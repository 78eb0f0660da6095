package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

import graft.gen.Corpus
import graft.schema.DedupConfig

/** Driver bench contract: ONE JSON line with per-query seconds over the
  * SPARK_GRAFT_SF_DIR tables, plus the flagship dedup throughput
  * (images/sec on the deterministic synthetic corpus — the BASELINE.json
  * north metric; corpus generation/materialization is excluded from every
  * timed window via Corpus.cached pre-warming). Failed queries report
  * `null` seconds plus an `errors` entry — a crash is never mistaken for a
  * fast run. The line is printed to stdout AND written to BENCH_LINE.json
  * (override with SPARK_GRAFT_BENCH_OUT) so log-prefix mangling can't
  * unparse it. Scaling evidence across parallelism levels lives in
  * graft.ScalingBench. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pre-materialize the synthetic corpora the corpus-backed queries use —
    // image encode cost stays outside the timed windows
    Corpus.cached(spark, 150, 40)
    Corpus.cached(spark, 80, 20)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(e.getClass.getSimpleName)
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // flagship throughput: input materialized before the timer
    val corpus = Corpus.cached(spark,
      sys.env.getOrElse("BENCH_CLUSTERS", "3000").toInt,
      sys.env.getOrElse("BENCH_SKEW", "500").toInt)
    val nImages = corpus.count()
    val tf0 = System.nanoTime()
    val flagshipErr = try { Dedup.run(corpus, DedupConfig()).count(); None } catch {
      case e: Throwable =>
        System.err.println(s"[bench] flagship FAILED: ${e.getMessage}")
        Some(e.getClass.getSimpleName)
    }
    val flagshipSec = (System.nanoTime() - tf0) / 1e9
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "null" else f"$v%.3f")
    }.mkString("{", ",", "}")
    val errs = (results.collect { case (k, _, Some(e)) => k -> e } ++
        flagshipErr.map("flagship" -> _))
      .map { case (k, e) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val okTotal = results.collect { case (_, v, None) => v }.sum
    val flagship =
      if (flagshipErr.isEmpty)
        f""""flagship_images":$nImages,"flagship_sec":$flagshipSec%.2f,""" +
          f""""flagship_images_per_sec":${nImages / flagshipSec}%.1f,"""
      else """"flagship_images":null,"flagship_sec":null,"flagship_images_per_sec":null,"""
    val line =
      f"""{"metric":"total","value":$okTotal%.3f,"unit":"sec","queries":$qs,""" +
        f""""errors":$errs,""" + flagship + f""""sf":"$sfDir"}"""
    println(line)
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LINE.json")),
      line + "\n")
    spark.stop()
  }
}
