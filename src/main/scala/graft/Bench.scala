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
  * graft.ScalingBench.
  *
  * This box is a co-tenanted VM: back-to-back sweeps of the identical
  * binary measured 58 s vs 131 s vs 191 s totals with the slow queries
  * MOVING between runs (multi-minute hypervisor-steal bursts land on
  * whatever happens to be running). Two defenses, both recorded in the
  * output line:
  *   - each query (and the flagship) is timed BENCH_REPEATS times (default
  *     2) and reports the MIN — a burst must span every repeat to survive;
  *   - /proc/stat is sampled around every timed window and the reported
  *     run's whole-box steal + idle fractions are emitted per query
  *     (`query_steal`, `query_idle`), so a reader can tell a genuinely
  *     slow plan (idle≈0, steal≈0) from a contended window.
  *
  * Packaging: the stdout/BENCH_LINE.json line carries ONLY the compact
  * contract fields (total, per-query seconds, errors, flagship) — round 3's
  * line inlined the steal/idle maps and tripled in length, pushing the
  * front of the JSON out of the driver's captured tail ("parsed": null).
  * The diagnostics now go to BENCH_DIAG.json (file only, never stdout).
  */
object Bench {
  /** (user nice sys idle iowait irq softirq steal) ticks, whole box. */
  private def procStat(): Array[Long] =
    scala.io.Source.fromFile("/proc/stat").getLines().next()
      .split("\\s+").drop(1).take(8).map(_.toLong)

  private final case class Timing(sec: Double, steal: Double, idle: Double)

  /** Time one execution of `body`, with whole-box steal/idle during it. */
  private def timed(body: => Unit): Timing = {
    val s0 = procStat()
    val t0 = System.nanoTime()
    body
    val sec = (System.nanoTime() - t0) / 1e9
    val s1 = procStat()
    val d = s1.zip(s0).map { case (a, b) => a - b }
    val tot = math.max(1L, d.sum).toDouble
    Timing(sec, d(7) / tot, d(3) / tot)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("BENCH_REPEATS", "2").toInt
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
    val names = SparkEntry.queries.keys.toSeq.sorted
    val best = scala.collection.mutable.Map.empty[String, Timing]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (r <- 1 to repeats; name <- names; if !errors.contains(name)) {
      val fn = SparkEntry.queries(name)
      try {
        val t = timed { fn(spark, sfDir).count(): Unit }
        System.err.println(f"[bench] $name r$r ${t.sec}%.2f s steal=${t.steal}%.2f")
        if (!best.get(name).exists(_.sec <= t.sec)) best(name) = t
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors(name) = e.getClass.getSimpleName
          // a success on an earlier repeat must not survive alongside the
          // error record — an errored query is unambiguously null
          best.remove(name)
      }
    }
    // flagship throughput: input materialized before the timer
    val corpus = Corpus.cached(spark,
      sys.env.getOrElse("BENCH_CLUSTERS", "3000").toInt,
      sys.env.getOrElse("BENCH_SKEW", "500").toInt)
    val nImages = corpus.count()
    var flagship: Option[Timing] = None
    for (r <- 1 to repeats; if !errors.contains("flagship")) {
      try {
        val t = timed { Dedup.run(corpus, DedupConfig()).count(): Unit }
        System.err.println(f"[bench] flagship r$r ${t.sec}%.2f s steal=${t.steal}%.2f")
        if (!flagship.exists(_.sec <= t.sec)) flagship = Some(t)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] flagship FAILED: ${e.getMessage}")
          errors("flagship") = e.getClass.getSimpleName
          flagship = None
      }
    }
    def jmap(sel: Timing => Double): String = names.map { k =>
      "\"" + k + "\":" +
        best.get(k).map(t => f"${sel(t)}%.3f").getOrElse("null")
    }.mkString("{", ",", "}")
    val errsJson = errors.toSeq.sortBy(_._1)
      .map { case (k, e) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val okTotal = best.values.map(_.sec).sum
    val flagshipJson = flagship match {
      case Some(t) =>
        f""""flagship_images":$nImages,"flagship_sec":${t.sec}%.2f,""" +
          f""""flagship_images_per_sec":${nImages / t.sec}%.1f,""" +
          f""""flagship_steal":${t.steal}%.3f,"""
      case None =>
        """"flagship_images":null,"flagship_sec":null,"flagship_images_per_sec":null,"""
    }
    val line =
      f"""{"metric":"total","value":$okTotal%.3f,"unit":"sec","repeats":$repeats,""" +
        f""""queries":${jmap(_.sec)},""" +
        f""""errors":$errsJson,""" + flagshipJson + f""""sf":"$sfDir"}"""
    println(line)
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LINE.json")),
      line + "\n")
    val diag =
      f"""{"metric":"bench_diag","query_steal":${jmap(_.steal)},""" +
        f""""query_idle":${jmap(_.idle)}""" +
        flagship.map(t => f""","flagship_steal":${t.steal}%.3f,"flagship_idle":${t.idle}%.3f""").getOrElse("") +
        "}"
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_DIAG_OUT", "BENCH_DIAG.json")),
      diag + "\n")
    spark.stop()
  }
}
