package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.candidates.Candidates
import graft.keys.Keys
import graft.schema.NearDupConfig

/** Stage-by-stage profile of the SimHash pair-listing path (dev tool). */
object SimProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[simprof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = NearDupConfig(jaccardThreshold = 0.8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs read+persist")(docs.count())
    val base = docs.select(col("doc_id"), Keys.normCaption(col("text")).as("_nc"))
    val repW = org.apache.spark.sql.expressions.Window.partitionBy(col("_nc"))
    val withRep = base.withColumn("_rep", min("doc_id").over(repW))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("collapse+persist")(withRep.count())
    val reps = withRep.where(col("doc_id") === col("_rep"))
      .select(col("doc_id"), Keys.tokens(col("_nc")).as("_t"))
      .where(size(col("_t")) > 0)
      .select(col("doc_id"), Keys.simhashMd5Udf(col("_t")).as("_sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("md5 signatures+persist")(reps.count())
    val cand = Candidates.multiIndexHammingPairs(
      reps, "doc_id", "_sim",
      cfg.simhashBands, cfg.simhashSubRadius, cfg.simhashRadius)
    val nCand = time("multi-index pairs (radius 7)")(cand.count())
    println(s"[simprof] pairs = $nCand")
    val n2 = time("full simhashPairs op")(
      graft.ops.DocOps.simhashPairs(docs, "doc_id", "text", cfg).count())
    println(s"[simprof] op output = $n2")
    spark.stop()
  }
}
