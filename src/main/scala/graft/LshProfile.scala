package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gen.Corpus
import graft.keys.Keys
import graft.schema.NearDupConfig

/** Sub-stage wall-clock profile of the caption-LSH candidate path
  * (dev tool): isolates window collapse, shingling, band UDF, bucket
  * pairing, and verify so the non-scaling term is attributable. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROFILE_CLUSTERS", "150000").toInt
    val skew = sys.env.getOrElse("PROFILE_SKEW", "2000").toInt
    val cores = sys.env.getOrElse("PROFILE_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lshprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = NearDupConfig()
    val corpus = time("gen+persist") {
      val c = Corpus.generate(spark, n, skew).toDF()
        .select("image_id", "caption") // LSH path touches only these
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val norm = corpus.select(col("image_id"), Keys.normCaption(col("caption")).as("_nc"))
    val repW = Window.partitionBy(col("_nc"))
    val withRep = norm.withColumn("_rep", min("image_id").over(repW))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("collapse window+persist")(withRep.count())
    val shingled = withRep.where(col("image_id") === col("_rep"))
      .select(col("image_id"), Keys.shingles(col("_nc"), cfg.shingleK).as("_sh"))
      .where(size(col("_sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles+persist")(shingled.count())
    val bandUdf = Keys.minhashBandUdf(cfg.lshBands, cfg.lshRowsPerBand)
    val exploded = shingled
      .select(col("image_id"),
              posexplode(bandUdf(col("_sh"))).as(Seq("band_id", "band_hash")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExp = time("band UDF + explode + persist")(exploded.count())
    println(s"[lshprof] exploded rows = $nExp")
    val (cand, _) = time("pairsWithinBuckets (plan)") {
      graft.candidates.Candidates.pairsWithinBuckets(
        exploded, "image_id", Seq("band_id", "band_hash"), cfg.maxBucketSize, "t")
    }
    val candP = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = time("pairsWithinBuckets (run)")(candP.count())
    println(s"[lshprof] candidates = $nCand")
    val verified = candP
      .join(shingled.select(col("image_id").as("id1"), col("_sh").as("_sh1")), "id1")
      .join(shingled.select(col("image_id").as("id2"), col("_sh").as("_sh2")), "id2")
    val (inter, union) = Keys.jaccardInterUnion(col("_sh1"), col("_sh2"))
    val nVer = time("verify (exact jaccard)")(
      verified.where(inter * 100 >= union * 80).count())
    println(s"[lshprof] verified = $nVer")
    spark.stop()
  }
}
