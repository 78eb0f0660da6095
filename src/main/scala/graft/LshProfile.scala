package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gen.Corpus
import graft.keys.Keys
import graft.schema.NearDupConfig

/** Sub-stage wall-clock profile of the caption-LSH candidate path
  * (dev tool): isolates window collapse, shingling, band UDF, bucket
  * pairing, and verify so the non-scaling term is attributable. Session
  * config and CPU pinning mirror ScalingBench/Profile. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROFILE_CLUSTERS", "150000").toInt
    val skew = sys.env.getOrElse("PROFILE_SKEW", "2000").toInt
    val cores = sys.env.getOrElse("PROFILE_CPUS", "32").toInt
    val shmRoot = sys.env.getOrElse("SCALE_LOCAL_DIR", "/dev/shm/spark-graft")
    ScalingBench.pinCpus(cores)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", s"$shmRoot/shuffle")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lshprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = NearDupConfig()
    val corpus = time("input materialize") {
      val c = (sys.env.get("PROFILE_INPUT") match {
        case Some(path) => spark.read.parquet(path)
        case None => Corpus.generate(spark, n, skew).toDF()
      }).select(col("image_id"), col("caption")) // LSH path touches only these
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val norm = corpus.select(col("image_id"), Keys.normCaption(col("caption")).as("_nc"))
    val repW = Window.partitionBy(col("_nc"))
    val withRep = norm.withColumn("_rep", min("image_id").over(repW))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("collapse window+persist")(withRep.count())
    val sbUdf = Keys.shingleLshUdf(cfg.shingleK, cfg.lshBands, cfg.lshRowsPerBand)
    val shingled = withRep.where(col("image_id") === col("_rep"))
      .select(col("image_id"), sbUdf(col("_nc")).as("_sb"))
      .where(size(col("_sb._1")) > 0)
      .select(col("image_id"), col("_sb._1").as("_shh"), col("_sb._2").as("_bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles+bands fused UDF+persist")(shingled.count())
    val exploded = shingled
      .select(col("image_id"),
              posexplode(col("_bands")).as(Seq("band_id", "band_hash")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExp = time("band UDF + explode + persist")(exploded.count())
    println(s"[lshprof] exploded rows = $nExp")
    val (cand, _) = time("pairsWithinBuckets (plan)") {
      graft.candidates.Candidates.pairsWithinBuckets(
        exploded, "image_id", Seq("band_id", "band_hash"), cfg.maxBucketSize, "t",
        assumeDistinct = true)
    }
    val candP = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = time("pairsWithinBuckets (run)")(candP.count())
    println(s"[lshprof] candidates = $nCand")
    val verified = candP
      .join(shingled.select(col("image_id").as("id1"), col("_shh").as("_sh1")), "id1")
      .join(shingled.select(col("image_id").as("id2"), col("_shh").as("_sh2")), "id2")
    val (inter, union) = Keys.jaccardInterUnion(col("_sh1"), col("_sh2"))
    val nVer = time("verify (exact jaccard)")(
      verified.where(inter * 100 >= union * 80).count())
    println(s"[lshprof] verified = $nVer")
    spark.stop()
  }
}
