package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.candidates.Candidates
import graft.cluster.ConnectedComponents
import graft.gen.Corpus
import graft.keys.Keys
import graft.schema.DedupConfig

/** Stage-by-stage wall-clock profile of the flagship pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROFILE_CLUSTERS", "150").toInt
    val skew = sys.env.getOrElse("PROFILE_SKEW", "40").toInt
    val cores = sys.env.getOrElse("PROFILE_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = DedupConfig()
    val corpus = time("gen+persist") {
      val c = Corpus.generate(spark, n, skew).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val keyed = corpus.withColumn("key",
      Keys.matchKey(cfg.key, col("bytes"), col("caption"), col("mtime")))
    time("exact edges")(Candidates.exactEdges(keyed, "image_id", "key").count())
    time("caption LSH edges")(
      Candidates.captionLshEdges(corpus, "image_id", "caption", cfg.near)._1.count())
    time("phash hamming edges")(
      Candidates.phashHammingEdges(corpus, "image_id", "phash", cfg.near)._1.count())
    time("containment edges")(
      Candidates.containmentEdges(corpus, "image_id", "caption", cfg.near).count())
    val edges = time("all edges union distinct") {
      val (e, _) = Dedup.candidateEdges(corpus, cfg)
      e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      e
    }
    val cc = time("connected components") {
      val (out, iters, _) = ConnectedComponents.runWithStats(edges)
      println(s"[profile]   cc iterations=$iters")
      out
    }
    val members = time("members join+persist") {
      val filtered = Dedup.filterRows(corpus, cfg.filter)
      val m = filtered
        .join(cc.withColumnRenamed("id", "image_id"), Seq("image_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("image_id")))
        .select("image_id", "role", "cluster_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    time("ranked windows only") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("cluster_id", "role").orderBy("image_id")
      members.withColumn("rn", row_number().over(w))
        .withColumn("n_ref", sum(when(col("role") === "ref", 1).otherwise(0))
          .over(Window.partitionBy("cluster_id")))
        .withColumn("n_scan", sum(when(col("role") === "scan", 1).otherwise(0))
          .over(Window.partitionBy("cluster_id")))
        .count()
    }
    time("resolve only")(graft.resolve.Resolver.resolve(members, cfg.resolve).count())
    time("end-to-end fresh 1")(Dedup.run(corpus, cfg).count())
    time("end-to-end fresh 2")(Dedup.run(corpus, cfg).count())
    time("end-to-end fresh 3")(Dedup.run(corpus, cfg).count())
    spark.stop()
  }
}
