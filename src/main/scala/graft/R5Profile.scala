package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.gen.Corpus
import graft.ops.DocOps
import graft.schema.{DedupConfig, NearDupConfig}

/** Dev-only phase profiler for the round-5 bench targets
  * (q_dup_clusters / q_dedup_pipeline flat-cost decomposition). */
object R5Profile {
  def time[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docLsh = NearDupConfig(jaccardThreshold = 0.8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    for (rep <- 1 to 2) {
      println(s"[prof] ---- repeat $rep ----")
      // q_dup_clusters phases
      val edges = time("lsh_edges build+materialize") {
        val e = DocOps.minhashLshEdges(docs, "doc_id", "text", docLsh)
          .localCheckpoint(true)
        graft.util.CacheScope.flushDeferred()
        println(s"[prof]   edges=${e.count()}")
        e
      }
      val cc = time("cc runMapping") {
        ConnectedComponents.runMapping(edges)
      }
      time("final join+orderBy+count") {
        val out = docs.select(col("doc_id"))
          .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
                  coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          .orderBy("doc_id")
        println(s"[prof]   rows=${out.count()}")
      }
      time("q_dup_clusters end-to-end") {
        SparkEntry.queries("q_dup_clusters")(spark, sfDir).count()
        graft.util.CacheScope.flushDeferred()
      }
      // q_dedup_pipeline phases
      val corpus = Corpus.cached(spark, 150, 40)
      corpus.count()
      val filtered = Dedup.filterRows(corpus, DedupConfig().filter)
      val (edges2, _) = time("flagship candidateEdges") {
        val (e, m) = Dedup.candidateEdges(filtered, DedupConfig(), dedup = false)
        println(s"[prof]   edges=${e.count()}")
        (e, m)
      }
      val cc2 = time("flagship cc runMapping") {
        ConnectedComponents.runMapping(edges2)
      }
      time("flagship members+resolve+count") {
        val members = filtered
          .join(cc2.withColumnRenamed("id", "image_id"), Seq("image_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("image_id")))
          .select("image_id", "role", "cluster_id")
        println(s"[prof]   rows=${graft.resolve.Resolver.resolve(members).count()}")
      }
      time("q_dedup_pipeline end-to-end") {
        SparkEntry.queries("q_dedup_pipeline")(spark, sfDir).count()
        graft.util.CacheScope.flushDeferred()
      }
    }
    spark.stop()
  }
}
