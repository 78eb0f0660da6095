package graft

import org.apache.spark.sql.functions._

import graft.gen.Corpus
import graft.schema.DedupConfig

/** The north metric: dup-pair recall ≥ 0.99 against the planted oracle at
  * the reference shingle/signature config (BASELINE.json). Truth pairs are
  * all intra-cluster pairs of planted multi-row clusters (the `truth_cluster`
  * column the pipeline never reads); engine pairs come from the full
  * pipeline's connected components. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  test("dup-pair recall ≥ 0.99 and pairwise precision ≥ 0.99 on planted corpus") {
    val corpus = Corpus.generate(spark, nClusters = 150, skewCopies = 40).toDF().cache()
    val members = Dedup.clusterMembers(corpus, DedupConfig()).cache()

    def pairsOf(df: org.apache.spark.sql.DataFrame, ccol: String) = {
      val a = df.select(col(ccol).as("c"), col("image_id").as("id1"))
      val b = df.select(col(ccol).as("c"), col("image_id").as("id2"))
      a.join(b, "c").where(col("id1") < col("id2")).select("id1", "id2")
    }
    val truthPairs = pairsOf(corpus, "truth_cluster").cache()
    val enginePairs = pairsOf(members, "cluster_id").cache()
    val nTruth = truthPairs.count()
    val hit = truthPairs.intersect(enginePairs).count()
    val nEngine = enginePairs.count()
    val recall = hit.toDouble / nTruth
    val precision = hit.toDouble / nEngine
    info(f"dup-pair recall=$recall%.4f ($hit/$nTruth) precision=$precision%.4f ($hit/$nEngine)")
    assert(recall >= 0.99, f"recall $recall%.4f < 0.99")
    assert(precision >= 0.99, f"precision $precision%.4f < 0.99 (over-merging)")
    corpus.unpersist(); members.unpersist(); truthPairs.unpersist(); enginePairs.unpersist()
  }

  test("clustering is invariant to input partitioning (distribution determinism)") {
    val corpus = Corpus.generate(spark, nClusters = 40, skewCopies = 10).toDF().cache()
    val cfg = DedupConfig()
    val m1 = Dedup.clusterMembers(corpus.repartition(2), cfg)
      .select("image_id", "cluster_id").as[(String, String)].collect().toMap
    val m2 = Dedup.clusterMembers(corpus.repartition(13), cfg)
      .select("image_id", "cluster_id").as[(String, String)].collect().toMap
    assert(m1 == m2, "cluster assignment must not depend on partitioning")
    corpus.unpersist()
  }
}
