package graft

import java.nio.file.Files

import graft.gen.Corpus
import graft.schema.DedupConfig
import graft.util.Seal

/** Reliable-checkpoint mode: with spark.graft.checkpoint.dir set, every
  * engine seal (operator outputs, featurize, CC iterations) becomes a
  * reliable `Dataset.checkpoint` — executor-loss-safe on a real cluster —
  * and the flagship must produce identical actions to the local default. */
class SealSpec extends SparkSpec {

  test("flagship under reliable checkpoints == local default, files written") {
    val corpus = Corpus.generate(spark, nClusters = 40, skewCopies = 10).toDF().cache()
    val cfg = DedupConfig()
    def actions() = Dedup.run(corpus, cfg)
      .select("image_id", "cluster_id", "disposition", "target")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet

    val local = actions()
    val ckptDir = Files.createTempDirectory("graft_reliable_ckpt").toString
    spark.conf.set(Seal.ConfKey, ckptDir)
    Seal.resetLeakWarningsForTest()
    try {
      val reliable = actions()
      assert(reliable == local, "reliable-checkpoint mode must not change results")
      // round-6: the file-leak warning fires during a real reliable run
      // (this session has neither cleanCheckpoints nor the managed ack)
      assert(Seal.leakWarnings == 1,
        s"expected the checkpoint-leak warning once, got ${Seal.leakWarnings}")
      // the mode actually wrote reliable checkpoint data
      import scala.jdk.CollectionConverters._
      val s = Files.walk(java.nio.file.Paths.get(ckptDir))
      val nFiles = try s.filter(Files.isRegularFile(_)).iterator().asScala.size
                   finally s.close()
      assert(nFiles > 0, "no reliable checkpoint files were written")
    } finally {
      spark.conf.unset(Seal.ConfKey)
      corpus.unpersist()
    }
  }
}
