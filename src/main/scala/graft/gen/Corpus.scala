package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

import graft.schema.ImageRow

/** Deterministic synthetic image+caption corpus with planted duplicate
  * relationships (FIXTURES.md §1). No wall-clock, no external data: every
  * row is a pure function of (seed, clusterId, variantId), so the corpus is
  * identical regardless of partitioning / parallelism — required for the
  * local[4]-vs-local[16] scaling evidence to compare like with like.
  *
  * Cluster plan, by clusterId % 10 (a "decade" = 20 rows):
  *   0-3  singleton negatives (incl. an adversarial same-caption+same-size
  *        different-content pair shape via 2-3: unique image, reused caption
  *        shell — mirrors /root/reference/tests/test_usecases.py:151-176)
  *   4    exact duplicate pair (same bytes, same caption, distinct mtime)
  *   5    exact bytes, different caption ("renamed file")
  *   6    caption near-duplicates (3 rows, shingle-Jaccard ≳ 0.85)
  *   7    image near-duplicates (same pixels as png / bmp / jpg q90)
  *   8    caption containment (short caption ⊂ long caption)
  *   9    mixed 4-row cluster (exact + caption-near + image-near chained)
  * plus one skew block: `skewCopies` rows of one image with near-identical
  * captions (scaled-up reference shape,
  * /root/reference/tests/test_usecases_source_duplications.py:271-293).
  */
object Corpus {
  val Vocab: IndexedSeq[String] = (0 until 1000).map(i => f"w$i%03d")

  private def rngFor(seed: Long, g: Long): Random =
    new Random(seed * 1000003L + g * 7919L)

  private def caption(rng: Random, nTokens: Int): Array[String] =
    Array.fill(nTokens)(Vocab(rng.nextInt(Vocab.length)))

  /** Paraphrase: swap `nSwap` interior tokens — keeps shingle-Jaccard high
    * and controllable for a 30-token caption. */
  private def paraphrase(rng: Random, base: Array[String], nSwap: Int): Array[String] = {
    val out = base.clone()
    var i = 0
    while (i < nSwap) {
      val pos = 2 + rng.nextInt(out.length - 4)
      out(pos) = Vocab(rng.nextInt(Vocab.length))
      i += 1
    }
    out
  }

  private val BaseEpochMs = 1700000000000L // fixed, deterministic

  private def mk(g: Long, v: Int, bytes: Array[Byte], fmt: String,
                 cap: Array[String], img: java.awt.image.BufferedImage,
                 truth: Long): ImageRow = {
    val ts = new Timestamp(BaseEpochMs + g * 1000L + v * 7L)
    ts.setNanos(((g * 131 + v * 17) % 1000).toInt * 1000) // µs-distinct mtimes
    ImageRow(
      image_id = f"img_$g%08d_$v%02d",
      bytes = bytes, w = Images.Side, h = Images.Side, fmt = fmt,
      caption = cap.mkString(" "),
      phash = Images.phash(img),
      role = if ((g + v) % 2 == 0) "ref" else "scan",
      mtime = ts,
      truth_cluster = truth)
  }

  /** Rows of one planted cluster. Pure in (seed, g). */
  def clusterRows(seed: Long, g: Long): Seq[ImageRow] = {
    val rng = rngFor(seed, g)
    val img = Images.smoothImage(rng)
    val png = Images.encode(img, "png")
    val cap = caption(rng, 38 + rng.nextInt(6)) // 38-43 tokens: one interior
    // token swap keeps shingle-Jaccard ≈ 0.85, above the 0.8 verify threshold
    (g % 10) match {
      case 0 | 1 | 2 | 3 =>
        Seq(mk(g, 0, png, "png", cap, img, g))
      case 4 => // exact pair: same bytes + caption, mtime differs
        Seq(mk(g, 0, png, "png", cap, img, g),
            mk(g, 1, png, "png", cap, img, g))
      case 5 => // same bytes, different caption
        val cap2 = caption(rng, 38)
        Seq(mk(g, 0, png, "png", cap, img, g),
            mk(g, 1, png, "png", cap2, img, g))
      case 6 => // caption near-dups over different images
        val img2 = Images.smoothImage(rng); val img3 = Images.smoothImage(rng)
        Seq(mk(g, 0, png, "png", cap, img, g),
            mk(g, 1, Images.encode(img2, "png"), "png", paraphrase(rng, cap, 1), img2, g),
            mk(g, 2, Images.encode(img3, "png"), "png", paraphrase(rng, cap, 1), img3, g))
      case 7 => // image near-dups: re-encodes of the same pixels
        val bmp = Images.encode(img, "bmp")
        val jpg = Images.encode(img, "jpg", 0.9f)
        val jimg = Images.decode(jpg)
        Seq(mk(g, 0, png, "png", cap, img, g),
            mk(g, 1, bmp, "bmp", caption(rng, 38), img, g),
            mk(g, 2, jpg, "jpg", caption(rng, 38), jimg, g))
      case 8 => // containment: cap ⊂ longer caption
        val img2 = Images.smoothImage(rng)
        val longCap = caption(rng, 6) ++ cap ++ caption(rng, 6)
        Seq(mk(g, 0, png, "png", cap, img, g),
            mk(g, 1, Images.encode(img2, "png"), "png", longCap, img2, g))
      case _ => // 9: mixed chain — exact, caption-near, image-near
        val jpg = Images.encode(img, "jpg", 0.9f)
        val jimg = Images.decode(jpg)
        val img4 = Images.smoothImage(rng)
        Seq(mk(g, 0, png, "png", cap, img, g),
            mk(g, 1, png, "png", cap, img, g),                                  // exact of 0
            mk(g, 2, Images.encode(img4, "png"), "png", paraphrase(rng, cap, 1), img4, g), // caption-near of 0
            mk(g, 3, jpg, "jpg", caption(rng, 38), jimg, g))                    // image-near of 0
      }
  }

  /** Distributed deterministic generation: ~2 rows per cluster + skew. */
  def generate(spark: SparkSession, nClusters: Int, skewCopies: Int = 0,
               seed: Long = 42L): Dataset[ImageRow] = {
    import spark.implicits._
    val clusters = spark.range(0, nClusters.toLong, 1,
        math.min(spark.sparkContext.defaultParallelism, math.max(1, nClusters / 8)))
      .flatMap(g => clusterRows(seed, g))
    if (skewCopies > 0) {
      val skew = spark.range(0, skewCopies.toLong, 1,
          math.max(1, skewCopies / 1024))
        .map(v => skewRowAt(seed, nClusters.toLong, v.toInt))
      clusters.union(skew)
    } else clusters
  }

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int, Long), org.apache.spark.sql.DataFrame]

  /** Memoized, persisted corpus per (session, nClusters, skewCopies, seed):
    * queries that run over the synthetic corpus (q_dedup_pipeline,
    * q_image_features) share one materialization instead of re-encoding
    * every image per invocation; if an external `clearCache()` dropped the
    * persist, it is re-persisted and re-materialized here (outside any
    * caller's timed window). Keyed by the context's unique applicationId
    * (+ session identity within it): a bare identity-hash key can collide
    * with a NEW session after the old one is GC'd, handing out a DataFrame
    * bound to a stopped SparkContext; entries of stopped contexts are also
    * dropped before reuse. */
  def cached(spark: SparkSession, nClusters: Int, skewCopies: Int = 0,
             seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    memo.filterInPlace((_, df) => !df.sparkSession.sparkContext.isStopped)
    val key = (s"${spark.sparkContext.applicationId}-${System.identityHashCode(spark)}",
               nClusters, skewCopies, seed)
    val df = memo.getOrElseUpdate(key, generate(spark, nClusters, skewCopies, seed).toDF())
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
    }
    df
  }

  /** One skew row, generated independently per index (distributed-friendly:
    * no single task materializes the whole hot cluster). */
  def skewRowAt(seed: Long, skewId: Long, v: Int): ImageRow = {
    val rng = rngFor(seed, skewId)
    val img = Images.smoothImage(rng)
    val png = Images.encode(img, "png")
    val cap = caption(rng, 40)
    val capV = cap.dropRight(1) :+ Vocab(v % Vocab.length)
    mk(skewId, v, png, "png", capV, img, skewId)
  }
}
