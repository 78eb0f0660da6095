package graft

import org.apache.spark.sql.functions._

import graft.gen.{Corpus, Images}
import graft.ops.ImageOps

/** Multimodal plumbing + the input_hint fidelity invariant:
  * decoded-pixel PSNR ≥ 40 dB for lossy re-encodes, phash stability under
  * re-encoding, one-pass feature extraction consistency. */
class ImageOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rng = new scala.util.Random(7L)

  test("fidelity invariant: jpg q90 re-encode keeps luma PSNR ≥ 40 dB") {
    for (i <- 1 to 5) {
      val img = Images.smoothImage(new scala.util.Random(100L + i))
      val jpg = Images.decode(Images.encode(img, "jpg", 0.9f))
      val p = Images.psnr(img, jpg)
      assert(p >= 40.0, s"smooth image $i: psnr $p < 40 dB")
    }
  }

  test("phash: invariant to lossless re-encode, near-invariant to jpg q90") {
    for (i <- 1 to 5) {
      val img = Images.smoothImage(new scala.util.Random(200L + i))
      val p0 = Images.phash(img)
      val pBmp = Images.phash(Images.decode(Images.encode(img, "bmp")))
      val pPng = Images.phash(Images.decode(Images.encode(img, "png")))
      val pJpg = Images.phash(Images.decode(Images.encode(img, "jpg", 0.9f)))
      assert(pBmp == p0 && pPng == p0, "lossless re-encode must not change phash")
      val d = java.lang.Long.bitCount(p0 ^ pJpg)
      assert(d <= 7, s"jpg q90 phash hamming $d exceeds blocking radius 7")
    }
  }

  test("phash separates independent images (no trivial collisions)") {
    val hashes = (1 to 20).map(i => Images.phash(Images.smoothImage(new scala.util.Random(300L + i))))
    val dists = for (a <- hashes.indices; b <- (a + 1) until hashes.size)
      yield java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    // independent smooth images: expect ~32 bit distance, never within radius
    assert(dists.min > 7, s"independent images collided at distance ${dists.min}")
  }

  test("imageFeatures: one-pass decode matches generator metadata") {
    val corpus = Corpus.generate(spark, nClusters = 20).toDF().cache()
    val feats = ImageOps.imageFeatures(corpus, "image_id", "bytes")
    val joined = corpus.select("image_id", "w", "h", "fmt", "phash")
      .join(feats, "image_id").cache()
    assert(joined.where(!col("decodable")).count() == 0)
    assert(joined.where(col("width") =!= col("w") || col("height") =!= col("h")).count() == 0)
    // stored phash was computed on the decoded variant → recompute matches exactly
    assert(joined.where(col("phash_recomputed") =!= col("phash")).count() == 0)
    corpus.unpersist(); joined.unpersist()
  }

  test("pairFidelity: planted image-near pairs all pass PSNR ≥ 40, dims guarded") {
    val corpus = Corpus.generate(spark, nClusters = 30).toDF().cache()
    // type-7 clusters: rows 0/1/2 share pixels across png/bmp/jpg
    val t7 = corpus.where(pmod(col("truth_cluster"), lit(10)) === 7)
    val pairs = t7.alias("a").join(t7.alias("b"),
        col("a.truth_cluster") === col("b.truth_cluster") &&
        col("a.image_id") < col("b.image_id"))
      .select(col("a.image_id").as("id1"), col("b.image_id").as("id2"))
    val checked = ImageOps.pairFidelity(pairs, corpus, "image_id", "bytes")
    val bad = checked.where(col("psnr_db") < 40.0 || isnan(col("psnr_db")))
    assert(checked.count() > 0)
    assert(bad.count() == 0, s"fidelity violations: ${bad.collect().mkString(",")}")
    corpus.unpersist()
  }

  test("thumbnail UDF produces decodable PNG of requested size") {
    val img = Images.smoothImage(rng)
    val df = Seq(Tuple1(Images.encode(img, "png"))).toDF("bytes")
    val thumb = df.select(ImageOps.thumbnailUdf(8, 8)(col("bytes")).as("t"))
      .first().getAs[Array[Byte]](0)
    val dec = Images.decode(thumb)
    assert(dec.getWidth == 8 && dec.getHeight == 8)
  }

  test("undecodable bytes degrade gracefully (skip, not task failure)") {
    val df = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("bytes")
    val r = ImageOps.imageFeatures(df.withColumn("id", lit("x")), "id", "bytes").first()
    assert(!r.getAs[Boolean]("decodable"))
    assert(r.get(r.fieldIndex("phash_recomputed")) == null)
  }
}
