package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.gen.Images

/** Multimodal (binary-column) image operators.
  *
  * Images travel as opaque `binary` columns with typed metadata — the
  * engine's multimodal plumbing. Decode/feature-extract runs as Scala UDFs
  * over JDK `javax.imageio` (offline-safe, executor-local, no native deps):
  * each UDF is a pure `Array[Byte] => T` so Spark distributes it per
  * partition with zero shuffle; only the (small) derived columns flow
  * onward, never re-encoded pixels unless explicitly materialized.
  *
  * Scale notes: UDFs break whole-stage codegen locally, so every operator
  * here *projects first* (id + bytes only) and derives all needed features
  * in ONE pass over the binary column — a 100 TB scan decodes each image
  * exactly once. The fidelity invariant (BASELINE.json input_hint:
  * decoded-pixel PSNR ≥ 40 dB for lossy formats) is `psnrUdf` applied to
  * candidate pairs, never to the full cross product.
  */
object ImageOps {

  /** Decoded metadata: (width, height, decodable). Undecodable payloads
    * yield (-1,-1,false) instead of failing the task — reference behavior
    * for unreadable files is skip-and-continue (hash_manager.py swallows
    * per-file errors). */
  val decodeMetaUdf: UserDefinedFunction = udf { (bytes: Array[Byte]) =>
    try {
      val img = Images.decode(bytes)
      if (img == null) (-1, -1, false) else (img.getWidth, img.getHeight, true)
    } catch { case _: Exception => (-1, -1, false) }
  }

  /** Recomputed 64-bit DCT perceptual hash from pixel content. */
  val phashUdf: UserDefinedFunction = udf { (bytes: Array[Byte]) =>
    try {
      val img = Images.decode(bytes)
      if (img == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(Images.phash(img))
    } catch { case _: Exception => null.asInstanceOf[java.lang.Long] }
  }

  /** Luma PSNR between two encoded images (dB; +Inf for identical pixels,
    * NaN if either side fails to decode or dimensions differ). */
  val psnrUdf: UserDefinedFunction = udf { (a: Array[Byte], b: Array[Byte]) =>
    try {
      val ia = Images.decode(a); val ib = Images.decode(b)
      if (ia == null || ib == null ||
          ia.getWidth != ib.getWidth || ia.getHeight != ib.getHeight) Double.NaN
      else Images.psnr(ia, ib)
    } catch { case _: Exception => Double.NaN }
  }

  /** Deterministic thumbnail: decode → area-average resize → PNG bytes. */
  def thumbnailUdf(w: Int, h: Int): UserDefinedFunction = udf { (bytes: Array[Byte]) =>
    try {
      val img = Images.decode(bytes)
      if (img == null) null
      else Images.encode(Images.resizeTo(img, w, h), "png")
    } catch { case _: Exception => null }
  }

  /** One-pass feature extraction over the binary column: width/height/
    * decodability + recomputed phash + byte size. Input df needs
    * (idCol, bytesCol); output keeps idCol plus derived columns only —
    * bytes are dropped so downstream stages shuffle small rows. */
  def imageFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame =
    df.select(col(idCol),
              length(col(bytesCol)).as("n_bytes"),
              decodeMetaUdf(col(bytesCol)).as("_m"),
              phashUdf(col(bytesCol)).as("phash_recomputed"))
      .select(col(idCol), col("n_bytes"),
              col("_m._1").as("width"), col("_m._2").as("height"),
              col("_m._3").as("decodable"), col("phash_recomputed"))

  /** Fidelity verification for candidate pairs (id1, id2): joins bytes back
    * and computes pairwise luma PSNR — the input_hint invariant check
    * (PSNR ≥ 40 dB for lossy re-encodes). `pairs` stays the driver of the
    * join so only candidate rows ever decode twice. */
  def pairFidelity(pairs: DataFrame, images: DataFrame,
                   idCol: String, bytesCol: String): DataFrame = {
    val img = images.select(col(idCol), col(bytesCol))
    pairs
      .join(img.select(col(idCol).as("id1"), col(bytesCol).as("_b1")), "id1")
      .join(img.select(col(idCol).as("id2"), col(bytesCol).as("_b2")), "id2")
      .withColumn("psnr_db", psnrUdf(col("_b1"), col("_b2")))
      .drop("_b1", "_b2")
  }
}
