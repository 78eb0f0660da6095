package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Quantized integer dot products (round(x*1000) per dimension) make
  * similarity comparisons integer-exact — oracle-reproducible in any SQL
  * engine, no float-boundary flakiness — while preserving ranking to 3
  * decimals. The brute-force path is the small-scale baseline; the
  * hyperplane-LSH path is the 100 TB path (bucketed candidate join).
  */
object EmbeddingOps {

  /** array<float> → array<long>, q[i] = round(v[i] * 1000). */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000).cast("long"))

  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force top-1 neighbor per vector, blocked by an exact partition
    * column (label): never a global cartesian — within-block join + window
    * argmax. Output (vec_id, nn_id, dot_q). Ties broken by smaller nn_id. */
  def top1WithinLabel(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
                       quantize(col(vecCol)).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = q.select(col("vec_id"), col("label"), col("q"))
      .join(q.select(col("vec_id").as("nn_id"), col("label"), col("q").as("q2")), "label")
      .where(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"), dotQ(col("q"), col("q2")).as("dot_q"))
    val w = Window.partitionBy("vec_id").orderBy(col("dot_q").desc, col("nn_id").asc)
    pairs.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("vec_id", "nn_id", "dot_q")
  }

  /** Random-hyperplane (SimHash) LSH sign-bucket for ANN: bit j of the
    * bucket = sign(v · h_j) where hyperplane h_j's components are derived
    * deterministically from xxhash64(j, dim) — no stored model, executors
    * recompute identically. */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      // h_j[i] ∈ {-1, +1} from the parity of xxhash64(j, i)
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => when(pmod(xxhash64(lit(j), i), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via hyperplane-LSH buckets: candidates share a bucket; verified &
    * ranked by quantized dot. Scale path: shuffle on bucket id only.
    * Output (vec_id, nn_id, dot_q) — approximate top-1 per vector among
    * same-bucket candidates. */
  def annTop1(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, nBits: Int = 12): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"),
                       quantize(col(vecCol)).as("q"),
                       hyperplaneBucket(col(vecCol), dim, nBits).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = q
      .join(q.select(col("vec_id").as("nn_id"), col("q").as("q2"), col("bucket")), "bucket")
      .where(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"), dotQ(col("q"), col("q2")).as("dot_q"))
    val w = Window.partitionBy("vec_id").orderBy(col("dot_q").desc, col("nn_id").asc)
    pairs.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("vec_id", "nn_id", "dot_q")
  }
}
