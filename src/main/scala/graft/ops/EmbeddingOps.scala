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

  /** Embedding-cosine near-duplicate pairs: within-label blocked join,
    * keep pairs with quantized dot ≥ `tauQ`. Inputs are L2-normalized so
    * the integer dot IS cosine × 10⁶ (to quantization error) — integer-
    * exact, oracle-reproducible. Output (id1, id2, dot_q), id1 < id2.
    * The label block bounds the join (same role as LSH buckets); at scale
    * the label is replaced by `hyperplaneBucket`. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, tauQ: Long): DataFrame = {
    val q = emb.select(col(idCol).as("id"), col(labelCol).as("label"),
                       quantize(col(vecCol)).as("q"))
    q.select(col("id").as("id1"), col("label"), col("q").as("q1"))
      .join(q.select(col("id").as("id2"), col("label"), col("q").as("q2")), "label")
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), dotQ(col("q1"), col("q2")).as("dot_q"))
      .where(col("dot_q") >= tauQ)
  }

  /** Random-hyperplane (SimHash) LSH sign-bucket for ANN: bit j of table
    * `table`'s bucket = sign(v · h_{t,j}) where hyperplane h_{t,j}'s
    * components are ±1 from the parity of xxhash64(table, j, dim-index) —
    * no stored model, every executor recomputes the same planes. */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int, table: Int = 0): Column = {
    val bits = (0 until nBits).map { j =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => when(pmod(xxhash64(lit(table), lit(j), i), lit(2)) === 0, x)
            .otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-1 via multi-table hyperplane LSH: `nTables` independent
    * sign-LSH tables (standard recall amplification — one table of b bits
    * finds a cos-θ neighbor with prob (1−θ/π)^b; L tables lift that to
    * 1−(1−p^b)^L); candidates are the union of same-(table,bucket) pairs,
    * verified & ranked by exact quantized dot. Scale path: one explode to
    * nTables rows per vector, shuffle keyed on (table, bucket) only — never
    * a cross join; hot buckets would be salted exactly like LSH text
    * buckets (Candidates.pairsWithinBuckets).
    * Output (vec_id, nn_id, dot_q) — approximate top-1 per vector. */
  def annTop1(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, nBits: Int = 8, nTables: Int = 8): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"),
                       quantize(col(vecCol)).as("q"),
                       posexplode(array((0 until nTables).map(t =>
                         hyperplaneBucket(col(vecCol), dim, nBits, t)): _*))
                         .as(Seq("table_id", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = q
      .join(q.select(col("vec_id").as("nn_id"), col("q").as("q2"),
                     col("table_id"), col("bucket")), Seq("table_id", "bucket"))
      .where(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"), col("q"), col("q2"))
      .dropDuplicates("vec_id", "nn_id") // a pair sharing k tables scores once
      .select(col("vec_id"), col("nn_id"), dotQ(col("q"), col("q2")).as("dot_q"))
    val w = Window.partitionBy("vec_id").orderBy(col("dot_q").desc, col("nn_id").asc)
    pairs.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("vec_id", "nn_id", "dot_q")
  }
}
