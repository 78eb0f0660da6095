package graft.candidates

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.keys.Keys
import graft.schema.NearDupConfig

/** Candidate-pair generation. Output contract for every source: DataFrame
  * `(id1, id2, kind)` with `id1 < id2`, distinct — the union feeds
  * connected-components clustering.
  *
  * At 100 TB the invariant is: NEVER a cartesian product; every candidate
  * source is an equi-join on a blocking key (exact key, LSH band hash,
  * Hamming band, shingle block), so Spark shuffles each side once on that
  * key and AQE handles residual skew. Hot buckets are additionally capped
  * with an explicit, logged truncation (reference analogue: the Bloom
  * pre-filter bounded candidate work, duplicates_finder.py:70-104).
  */
object Candidates {

  /** Pairs sharing an exact blocking key, bucket-capped.
    *
    * Instead of joining bucket×bucket (quadratic in bucket size), emit for
    * each bucket only the star `representative—member` edges: connectivity
    * is what clustering needs, and a star is the minimal edge set — turns
    * the reference's grouped-lists-by-key shape (duplicates_finder.py:161-
    * 175) into O(bucket) edges rather than O(bucket²). For *verified*
    * near-dup sources we keep true pairs (each pair must pass its verify
    * predicate) — see `pairsWithinBuckets`.
    */
  def starWithinBuckets(keyed: DataFrame, idCol: String, keyCols: Seq[String],
                        kind: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    keyed
      .withColumn("_rep", min(idCol).over(w))
      .where(col(idCol) =!= col("_rep"))
      .select(col("_rep").as("id1"), col(idCol).as("id2"), lit(kind).as("kind"))
      .distinct()
  }

  /** All intra-bucket pairs (id1<id2), with **salting** of oversized
    * buckets — the north_rule's explicit skew guard. `keyed` must have
    * `idCol` + `keyCols`. Returns (pairs, metrics).
    *
    * Mechanics: bucket sizes come from a `groupBy().count()` (partial
    * aggregation — skew-safe by construction); buckets ≤ `cap` produce the
    * exact full pair set; a bucket of size s > cap is split into
    * `ceil(s/cap)` salt sub-buckets by `xxhash64(id) mod nsalt`, pairs are
    * generated *within* each salt group, and the salt groups are stitched
    * with a chain over their per-salt minimum ids — so the bucket stays one
    * connected component while per-bucket pair cost drops from O(s²) to
    * O(s·cap) and no task ever joins more than ~2·cap rows against itself.
    * Nothing is dropped (the old design truncated rank>cap rows); stitched
    * buckets are still *reported* because their pair set is a connectivity-
    * preserving subset, not the full clique — downstream verification prunes
    * per-edge either way. The bucket-size frame is tiny (one row per
    * oversized bucket) so the size join broadcasts.
    */
  def pairsWithinBuckets(keyed: DataFrame, idCol: String, keyCols: Seq[String],
                         cap: Int, kind: String): (DataFrame, DataFrame) = {
    val ks = keyCols.map(col)
    // persisted: read once for bucket sizes (inside the broadcast build,
    // which must finish within spark.sql.broadcastTimeout) and once for the
    // salted self-join — without it the exploded frame computes twice and
    // the broadcast races its timeout against the full upstream plan
    val rows = keyed
      .select((keyCols :+ idCol).map(col): _*)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = rows.groupBy(ks: _*).agg(count(lit(1)).as("_bsz"))
    val oversized = sizes.where(col("_bsz") > cap)
      .withColumn("_nsalt", ceil(col("_bsz").cast("double") / cap).cast("int"))
      .select((ks :+ col("_nsalt")): _*)
    val salted = rows
      .join(broadcast(oversized), keyCols, "left")
      .withColumn("_salt",
        when(col("_nsalt").isNull, lit(0))
          .otherwise(pmod(xxhash64(col(idCol)), col("_nsalt")).cast("int")))
    val saltKeys = keyCols :+ "_salt"
    val a = salted.select((saltKeys.map(col) :+ col(idCol).as("id1")): _*)
    val b = salted.select((saltKeys.map(col) :+ col(idCol).as("id2")): _*)
    val intra = a.join(b, saltKeys)
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
    // stitch: chain consecutive per-salt minimum ids of each oversized
    // bucket (≤ nsalt rows per bucket — the window is trivially small)
    val reps = salted.where(col("_nsalt").isNotNull)
      .groupBy((saltKeys).map(col): _*).agg(min(idCol).as("_rep"))
    val wS = Window.partitionBy(ks: _*).orderBy(col("_salt"))
    val stitch = reps
      .withColumn("_prev", lag(col("_rep"), 1).over(wS))
      .where(col("_prev").isNotNull)
      .select(least(col("_prev"), col("_rep")).as("id1"),
              greatest(col("_prev"), col("_rep")).as("id2"))
    val pairs = intra.unionByName(stitch)
      .select(col("id1"), col("id2"), lit(kind).as("kind"))
      .distinct()
    val metrics = oversized
      .agg(coalesce(count(lit(1)), lit(0L)).as("salted_buckets"),
           coalesce(sum(col("_nsalt").cast("long")), lit(0L)).as("salt_groups"))
    (pairs, metrics)
  }

  /** Exact-duplicate edges: rows sharing the match key (already a struct
    * column named `keyCol`). Star edges — exact groups can be huge (the
    * skew block) and stars keep them linear. */
  def exactEdges(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    starWithinBuckets(df.select(col(idCol), col(keyCol)), idCol, Seq(keyCol), "exact")

  /** Caption-LSH candidates: explode band hashes → intra-bucket pairs →
    * verify exact shingle-Jaccard ≥ threshold.
    *
    * Skew guards, in order: (1) exact-normalized-caption dedup BEFORE
    * signatures — identical captions collapse to one representative, so the
    * 1000-copy skew block costs one signature, not 10⁶ bucket pairs;
    * (2) bucket cap with logged truncation. Representative edges are
    * re-expanded afterwards (rep—member star per identical-caption group).
    * Returns (edges, metrics). */
  def captionLshEdges(df: DataFrame, idCol: String, captionCol: String,
                      cfg: NearDupConfig): (DataFrame, DataFrame) = {
    val norm = df.select(col(idCol), Keys.normCaption(col(captionCol)).as("_nc"))
    // (1) collapse identical normalized captions
    val repW = Window.partitionBy(col("_nc"))
    val withRep = norm.withColumn("_rep", min(idCol).over(repW))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sameCaption = withRep.where(col(idCol) =!= col("_rep"))
      .select(col("_rep").as("id1"), col(idCol).as("id2"), lit("caption_exact").as("kind"))
    // materialize shingles behind the persist (optimizer barrier), then one
    // JVM-native UDF pass computes all band hashes per row — see
    // Keys.minhashBandUdf for why this beats the HOF expression form
    val shingled = withRep.where(col(idCol) === col("_rep"))
      .select(col(idCol), Keys.shingles(col("_nc"), cfg.shingleK).as("_sh"))
      .where(size(col("_sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandUdf = Keys.minhashBandUdf(cfg.lshBands, cfg.lshRowsPerBand)
    val exploded = shingled
      .select(col(idCol),
              posexplode(bandUdf(col("_sh"))).as(Seq("band_id", "band_hash")))
    val (cand, metrics) = pairsWithinBuckets(
      exploded, idCol, Seq("band_id", "band_hash"), cfg.maxBucketSize, "caption_lsh")
    // verify: join shingles back, exact Jaccard (integer-exact compare)
    val sh = shingled
    val verified = cand
      .join(sh.select(col(idCol).as("id1"), col("_sh").as("_sh1")), "id1")
      .join(sh.select(col(idCol).as("id2"), col("_sh").as("_sh2")), "id2")
    val (inter, union) = Keys.jaccardInterUnion(col("_sh1"), col("_sh2"))
    val thresholdPct = math.round(cfg.jaccardThreshold * 100).toInt
    val edges = verified
      .where(inter * 100 >= union * thresholdPct)
      .select(col("id1"), col("id2"), col("kind"))
    (edges.unionByName(sameCaption), metrics)
  }

  /** pHash Hamming candidates via **multi-index Hamming search** (Norouzi
    * et al., CVPR'12): the 64-bit hash splits into `hammingBands` WIDE
    * chunks (default 2 × 32 bits); the probe side explodes every
    * ≤`hammingSubRadius`-bit flip of each chunk and equi-joins the index
    * side's exact chunk values. Pigeonhole guarantees recall for distance
    * ≤ bands×(subRadius+1)−1; beyond that (up to the exact-verify
    * `hammingRadius`) recall is probabilistic — see NearDupConfig for the
    * selectivity/guarantee trade and why narrow chunks (8 or 16 bits) make
    * the block join quadratic in n and are NOT usable past ~10⁵ rows.
    * Verification is exact `bit_count(xor) ≤ r`. Skew guards:
    * identical-phash collapse up front (the degenerate mass — 60% of
    * re-encode pairs in the fixture), AQE skew-join on the residual block
    * join. Returns (edges, metrics). */
  def phashHammingEdges(df: DataFrame, idCol: String, phashCol: String,
                        cfg: NearDupConfig): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    // collapse identical phash first (same reasoning as captions)
    val repW = Window.partitionBy(col(phashCol))
    val withRep = df.select(col(idCol), col(phashCol))
      .withColumn("_rep", min(idCol).over(repW))
    val samePhash = withRep.where(col(idCol) =!= col("_rep"))
      .select(col("_rep").as("id1"), col(idCol).as("id2"), lit("phash_exact").as("kind"))
    val reps = withRep.where(col(idCol) === col("_rep"))
      .select(col(idCol), col(phashCol),
              posexplode(Keys.hammingBands(col(phashCol), cfg.hammingBands))
                .as(Seq("band_id", "band_val")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val masks = Keys.flipMasks(64 / cfg.hammingBands, cfg.hammingSubRadius)
    val probe = reps.select(col(idCol).as("_pid"), col(phashCol).as("_pp"),
        col("band_id"),
        explode(array(masks.map(m => col("band_val").bitwiseXOR(lit(m))): _*))
          .as("band_val"))
    // asymmetric join: expanded probe × exact index; a true pair within the
    // sub-radius collides in both directions, distinct dedups
    val edges = probe
      .join(reps.select(col(idCol).as("_iid"), col(phashCol).as("_ip"),
                        col("band_id"), col("band_val")),
            Seq("band_id", "band_val"))
      .where(col("_pid") < col("_iid") &&
             Keys.hammingDist(col("_pp"), col("_ip")) <= cfg.hammingRadius)
      .select(col("_pid").as("id1"), col("_iid").as("id2"),
              lit("phash_hamming").as("kind"))
      .distinct()
    val metrics = Seq((0L, 0L)).toDF("salted_buckets", "salt_groups")
    (edges.unionByName(samePhash), metrics)
  }

  /** Contained-caption candidates: short caption is a substring of a longer
    * one. Blocking: a containment pair must share every shingle of the short
    * side, so any ONE shingle of the short side is a recall-lossless block
    * key (for captions with ≥ k tokens) — and picking the short side's
    * **globally least frequent** shingle (classic prefix filtering, à la
    * PPJoin) minimizes bucket sizes: a naive "first shingle" key degenerates
    * when many captions share a prefix (exactly the skew-block shape).
    * Verified with an exact `instr` check — never a cartesian product. */
  def containmentEdges(df: DataFrame, idCol: String, captionCol: String,
                       cfg: NearDupConfig): DataFrame = {
    val norm = df
      .select(col(idCol), Keys.normCaption(col(captionCol)).as("_nc"))
      .distinct()
      .withColumn("_sh", Keys.shingles(col("_nc"), cfg.shingleK))
      .where(size(col("_sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = norm.select(col(idCol), col("_nc"), explode(col("_sh")).as("block"))
    // global shingle document frequency (partial-agg shuffle, skew-free),
    // then per-doc argmin by (df, shingle) — deterministic block choice
    val freq = exploded.groupBy("block").agg(count(lit(1)).as("_df"))
    val wMin = Window.partitionBy(col(idCol)).orderBy(col("_df"), col("block"))
    val short = exploded.join(freq, "block")
      .withColumn("_rn", row_number().over(wMin))
      .where(col("_rn") === 1)
      .select(col(idCol).as("sid"), col("_nc").as("s_nc"), col("block"))
    val long = norm.select(col(idCol).as("lid"), col("_nc").as("l_nc"),
                           explode(col("_sh")).as("block"))
    short.join(long, "block")
      .where(col("sid") =!= col("lid") &&
             length(col("l_nc")) > length(col("s_nc")) &&
             instr(col("l_nc"), col("s_nc")) > 0)
      .select(least(col("sid"), col("lid")).as("id1"),
              greatest(col("sid"), col("lid")).as("id2"),
              lit("containment").as("kind"))
      .distinct()
  }
}
