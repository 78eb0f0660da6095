package graft.keys

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.schema.{KeyConfig, NearDupConfig}

/** Match-key and signature construction. Everything here is a pure
  * `Column` expression tree — whole-stage-codegen'd, no UDFs — so the 100 TB
  * plan keeps hashing/shingling inside the scan stage with zero shuffles.
  */
object Keys {
  val PartialHashBytes: Int = 2 * 1024 * 1024 // reference prefix, hash_manager.py:217

  /** Content hash — reference `compute_hash` / `compute_partial_hash`
    * (/root/reference/duplicate_files_in_folders/hash_manager.py:193-233):
    * sha256 of the whole payload (`fullHash`) or of the first 2 MiB
    * (default). `substring` on binary is codegen'd; pushdown-safe. */
  def contentHash(bytes: Column, fullHash: Boolean): Column =
    if (fullHash) sha2(bytes, 256)
    else sha2(substring(bytes, 1, PartialHashBytes), 256)

  /** The match key — reference `get_file_key` (utils.py:220-231) built
    * `'{hash}[_{name}][_{mtime}]'` as a string; we use a struct to avoid the
    * separator-collision bug class entirely. Components beyond the hash are
    * config-gated exactly like `--ignore_diff`. */
  def matchKey(cfg: KeyConfig, bytes: Column, caption: Column, mtime: Column): Column = {
    val parts = Seq(contentHash(bytes, cfg.fullHash).as("h")) ++
      (if (!cfg.ignoreCaption) Seq(caption.as("c")) else Nil) ++
      (if (!cfg.ignoreMtime) Seq(mtime.cast("string").as("m")) else Nil)
    struct(parts: _*)
  }

  /** Caption normalization: lower-case, collapse whitespace. */
  def normCaption(caption: Column): Column =
    trim(regexp_replace(lower(caption), "\\s+", " "))

  /** Word tokens of the normalized caption. */
  def tokens(caption: Column): Column =
    filter(split(normCaption(caption), " "), t => length(t) > 0)

  /** Distinct word k-shingles: array of space-joined k-grams. Captions with
    * fewer than k tokens yield an empty array (no LSH candidates — same
    * no-key behavior as an unreadable file in the reference). */
  def shingles(caption: Column, k: Int): Column = {
    val toks = tokens(caption)
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: `lanes` 64-bit minima. Lane i minimizes
    * xxhash64(i, shingle) over the shingle set — one projection, no shuffle,
    * partial-agg-free (array_min over transform). Returns array<long>. */
  def minhashSignature(shingleArr: Column, lanes: Int): Column =
    array((0 until lanes).map { lane =>
      array_min(transform(shingleArr, s => xxhash64(lit(lane), s)))
    }: _*)

  /** LSH band hashes from a signature: band j hashes lanes
    * [j*r, (j+1)*r). Returns array<long> of length `bands`; null-signature
    * (empty shingles) propagates null band hashes. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** Fused shingles→MinHash→LSH band hashes in ONE expression tree where
    * every lane minimum is referenced exactly once by its band.
    *
    * Why not `bandHashes(minhashSignature(...))`: Catalyst's project
    * collapsing inlines a `withColumn` alias into each of its references, so
    * 16 bands × 4 `element_at`s on the signature column would duplicate the
    * 64-lane MinHash subtree 64× (≈4096 lambda expressions) — optimizer and
    * codegen blow up. The fused form is linear: bands × rowsPerBand lane
    * expressions total. */
  def lshBandHashes(shingleArr: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map { r =>
        val lane = b * rowsPerBand + r
        array_min(transform(shingleArr, s => xxhash64(lit(lane), s)))
      }: _*)
    }: _*)

  /** SimHash (64-bit) over the token multiset: bit b of the result is the
    * sign of Σ_tokens (bit b of xxhash64(token) ? +1 : −1). Pure
    * higher-order-function expression: aggregate over the token array with a
    * 64-counter accumulator — no explode, no shuffle. */
  def simhash(caption: Column): Column = {
    val toks = tokens(caption)
    // variable-distance shifts need the SQL function (the Scala helper only
    // accepts a literal Int distance)
    def shr(v: Column, n: Column) = call_function("shiftright", v, n.cast("int"))
    def shl(v: Column, n: Column) = call_function("shiftleft", v, n.cast("int"))
    val counters = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(shr(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming band keys for a 64-bit hash: split into `bands` equal bit
    * slices. Pigeonhole: two hashes within Hamming distance r < bands agree
    * on at least one band — blocking is recall-lossless for r ≤ bands−1. */
  def hammingBands(hash64: Column, bands: Int): Column = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    array((0 until bands).map { b =>
      shiftright(hash64, b * width).bitwiseAND(lit(mask))
    }: _*)
  }

  /** Exact Hamming distance between two 64-bit hashes (codegen builtin). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two distinct-shingle arrays, as a
    * (numerator, denominator) integer pair — integer-exact comparisons
    * (`inter * 100 >= thresholdPct * union`) avoid float-boundary flakiness. */
  def jaccardInterUnion(a: Column, b: Column): (Column, Column) = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    (inter, union)
  }
}
