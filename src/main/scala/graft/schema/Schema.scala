package graft.schema

import org.apache.spark.sql.types._

/** Engine data model, per BASELINE.json `input_hint`.
  *
  * One table of image+caption rows replaces the reference tool's two
  * filesystem trees (scan dir + reference dir — see
  * /root/reference/df_finder3.py:19). The `role` column carries the
  * scan/ref distinction; `mtime` preserves the reference's sub-second
  * modified-time semantics (/root/reference/duplicate_files_in_folders/
  * file_manager.py:224 stores float epoch seconds and tests rely on
  * 0.1 s deltas changing the match key).
  */
final case class ImageRow(
    image_id: String,  // ≅ reference 'path' — stable row identity
    bytes: Array[Byte],// ≅ file content (what gets hashed)
    w: Int,
    h: Int,
    fmt: String,       // ≅ filename extension (whitelist/blacklist filters)
    caption: String,   // ≅ filename component of the key (near-dup axis A)
    phash: Long,       // 64-bit perceptual hash   (near-dup axis B)
    role: String,      // 'scan' | 'ref'
    mtime: java.sql.Timestamp,
    truth_cluster: Long // oracle-only planted cluster id; pipeline MUST NOT read it
)

object ImageRow {
  val schema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType, nullable = false),
    StructField("phash", LongType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("mtime", TimestampType, nullable = false),
    StructField("truth_cluster", LongType, nullable = false)
  ))
}

/** Which optional components participate in the match key — the engine
  * form of the reference's `--ignore_diff` set
  * (/root/reference/duplicate_files_in_folders/utils.py:117-123):
  * key = content hash (always) + caption unless ignored + mtime unless
  * ignored (utils.py:220-231). */
final case class KeyConfig(
    ignoreCaption: Boolean = true, // reference default ignore_diff={mdate} keeps filename
    ignoreMtime: Boolean = true,
    fullHash: Boolean = false      // false ⇒ partial hash of first 2 MiB (hash_manager.py:216-233)
)

/** Size/extension row filter — reference `filter_files_by_args`
  * (/root/reference/duplicate_files_in_folders/duplicates_finder.py:54-67). */
final case class FilterConfig(
    minSize: Long = 0L,
    maxSize: Long = Long.MaxValue,
    whitelistExt: Option[Set[String]] = None,
    blacklistExt: Option[Set[String]] = None
) {
  require(
    whitelistExt.isEmpty || blacklistExt.isEmpty,
    "whitelist and blacklist extensions are mutually exclusive (utils.py:126-129)")
}

/** Near-duplicate detection knobs (engine-side; the reference is
  * exact-key only — near-dup axes mandated by BASELINE.json north_rule). */
final case class NearDupConfig(
    shingleK: Int = 3,         // word k-grams over normalized caption
    minhashLanes: Int = 64,    // signature length
    lshBands: Int = 16,        // bands × rowsPerBand == minhashLanes
    lshRowsPerBand: Int = 4,
    jaccardThreshold: Double = 0.8,   // verify-stage exact Jaccard
    // pHash blocking: multi-index Hamming with WIDE chunks. Chunk width
    // (64/bands) is the selectivity lever: random-bucket density is
    // n/2^width, so 32-bit chunks stay collision-free to n ≈ 10⁹ while
    // 16-bit chunks already average 60+ rows/bucket at n = 4·10⁶ and the
    // probe join degenerates quadratically (measured). Guaranteed blocking
    // radius = bands × (subRadius+1) − 1 (pigeonhole); pairs between that
    // and `hammingRadius` are caught probabilistically and the verify stage
    // is exact either way. Defaults (2 × 32-bit, 1-flip probes): guarantee
    // d ≤ 3, catch 62.5% of d = 4 — the synthetic corpus' jpg-q90
    // re-encodes measure max d = 4 with 60% at d = 0 (identical-phash
    // collapse) and 1.7% at d = 4. At 10¹² rows even 32-bit chunks
    // saturate; the design note is to move to a 128-bit perceptual hash or
    // shard by a coarse content descriptor first.
    hammingBands: Int = 2,     // 2 × 32-bit chunks
    hammingSubRadius: Int = 1, // flip-enumeration bits per chunk probe
    hammingRadius: Int = 7,    // exact verify: bit_count(xor) ≤ radius
    maxBucketSize: Int = 256,  // LSH bucket salting threshold; salted buckets are logged
    salts: Int = 8             // salt fan-out for hot buckets
) {
  require(lshBands * lshRowsPerBand == minhashLanes, "bands*rows must equal lanes")
  require(64 % hammingBands == 0, "hash width must divide into equal chunks")
  require(hammingSubRadius <= 2,
    "flip enumeration impractical past 2 bits per chunk")
}

/** Disposition policy — reference `process_duplicates`
  * (/root/reference/duplicate_files_in_folders/duplicates_finder.py:180-214). */
final case class ResolveConfig(
    copyToAll: Boolean = false,
    keepStructure: Boolean = false
)

final case class DedupConfig(
    key: KeyConfig = KeyConfig(),
    filter: FilterConfig = FilterConfig(),
    near: NearDupConfig = NearDupConfig(),
    resolve: ResolveConfig = ResolveConfig(),
    enableCaptionLsh: Boolean = true,
    enablePhashHamming: Boolean = true,
    enableContainment: Boolean = true
)
