package graft.resolve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.ResolveConfig

/** Duplicate-set resolution — the reference's `process_duplicates` +
  * `clean_scan_dir_duplications`
  * (/root/reference/duplicate_files_in_folders/duplicates_finder.py:180-214,
  * 249-262) re-expressed as a window-ranked canonical-row election per
  * cluster. The engine never mutates rows (reference guard: ref dirs are
  * protected, file_manager.py:44-103); it emits an **actions table**:
  *
  *   (image_id, role, cluster_id, disposition, target)
  *
  * Semantics table (SURVEY.md §7.3):
  *   - rows with role='ref'      → disposition 'keep'   (never mutated)
  *   - scan rank-1 of a matched cluster → 'move', target = ref rank-1
  *     (reference: first scan path moves to first ref path, by
  *      lexicographic order — duplicates_finder.py:172-175,194,199)
  *   - copyToAll: max(0, |ref|−|scan|) extra 'copy' actions from scan
  *     rank-1 to each surplus ref location, then remaining scan copies
  *     zip-move positionally to the leftover refs (duplicates_finder.py:
  *     203-212) — a rank-equality join, J3
  *   - other scan copies of a matched cluster → 'scan_dup'
  *   - scan rows of clusters with no ref member → 'none' (left in place,
  *     duplicates_finder.py:170)
  */
object Resolver {

  /** @param members DataFrame (image_id, role, cluster_id) — every filtered
    *                input row tagged with its duplicate cluster.
    * @return actions DataFrame (image_id, role, cluster_id, disposition, target)
    */
  def resolve(members: DataFrame, cfg: ResolveConfig = ResolveConfig()): DataFrame = {
    // ONE window spec for everything — partition by cluster_id, order by
    // (role, image_id) — so the whole ranked frame costs a single
    // exchange + sort. Role counts use the full-partition frame; the
    // within-role rank falls out of the global position: 'ref' < 'scan'
    // lexicographically, so scan rows start at position n_ref + 1
    // (the schema admits exactly these two roles). A per-role window
    // spec (cluster_id, role) would force a SECOND full shuffle of the
    // members frame for no information gain.
    val w = Window.partitionBy("cluster_id").orderBy("role", "image_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    if (!cfg.copyToAll) {
      // Default mode is a SINGLE window pass — no persist, no self-join, no
      // union arms: the move target (ref rank-1 = minimum ref id, since rn
      // orders refs by image_id) is itself a full-frame aggregate of the
      // same window, so every disposition is a case-branch over one ranked
      // projection. One exchange + sort total; at 10⁹ members this is the
      // difference between one shuffle and three shuffles + a barrier.
      val refTarget = min(when(col("role") === "ref", col("image_id"))).over(wAll)
      members
        .withColumn("n_ref",
          sum(when(col("role") === "ref", 1).otherwise(0)).over(wAll))
        .withColumn("rn",
          row_number().over(w) -
            when(col("role") === "scan", col("n_ref")).otherwise(lit(0)))
        .withColumn("_ref1", refTarget)
        .select(col("image_id"), col("role"), col("cluster_id"),
          when(col("role") === "ref", lit("keep"))
            .when(col("n_ref") === 0, lit("none"))     // scan, cluster has no ref
            .when(col("rn") === 1, lit("move"))        // scan rank-1 → ref rank-1
            .otherwise(lit("scan_dup")).as("disposition"),
          when(col("role") === "scan" && col("n_ref") > 0 && col("rn") === 1,
               col("_ref1").cast("string"))
            .otherwise(lit(null).cast("string")).as("target"))
    } else graft.util.CacheScope.seal { scope =>
    // copy_to_all needs rank-equality joins against the ref list — keep the
    // materialized ranked frame + branch arms for this mode only (scoped:
    // the persist is released once the sealed actions table materializes).
    val ranked = scope.persist(members
      .withColumn("n_ref",
        sum(when(col("role") === "ref", 1).otherwise(0)).over(wAll))
      .withColumn("n_scan",
        sum(when(col("role") === "scan", 1).otherwise(0)).over(wAll))
      .withColumn("rn",
        row_number().over(w) -
          when(col("role") === "scan", col("n_ref")).otherwise(lit(0))))
    val matched = col("n_ref") > 0 && col("n_scan") > 0

    val refs = ranked.where(col("role") === "ref")
      .select(col("cluster_id"), col("image_id").as("ref_id"), col("rn").as("ref_rn"))

    // ref rows: always keep
    val refActions = ranked.where(col("role") === "ref")
      .select(col("image_id"), col("role"), col("cluster_id"),
              lit("keep").as("disposition"), lit(null).cast("string").as("target"))

    // unmatched scan rows (no ref in cluster): none
    val unmatchedScan = ranked.where(col("role") === "scan" && !matched)
      .select(col("image_id"), col("role"), col("cluster_id"),
              lit("none").as("disposition"), lit(null).cast("string").as("target"))

    val scanMatched = ranked.where(col("role") === "scan" && matched)
      // copy_to_all (duplicates_finder.py:203-212):
      //   num_copy = max(0, n_ref - n_scan) — scan rank-1 copies to ref
      //   ranks 1..num_copy, then scan ranks zip-move onto ref ranks
      //   (num_copy+1 .. n_ref); scan ranks beyond n_ref are scan_dups.
      val numCopy = greatest(lit(0), col("n_ref") - col("n_scan"))
      val copies = scanMatched.where(col("rn") === 1)
        .withColumn("k", numCopy)
        .join(refs, "cluster_id")
        .where(col("ref_rn") <= col("k"))
        .select(col("image_id"), col("role"), col("cluster_id"),
                lit("copy").as("disposition"), col("ref_id").as("target"))
      val moves = scanMatched
        .withColumn("zip_rn", col("rn") + numCopy)
        .join(refs, "cluster_id")
        .where(col("ref_rn") === col("zip_rn"))
        .select(col("image_id"), col("role"), col("cluster_id"),
                lit("move").as("disposition"), col("ref_id").as("target"))
      val dups = scanMatched.where(col("rn") + numCopy > col("n_ref"))
        .select(col("image_id"), col("role"), col("cluster_id"),
                lit("scan_dup").as("disposition"), lit(null).cast("string").as("target"))
      refActions.unionByName(unmatchedScan).unionByName(copies)
        .unionByName(moves).unionByName(dups)
    }
  }
}
