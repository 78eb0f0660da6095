package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped table facade (SURVEY.md §7.6).
  *
  * No Iceberg runtime jar is resolvable in this offline sandbox, so this
  * layer provides the subset of table semantics the north_rule actually
  * exercises — atomic-ish snapshot commits, resumable restart from the last
  * committed snapshot, per-partition lineage + metrics — over plain Parquet
  * plus a JSON snapshot manifest. All engine code goes through this facade;
  * swapping in `iceberg-spark-runtime` is a one-line format change.
  *
  * Layout:  {root}/data/snap-{id}/part-*.parquet
  *          {root}/_manifest.json   (atomic rename commit)
  */
object TableIO {

  final case class Snapshot(id: Long, parent: Long, rows: Long, stage: String)

  private def manifestPath(root: String) = Paths.get(root, "_manifest.json")

  def lastSnapshot(root: String): Option[Snapshot] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def field(k: String): Option[String] =
        ("\"" + k + "\"\\s*:\\s*([^,}\\s\"]+|\"[^\"]*\")").r
          .findFirstMatchIn(s).map(_.group(1).stripPrefix("\"").stripSuffix("\""))
      for {
        id <- field("id"); parent <- field("parent"); rows <- field("rows")
        stage <- field("stage")
      } yield Snapshot(id.toLong, parent.toLong, rows.toLong, stage)
    }
  }

  /** Commit `df` as the next snapshot of table `root`. Writes data to a new
    * snapshot directory, then atomically renames a manifest temp file over
    * the live manifest — readers either see the old snapshot or the new one.
    * Returns the committed snapshot. */
  // observation names must be unique across CONCURRENT commits (HashCache
  // merge commits its touched partitions in parallel, all stage "hash_cache")
  private val obsSeq = new java.util.concurrent.atomic.AtomicLong

  def commit(df: DataFrame, root: String, stage: String): Snapshot = {
    val parent = lastSnapshot(root).map(_.id).getOrElse(-1L)
    val id = parent + 1
    val dataDir = s"$root/data/snap-$id"
    // row count observed DURING the write (one job) — the old re-read of the
    // just-written parquet was a full second pass per stage commit, at a
    // 100 TB edges snapshot a second scan of the whole table
    val obs = org.apache.spark.sql.Observation(
      s"graft-commit-$stage-$id-${obsSeq.incrementAndGet()}")
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).parquet(dataDir)
    val rows = obs.get("rows").asInstanceOf[Long]
    val snap = Snapshot(id, parent, rows, stage)
    val json =
      s"""{"id":$id,"parent":$parent,"rows":$rows,"stage":"$stage"}"""
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"_manifest.json.tmp-$id")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Read the last committed snapshot of `root`, if any. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    lastSnapshot(root).map(s => spark.read.parquet(s"$root/data/snap-${s.id}"))

  /** Resume-or-compute: if table `root`'s last snapshot was committed by
    * `stage`, reuse it (resumable checkpointed restart); otherwise compute,
    * commit, and return the re-read committed data. This is the engine's
    * per-stage checkpoint boundary — also truncates lineage between pipeline
    * stages, which the iterative stages need. */
  def stageCheckpoint(spark: SparkSession, root: String, stage: String)
                     (compute: => DataFrame): DataFrame =
    lastSnapshot(root) match {
      case Some(s) if s.stage == stage =>
        spark.read.parquet(s"$root/data/snap-${s.id}")
      case _ =>
        val snap = commit(compute, root, stage)
        spark.read.parquet(s"$root/data/snap-${snap.id}")
    }
}

/** Persistent content-hash cache — the reference HashManager's pickle table
  * (/root/reference/duplicate_files_in_folders/hash_manager.py:49-158):
  * columns (image_id, hash_value, updated_at), TTL-expired rows dropped on
  * save, upsert-by-id on merge. Engine form: MERGE-style union-dedup over
  * the TableIO facade; the anti-join lets a run hash only cache misses
  * (reference X7 adaptive strategy, duplicates_finder.py:164-167).
  *
  * Layout: the cache is HASH-PARTITIONED into `NumParts` independent
  * TableIO tables ({root}/p=k, k = xxhash64(image_id) mod NumParts). A
  * merge rewrites ONLY the partitions that contain fresh ids — the old
  * single-table MERGE rewrote the whole cache on every run, O(cache) work
  * for an O(misses) change; at a 100 TB corpus the cache is billions of
  * rows and an incremental run may touch a sliver of them. (A real Iceberg
  * MERGE INTO does the same thing with finer file-level granularity.)
  * Same id always lands in the same partition, so newest-wins dedup stays
  * a per-partition operation.
  *
  * TTL bookkeeping: the newest `updated_at` ever merged is recorded in
  * {root}/_horizon (atomic rename, like the manifests). Physical pruning
  * happens only when a partition is rewritten; `readAll` applies the
  * horizon filter logically, so an expired row in an untouched partition
  * is never SERVED even though its file still holds it. */
object HashCache {
  val TtlDays = 28 // MAX_CACHE_TIME, hash_manager.py:16
  val NumParts = 16

  private[graft] def partOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(NumParts)).cast("int")

  private[graft] def partRoot(root: String, p: Int) = s"$root/p=$p"

  private def horizonPath(root: String) = Paths.get(root, "_horizon")

  private def readHorizon(root: String): Option[java.sql.Timestamp] = {
    val p = horizonPath(root)
    if (!Files.exists(p)) None
    else Some(new java.sql.Timestamp(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong))
  }

  private def writeHorizon(root: String, ts: java.sql.Timestamp): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"_horizon.tmp")
    Files.write(tmp, ts.getTime.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, horizonPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Every live (non-expired vs the recorded horizon) cache row, across all
    * partitions; None when the cache has never been written. */
  def readAll(spark: SparkSession, root: String): Option[DataFrame] = {
    val parts = (0 until NumParts)
      .flatMap(p => TableIO.read(spark, partRoot(root, p)))
    parts.reduceOption(_ unionByName _).map { all =>
      readHorizon(root) match {
        case Some(h) => all.where(
          col("updated_at") >= lit(h).cast("timestamp") - expr(s"INTERVAL $TtlDays DAYS"))
        case None => all
      }
    }
  }

  /** Upsert `fresh` (image_id, hash_value, updated_at) into the cache at
    * `root`: newest row per image_id wins; expired rows (older than the TTL
    * relative to the newest updated_at ever merged) are dropped. Only
    * partitions containing fresh ids are rewritten — and the ≤ NumParts
    * touched-partition commits are submitted CONCURRENTLY (they write
    * disjoint sub-tables; the shared seal pool bounds scheduler pressure),
    * so a merge costs ~one commit wave, not a sequential job per
    * partition. Returns Unit: the engine derives its working hash table
    * from hits ∪ fresh directly (see Dedup.runCheckpointed) — the old
    * eagerly-rebuilt readAll return was a free barrier every caller
    * discarded. An empty `fresh` is a no-op. */
  def merge(spark: SparkSession, root: String, fresh: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val freshP = fresh.withColumn("_p", partOf(col("image_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = freshP.select("_p").distinct()
        .collect().map(_.getInt(0)).sorted // ≤ NumParts values — driver-safe
      if (touched.isEmpty) return // nothing fresh: no horizon move, no commits
      val freshMax = freshP.agg(max("updated_at")).first().getTimestamp(0)
      require(freshMax != null, "fresh rows must carry updated_at")
      val horizon = readHorizon(root) match {
        case Some(h) if h.after(freshMax) => h
        case _ => freshMax
      }
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec = graft.util.CacheScope.sealEc
      val commits = touched.toSeq.map { p => Future {
        val part = partRoot(root, p)
        val freshPart = freshP.where(col("_p") === p).drop("_p")
        val unioned = TableIO.read(spark, part) match {
          case Some(existing) => existing.unionByName(freshPart)
          case None => freshPart
        }
        val w = Window.partitionBy("image_id")
          .orderBy(col("updated_at").desc, col("hash_value"))
        val live = unioned
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
          .where(col("updated_at") >=
            lit(horizon).cast("timestamp") - expr(s"INTERVAL $TtlDays DAYS"))
        TableIO.commit(live, part, "hash_cache"): Unit
      }}
      Await.result(Future.sequence(commits), Duration.Inf)
      writeHorizon(root, horizon)
    } finally freshP.unpersist()
  }

  /** Hashes for `ids` (image_id) resolved cache-first: (cached hits,
    * miss ids). Caller computes misses and `merge`s them back.
    *
    * TTL is enforced HERE, not only at merge time: an entry older than the
    * TTL (relative to now — the clock the caller's fresh rows will carry)
    * counts as a miss and is re-hashed, exactly like the reference re-hashes
    * expired entries at read time (hash_manager.py:149-157). Serving an
    * expired row as a hit while `merge` later deletes it would silently drop
    * the row from the merged hash table — and from every downstream
    * edge/cluster/action. */
  def lookup(spark: SparkSession, root: String, ids: DataFrame): (DataFrame, DataFrame) = {
    readAll(spark, root) match {
      case None => (ids.limit(0).withColumn("hash_value", lit("")), ids)
      case Some(c) =>
        val live = c.where(
          col("updated_at") >= current_timestamp() - expr(s"INTERVAL $TtlDays DAYS"))
        val hits = ids.join(live.select("image_id", "hash_value"), Seq("image_id"), "inner")
        val misses = ids.join(live.select("image_id"), Seq("image_id"), "left_anti")
        (hits, misses)
    }
  }
}
