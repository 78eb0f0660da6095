package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for operator outputs and iterative
  * stages, with a config-gated RELIABLE mode for real clusters.
  *
  * The engine's default (`localCheckpoint`) stores the materialized blocks
  * on the executors that computed them — the cheapest way to truncate a
  * lineage chain, but NOT executor-loss-safe: on a multi-node cluster a
  * dead executor takes its blocks (and, lineage being truncated, the only
  * way to recompute them) with it. Setting
  *
  *   spark.graft.checkpoint.dir = hdfs://.../graft-ckpt   (or any shared fs)
  *
  * switches every seal in the engine — CacheScope outputs, the featurize
  * frame, the candidate-source seals, the connected-components iterations —
  * to a RELIABLE `Dataset.checkpoint` written to that directory, which a
  * real deployment points at HDFS/S3 (the coarse-grained sibling of the
  * TableIO stage snapshots, which remain the restart mechanism BETWEEN
  * pipeline stages). Local runs leave the conf unset and keep the
  * zero-copy behavior; the flagship-equivalence spec (SealSpec) runs the
  * full pipeline under the reliable mode.
  */
object Seal extends org.apache.spark.internal.Logging {

  /** Spark conf key: when set, seals become reliable checkpoints rooted at
    * this directory. */
  val ConfKey = "spark.graft.checkpoint.dir"

  /** Count of reliable-mode leak warnings emitted (for specs/metrics). */
  private val leakWarningsCounter = new java.util.concurrent.atomic.AtomicLong
  def leakWarnings: Long = leakWarningsCounter.get()
  // warn once per SparkContext, not per seal — reliable runs seal hundreds
  // of frames and the mitigation is a session-level conf
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[graft] def resetLeakWarningsForTest(): Unit = {
    warned.clear(); leakWarningsCounter.set(0)
  }
  private[graft] def warnCheckForTest(spark: org.apache.spark.sql.SparkSession): Unit =
    warnIfLeaky(spark)

  /** Round-5 ask #5: reliable-mode checkpoint FILES leak unless the session
    * was built with spark.cleaner.referenceTracking.cleanCheckpoints=true
    * (must be set before SparkContext start) or ConfKey points at a per-run
    * directory the deployment deletes itself. Document-only was not enough
    * — warn at runtime, once per context, when neither mitigation is
    * visible. */
  /** Graft-owned runtime conf: a deployment that manages checkpoint-file
    * lifecycle itself (ConfKey → per-run directory, deleted after the
    * run's stage snapshots commit) sets this to "true" to acknowledge the
    * leak is handled and silence the warning. (The core cleanCheckpoints
    * conf cannot be read back as a declaration — Spark 4 forbids setting
    * core confs at runtime, so a post-start acknowledgement needs its own
    * key.) */
  val FilesManagedKey = "spark.graft.checkpoint.filesManaged"

  private def warnIfLeaky(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sc = spark.sparkContext
    // the context conf is what the ContextCleaner actually reads
    val cleans = sc.getConf
      .getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", false) ||
      spark.conf.getOption(FilesManagedKey).contains("true")
    if (!cleans && warned.add(sc.applicationId)) {
      leakWarningsCounter.incrementAndGet()
      logWarning(s"reliable seal mode ($ConfKey is set) without " +
        "spark.cleaner.referenceTracking.cleanCheckpoints=true: checkpoint " +
        "files under the checkpoint dir will NOT be reclaimed by the " +
        "ContextCleaner. Either set that conf before SparkContext start, or " +
        s"point $ConfKey at a per-run directory and delete it after the " +
        "run's stage snapshots commit (see Seal scaladoc).")
    }
  }

  /** Materialize `df` (eagerly or lazily) with lineage truncation —
    * localCheckpoint by default, reliable checkpoint when `ConfKey` is set.
    * The SparkContext checkpoint dir is initialized on first use (a second
    * setCheckpointDir call with the same value is a no-op-equivalent).
    *
    * Reliable mode details:
    *   - the frame is persisted around the checkpoint so the checkpoint
    *     write job reads cached blocks instead of recomputing the whole
    *     plan (the classic reliable-checkpoint double-compute), and the
    *     scratch cache is released once the files are written;
    *   - reliable seals are always EAGER, even when the caller asked for a
    *     lazy one (a lazy reliable checkpoint has no well-defined point to
    *     release its scratch persist, and recomputes at write time) — the
    *     one extra job per CC batch is the durability mode's price;
    *   - checkpoint FILES are not reclaimed by the ContextCleaner unless
    *     the session was built with
    *     spark.cleaner.referenceTracking.cleanCheckpoints=true (it must be
    *     set before SparkContext start — this library cannot retrofit it).
    *     Long-lived reliable-mode deployments should set that conf, or
    *     point ConfKey at a per-run directory and delete it after the
    *     run's TableIO stage snapshots commit. */
  def apply(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        warnIfLeaky(spark)
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set once
        // (a mid-session conf change keeps the first directory)
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true)
        finally df.unpersist(blocking = false)
      case _ =>
        df.localCheckpoint(eager)
    }
  }
}
