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
object Seal {

  /** Spark conf key: when set, seals become reliable checkpoints rooted at
    * this directory. */
  val ConfKey = "spark.graft.checkpoint.dir"

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
