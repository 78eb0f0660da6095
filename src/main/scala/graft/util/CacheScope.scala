package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Operator-scoped persist management.
  *
  * Every multi-consumer intermediate inside an operator (shingle frames,
  * salted bucket rows, ranked windows) must be persisted — but a persist
  * with no matching unpersist accumulates in the session's cache manager,
  * and a long-lived session composing many operators slowly squeezes
  * executor storage out from under the shuffles that need it. The pattern
  * here makes the leak structurally impossible:
  *
  *   - intermediates register through `scope.persist`;
  *   - the operator's OUTPUT is materialized eagerly (`Seal` —
  *     localCheckpoint by default, a reliable checkpoint when
  *     spark.graft.checkpoint.dir is set for multi-node runs), which
  *     truncates its lineage off the scoped frames;
  *   - the scope then releases every registered persist (try/finally,
  *     so failures release too).
  *
  * Checkpointed outputs live as plain RDD blocks outside the SQL cache
  * manager and are reclaimed by the ContextCleaner once unreferenced, so
  * after any operator returns, the session's cache manager is empty
  * (asserted by PlanShapeSpec). A second win: sealed operators are
  * independent Spark jobs, so the engine can run several candidate
  * sources CONCURRENTLY on one session (see Dedup.candidateEdges).
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) for the life of this scope. */
  def persist(df: DataFrame): DataFrame = {
    frames += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Persist and MATERIALIZE `df` before returning it. A lazy persist is
    * not enough when the frame feeds two or more downstream exchanges: AQE
    * submits every ready shuffle-map stage CONCURRENTLY, and jobs racing
    * into a not-yet-built cache each recompute the full subtree (measured:
    * the containment source's scan+shingle pass ran 2-3× per query, ~500
    * CPU core-s each at 1M captions, with its persist never hit). The
    * count() barrier costs one extra job but runs inside the operator's own
    * future, overlapped with the other candidate sources. */
  def persistEager(df: DataFrame): DataFrame = {
    val p = persist(df)
    p.count()
    p
  }

  def close(): Unit = {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}

object CacheScope {
  /** Build one output inside a fresh scope, seal it, release the scope. */
  def seal(body: CacheScope => DataFrame): DataFrame =
    sealMany(s => Seq(body(s))).head

  // seal jobs of ONE sealMany call run concurrently (they are independent
  // reads of already-materialized scoped caches); a small shared daemon pool
  // bounds the extra scheduler pressure
  private lazy val sealEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, (r: Runnable) => {
        val t = new Thread(r, "graft-seal"); t.setDaemon(true); t
      }))

  /** Build several outputs inside ONE fresh scope (they may share scoped
    * intermediates), seal each eagerly, release the scope.
    *
    * The seals are submitted CONCURRENTLY: every scoped intermediate was
    * already materialized by `persistEager`, so each output's checkpoint job
    * only reads built caches — sequential seals paid the sum of their
    * barriers (the round-3 eager-seal regression on the pair-listing
    * queries), concurrent seals pay roughly the max. */
  def sealMany(body: CacheScope => Seq[DataFrame]): Seq[DataFrame] = {
    val scope = new CacheScope
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = sealEc
      val outs = body(scope)
      if (outs.sizeIs <= 1) outs.map(Seal(_))
      else Await.result(
        Future.sequence(outs.map(df => Future(Seal(df)))),
        Duration.Inf)
    } finally scope.close()
  }
}
