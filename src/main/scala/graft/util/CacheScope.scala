package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Operator-scoped persist management.
  *
  * Every multi-consumer intermediate inside an operator (shingle frames,
  * salted bucket rows, ranked windows) must be persisted — but a persist
  * with no matching unpersist accumulates in the session's cache manager,
  * and a long-lived session composing many operators slowly squeezes
  * executor storage out from under the shuffles that need it. Two
  * lifecycles make the leak structurally impossible:
  *
  *   - CONCURRENT mode (`seal`/`sealMany`): the operator's OUTPUT is
  *     materialized eagerly (`Seal` — localCheckpoint by default, a
  *     reliable checkpoint when spark.graft.checkpoint.dir is set), which
  *     truncates its lineage off the scoped frames; the scope then releases
  *     every registered persist synchronously (try/finally). This is the
  *     mode for the flagship pipeline, where independent candidate sources
  *     run as concurrent jobs over shared frames.
  *   - DEFERRED mode (`deferred`): the operator returns its LAZY plan —
  *     no checkpoint job (the flat seal cost measured round 4 as 0.6-0.77
  *     idle at 32 cores on the pair-listing queries) — and the scope parks
  *     in a pending list until the single downstream consumer has run its
  *     one action and calls `flushDeferred()`. This is the mode for the
  *     query surfaces (SparkEntry.queries), where exactly one action ever
  *     consumes the output. Multi-exchange intermediates keep their eager
  *     `persistEager` barrier even here — AQE races sub-stages of a single
  *     action into unbuilt caches just like concurrent seal jobs (see
  *     persistEager).
  *
  * Checkpointed outputs live as plain RDD blocks outside the SQL cache
  * manager and are reclaimed by the ContextCleaner once unreferenced, so
  * after any concurrent-mode operator returns — and after any consumer
  * flushes the deferred scopes it drained — the session's cache manager is
  * empty (asserted by PlanShapeSpec).
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) for the life of this scope. */
  def persist(df: DataFrame): DataFrame = {
    frames += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Persist `df`, MATERIALIZING it before returning. A lazy persist is
    * not enough when the frame feeds two or more downstream EXCHANGES: AQE
    * materializes every ready shuffle-map stage CONCURRENTLY — across the
    * seal jobs of a concurrent-mode scope AND across the sub-stages of one
    * single consumer action — and jobs racing into a not-yet-built cache
    * each recompute the full subtree (measured twice: the containment
    * source's scan+shingle pass ran 2-3× per query, ~500 CPU core-s each
    * at 1M captions, with its persist never hit; and an experiment making
    * this lazy in deferred mode doubled q_doc_pipeline/q_dup_clusters at
    * sf0.1 — one action is NOT one traversal). The count() barrier costs
    * one extra job; in the flagship it runs inside the operator's own
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
  // bounds the extra scheduler pressure. private[graft]: HashCache.merge
  // reuses it for its concurrent per-partition snapshot commits.
  private[graft] lazy val sealEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, (r: Runnable) => {
        val t = new Thread(r, "graft-seal"); t.setDaemon(true); t
      }))

  /** Build several outputs inside ONE fresh scope (they may share scoped
    * intermediates), seal each eagerly, release the scope.
    *
    * The seals are submitted CONCURRENTLY. Safety invariant: the scope must
    * contain at least one EAGER barrier (`persistEager`) whose lineage
    * covers every lazy `persist` in it — the barrier's count() builds all
    * covered caches in one job, so by seal time the concurrent checkpoint
    * jobs only READ built caches. (Lazy persists whose materialization
    * relied on "some downstream job will traverse them first" are exactly
    * the race `persistEager` exists to prevent.) Sequential seals paid the
    * sum of their barriers — the round-3 eager-seal regression on the
    * pair-listing queries; concurrent seals pay roughly the max. */
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

  // scopes whose persists outlive the operator call — released by the
  // consumer via flushDeferred() after its action. ConcurrentLinkedQueue:
  // deferred operators may be composed from multiple threads.
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[CacheScope]

  /** Build output(s) inside a fresh DEFERRED scope and return them LAZILY:
    * no checkpoint job. The scoped persists stay registered so the
    * consumer's single action still reuses every shared intermediate; the
    * consumer releases them afterwards with `flushDeferred()` (Bench/Verify
    * do this after every query action; a composed query may hold several
    * deferred scopes at once, e.g. q_doc_pipeline's three candidate
    * sources). `persistEager` barriers still run eagerly — see its doc for
    * why one consumer action is not one traversal under AQE.
    *
    * This is the single-consumer fast path: a query surface skips the
    * output materialization the flagship needs (its sources race
    * concurrently over shared frames, so their OUTPUTS must be sealed
    * before the scope releases; a deferred output is consumed after the
    * scope would have closed, hence the parked release instead). */
  def deferred[A](body: CacheScope => A): A = {
    val scope = new CacheScope
    val out =
      try body(scope)
      catch { case t: Throwable => scope.close(); throw t }
    pending.add(scope)
    out
  }

  /** Release every pending deferred scope's persists. Call after the
    * action that consumed the deferred operator output(s). Idempotent. */
  def flushDeferred(): Unit = {
    var s = pending.poll()
    while (s != null) { s.close(); s = pending.poll() }
  }
}
