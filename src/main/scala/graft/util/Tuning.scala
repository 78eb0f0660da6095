package graft.util

import org.apache.spark.sql.SparkSession

/** Engine-recommended runtime SQLConf for the query surface.
  *
  * Round-6 measurement (SqlMetricsDump, local[32] sf0.1): the pair-listing
  * queries' exchanges carry KILOBYTES but paid 0.9-2.7 task-seconds of
  * shuffle-write machinery EACH — with `spark.sql.shuffle.partitions = 32`
  * and AQE's `coalescePartitions.parallelismFirst = true` (the default),
  * every tiny exchange still runs 32 map tasks × 32 reducers, so the M×R
  * block count (guide §2.2) dominates at small data. Flipping
  * `parallelismFirst` to false lets AQE coalesce a tiny exchange to ONE
  * reducer (its cost is pure machinery), which cut q_minhash_lsh_pairs
  * from 2.7 s to 1.65 s.
  *
  * Scale story (why this is safe at 100 TB, not a local-only trick):
  *   - The advisory size is lowered 64 MB → 8 MB so any exchange past a few
  *     MB keeps ≥ data/8MB reducers — production-scale shuffles (GBs+ per
  *     exchange) coalesce the same way they would with stock settings (the
  *     initial partition count, not the advisory, is their binding limit),
  *     while genuinely tiny exchanges (broadcast-sized side frames,
  *     metrics, convergence signatures) stop paying cores² overhead.
  *   - `parallelismFirst=true` exists to keep reducer counts at the
  *     default parallelism for MID-sized data; with the 8 MB advisory the
  *     crossover where we give up parallelism is ≤ 8 MB × cores of shuffled
  *     bytes per exchange — work measured in tens of milliseconds, where
  *     scheduling dominates compute at any cluster size.
  *
  * Both knobs are env-overridable (a production deployment that tunes its
  * own AQE settings sets SPARK_GRAFT_ADVISORY_SHUFFLE /
  * SPARK_GRAFT_COALESCE_PARALLELISM_FIRST, or simply patches its session
  * conf after the first query); ScalingBench configures its own session
  * explicitly and is not affected.
  */
object Tuning {
  /** Apply the query-surface runtime confs (idempotent, cheap). */
  def queryTuned(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_ADVISORY_SHUFFLE", "8m"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_COALESCE_PARALLELISM_FIRST", "false"))
    // without this, AQE (and so partition coalescing) is DISABLED inside
    // cached-plan materialization: every scoped persist built through a
    // shuffle keeps the static spark.sql.shuffle.partitions count, and all
    // its consumer map stages inherit it — measured as six concurrent
    // 32-task stages with ~1 ms of work per task on the sf0.1 pair
    // listings. With it, a tiny cached frame coalesces like any other
    // exchange (the advisory size governs, so big caches keep parallelism).
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_CACHED_PLAN_AQE", "true"))
  }
}
