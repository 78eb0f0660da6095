package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative DataFrame connected components — the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14), which BASELINE.json's north_rule
  * names explicitly. No GraphX/RDDs: each round is two shuffles on the node
  * id, edges monotonically point toward each component's minimum id, and
  * convergence is O(log n) rounds.
  *
  * Scale notes: per-round `persist` + `count` materializes the iteration and
  * truncates the lineage chain (on a real cluster this would be a
  * checkpoint/table write per round — see graft.state.TableIO); the
  * neighborhood minimum uses a window `min` rather than `collect_list`, so a
  * degenerate high-degree node (the skew block's star root) never
  * materializes its adjacency list in one task.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two columns (any orderable type) naming an
    *              undirected edge; self-loops and duplicates are fine.
    * @return DataFrame (id, cluster_id): every node of `edges` mapped to the
    *         minimum id of its component (including isolated endpoints).
    */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame =
    runWithStats(edges, maxIter)._1

  /** Normalized edge frame (src > dst, no self-loops, distinct) — lazy. */
  private def normalize(edges: DataFrame): DataFrame = {
    val Seq(c1, c2) = edges.columns.take(2).toSeq
    edges
      .select(col(c1).as("src"), col(c2).as("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("dst2"),
              greatest(col("src"), col("dst")).as("src2"))
      .select(col("src2").as("src"), col("dst2").as("dst")) // src > dst
      .distinct()
  }

  /** Edge count below which `roundsPerJob` auto-resolves to 1 (un-chained
    * rounds). Chaining two rounds per job QUADRUPLES the per-batch logical
    * plan (round() scans its input twice and its large-star frame twice),
    * and per-batch cost is super-linear in plan size on the driver (AQE
    * re-optimizes the whole plan at every exchange materialization).
    * Measured on a 250-edge graph, warm: rpj=1 2.3 s vs rpj=2 4.5 s vs
    * rpj=4 50-145 s — below the threshold the batch is driver-planning-
    * bound and chaining is counterproductive. Above it task execution
    * dominates and chaining halves the materialization barriers (the flat
    * cost that caps scaling efficiency at high core counts — the 4M-image
    * ScalingBench regime, ~2-4M edges, keeps rpj=2). */
  val AutoChainEdges = 1L << 20

  /** run + (rounds, finalEdgeCount) for tests/metrics.
    *
    * `roundsPerJob`: large-star/small-star rounds chained per materialized
    * job. Every materialization is a full cluster barrier (checkpoint write
    * + signature action + scheduler round-trip) — at high core counts these
    * barriers are flat cost that caps scaling efficiency, and component
    * diameters shrink so fast (squared per round) that typical inputs
    * converge in 3-5 rounds: batching 2 rounds per job halves the barrier
    * count for at most one wasted round after convergence. 0 (default) =
    * adaptive: 1 below `AutoChainEdges` normalized edges, else 2 — see
    * AutoChainEdges for the measured crossover. */
  def runWithStats(edges: DataFrame, maxIter: Int = 50,
                   roundsPerJob: Int = 0): (DataFrame, Int, Long) = {
    // tag every CC job for stage attribution (ScaleDiag, UIs)
    edges.sparkSession.sparkContext.setJobDescription("graft:cc")
    try runWithStatsIn(edges, maxIter, roundsPerJob)
    finally edges.sparkSession.sparkContext.setJobDescription(null)
  }

  private def runWithStatsIn(edges: DataFrame, maxIter: Int,
                             roundsPerJob: Int): (DataFrame, Int, Long) = {
    // normalize once and materialize EAGERLY: every consumer plan scans e0
    // at least twice (allNodes' union, round()'s nbrs union), and AQE
    // races those scans into a lazily-persisted cache concurrently — each
    // recomputing the caller's full candidate DAG (measured: deferred-mode
    // LSH edges doubled q_doc_pipeline/q_dup_clusters until this barrier)
    val e0 = normalize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val nE0 = e0.count()
    val rpj = resolveChain(roundsPerJob, nE0)
    val allNodes = e0
      .select(col("src").as("id")).union(e0.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    allNodes.count()
    val (fin, iter, nEdges) = converge(e0, maxIter, rpj)
    // components: every node that appears as src points at its root (dst);
    // roots themselves and isolated nodes map to themselves.
    val roots = fin.groupBy("src").agg(min("dst").as("cluster_id"))
    // sealed output: eager localCheckpoint materializes the mapping (one
    // pass, same cost the old persist+count paid) but lives OUTSIDE the SQL
    // cache manager — reclaimed by the ContextCleaner once unreferenced, so
    // a long-lived session composing operators never accumulates CC outputs
    val out = graft.util.Seal(allNodes
      .join(roots.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id")))
    allNodes.unpersist(); fin.unpersist(); e0.unpersist()
    (out, iter, nEdges)
  }

  /** Cluster mapping for NON-ROOT edge nodes only: (id, cluster_id) for
    * every node that is not its component's minimum. Roots and isolated
    * nodes are ABSENT — the pipeline's members join is a left join +
    * `coalesce(cluster_id, id)`, which maps them to themselves anyway, so
    * the `allNodes` union-distinct, its count barrier, and the final
    * node-universe join that `run` pays are pure overhead there (three of
    * the flat per-run jobs the scaling decomposition charged to CC). */
  def runMapping(edges: DataFrame, maxIter: Int = 50,
                 roundsPerJob: Int = 0): DataFrame = {
    edges.sparkSession.sparkContext.setJobDescription("graft:cc")
    try runMappingIn(edges, maxIter, roundsPerJob)
    finally edges.sparkSession.sparkContext.setJobDescription(null)
  }

  private def runMappingIn(edges: DataFrame, maxIter: Int,
                           roundsPerJob: Int): DataFrame = {
    // eager for the same AQE-race reason as runWithStatsIn: round() scans
    // e0 twice inside the first signature action
    val e0 = normalize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val nE0 = e0.count()
    val (fin, _, _) = converge(e0, maxIter, resolveChain(roundsPerJob, nE0))
    val out = graft.util.Seal(fin.groupBy("src").agg(min("dst").as("cluster_id"))
      .withColumnRenamed("src", "id"))
    fin.unpersist(); e0.unpersist()
    out
  }

  /** 0 = adaptive on the measured normalized edge count (see
    * AutoChainEdges); an explicit caller value always wins. */
  private def resolveChain(roundsPerJob: Int, nEdges: Long): Int =
    if (roundsPerJob > 0) roundsPerJob
    else if (nEdges < AutoChainEdges) 1 else 2

  /** The alternating-rounds loop: iterate from persisted `e0` until the
    * edge set is stable; returns the persisted final frame (src > dst,
    * star-shaped), the round count, and the final edge count. Intermediate
    * frames (including `e0` once replaced) are unpersisted here. */
  private def converge(e0: DataFrame, maxIter: Int,
                       roundsPerJob: Int): (DataFrame, Int, Long) = {
    var e = e0

    // ONE alternating large-star + small-star round (lazy plan):
    //   large star: for every node u, attach all neighbors v > u to the
    //     minimum of (u ∪ neighbors) — both edge directions participate;
    //   small star: edges then satisfy src > dst; for each u attach all its
    //     smaller neighbors (and u) to the minimum neighbor.
    // The neighborhood minimum is a window `min`, never collect_list — a
    // degenerate high-degree node holds no adjacency list in one task.
    def round(cur: DataFrame): DataFrame = {
      val nbrs = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
      val wL = Window.partitionBy("src")
      // no distinct between the stars (round 6): duplicates in the
      // large-star output (two old sources of one node mapping to the same
      // minimum) do not change the small-star window minimum, and the final
      // distinct below dedups the round's output — the intermediate
      // distinct was a full extra exchange per round for a frame the next
      // window reshuffles anyway. The undeduped large output is ≤ |nbrs| =
      // 2|E| rows, so the small-star shuffle grows at most 2× in the worst
      // case while every round drops one exchange barrier.
      val large = nbrs
        .withColumn("m", least(min("dst").over(wL), col("src")))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst")) // keep src > dst
        .where(col("src") =!= col("dst"))
      val wS = Window.partitionBy("src")
      val withMin = large.withColumn("m", min("dst").over(wS))
      withMin
        .select(col("src"), col("m").as("dst"))
        .union(withMin.where(col("dst") =!= col("m"))
          .select(col("dst").as("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
    }

    var iter = 0
    var converged = false
    var prevSig: (Long, Any) = (-1L, null)
    while (!converged && iter < maxIter) {
      var cur = e
      var r = 0
      while (r < roundsPerJob && iter + r < maxIter) { cur = round(cur); r += 1 }
      // lazy seal: materializes the chained rounds AND truncates the
      // logical plan (a persist alone leaves the tree growing exponentially
      // across iterations); the signature aggregation below is the action
      // that materializes it — ONE job per batch. With
      // spark.graft.checkpoint.dir set this is a RELIABLE checkpoint
      // (executor-loss-safe on a real cluster); the local default stays
      // zero-copy.
      val next = graft.util.Seal(cur, eager = false)
      // convergence: edge set stable (count + order-independent xor-hash —
      // xor, not sum: ANSI mode makes long-sum overflow an error)
      val sig = next.agg(
        count(lit(1)),
        call_function("bit_xor", xxhash64(col("src"), col("dst")))).first()
      val newSig = (sig.getLong(0), sig.get(1))
      e.unpersist()
      e = next
      converged = newSig == prevSig
      prevSig = newSig
      iter += r
    }
    (e, iter, prevSig._1)
  }
}
