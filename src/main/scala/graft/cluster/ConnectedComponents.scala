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

  /** run + (iterations, finalEdgeCount) for tests/metrics. */
  def runWithStats(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int, Long) = {
    val spark = edges.sparkSession
    val Seq(c1, c2) = edges.columns.take(2).toSeq
    // normalize once and materialize: every downstream read (node universe +
    // first iteration) hits the persisted copy, never the caller's candidate
    // DAG twice
    var e = edges
      .select(col(c1).as("src"), col(c2).as("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("dst2"),
              greatest(col("src"), col("dst")).as("src2"))
      .select(col("src2").as("src"), col("dst2").as("dst")) // src > dst
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val allNodes = e
      .select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    allNodes.count()
    val e0 = e

    var iter = 0
    var converged = false
    var prevSig: (Long, Any) = (-1L, null)
    while (!converged && iter < maxIter) {
      // --- large star: for every node u, attach all neighbors v > u to the
      //     minimum of (u ∪ neighbors). Both edge directions participate.
      val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val wL = Window.partitionBy("src")
      val large = nbrs
        .withColumn("m", least(min("dst").over(wL), col("src")))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst")) // keep src > dst
        .where(col("src") =!= col("dst"))
        .distinct()
      // --- small star: edges already satisfy src > dst; for each u attach
      //     all its smaller neighbors (and u) to the minimum neighbor.
      val wS = Window.partitionBy("src")
      val withMin = large.withColumn("m", min("dst").over(wS))
      // localCheckpoint (eager): materializes the iteration AND truncates the
      // logical plan — a persist alone leaves the plan tree growing
      // exponentially across iterations. On a multi-node cluster this becomes
      // a reliable checkpoint / table write (TableIO.stageCheckpoint).
      // lazy localCheckpoint: the signature aggregation below is the action
      // that materializes it — ONE job per iteration (eager checkpoint +
      // separate agg was two), and the plan still truncates for the next
      // round (a persist alone leaves the tree growing exponentially).
      val small = withMin
        .select(col("src"), col("m").as("dst"))
        .union(withMin.where(col("dst") =!= col("m"))
          .select(col("dst").as("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(false)
      // convergence: edge set stable (count + order-independent xor-hash —
      // xor, not sum: ANSI mode makes long-sum overflow an error)
      val sig = small.agg(
        count(lit(1)),
        call_function("bit_xor", xxhash64(col("src"), col("dst")))).first()
      val newSig = (sig.getLong(0), sig.get(1))
      e.unpersist()
      e = small
      converged = newSig == prevSig
      prevSig = newSig
      iter += 1
    }
    // components: every node that appears as src points at its root (dst);
    // roots themselves and isolated nodes map to themselves.
    val roots = e.groupBy("src").agg(min("dst").as("cluster_id"))
    // sealed output: eager localCheckpoint materializes the mapping (one
    // pass, same cost the old persist+count paid) but lives OUTSIDE the SQL
    // cache manager — reclaimed by the ContextCleaner once unreferenced, so
    // a long-lived session composing operators never accumulates CC outputs
    val out = allNodes
      .join(roots.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .localCheckpoint(true)
    allNodes.unpersist(); e.unpersist(); e0.unpersist()
    (out, iter, prevSig._1)
  }
}
