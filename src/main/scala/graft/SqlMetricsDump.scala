package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: run one declared query and dump the FINAL adaptive plan with
  * per-operator SQL metrics (rows out, per-operator timings) — the offline
  * stand-in for the SQL tab. Env: MDUMP_QUERY (required), repeats via
  * MDUMP_REPEATS (metrics from the last run). */
object SqlMetricsDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("MDUMP_QUERY", "q_minhash_lsh_pairs")
    val repeats = sys.env.getOrElse("MDUMP_REPEATS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // MDUMP_CONF="k=v;k=v" — runtime SQLConf experiment knobs
    sys.env.get("MDUMP_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    graft.gen.Corpus.cached(spark, 150, 40)
    graft.gen.Corpus.cached(spark, 80, 20)
    var df = SparkEntry.queries(name)(spark, sfDir)
    for (r <- 1 until repeats) {
      val t0 = System.nanoTime()
      df.count()
      graft.util.CacheScope.flushDeferred()
      println(f"[mdump] warm run $r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df = SparkEntry.queries(name)(spark, sfDir)
    }
    val t0 = System.nanoTime()
    // collect(), not count(): count() builds a NEW QueryExecution, so the
    // metrics of df's own plan would stay empty
    val n = df.collect().length
    println(f"[mdump] measured run ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        m.value > 0 && (k.contains("numOutputRows") || k.contains("Time") ||
          k.contains("time") || k.contains("dataSize") || k.contains("spill"))
      }
      val ms = interesting.toSeq.sortBy(_._1).map { case (k, m) =>
        s"$k=${m.value}" }.mkString(" ")
      println(s"[mdump] ${"  " * depth}${p.nodeName}  $ms")
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Nil
        case _ => p.children ++ p.subqueries
      }
      kids.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    graft.util.CacheScope.flushDeferred()
    spark.stop()
  }
}
