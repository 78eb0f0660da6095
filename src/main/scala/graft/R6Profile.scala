package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only job-timeline profiler for the round-6 optimization targets:
  * runs selected declared queries and prints every Spark job's wall window
  * plus the GAP since the previous job ended — the flat driver-side
  * job-boundary latency BENCH_DIAG attributes the idle fractions to.
  * Env: R6_ONLY (comma list, default = the slow set), R6_REPEATS. */
object R6Profile {
  private final case class JobRec(id: Int, desc: String, t0: Long,
                                  var t1: Long = -1L)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.getOrElse("R6_REPEATS", "2").toInt
    val names = sys.env.getOrElse("R6_ONLY",
      "q_embed_top1,q_ann_top1,q_embed_neardup_pairs,q_minhash_lsh_pairs," +
        "q_simhash_pairs,q_jaccard_pairs,q_dup_clusters").split(",").map(_.trim)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.gen.Corpus.cached(spark, 150, 40)
    graft.gen.Corpus.cached(spark, 80, 20)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, d, System.nanoTime()))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.t1 = System.nanoTime()
      }
    })
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double, Int, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield (c - s) / 1e3).getOrElse(-1.0)
        val taskSec = si.taskMetrics.executorRunTime / 1e3
        stages.add((si.stageId, si.name.take(90), wall, si.numTasks, taskSec))
      }
    })

    for (r <- 1 to repeats; name <- names) {
      jobs.clear()
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count(): Unit
      graft.util.CacheScope.flushDeferred()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      val rs = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.toSeq.sortBy(_.t0)
      }
      println(f"[r6] ==== $name rep$r wall=$wall%.2f s jobs=${rs.size} ====")
      var lastEnd = t0
      var gapSum = 0.0
      for (j <- rs) {
        val gap = math.max(0L, j.t0 - lastEnd) / 1e9
        gapSum += gap
        val dur = (if (j.t1 > 0) j.t1 - j.t0 else -1L) / 1e9
        println(f"[r6] job${j.id}%4d start+${(j.t0 - t0) / 1e9}%6.2f dur=$dur%6.3f gap=$gap%6.3f  ${j.desc.take(80)}")
        if (j.t1 > lastEnd) lastEnd = j.t1
      }
      println(f"[r6] $name rep$r wall=$wall%.2f s jobs=${rs.size} gapSum=$gapSum%.2f s")
      val ss = {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_._3)
      }
      println(f"[r6] stages=${ss.size} top by wall:")
      for ((id, nm, wallS, nt, taskS) <- ss.take(14))
        println(f"[r6]   st$id%4d wall=$wallS%7.3f tasks=$nt%3d taskSec=$taskS%7.2f  $nm")
    }
    spark.stop()
  }
}
