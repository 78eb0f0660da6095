package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.schema.DedupConfig

/** Dev tool: per-stage task-metric attribution of ONE flagship run at a
  * pinned core count, against the tmpfs corpus ScalingBench leaves behind.
  * The scaling curve showed utilization ≈ 0.95 at every leg yet total task
  * CPU-seconds INFLATING with parallelism — this prints, per stage, the
  * task count, Σ run-time, Σ cpu-time, and Σ shuffle/spill bytes, so two
  * runs at different core counts can be diffed stage-by-stage to find where
  * the extra CPU goes (same-work-slower = hardware contention; more-work =
  * a plan that grows with partition count).
  */
object ScaleDiag {
  private final case class Agg(var tasks: Long = 0, var runMs: Long = 0,
                               var cpuNs: Long = 0, var gcMs: Long = 0,
                               var shufReadB: Long = 0, var shufWriteB: Long = 0,
                               var spillB: Long = 0, var inputB: Long = 0)

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("DIAG_CPUS", "32").toInt
    val shmRoot = sys.env.getOrElse("SCALE_LOCAL_DIR", "/dev/shm/spark-graft")
    val corpusPath = sys.env.getOrElse("DIAG_INPUT", s"$shmRoot/corpus.parquet")
    ScalingBench.pinCpus(cores)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"graft-diag-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.local.dir", s"$shmRoot/shuffle")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup outside instrumentation: JIT + codegen on 1/10-shaped data
    Dedup.run(gen.Corpus.generate(spark, 50000, 500).toDF(), DedupConfig()).count()
    spark.catalog.clearCache()

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageComp = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.startsWith("graft:")).getOrElse("untagged")
        j.stageIds.foreach(sid => stageComp.put(sid, desc))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val a = stages.computeIfAbsent(t.stageId, _ => Agg())
          a.synchronized {
            a.tasks += 1; a.runMs += m.executorRunTime
            a.cpuNs += m.executorCpuTime; a.gcMs += m.jvmGCTime
            a.shufReadB += m.shuffleReadMetrics.totalBytesRead
            a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
            a.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
            a.inputB += m.inputMetrics.bytesRead
          }
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        // jobs submitted from the concurrent candidate-source futures get a
        // CompletableFuture call site; the engine frame is in the long form
        val engine = s.stageInfo.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("ScaleDiag"))
          .map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
        names.put(s.stageInfo.stageId,
          engine.getOrElse(s.stageInfo.name.takeWhile(_ != '\n')))
      }
    })

    def procStat(): Array[Long] =
      scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
    val st0 = procStat()
    val t0 = System.nanoTime()
    val n = Dedup.run(spark.read.parquet(corpusPath), DedupConfig()).count()
    val wall = (System.nanoTime() - t0) / 1e9
    val st1 = procStat()
    val d = st1.zip(st0).map { case (a, b) => a - b }
    val tot = d.sum.toDouble
    // user nice sys idle iowait irq softirq steal
    println(f"[diag] box: user=${d(0) / tot}%.2f sys=${d(2) / tot}%.2f " +
      f"idle=${d(3) / tot}%.2f steal=${d(7) / tot}%.2f (whole-box, whole-run)")
    Thread.sleep(2000)

    import scala.jdk.CollectionConverters._
    // per-component rollup (job-description tags set by the engine)
    val comps = stages.asScala.toSeq
      .groupBy { case (id, _) => stageComp.getOrDefault(id, "untagged") }
      .map { case (comp, ss) =>
        val t = Agg()
        ss.foreach { case (_, a) =>
          t.tasks += a.tasks; t.runMs += a.runMs; t.cpuNs += a.cpuNs
          t.gcMs += a.gcMs; t.shufReadB += a.shufReadB
          t.shufWriteB += a.shufWriteB; t.spillB += a.spillB; t.inputB += a.inputB
        }
        comp -> t
      }.toSeq.sortBy(-_._2.cpuNs)
    println(f"[diag] ${"component"}%-24s ${"tasks"}%6s ${"run_s"}%8s ${"cpu_s"}%8s ${"gc_s"}%6s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s")
    comps.foreach { case (c, a) =>
      println(f"[diag] $c%-24s ${a.tasks}%6d ${a.runMs / 1e3}%8.1f ${a.cpuNs / 1e9}%8.1f ${a.gcMs / 1e3}%6.1f " +
        f"${a.inputB / 1e6}%8.0f ${a.shufReadB / 1e6}%8.0f ${a.shufWriteB / 1e6}%8.0f")
    }
    val rows = stages.asScala.toSeq.sortBy(-_._2.cpuNs)
    val totCpu = rows.map(_._2.cpuNs).sum / 1e9
    val totRun = rows.map(_._2.runMs).sum / 1e3
    println(f"[diag] cores=$cores images=$n wall=$wall%.1f s " +
      f"sumRun=$totRun%.1f core-s sumCpu=$totCpu%.1f core-s stages=${rows.size}")
    println(f"[diag] ${"stage"}%-58s ${"tasks"}%6s ${"run_s"}%8s ${"cpu_s"}%8s ${"gc_s"}%6s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spill_MB"}%8s")
    rows.take(40).foreach { case (id, a) =>
      val nm = names.getOrDefault(id, "?").take(56)
      println(f"[diag] $nm%-58s ${a.tasks}%6d ${a.runMs / 1e3}%8.1f ${a.cpuNs / 1e9}%8.1f ${a.gcMs / 1e3}%6.1f " +
        f"${a.inputB / 1e6}%8.0f ${a.shufReadB / 1e6}%8.0f ${a.shufWriteB / 1e6}%8.0f ${a.spillB / 1e6}%8.0f")
    }
    spark.stop()
  }
}
