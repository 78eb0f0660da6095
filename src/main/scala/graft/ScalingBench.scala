package graft

import org.apache.spark.sql.SparkSession

import graft.gen.Corpus
import graft.schema.DedupConfig

/** Cluster-size scaling evidence (BASELINE.json: throughput scaling
  * efficiency ≥ 0.8 between N and 4N executors).
  *
  * No multi-node cluster exists in this sandbox, so the same flagship job
  * runs at two parallelism levels — local[8] and local[32], with
  * spark.sql.shuffle.partitions scaled with cores — on the IDENTICAL
  * deterministic corpus (generation is seed-pure, so both sessions dedup
  * byte-identical input). Efficiency = (T_N / T_4N) / 4.
  *
  * Fairness rules (each models what a real N-core-per-node cluster gives
  * an executor, applied identically to both legs):
  *   - CPU affinity is pinned to exactly `cores` CPUs for the leg's whole
  *     lifetime (`taskset -a -p`): otherwise the JVM's service threads —
  *     GC, netty IO, shuffle compression — of the "8-core" leg silently
  *     borrow the other 24 cores of this 32-core box, cores a real 8-core
  *     node would not have, inflating the baseline and understating
  *     scaling.
  *   - The corpus is written once to parquet on tmpfs and re-SCANNED by
  *     every timed run (input IO is part of the job, and a parallel scan
  *     must scale with cores), and the session cache is cleared between
  *     repeats so a repeat can never reuse a previous run's persisted
  *     intermediates (the engine persists candidate frames internally;
  *     identical plan ⇒ silent cache hit ⇒ the repeat would time a
  *     partially-cached run).
  *   - Shuffle dirs on tmpfs: on a real cluster every executor ships its
  *     own local NVMe, so shuffle bandwidth scales with executor count; a
  *     single-box measurement would otherwise serialize all "executors"
  *     through ONE ~1 GB/s virtual disk.
  *   - AQE ON for both legs (production default; the probe-expansion joins
  *     produce intermediates whose static size estimates are garbage —
  *     measured: a 10k-cluster warmup exceeded 9 min AQE-off vs 57 s
  *     AQE-on). Partition coalescing stays off so each leg keeps its
  *     configured parallelism.
  *
  * Output: one JSON line (stdout + SCALE_OUT file), recorded in
  * BASELINE.md.
  */
object ScalingBench {

  /** Aggregated task metrics for one timed window — distinguishes the two
    * failure modes a low efficiency can hide: idle cores (Σ task run time ≪
    * cores × wall → driver latency / barriers / insufficient parallel
    * slack) vs inflated task time (run time scales with wall but each task
    * slower → memory-bandwidth contention or co-tenant steal). */
  private[graft] final class UtilListener extends org.apache.spark.scheduler.SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        gcMs.addAndGet(m.jvmGCTime)
        tasks.incrementAndGet()
      }
    }
    def snapshot: (Long, Long, Long, Long) =
      (runMs.get, cpuNs.get, gcMs.get, tasks.get)
  }

  private[graft] def pinCpus(cores: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    // taskset -a walks /proc/<pid>/task and fails if ANY thread exits while
    // it iterates — a transient race on a JVM that constantly parks worker
    // threads. Retry; the mask is idempotent.
    val ok = (1 to 5).exists { attempt =>
      val p = new ProcessBuilder(
          "taskset", "-a", "-p", "-c", s"0-${cores - 1}", pid.toString)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      val good = p.waitFor() == 0
      if (!good)
        System.err.println(s"[scale] taskset attempt $attempt failed:\n" +
          out.linesIterator.take(3).mkString("\n"))
      good
    }
    require(ok, s"taskset failed for $cores cpus after retries")
    System.err.println(s"[scale] pinned to $cores cpus")
  }

  def main(args: Array[String]): Unit = {
    val nClusters = sys.env.getOrElse("SCALE_CLUSTERS", "30000").toInt
    val skew = sys.env.getOrElse("SCALE_SKEW", "2000").toInt
    val repeats = sys.env.getOrElse("SCALE_REPEATS", "3").toInt
    val shmRoot = sys.env.getOrElse("SCALE_LOCAL_DIR", "/dev/shm/spark-graft")
    val corpusPath = s"$shmRoot/corpus.parquet"

    // shuffle partitions at 2× cores (identical multiplier at both legs):
    // with partitions == cores, each stage's wall clock is its single
    // slowest task — 2-3× gives the scheduler slack to smooth stragglers,
    // the standard sizing on real clusters.
    val partMult = sys.env.getOrElse("SCALE_PART_MULT", "2").toInt

    def session(cores: Int): SparkSession = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scale-$cores")
        .config("spark.sql.shuffle.partitions", (cores * partMult).toString)
        .config("spark.sql.adaptive.enabled",
                sys.env.getOrElse("SCALE_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", s"$shmRoot/shuffle")
        .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
        .config("spark.sql.broadcastTimeout", "3600") // large-corpus builds
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark
    }

    // Generate ONCE (unpinned — generation is outside every measurement)
    // and write to tmpfs parquet; both legs scan the identical files.
    // SCALE_SKIP_GEN reuses an existing corpus (it is seed-pure, so a
    // previous run's files are byte-equivalent input).
    val skipGen = sys.env.get("SCALE_SKIP_GEN").contains("true") &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath))
    if (!skipGen) {
      val spark = session(32)
      try {
        Corpus.generate(spark, nClusters, skew).toDF()
          .write.mode("overwrite").parquet(corpusPath)
      } finally {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }

    /** One leg: (nImages, best wall sec, utilization, cpu fraction,
      * gc fraction) — utilization/cpu/gc come from the SAME repeat that won
      * the min, so the reported triple is internally consistent. */
    def runAt(cores: Int): (Long, Double, Double, Double, Double) = {
      pinCpus(cores)
      val spark = session(cores)
      try {
        // JIT/codegen warmup: same plan shape, 1/10 of the data
        val tw0 = System.nanoTime()
        Dedup.run(Corpus.generate(spark, math.max(nClusters / 10, 50),
          skew / 10).toDF(), DedupConfig()).count()
        spark.catalog.clearCache()
        System.err.println(f"[scale] local[$cores] warmup done in ${(System.nanoTime() - tw0) / 1e9}%.1f s")
        val nImages = spark.read.parquet(corpusPath).count()
        val listener = new UtilListener
        spark.sparkContext.addSparkListener(listener)
        // min over repeats: co-tenant interference on this box produces
        // multi-× wall-clock outliers; the minimum is the least-contended
        // sample of the same deterministic work
        val runs = (1 to repeats).map { i =>
          val (r0, c0, g0, _) = listener.snapshot
          val t0 = System.nanoTime()
          val n = Dedup.run(spark.read.parquet(corpusPath), DedupConfig()).count()
          val sec = (System.nanoTime() - t0) / 1e9
          require(n == nImages, s"actions $n != input $nImages")
          // listener events drain asynchronously after the last task ends
          // (the bus's waitUntilEmpty is private[spark]; a short sleep
          // after the blocking count() is ample for end-of-run stragglers)
          Thread.sleep(2000)
          val (r1, c1, g1, _) = listener.snapshot
          val util = (r1 - r0) / 1e3 / (cores * sec)
          val cpuFrac = if (r1 == r0) 0.0 else (c1 - c0) / 1e6 / (r1 - r0)
          val gcFrac = if (r1 == r0) 0.0 else (g1 - g0).toDouble / (r1 - r0)
          System.err.println(
            f"[scale] local[$cores] run $i: $sec%.1f s  util=$util%.2f cpu=$cpuFrac%.2f gc=$gcFrac%.2f")
          // drop this run's persisted intermediates + let ContextCleaner
          // reclaim shuffle files before the next repeat
          spark.catalog.clearCache()
          System.gc()
          Thread.sleep(3000)
          (sec, util, cpuFrac, gcFrac)
        }
        val best = runs.minBy(_._1)
        (nImages, best._1, best._2, best._3, best._4)
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    // SCALE_LEGS: which parallelism levels to run (a crashed leg can be
    // re-run alone against the same tmpfs corpus via SCALE_SKIP_GEN).
    val legs = sys.env.getOrElse("SCALE_LEGS", "8,32")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val results = legs.map(c => c -> runAt(c))
    require(results.map(_._2._1).distinct.size == 1, "legs saw different inputs")
    val n = results.head._2._1
    val legsJson = results.map { case (c, (_, t, util, cpu, gc)) =>
      f"""{"cores":$c,"sec":$t%.2f,"imgs_per_sec":${n / t}%.1f,""" +
      f""""utilization":$util%.3f,"cpu_frac":$cpu%.3f,"gc_frac":$gc%.3f}"""
    }.mkString("[", ",", "]")
    // efficiency for every measured pair: (T_small / T_big) / (big/small)
    val pairsJson = results.combinations(2).map {
      case Seq((c1, (_, t1, _, _, _)), (c2, (_, t2, _, _, _))) =>
        f""""eff_${c1}_to_$c2":${(t1 / t2) / (c2.toDouble / c1)}%.3f"""
    }.mkString(",")
    // legacy 2-leg keys (BASELINE.md history) + the general form
    val legacy =
      if (results.size == 2) {
        val Seq((c1, (_, t1, _, _, _)), (c2, (_, t2, _, _, _))) = results
        f""""local${c1}_sec":$t1%.2f,"local${c2}_sec":$t2%.2f,""" +
        f""""imgs_per_sec_$c1":${n / t1}%.1f,"imgs_per_sec_$c2":${n / t2}%.1f,""" +
        f""""scaling_efficiency":${(t1 / t2) / (c2.toDouble / c1)}%.3f,"""
      } else ""
    val line =
      f"""{"metric":"scaling","n_images":$n,""" + legacy +
        f""""legs":$legsJson,$pairsJson}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SCALE_OUT", "SCALE_LINE.json")),
      line + "\n")
  }
}
