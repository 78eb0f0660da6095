package graft

import org.apache.spark.sql.SparkSession

import graft.gen.Corpus
import graft.schema.DedupConfig

/** Cluster-size scaling evidence (BASELINE.json: throughput scaling
  * efficiency ≥ 0.8 between N and 4N executors).
  *
  * No multi-node cluster exists in this sandbox, so the same flagship job
  * runs at two parallelism levels — local[4] and local[16] with CPU
  * affinity pinned to exactly that many cores (SCALE_LEGS picks the
  * pairing), spark.sql.shuffle.partitions scaled with cores — on the
  * IDENTICAL deterministic corpus (generation is seed-pure, so both
  * sessions dedup byte-identical input). Efficiency = (T_N / T_4N) / 4.
  *
  * Fairness rules (each models what a real N-core-per-node cluster gives
  * an executor, applied identically to both legs):
  *   - CPU affinity is pinned to exactly `cores` CPUs for the leg's whole
  *     lifetime (`taskset -a -p`): otherwise the JVM's service threads —
  *     GC, netty IO, shuffle compression — of the narrow (e.g. 4-core) leg
  *     silently borrow the other 28 cores of this 32-core box, cores a
  *     real 4-core node would not have, inflating the baseline and
  *     understating scaling.
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
  *     AQE-on). Partition coalescing is ON (production default, same policy
  *     at both legs): the CC iterations shuffle ~tens of MB across 2×cores
  *     partitions, and un-coalesced 300 KB tasks were measured 75% blocked
  *     on launch/fetch overhead — coalescing only ever merges below the
  *     64 MB advisory size, so the wide data-bearing stages keep each leg's
  *     full parallelism.
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

    // Scan splits must outnumber the widest leg by several waves. A 100 TB
    // input is ~800k parquet splits — parallelism there is never limited by
    // file count — but a single-box corpus written at defaultParallelism is
    // ~33 single-row-group files, and a row group is the minimum split: the
    // 32-core leg's scan (and every pre-shuffle stage inheriting it — the
    // per-image decode/hash UDFs, the hottest CPU in the job) ran as 32+1
    // tasks, one full wave plus a straggler wave, capping 8→32 efficiency
    // at ~0.5 before any shuffle happened. Write many small files and cap
    // maxPartitionBytes so both legs see every file as its own split.
    val scanFiles = sys.env.getOrElse("SCALE_SCAN_FILES", "256").toInt

    // SCALE_EXTRA_CONF="k=v;k2=v2": ad-hoc spark confs applied IDENTICALLY
    // to every leg — the A/B knob for config experiments (e.g.
    // spark.io.compression.codec=zstd trades CPU for shuffle bytes, the
    // right direction when DRAM streaming is the scaling ceiling)
    val extraConf: Seq[(String, String)] = sys.env.get("SCALE_EXTRA_CONF")
      .map(_.split(";").toSeq.filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); (k.trim, v.trim) }
        .filter(_._1.nonEmpty)) // "=v" would mint an empty Spark conf key
      .getOrElse(Nil)

    def session(cores: Int): SparkSession = {
      val b0 = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scale-$cores")
        .config("spark.sql.shuffle.partitions", (cores * partMult).toString)
        .config("spark.sql.adaptive.enabled",
                sys.env.getOrElse("SCALE_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                sys.env.getOrElse("SCALE_AQE_COALESCE", "true"))
        .config("spark.local.dir", s"$shmRoot/shuffle")
        // one split per corpus file (files are ~2-4 MB; any file alone
        // exceeds this budget, so none are packed together)
        .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
        .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
        .config("spark.sql.broadcastTimeout", "3600") // large-corpus builds
        .config("spark.ui.enabled", "false")
      val spark = extraConf.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
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
          .repartition(scanFiles)
          .write.mode("overwrite").parquet(corpusPath)
      } finally {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }

    /** Whole-box CPU ticks from /proc/stat (user nice sys idle iowait irq
      * softirq steal ...) — the steal/sys fractions of a repeat's window
      * tell whether its wall-clock is trustworthy: this box is a co-tenanted
      * VM and hypervisor steal varies 0-25% across hours. */
    def procStat(): Array[Long] =
      scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)

    final case class Run(sec: Double, util: Double, cpuFrac: Double,
                         gcFrac: Double, steal: Double, sys: Double)

    val warmed = scala.collection.mutable.Set.empty[Int]

    /** One timed execution of the flagship at `cores` (fresh session; JIT
      * state persists in the JVM across sessions, so the per-leg warmup
      * runs only on the leg's first round). */
    def runOnce(cores: Int): (Long, Run) = {
      pinCpus(cores)
      val spark = session(cores)
      try {
        if (!warmed.add(cores)) () // JVM already hot for this leg
        else {
          // JIT/codegen warmup: same plan shape, 1/10 of the data
          val tw0 = System.nanoTime()
          Dedup.run(Corpus.generate(spark, math.max(nClusters / 10, 50),
            skew / 10).toDF(), DedupConfig()).count()
          spark.catalog.clearCache()
          System.err.println(f"[scale] local[$cores] warmup done in ${(System.nanoTime() - tw0) / 1e9}%.1f s")
        }
        val nImages = spark.read.parquet(corpusPath).count()
        val listener = new UtilListener
        spark.sparkContext.addSparkListener(listener)
        val (r0, c0, g0, _) = listener.snapshot
        val s0 = procStat()
        val t0 = System.nanoTime()
        val n = Dedup.run(spark.read.parquet(corpusPath), DedupConfig()).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val s1 = procStat()
        require(n == nImages, s"actions $n != input $nImages")
        // listener events drain asynchronously after the last task ends
        // (the bus's waitUntilEmpty is private[spark]; a short sleep
        // after the blocking count() is ample for end-of-run stragglers)
        Thread.sleep(2000)
        val (r1, c1, g1, _) = listener.snapshot
        val util = (r1 - r0) / 1e3 / (cores * sec)
        val cpuFrac = if (r1 == r0) 0.0 else (c1 - c0) / 1e6 / (r1 - r0)
        val gcFrac = if (r1 == r0) 0.0 else (g1 - g0).toDouble / (r1 - r0)
        val d = s1.zip(s0).map { case (a, b) => a - b }
        val tot = math.max(1L, d.sum).toDouble
        val run = Run(sec, util, cpuFrac, gcFrac, d(7) / tot, d(2) / tot)
        System.err.println(
          f"[scale] local[$cores]: $sec%.1f s  util=$util%.2f cpu=$cpuFrac%.2f " +
          f"gc=$gcFrac%.2f steal=${run.steal}%.2f sys=${run.sys}%.2f")
        (nImages, run)
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
    // Legs INTERLEAVED round-robin (8,32,8,32,...), min per leg across
    // rounds: hypervisor steal on this box drifts on a minutes scale, and
    // running all of one leg's repeats before the other leg means a drift
    // mid-probe lands entirely on one side of the ratio. Interleaving gives
    // every leg a sample in every co-tenant regime.
    val samples = scala.collection.mutable.Map.empty[Int, List[(Long, Run)]]
      .withDefaultValue(Nil)
    for (_ <- 1 to repeats; c <- legs) samples(c) ::= runOnce(c)
    val results: Seq[(Int, (Long, Double, Double, Double, Double, Double, Double))] =
      legs.map { c =>
        val (n, best) = samples(c).minBy(_._2.sec)
        c -> ((n, best.sec, best.util, best.cpuFrac, best.gcFrac, best.steal, best.sys))
      }
    require(results.map(_._2._1).distinct.size == 1, "legs saw different inputs")
    val n = results.head._2._1
    val legsJson = results.map { case (c, (_, t, util, cpu, gc, steal, sysF)) =>
      f"""{"cores":$c,"sec":$t%.2f,"imgs_per_sec":${n / t}%.1f,""" +
      f""""utilization":$util%.3f,"cpu_frac":$cpu%.3f,"gc_frac":$gc%.3f,""" +
      f""""steal_frac":$steal%.3f,"sys_frac":$sysF%.3f}"""
    }.mkString("[", ",", "]")
    // efficiency for every measured pair: (T_small / T_big) / (big/small)
    val pairsJson = results.combinations(2).map {
      case Seq((c1, (_, t1, _, _, _, _, _)), (c2, (_, t2, _, _, _, _, _))) =>
        f""""eff_${c1}_to_$c2":${(t1 / t2) / (c2.toDouble / c1)}%.3f"""
    }.mkString(",")
    // legacy 2-leg keys (BASELINE.md history) + the general form
    val legacy =
      if (results.size == 2) {
        val Seq((c1, (_, t1, _, _, _, _, _)), (c2, (_, t2, _, _, _, _, _))) = results
        f""""local${c1}_sec":$t1%.2f,"local${c2}_sec":$t2%.2f,""" +
        f""""imgs_per_sec_$c1":${n / t1}%.1f,"imgs_per_sec_$c2":${n / t2}%.1f,""" +
        f""""scaling_efficiency":${(t1 / t2) / (c2.toDouble / c1)}%.3f,"""
      } else ""
    // JSON-escape the env-sourced conf string — a quote/backslash in
    // SCALE_EXTRA_CONF must not unparse the whole artifact line
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val extraJson =
      if (extraConf.isEmpty) ""
      else s""""extra_conf":"${jesc(extraConf.map { case (k, v) => s"$k=$v" }.mkString(";"))}","""
    val line =
      f"""{"metric":"scaling","n_images":$n,""" + legacy + extraJson +
        f""""legs":$legsJson,$pairsJson}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SCALE_OUT", "SCALE_LINE.json")),
      line + "\n")
  }
}
