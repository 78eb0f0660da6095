package graft

import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicLong

/** Hardware scaling ceiling probe (no Spark): measures how far THIS box can
  * scale embarrassingly parallel JVM work across pinned core counts. The
  * north rule's efficiency target presumes hardware where 4× cores buys ~4×
  * compute; on a co-tenanted VM with shared DRAM bandwidth that premise must
  * be MEASURED, not assumed — the flagship's efficiency is only meaningful
  * relative to this ceiling.
  *
  * Two probes, each run at every requested core count (pinned via taskset,
  * same mechanism as ScalingBench):
  *   - cpu: per-thread SHA-256 over a thread-local 16 KiB buffer — fits in
  *     L1/L2, no shared memory traffic; the purest "more cores = more work"
  *     load a JVM can express. If THIS doesn't scale 4×, nothing will.
  *   - membw: per-thread sequential copy over a thread-local 64 MiB long
  *     array — DRAM-bandwidth-bound; shows how the shared memory system
  *     divides across cores (shuffle/scan/persist passes live here).
  *
  * Output: one JSON line with per-core-count throughput and efficiency
  * versus the smallest core count.
  */
object HwCeiling {

  private def pin(cores: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    val ok = (1 to 5).exists { _ =>
      val p = new ProcessBuilder(
        "taskset", "-a", "-p", "-c", s"0-${cores - 1}", pid.toString)
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    }
    require(ok, s"taskset failed for $cores cpus")
  }

  def main(args: Array[String]): Unit = {
    val coreCounts = sys.env.getOrElse("HW_CORES", "8,32")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val ms = sys.env.getOrElse("HW_MS", "12000").toLong

    // thread-local state factories
    def cpuWork(): () => Unit = {
      val md = MessageDigest.getInstance("SHA-256")
      val buf = new Array[Byte](16 * 1024)
      () => { md.reset(); md.update(buf); md.digest() }
    }
    def bwWork(): () => Unit = {
      val src = new Array[Long](8 * 1024 * 1024) // 64 MiB
      val dst = new Array[Long](8 * 1024 * 1024)
      () => System.arraycopy(src, 0, dst, 0, src.length)
    }
    // randomWork models the job's hot loop better than either pure probe:
    // shuffled hash joins and hash aggregates chase pointers through
    // per-task tables far larger than the per-core L2 — on one socket every
    // added core SHRINKS each core's share of the shared L3, so random-
    // access work inflates with core count in a way neither the L1-resident
    // CPU probe nor the prefetchable streaming probe shows. One op = 4096
    // dependent 8-byte loads over a thread-local 128 MiB table.
    def randomWork(): () => Unit = {
      val table = new Array[Long](16 * 1024 * 1024) // 128 MiB
      java.util.Arrays.fill(table, 0x9e3779b97f4a7c15L)
      var x = 0x243f6a8885a308d3L
      () => {
        var i = 0
        var acc = 0L
        var s = x
        while (i < 4096) {
          s = s * 6364136223846793005L + 1442695040888963407L
          acc ^= table(((s >>> 33) & (table.length - 1)).toInt)
          i += 1
        }
        x = s ^ acc
      }
    }

    final case class Res(cores: Int, cpuOps: Double, bwGBs: Double,
                         randOps: Double = 0.0)
    val results = coreCounts.map { c =>
      pin(c)
      // per-thread local state: build the closures AFTER pinning
      def driveLocal(mk: () => (() => Unit)): Long = {
        val works = (1 to c).map(_ => mk())
        val done = new AtomicLong
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val ts = works.map { w =>
          val t = new Thread(() => { while (!stop.get()) { w(); done.incrementAndGet() } })
          t.setDaemon(true); t.start(); t
        }
        Thread.sleep(ms)
        stop.set(true); ts.foreach(_.join(5000))
        done.get()
      }
      // one discarded warmup window PER PROBE KIND (JIT + allocation ramp):
      // warming only the cpu probe left membw/random measuring their own
      // compile ramp, slightly understating throughput
      def measured(mk: () => (() => Unit)): Long = { driveLocal(mk); driveLocal(mk) }
      val cpu = measured(() => cpuWork())
      val bw = measured(() => bwWork())
      val rnd = measured(() => randomWork())
      val r = Res(c, cpu / (ms / 1e3), bw * 128.0 / 1024 / (ms / 1e3), // 128 MiB moved per copy op
                  rnd / (ms / 1e3))
      System.err.println(f"[hw] cores=$c cpu=${r.cpuOps}%.0f hashes/s  membw=${r.bwGBs}%.1f GB/s  rand=${r.randOps}%.0f probes/s")
      r
    }
    val base = results.head
    val legs = results.map { r =>
      f"""{"cores":${r.cores},"sha256_16k_per_sec":${r.cpuOps}%.0f,"copy_gb_per_sec":${r.bwGBs}%.2f,""" +
      f""""rand_probe_per_sec":${r.randOps}%.0f,""" +
      f""""cpu_eff_vs_${base.cores}":${r.cpuOps / base.cpuOps / (r.cores.toDouble / base.cores)}%.3f,""" +
      f""""bw_eff_vs_${base.cores}":${r.bwGBs / base.bwGBs / (r.cores.toDouble / base.cores)}%.3f,""" +
      f""""rand_eff_vs_${base.cores}":${r.randOps / base.randOps / (r.cores.toDouble / base.cores)}%.3f}"""
    }.mkString("[", ",", "]")
    val line = s"""{"metric":"hw_ceiling","window_ms":$ms,"legs":$legs}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("HW_OUT", "HW_CEILING.json")),
      line + "\n")
  }
}
