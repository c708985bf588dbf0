package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query JVM/task-metric evidence for the bench's noise diagnosis.
  *
  * Motivation: two rounds of driver benches read the dedup family at 2-5x
  * the clean local figure while the code was untouched, and a dozen cheap
  * keys inflated uniformly between rounds. That pattern has exactly two
  * candidate causes, and wall-clock alone cannot distinguish them:
  *
  *   - **VM contention** (another tenant on the host): wall-clock inflates
  *     while the query's own executor CPU time stays flat, and /proc/stat
  *     shows steal/busy ticks the JVM never got.
  *   - **cross-query JVM state** (accumulated shuffle files, block-store
  *     fragmentation, GC pressure from 45 sequential queries in one JVM):
  *     task GC time and spills grow over the pass, and the local
  *     shuffle-dir footprint climbs.
  *
  * [[TaskMetricsProbe]] aggregates Spark task metrics between resets (the
  * per-query executor-side truth) and [[ProcStat]] reads the host's
  * cumulative CPU ticks (the machine-level truth). [[Bench]] attaches both
  * and emits a compact per-query `probe` object in its JSON line, so the
  * driver's official artifact CARRIES its own noise evidence; [[Probe]]
  * prints the full detail for interactive bisection.
  */
final class TaskMetricsProbe extends SparkListener {
  private val tasks = new LongAdder
  private val runMs = new LongAdder // executor wall per task, summed
  private val cpuNs = new LongAdder // executor CPU (on-core) time
  private val gcMs = new LongAdder // GC pauses attributed to tasks
  private val shuffleReadB = new LongAdder
  private val shuffleWriteB = new LongAdder
  private val spillB = new LongAdder // memory+disk spill bytes
  private val peakExecMem = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      tasks.increment()
      runMs.add(m.executorRunTime)
      cpuNs.add(m.executorCpuTime)
      gcMs.add(m.jvmGCTime)
      shuffleReadB.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteB.add(m.shuffleWriteMetrics.bytesWritten)
      spillB.add(m.memoryBytesSpilled + m.diskBytesSpilled)
      peakExecMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
    }
  }

  /** Totals since the last reset (listener events are delivered on a bus —
    * callers should wait for an empty bus via their action completing;
    * small trailing deltas are acceptable for this diagnostic). */
  def snapshotAndReset(): TaskMetricsProbe.Snap = {
    val s = TaskMetricsProbe.Snap(
      tasks.sumThenReset(),
      runMs.sumThenReset() / 1e3,
      cpuNs.sumThenReset() / 1e9,
      gcMs.sumThenReset() / 1e3,
      shuffleReadB.sumThenReset(),
      shuffleWriteB.sumThenReset(),
      spillB.sumThenReset(),
      peakExecMem.getAndSet(0L))
    s
  }
}

object TaskMetricsProbe {
  /** All times in seconds, sizes in bytes. `runS` is summed task wall,
    * `cpuS` summed on-core CPU: a healthy compute-bound query has
    * cpuS ≈ runS; runS >> cpuS means tasks sat off-core (contention,
    * IO wait, GC of OTHER threads). */
  final case class Snap(tasks: Long, runS: Double, cpuS: Double, gcS: Double,
      shuffleReadB: Long, shuffleWriteB: Long, spillB: Long, peakExecMemB: Long)
}

/** Host-level CPU accounting from /proc/stat (Linux; all zeros elsewhere).
  * `steal` is time the hypervisor ran OTHER tenants while this VM was
  * runnable — the direct contention signal wall-clock can only hint at. */
object ProcStat {
  final case class Cpu(busyS: Double, idleS: Double, iowaitS: Double, stealS: Double) {
    def -(o: Cpu): Cpu = Cpu(busyS - o.busyS, idleS - o.idleS,
      iowaitS - o.iowaitS, stealS - o.stealS)
  }

  private val hz = 100.0 // USER_HZ on every mainstream Linux

  def read(): Cpu = try {
    val line = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).getOrElse("")
    val f = line.trim.split("\\s+").drop(1).map(_.toDouble)
    // user nice system idle iowait irq softirq steal
    val busy = f(0) + f(1) + f(2) + f.lift(5).getOrElse(0.0) + f.lift(6).getOrElse(0.0)
    Cpu(busy / hz, f(3) / hz, f.lift(4).getOrElse(0.0) / hz,
      f.lift(7).getOrElse(0.0) / hz)
  } catch { case _: Throwable => Cpu(0, 0, 0, 0) }
}

/** Recursive directory size/count — for watching the local shuffle dir and
  * the session warehouse grow across a multi-query pass. */
object DirStat {
  final case class Stat(files: Long, bytes: Long)

  def of(path: String): Stat = {
    val root = new java.io.File(path)
    if (!root.exists()) return Stat(0, 0)
    var files = 0L
    var bytes = 0L
    def walk(f: java.io.File): Unit = {
      val children = f.listFiles()
      if (children != null) children.foreach { c =>
        if (c.isDirectory) walk(c)
        else { files += 1; bytes += c.length() }
      }
    }
    walk(root)
    Stat(files, bytes)
  }

  /** This JVM's OWN block-manager local dirs (shuffle + cached blocks),
    * resolved through SparkEnv's DiskBlockManager via reflection (the API
    * is private[spark]; this is a diagnostic, not a contract). ALL
    * configured `spark.local.dir` roots are returned — summing only the
    * first silently undercounts the footprint under multi-root configs.
    * The old newest-`blockmgr-*`-under-/tmp scan could attribute a
    * concurrently running Spark JVM's shuffle footprint to this bench —
    * kept only as the fallback when reflection breaks on a future Spark. */
  def blockMgrDirs(spark: org.apache.spark.sql.SparkSession): Seq[String] =
    try {
      val env = org.apache.spark.SparkEnv.get
      val bm = env.getClass.getMethod("blockManager").invoke(env)
      val dbm = bm.getClass.getMethod("diskBlockManager").invoke(bm)
      val dirs = dbm.getClass.getMethod("localDirs").invoke(dbm)
        .asInstanceOf[Array[java.io.File]]
      // each entry IS one `blockmgr-*` dir (one per configured local root)
      dirs.map(_.getAbsolutePath).toSeq
    } catch { case _: Throwable =>
      val roots = spark.sparkContext.getConf
        .get("spark.local.dir", System.getProperty("java.io.tmpdir", "/tmp"))
        .split(",")
      roots.flatMap { r =>
        val d = new java.io.File(r)
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
      }.sortBy(-_.lastModified()).take(1).map(_.getAbsolutePath).toSeq
    }
}
