package graft.obs

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scoped task-metric accounting — the library form of the accounting
  * [[graft.Bench]] does around every driver query, exposed so any caller
  * can answer "what did THIS query actually move?" without the Spark UI.
  *
  * Scale rationale: seconds lie at 100 TB — a query whose local time looks
  * fine but whose shuffle volume grows superlinearly is the one that dies
  * on a cluster. Shuffle/spill per labeled unit of work is the portable
  * evidence, and spill > 0 is the first sign partitions no longer fit
  * executor memory (resize `spark.sql.shuffle.partitions` /
  * `maxPartitionBytes` before it becomes task retry storms).
  *
  * Semantics: task-end metrics are GLOBAL to the SparkContext, so a scope
  * attributes whatever runs during it — callers must not run concurrent
  * jobs in the same session while measuring (same contract as the bench
  * loop). Listener events are async; the scope drains the bus before
  * reading, tolerating a bounded timeout (a slow drain bleeds the
  * remainder into the next scope rather than failing the caller).
  */
object ScopedMetrics {

  /** One scope's aggregated task metrics. */
  final case class Snapshot(
      tasks: Long,
      shuffleWriteBytes: Long,
      shuffleReadBytes: Long,
      memorySpillBytes: Long,
      diskSpillBytes: Long,
      executorCpuNs: Long,
      jvmGcMs: Long = 0L) {
    def shuffleWriteMb: Double = shuffleWriteBytes / 1048576.0
    def spilled: Boolean = memorySpillBytes > 0 || diskSpillBytes > 0
  }

  private final class Acc extends SparkListener {
    val tasks = new AtomicLong()
    val sw = new AtomicLong()
    val sr = new AtomicLong()
    val memSpill = new AtomicLong()
    val diskSpill = new AtomicLong()
    val cpu = new AtomicLong()
    val gc = new AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        cpu.addAndGet(m.executorCpuTime)
        gc.addAndGet(m.jvmGCTime)
      }
    }
    def snapshot: Snapshot = Snapshot(tasks.get(), sw.get(), sr.get(),
      memSpill.get(), diskSpill.get(), cpu.get(), gc.get())
  }

  /** Run `body` and return its result plus the task metrics it caused. */
  def measure[T](spark: SparkSession, drainTimeoutMs: Long = 30000L)(body: => T): (T, Snapshot) = {
    val acc = new Acc
    val sc = spark.sparkContext
    sc.addSparkListener(acc)
    try {
      val r = body
      // async listener bus: flush queued task-end events before reading
      try org.apache.spark.graft.ListenerDrain.drain(sc, drainTimeoutMs)
      catch { case _: Throwable => () }
      (r, acc.snapshot)
    } finally sc.removeSparkListener(acc)
  }
}
