package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shared task-metrics listener for the measurement harnesses (Bench
  * metrics mode, GraphBucketProbe, ScaleProbe, ClusterScaleProbe) —
  * previously four near-identical copies tracking different metric
  * subsets, which made "spill" mean different things across SCALE.md
  * rows. Disk and memory spill are tracked SEPARATELY everywhere now:
  * memoryBytesSpilled is the deserialized in-memory size at spill
  * time, routinely several × the bytes that reach disk (the r14
  * ScaleProbe lesson — summing them overstated spill ~5×).
  *
  * Totals are process-wide per measured span; every harness runs its
  * queries serially with nothing else in flight, and drains straggler
  * task-end events (a short sleep) before reading the counters. */
final class MetricsAcc extends SparkListener {
  val shufRead = new java.util.concurrent.atomic.AtomicLong
  val shufWrite = new java.util.concurrent.atomic.AtomicLong
  val diskSpill = new java.util.concurrent.atomic.AtomicLong
  val memSpill = new java.util.concurrent.atomic.AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      diskSpill.addAndGet(m.diskBytesSpilled)
      memSpill.addAndGet(m.memoryBytesSpilled)
    }
  }

  def reset(): Unit = {
    shufRead.set(0); shufWrite.set(0); diskSpill.set(0); memSpill.set(0)
  }
}
