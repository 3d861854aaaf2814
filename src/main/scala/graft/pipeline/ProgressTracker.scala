package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** C8 — progress tracking. The reference prints `Progress: n/N (x%)`
  * per completed chunk from an atomic counter
  * (`/root/reference/internal/cli/mapreduce.go:99-118`). The Spark-
  * native unit of progress is the TASK: a SparkListener counts task
  * completions across the job's stages and reports every
  * `reportEvery` — driver-side only, zero cost on executors, works
  * identically on a 1000-executor cluster.
  */
final class ProgressTracker(label: String, reportEvery: Int = 8,
                            report: String => Unit = Console.err.println)
  extends SparkListener {

  private val done = new java.util.concurrent.atomic.AtomicLong(0)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val n = done.incrementAndGet()
    if (n % reportEvery == 0) report(s"[$label] progress: $n tasks completed")
  }

  /** Tasks completed since attach (all jobs on the session). */
  def completed: Long = done.get()
}

object ProgressTracker {
  /** Attach a tracker to the session; detach it when the tracked
    * pipeline finishes (listeners are session-global).
    */
  def attach(spark: SparkSession, label: String,
             reportEvery: Int = 8): ProgressTracker = {
    val t = new ProgressTracker(label, reportEvery)
    spark.sparkContext.addSparkListener(t)
    t
  }

  def detach(spark: SparkSession, t: ProgressTracker): Unit =
    spark.sparkContext.removeSparkListener(t)
}
