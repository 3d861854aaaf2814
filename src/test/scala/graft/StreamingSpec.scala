package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingJobs

/** Stream-batch parity: the streaming window jobs must produce exactly
  * the batch catalog's q35/q37 results on the same data (sf0.001) —
  * same expressions, two execution modes (mirrors the SURVEY §5 plan).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("streaming tumbling window == batch q35") {
    val stream = StreamingJobs.eventsStream(spark, TestSpark.sf0001)
    val got = StreamingJobs.runToCompletion(spark,
      StreamingJobs.tumblingCounts(stream), "t_tumbling")
    val want = graft.queries.EventsQueries.queries("q35_tumbling_window")(
      spark, TestSpark.sf0001)
    assert(canon(got) == canon(want))
    assert(got.count() > 0)
  }

  test("streaming session window == batch q37") {
    val stream = StreamingJobs.eventsStream(spark, TestSpark.sf0001)
    val got = StreamingJobs.runToCompletion(spark,
      StreamingJobs.sessionCounts(stream), "t_session")
    val want = graft.queries.EventsQueries.queries("q37_session_window")(
      spark, TestSpark.sf0001)
    assert(canon(got) == canon(want))
    assert(got.count() > 0)
  }
}
