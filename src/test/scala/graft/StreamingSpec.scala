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

  test("typed flatMapGroupsWithState sessionizer == batch q34") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val evs = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[graft.streaming.SessionEvent]
    val got = graft.streaming.StatefulSessions.sessionize(evs)
      .select(col("user_id"), col("session_idx"),
        timestamp_micros(col("session_start_us")).as("session_start"),
        col("n_events"), round(col("value_sum"), 2).as("value_sum"))
    val want = graft.queries.EventsQueries.queries("q34_sessionize")(
      spark, TestSpark.sf0001)
      .select(col("user_id"), col("session_idx"), col("session_start"),
        col("n_events"), col("value_sum"))
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
