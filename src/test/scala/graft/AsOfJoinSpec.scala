package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("asof utility matches the q33 catalog query on sf0.001") {
    val e = Tables.events(spark, TestSpark.sf0001)
    val left = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
    val got = AsOfJoin.asof(left, right, "user_id", "ts",
        payload = Seq("p_id", "p_value"), tieBreak = col("p_id"))
      .select(col("event_id"), col("user_id"),
        col("p_id").as("asof_purchase_id"),
        round(col("p_value"), 2).as("asof_value"))
    val want = graft.queries.EventsQueries.queries("q33_asof_join")(
      spark, TestSpark.sf0001)
    assert(canon(got) == canon(want))
    assert(got.count() > 0)
  }

  test("null payload field in the latest right row wins atomically") {
    import spark.implicits._
    val left = Seq((1L, 10L, 30L)).toDF("id", "k", "t")
    val right = Seq(
      (10L, 10L, Option(5L), Option(1.0)),
      (10L, 20L, Option.empty[Long], Option(2.0))) // latest: p=null, v=2.0
      .toDF("k", "t", "p", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", Seq("p", "v"), col("v"))
      .collect()(0)
    // must be the t=20 row verbatim — p stays null, never backfilled
    // from t=10, and v comes from the SAME row
    assert(out.isNullAt(out.fieldIndex("p")))
    assert(out.getDouble(out.fieldIndex("v")) == 2.0)
  }

  test("left rows before any right row get null payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 5L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 50L, 7L, 1.5)).toDF("k", "t", "p", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", Seq("p", "v"), col("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(7L)) // t=100 sees the t=50 purchase
    assert(out(2L).isEmpty)      // t=5 predates everything
  }
}
