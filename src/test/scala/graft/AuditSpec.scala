package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants for the q186 attribution weights and the
  * q187 privacy audit (engine parity is the DuckDB oracle's job;
  * these prove the operators mean what they claim).
  */
class AuditSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark

  test("q186 credits sum to 1 per purchase and favor recent touches") {
    val rows = SparkEntry.queries("q186_attribution_decay")(
        spark, TestSpark.sf0001).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"),
        r.getAs[Long]("n_touches"), r.getAs[Double]("credit")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (pid, touches) =>
      assert(touches.length == touches.head._3,
        s"purchase $pid: n_touches disagrees with actual touch rows")
      val total = touches.map(_._4).sum
      assert(math.abs(total - 1.0) < 1e-4,
        s"purchase $pid: credits sum to $total")
      assert(touches.forall(_._4 > 0), s"purchase $pid: non-positive credit")
    }
  }

  test("q186 planted multi-touch purchase gets exact linear-decay credits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // views 45 and 15 minutes before the purchase: weights
    // (60-45)=15min and (60-15)=45min -> credits 0.25 / 0.75; a view
    // exactly AT the window edge and one outside must be dropped
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view", 0.0),     // Δ=60min: boundary, excluded
      (2L, "2024-01-01 10:15:00", 7L, "view", 0.0),     // Δ=45min -> w=15min
      (3L, "2024-01-01 10:45:00", 7L, "view", 0.0),     // Δ=15min -> w=45min
      (4L, "2024-01-01 09:00:00", 7L, "view", 0.0),     // outside window
      (5L, "2024-01-01 11:00:00", 7L, "purchase", 80.0),
      (6L, "2024-01-01 11:00:00", 8L, "view", 0.0))     // other user
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val got = graft.queries.EventsQueries.attributionDecay(ev).collect()
      .map(r => r.getAs[Long]("view_id") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Double]("credit"),
          r.getAs[Double]("value_credit")))).toMap
    assert(got.keySet == Set(2L, 3L), s"wrong touch set: $got")
    assert(got(2L) == ((2L, 0.25, 20.0)))
    assert(got(3L) == ((2L, 0.75, 60.0)))
  }

  test("q187 classes partition the table and k_dataset is the min class size") {
    val rows = SparkEntry.queries("q187_k_anonymity")(
        spark, TestSpark.sf0001).collect()
      .map(r => (r.getAs[Long]("class_size"), r.getAs[Boolean]("violates_k5"),
        r.getAs[Long]("k_dataset")))
    val total = Tables.customer(spark, TestSpark.sf0001).count()
    assert(rows.map(_._1).sum == total, "classes must partition every row")
    val kmin = rows.map(_._1).min
    assert(rows.forall(_._3 == kmin))
    rows.foreach { case (n, v, _) => assert(v == (n < 5)) }
    assert(rows.exists(_._2),
      "fixture yields no k<5 class — audit untested (coarsen buckets?)")
  }
}
