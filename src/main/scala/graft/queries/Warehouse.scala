package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Warehouse-maintenance operators over the orders change log: the
  * dimension-history and distribution-profiling ops a lakehouse runs
  * next to the q93 upsert / q95 snapshot-diff family.
  *
  * Both queries keep every window partitioned (SCD2) or two-phase
  * (equi-depth via [[graft.plans.Ranks]]) — no single-partition global
  * window on a fact table at any scale.
  */
object Warehouse {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD2 (slowly-changing-dimension type 2) interval build: treat
    // each customer's order stream as a change log of its priority
    // attribute and derive validity intervals — collapse consecutive
    // identical values (change detection via lag), then
    // [valid_from, valid_to) via lead, open interval = current row.
    // One shuffle by o_custkey: the change-detect window, the filter,
    // and the version/lead window all share the same partitioning, so
    // Catalyst reuses the exchange. Deterministic: (o_orderdate,
    // o_orderkey) is a unique sort key per customer.
    "q113_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_orderpriority"))
        .withColumn("prev_p", lag(col("o_orderpriority"), 1).over(w))
        .filter(col("prev_p").isNull ||
          col("prev_p") =!= col("o_orderpriority"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey"), col("version"),
          col("o_orderpriority").as("priority"),
          col("o_orderdate").as("valid_from"),
          col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }),

    // Equi-depth (equal-frequency) histogram — the quantile complement
    // to q94's equal-width bins, and the profile a cost-based optimizer
    // actually wants (equal-width bins collapse under skew; equi-depth
    // bins track the mass). Exact, not sketched: bin = floor((rank-1)*B
    // / n) over the GLOBAL order — computed with the two-phase
    // range-partitioned rank (plans/Ranks.scala), never a
    // single-partition window. The bin arithmetic stays exact in IEEE:
    // (rank-1)*B and n are exact integers < 2^53 and x/y with x = k*y
    // rounds to exactly k, so the floor cannot flip between engines.
    "q116_equidepth_histogram" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      val ranked = graft.plans.Ranks.withGlobalRanks(o,
        Seq(col("o_totalprice"), col("o_orderkey")),
        Seq(col("o_totalprice"), col("o_orderkey")),
        rankCol = "r", denseCol = "dr")
      val n = o.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(n))
        .withColumn("bin",
          floor((col("r") - 1) * 20.0 / col("n_total")).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("bin_min"),
          round(max(col("o_totalprice")), 2).as("bin_max"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q113_scd2_intervals" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_p
        |  FROM orders),
        |ch AS (
        |  SELECT * FROM c
        |  WHERE prev_p IS NULL OR prev_p <> o_orderpriority)
        |SELECT o_custkey,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  o_orderpriority AS priority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q116_equidepth_histogram" ->
      """WITH r AS (
        |  SELECT o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
        |    count(*) OVER () AS n_total
        |  FROM orders)
        |SELECT CAST(floor((r - 1) * 20.0 / n_total) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS bin_min,
        |  round(max(o_totalprice), 2) AS bin_max
        |FROM r GROUP BY 1""".stripMargin
  )
}
