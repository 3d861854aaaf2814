package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting. A `groupBy(key)` with one hot key sends
  * that key's entire volume to a single reducer; salting splits each
  * key into `saltBuckets` sub-keys for the wide first phase, then
  * merges the per-salt partials — the hot key's work spreads over
  * `saltBuckets` tasks and the second shuffle carries only
  * (#distinct keys x saltBuckets) rows.
  *
  * The salt is derived from stable input columns (hash % buckets), NOT
  * rand(): deterministic under retries and speculative execution —
  * rand() salting can double-count on task re-attempts.
  *
  * (For JOIN skew the engine relies on AQE's skew-join splitting,
  * enabled by default in Spark 4; this utility covers aggregation
  * skew, which AQE does not rebalance.)
  */
object Salting {

  /** Two-phase salted count: groupBy(key, salt).count -> groupBy(key)
    * .sum. Result is EXACTLY groupBy(key).count at any salt factor.
    * `saltFrom` must be stable per row (any column set; need not be
    * unique — more distinct values = better spread).
    */
  def saltedCount(df: DataFrame, key: Column, keyName: String,
                  saltFrom: Seq[Column], saltBuckets: Int = 16,
                  outCol: String = "n"): DataFrame =
    df.select(key.as(keyName),
        pmod(hash(saltFrom: _*), lit(saltBuckets)).as("_graft_salt"))
      .groupBy(col(keyName), col("_graft_salt"))
      .agg(count(lit(1)).as("_graft_partial"))
      .groupBy(col(keyName))
      .agg(sum(col("_graft_partial")).as(outCol))
}
