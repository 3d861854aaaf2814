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
  * Two forms: [[saltedCount]] for aggregation skew (which AQE does not
  * rebalance) and [[saltedEquiJoin]] for join skew — AQE's skew-join
  * splitting handles most sort-merge cases at runtime, but the manual
  * salt is the portable form when AQE is off, when the skew is known
  * up front, or when the join sits under an operator AQE won't split.
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

  /** Salted inner equi-join: the big (skewed) side gets a stable salt
    * in [0, saltBuckets); the small side is replicated once per salt
    * value (an explode — `saltBuckets`x the small side, which must
    * therefore be dimension-sized); the join runs on (key, salt), so a
    * hot key's rows spread over `saltBuckets` reducers instead of one.
    * Result is EXACTLY the plain inner join — replication never
    * duplicates output because each big-side row matches exactly its
    * own salt's replica.
    *
    * `saltFrom` must be stable per big-side row (same retry-safety rule
    * as [[saltedCount]]).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String,
                     saltFrom: Seq[Column], saltBuckets: Int = 16): DataFrame = {
    val b = big.withColumn("_graft_salt",
      pmod(hash(saltFrom: _*), lit(saltBuckets)))
    val sm = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // qualified key refs: col(...) would be AMBIGUOUS_REFERENCE the
    // moment both sides share the key name (the natural fact⋈dim call)
    b.join(sm,
        b("_graft_salt") === sm("_graft_salt") &&
          b(bigKey) === sm(smallKey))
      .drop("_graft_salt")
  }
}
