package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Salting

/** Salting must be result-invisible: the salted forms return EXACTLY
  * the plain groupBy / plain join output on any input — including a
  * pathologically skewed one (the case salting exists for).
  */
class SaltingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key — the shape that melts a reducer
  private def skewed = (1 to 2000).map { i =>
    (i.toLong, if (i % 10 == 0) i.toLong % 7 else 42L)
  }.toDF("row_id", "key")

  test("saltedEquiJoin equals the plain inner join on a skewed key") {
    val dim = (0L to 50L).map(k => (k, s"name_$k")).toDF("dim_key", "dim_name")
    val salted = Salting.saltedEquiJoin(skewed, dim, "key", "dim_key",
        saltFrom = Seq(col("row_id")))
      .select(col("row_id"), col("key"), col("dim_name"))
    val plain = skewed.join(dim, col("key") === col("dim_key"))
      .select(col("row_id"), col("key"), col("dim_name"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedEquiJoin drops big-side rows with no dim match, like inner join") {
    val dim = Seq((42L, "hot")).toDF("dim_key", "dim_name")
    val salted = Salting.saltedEquiJoin(skewed, dim, "key", "dim_key",
      saltFrom = Seq(col("row_id")))
    assert(salted.count() == skewed.filter(col("key") === 42L).count())
  }

  test("saltedEquiJoin resolves when both sides name the key identically") {
    val dim = (0L to 50L).map(k => (k, s"name_$k")).toDF("key", "dim_name")
    val salted = Salting.saltedEquiJoin(skewed, dim, "key", "key",
      saltFrom = Seq(col("row_id")))
    val plain = skewed.join(dim.withColumnRenamed("key", "k2"),
      col("key") === col("k2"))
    assert(salted.count() == plain.count())
  }

  test("saltedCount equals the plain groupBy count") {
    val salted = Salting.saltedCount(skewed, col("key"), "key",
      saltFrom = Seq(col("row_id"), col("key")))
    val plain = skewed.groupBy(col("key")).agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted forms on empty input are empty, not fatal") {
    val none = Seq.empty[(Long, Long)].toDF("row_id", "key")
    val dim = Seq((1L, "x")).toDF("dim_key", "dim_name")
    assert(Salting.saltedEquiJoin(none, dim, "key", "dim_key",
      saltFrom = Seq(col("row_id"))).count() == 0)
    assert(Salting.saltedCount(none, col("key"), "key",
      saltFrom = Seq(col("row_id"))).count() == 0)
  }
}
