package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Salting must be join-neutral (identical rows to the plain join) while
  * actually spreading hot keys over r sub-partitions — both properties
  * checked directly, not via downstream aggregates. */
class SaltedJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val R = 8

  private def sides() = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = ev.groupBy(col("event_type")).agg(count(lit(1)).as("type_n"))
    (ev, dim)
  }

  test("salted join == plain join, row for row") {
    val (ev, dim) = sides()
    val salted = SaltedJoin.join(ev, dim, Seq("event_type"), col("event_id"), R)
      .select(col("event_id"), col("event_type"), col("type_n"))
    val plain = ev.join(dim, "event_type")
      .select(col("event_id"), col("event_type"), col("type_n"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("each hot key is spread over all r salt values") {
    val (ev, _) = sides()
    // rebuild the salted big side exactly as the operator does
    val spread = ev
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(R.toLong)))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("__salt")).as("n_salts"))
      .agg(min(col("n_salts"))).head().getLong(0)
    // every type has ~400 rows at sf0.001 — xxhash64 spread makes missing
    // one of 8 salts astronomically unlikely; == R is the point of salting
    assert(spread == R, s"hot key hit only $spread of $R salt partitions")
  }
}
