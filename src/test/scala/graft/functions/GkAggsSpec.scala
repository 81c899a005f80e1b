package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GkOps._

/** GK sketch shard→merge surface ([[GkSketchAgg]]/[[GkMergeAgg]]/
  * [[GkQuery]]): serialization round-trips, the union-merge answers within
  * the compounded rank bound, and empty states behave.
  */
class GkAggsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val Eps = 0.01

  /** exact rank interval [count(<x)+1, count(≤x)] of x in xs. */
  private def rankIv(xs: Seq[Double], x: Double): (Long, Long) =
    (xs.count(_ < x).toLong + 1, xs.count(_ <= x).toLong)

  private def intersects(iv: (Long, Long), target: Double, tol: Double,
                         n: Long): Boolean =
    iv._1 <= target * n + tol * n + 1 && iv._2 >= target * n - tol * n - 1

  test("one-shot sketch answers within the ε rank bound") {
    val xs = (1 to 20000).map(_.toDouble)
    val df = xs.toDF("v")
    val q = df.agg(gkQuery(gkSketch(col("v"), Eps), 0.9).as("q"))
      .head.getDouble(0)
    assert(intersects(rankIv(xs, q), 0.9, Eps, xs.size))
  }

  test("sharded sketches union-merge within the 2ε rank bound at every p") {
    val xs = (1 to 20000).map(i => (i % 7).toLong -> i.toDouble)
    val df = xs.toDF("shard", "v")
    val per = df.groupBy(col("shard")).agg(gkSketch(col("v"), Eps).as("sk"))
    val row = per.agg(
      gkQuery(gkMerge(col("sk")), 0.5).as("m50"),
      gkQuery(gkMerge(col("sk")), 0.99).as("m99")).head
    val vs = xs.map(_._2)
    assert(intersects(rankIv(vs, row.getDouble(0)), 0.5, 2 * Eps, vs.size))
    assert(intersects(rankIv(vs, row.getDouble(1)), 0.99, 2 * Eps, vs.size))
  }

  test("serialization round-trip preserves count and answers") {
    var qs = new org.apache.spark.sql.catalyst.util.QuantileSummaries(
      org.apache.spark.sql.catalyst.util.QuantileSummaries.defaultCompressThreshold,
      Eps)
    (1 to 5000).foreach(i => qs = qs.insert(i.toDouble))
    val rt = GkSer.fromBytes(GkSer.toBytes(qs))
    assert(rt.count === 5000L)
    assert(rt.query(0.5) === GkSer.compressed(qs).query(0.5))
  }

  test("all-null shard column merges to null; gkQuery propagates null") {
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("g", "sk")
    val r = df.groupBy(col("g"))
      .agg(gkQuery(gkMerge(col("sk")), 0.5).as("q")).head
    assert(r.isNullAt(1))
  }

  test("null values are skipped, not inserted") {
    val df = Seq(Some(1.0), None, Some(3.0), Some(2.0)).toDF("v")
    val q = df.agg(gkQuery(gkSketch(col("v"), Eps), 1.0).as("q"))
      .head.getDouble(0)
    assert(q === 3.0)
  }
}
