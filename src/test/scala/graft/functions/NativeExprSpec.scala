package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The codegen'd DotProduct expression vs a plain Scala sequential fold, in
  * both whole-stage-codegen and interpreted (NO_CODEGEN) execution. */
class NativeExprSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(7)
  private val rows: Seq[(Array[Double], Array[Double])] =
    Seq.fill(200)((Array.fill(33)(rnd.nextGaussian()),
      Array.fill(33)(rnd.nextGaussian())))
  private val expected = rows.map { case (a, b) =>
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
  }

  private def run(): Seq[Double] =
    rows.toDF("a", "b").select(VecOps.dot(col("a"), col("b"))).as[Double].collect().toSeq

  test("DotProduct matches the sequential fold (codegen)") {
    assert(run() == expected) // same op order -> bit-exact
  }

  test("DotProduct matches under interpreted eval (NO_CODEGEN)") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(run() == expected)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("declarative logsumexp matches the two-pass closed form per group") {
    val data = (0 until 2000).map(i => (i % 7, rnd.nextGaussian() * 12))
    val got = data.toDF("g", "x")
      .groupBy(col("g")).agg(GraftAggs.logSumExp(col("x")).as("z"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = data.groupBy(_._1).map { case (g, xs) =>
      val vs = xs.map(_._2)
      val mx = vs.max
      g -> (mx + math.log(vs.map(v => math.exp(v - mx)).sum))
    }
    for ((g, z) <- want)
      assert(math.abs(got(g) - z) <= 1e-9 * math.max(1.0, math.abs(z)), s"group $g")
  }

  test("DotProduct is null-safe and truncates to the shorter array") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),
      (null, Array(1.0))
    ).toDF("a", "b")
    val got = df.select(VecOps.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 1.0 * 4.0 + 2.0 * 5.0)
    assert(got(1).isNullAt(0))
  }
}
