package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The integer pair-noise kernel (Mix60Kernel / PairMix60): the Java
  * wraparound arithmetic vs an exact BigInt mod-2^64 model of splitmix64 —
  * the same model the DuckDB oracle dual implements in HUGEINT SQL
  * (VecOps.mix60ColsSql), so kernel==model here plus oracle==model in the
  * driver gate closes the triangle. */
class Mix60Spec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val M64 = BigInt(1) << 64

  private def uc(c: Long): BigInt = BigInt(c) & (M64 - 1)

  /** splitmix64((seed + a·C1 + b·C2) mod 2^64) >> 4, in exact BigInt. */
  private def model(seed: Long, a: Long, b: Long): Long = {
    def mix(z0: BigInt): BigInt = {
      var z = z0 % M64
      z = ((z ^ (z >> 30)) * uc(Mix60Kernel.M1)) % M64
      z = ((z ^ (z >> 27)) * uc(Mix60Kernel.M2)) % M64
      z ^ (z >> 31)
    }
    val z0 = (uc(seed) + BigInt(a) * uc(Mix60Kernel.C1) + BigInt(b) * uc(Mix60Kernel.C2)) % M64
    (mix(z0) >> 4).toLong
  }

  private val rnd = new Random(42)
  private val seed = VecOps.seed60("spec")
  private val pairs: Seq[(Long, Long)] =
    Seq.tabulate(500)(i => (i.toLong, (i * 7 % 97).toLong)) ++
      Seq.fill(500)((rnd.nextLong(1L << 62), rnd.nextLong(1L << 62)))

  test("kernel matches the BigInt mod-2^64 splitmix64 model") {
    for ((a, b) <- pairs)
      assert(Mix60Kernel.mix60(seed, a, b) == model(seed, a, b), s"($a, $b)")
  }

  private def run(): Seq[Long] =
    pairs.toDF("a", "b")
      .select(NativeExprs.mix60(seed, col("a"), col("b"))).as[Long].collect().toSeq

  test("PairMix60 expression matches the kernel (codegen)") {
    assert(run() == pairs.map { case (a, b) => Mix60Kernel.mix60(seed, a, b) })
  }

  test("PairMix60 matches under interpreted eval (NO_CODEGEN)") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(run() == pairs.map { case (a, b) => Mix60Kernel.mix60(seed, a, b) })
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("pairGumbel is finite and the underlying u01 stays inside (0,1)") {
    val gs = pairs.toDF("a", "b")
      .select(VecOps.pairGumbel(seed, col("a"), col("b"))).as[Double].collect()
    assert(gs.forall(g => !g.isNaN && !g.isInfinite))
    // 60-bit output range: u01 = (h+0.5)/2^60 can never reach 0 or 1
    val hs = pairs.map { case (a, b) => Mix60Kernel.mix60(seed, a, b) }
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    // and the stream actually spreads: no more than 1% collisions over 1000
    assert(hs.distinct.size > 990)
  }
}
