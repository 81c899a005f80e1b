package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{DotProduct, LogSumExpDecl, LogWeightedVecAgg, VecWeightedSumAgg}

/** SQL-surface registration of the native graft functions, so they are
  * callable from `spark.sql(...)` and `selectExpr` exactly like built-ins:
  *
  *   - `graft_dot(a, b)` — codegen'd array<double> dot product
  *   - `graft_log_weighted_vec(score, vec)` — attention/entropy monoid agg
  *   - `graft_vec_weighted_sum(w, vec)` — weighted vector-sum agg
  *
  * Two registration paths:
  *   1. `spark.sql.extensions=graft.GraftExtensions` at session build time
  *      (the standard SparkSessionExtensions plug-in mechanism), or
  *   2. [[GraftExtensions.register]] on an already-running session (e.g. a
  *      driver-owned one the library did not create).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}

object GraftExtensions {

  private[graft] val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      "graft_dot(a, b) - dot product of two array<double> columns",
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_log_weighted_vec",
      "graft_log_weighted_vec(score, vec) - aggregate: struct(z=logsumexp(score), v=softmax-weighted mean of vec)",
      (es: Seq[Expression]) => LogWeightedVecAgg(es(0), es(1))),
    ("graft_vec_weighted_sum",
      "graft_vec_weighted_sum(w, vec) - aggregate: elementwise sum of w*vec",
      (es: Seq[Expression]) => VecWeightedSumAgg(es(0), es(1))),
    ("graft_logsumexp",
      "graft_logsumexp(x) - aggregate: numerically-stable log(sum(exp(x)))",
      (es: Seq[Expression]) => LogSumExpDecl(es(0))),
    ("graft_minhash",
      "graft_minhash(tokens) - K=16 minhash signature of array<string> as array<long>",
      (es: Seq[Expression]) => graft.functions.MinhashSig(es(0))),
    ("graft_simhash",
      "graft_simhash(tokens) - 32-bit SimHash of array<string> as bigint",
      (es: Seq[Expression]) => graft.functions.SimhashSig(es(0))),
    ("graft_sign_sketch",
      "graft_sign_sketch(vec) - 256-bit packed sign sketch of array<double> as array<long>",
      (es: Seq[Expression]) => graft.functions.SignSketch(es(0))),
    ("graft_hamming",
      "graft_hamming(a, b) - hamming distance between two packed array<long> sketches",
      (es: Seq[Expression]) => graft.functions.HammingDist(es(0), es(1))),
    ("graft_dot_f32",
      "graft_dot_f32(a, b) - float32 dot product of two array<float> columns (per-step single-precision rounding)",
      (es: Seq[Expression]) => graft.functions.DotProductFloat(es(0), es(1))),
    ("graft_ngram_hashes",
      "graft_ngram_hashes(tokens, n) - 60-bit hashes of the word n-grams of array<string> as array<long>; n must be an integer literal",
      (es: Seq[Expression]) =>
        graft.functions.NgramHashes(es(0), intLit(es(1), "n"))),
    ("graft_mix60",
      "graft_mix60(seed, a, b) - 60-bit splitmix64 pair hash of two bigint ids under an integer-literal seed",
      (es: Seq[Expression]) =>
        graft.functions.PairMix60(longLit(es(0), "seed"), es(1), es(2)))
  )

  /** plan-time int constant (codebook widths, shingle sizes, seeds live in
    * the expression, not per-row data). */
  private def intLit(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an INTEGER literal, got $other")
  }

  private def longLit(e: Expression, arg: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  /** Idempotent imperative registration into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      ColumnBridge.registerFunction(spark, name, usage, builder)
    }
}
