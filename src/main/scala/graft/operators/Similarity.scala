package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Similarity search over an embedding column: brute-force cosine top-k as
  * the exact baseline, and a random-hyperplane-LSH (sign-LSH) bucketed
  * variant as the scale path — plus embedding near-dup pairs on the same
  * buckets. Generalizes the reference sampler's per-row top-1
  * (sampling.py:14 argmax) to top-k (SURVEY.md §7.2 milestone 4).
  *
  * The hyperplanes are pseudo-random but DETERMINISTIC, derived from the
  * same md5→60-bit→uniform stream as [[VecOps.u01]] with keys
  * `plane:<p>:<d>` — the driver's DuckDB oracle recomputes identical planes
  * from the same formula, so even the ANN bucketing is hash-checkable.
  *
  * Scale: top-k is a pair-scoring join (broadcast query side) into a
  * per-query window rank — the kv axis streams with zero shuffle; the LSH
  * variant replaces the full scan with a bucket equi-join.
  */
object Similarity {

  /** number of hyperplanes (bucket bits) and embedding dimensionality. */
  val P = 8
  val Dim = 64

  /** Scala-side mirror of `u01('plane:p:d') - 0.5`: md5 hex → first 15 hex
    * digits → long → (x+0.5)/2^60 − 0.5. Pure IEEE ops in both engines, so
    * the planes are bit-identical to the oracle's. */
  private def planeComponent(p: Int, d: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane:$p:$d".getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    (v + 0.5) / 1152921504606846976.0 - 0.5
  }

  lazy val planes: IndexedSeq[Array[Double]] =
    (0 until P).map(p => Array.tabulate(Dim)(d => planeComponent(p, d)))

  /** sign-LSH bucket id over the first nPlanes hyperplanes: bit p =
    * [vec · plane_p > 0]. 4 planes → 16 coarse ANN buckets; 8 planes →
    * the near-dup banding signature. */
  def lshBucket(vec: Column, nPlanes: Int = P): Column =
    (0 until nPlanes).map { p =>
      when(VecOps.dot(vec, typedLit(planes(p).toSeq)) > 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** SQL oracle dual of [[lshBucket]] — planes recomputed from the md5
    * formula, never pasted as float literals. */
  def lshBucketSql(vecExpr: String, nPlanes: Int = P): String = {
    def planeSql(p: Int) =
      s"list_transform(generate_series(0, ${Dim - 1}), d -> ${VecOps.u01Sql(s"'plane:$p:' || d")} - 0.5)"
    (0 until nPlanes).map { p =>
      s"(CASE WHEN list_dot_product($vecExpr, ${planeSql(p)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Brute-force cosine top-k: q (q_id, qvec) × kv (k_id, kvec) →
    * (q_id, rank, k_id, cos), rank by (cos desc, k_id) for determinism;
    * self-pairs excluded. */
  def cosineTopK(q: DataFrame, kv: DataFrame, k: Int): DataFrame = {
    val cos = VecOps.cosine(col("qvec"), col("kvec"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("k_id"))
    kv.crossJoin(broadcast(q))
      .filter(col("k_id") =!= col("q_id"))
      .select(col("q_id"), col("k_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("k_id"),
        VecOps.qround(col("cos"), 4).as("cos"))
  }

  /** planes for the coarse ANN bucket (16 buckets). */
  val AnnPlanes = 4

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * sign-LSH bucket (equi-join on bucket id — no full scan), then exact
    * cosine rank within the bucket. */
  def annTopK(q: DataFrame, kv: DataFrame, k: Int): DataFrame = {
    val qb = q.select(col("q_id"), col("qvec"),
      lshBucket(col("qvec"), AnnPlanes).as("bucket"))
    val kb = kv.select(col("k_id"), col("kvec"),
      lshBucket(col("kvec"), AnnPlanes).as("bucket"))
    val cos = VecOps.cosine(col("qvec"), col("kvec"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("k_id"))
    kb.join(broadcast(qb), Seq("bucket"))
      .filter(col("k_id") =!= col("q_id"))
      .select(col("q_id"), col("k_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("k_id"),
        VecOps.qround(col("cos"), 4).as("cos"))
  }

  /** Embedding near-dup pairs: banded sign-LSH (2 bands × 4 planes,
    * OR-construction — a pair is a candidate if EITHER 4-bit band matches,
    * boosting recall at moderate cosine), then exact cosine ≥ minCos.
    * Band equi-join — never all-pairs. */
  def embeddingNearDupPairs(vecs: DataFrame, minCos: Double): DataFrame = {
    // signature table cached (referenced by the band explode and both sides
    // of the verification join); candidate dedup runs on bare id pairs so
    // the distinct never hashes the 64-wide vectors
    val sig = vecs
      .select(col("vec_id"), col("vec"), lshBucket(col("vec"), P).as("sig"))
      .cache()
    val bandCols = (0 until 2).map(b =>
      shiftrightunsigned(col("sig"), 4 * b).bitwiseAND(lit(15L)))
    val bnd = sig
      .select(col("vec_id"), posexplode(array(bandCols: _*)))
      .select(col("vec_id"),
        col("pos").cast("long").as("band"), col("col").as("key"))
    val cand = bnd.as("a").join(bnd.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val cos = VecOps.cosine(col("vec_a"), col("vec_b"))
    cand
      .join(sig.select(col("vec_id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(sig.select(col("vec_id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"), cos.as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), VecOps.qround(col("cos"), 4).as("cos"))
  }
}
