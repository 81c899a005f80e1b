package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.operators.Attention
import graft.sources.Tables

/** Driver-facing queries over the `embeddings` fixture for the reference's
  * five kernel operators (SURVEY.md §2.2), each with a DuckDB oracle dual.
  *
  * Shapes: M (query rows) is capped at 256 so the oracle stays cheap while
  * N (the streamed/reduced axis) scales with the fixture — the axis that
  * grows at 100 TB is the one our plans stream, never collect.
  */
object MatrixQueries {

  private val M = 256 // query-side rows (reference benches M=1024; sf0.01 has 500)
  private val D = 8   // value dims exposed through the oracle

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  private def qSide(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < M)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"), col("label"))

  private def kvSide(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id").as("k_id"), col("vec").as("kvec"),
      slice(col("vec"), 1, D).as("vvec"))

  private def attentionQuery(scale: Boolean)(s: SparkSession, dir: String): DataFrame =
    Attention.attention(qSide(s, dir).drop("label"), kvSide(s, dir), scale)
      .select(col("q_id"), posexplode(col("out")))
      .select(col("q_id"), col("pos").cast("long").as("d"),
        VecOps.qround(col("col"), 4).as("v"))

  // ---- oracle SQL builders (DuckDB dialect; two-pass stable softmax) ----

  private def attentionOracle(scaleExpr: String): String = {
    val v = VecOps.qroundSql("sum(wt * x) / sum(wt)", 4)
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $M),
       |k AS (SELECT embedding::DOUBLE[] AS kv, (embedding::DOUBLE[])[1:$D] AS vv FROM embeddings),
       |s AS (SELECT q_id, list_dot_product(qv, kv)$scaleExpr AS sc, vv FROM q CROSS JOIN k),
       |m AS (SELECT q_id, max(sc) AS mx FROM s GROUP BY q_id),
       |w AS (SELECT s.q_id, exp(sc - mx) AS wt, vv FROM s JOIN m USING (q_id)),
       |e AS (SELECT q_id, d, wt, vv[d] AS x
       |      FROM w CROSS JOIN (SELECT unnest(generate_series(1, $D)) AS d) ds)
       |SELECT q_id, CAST(d - 1 AS BIGINT) AS d, $v AS v
       |FROM e GROUP BY q_id, d""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attention" -> attentionQuery(scale = false),
    "sdpa_scaled" -> attentionQuery(scale = true)
  )

  val oracles: Map[String, String] = Map(
    "attention" -> attentionOracle(""),
    "sdpa_scaled" -> attentionOracle(" / sqrt(64.0)")
  )
}
