package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.operators.Decontaminate
import graft.sources.Tables

/** Corpus-curation queries over `documents`: benchmark decontamination,
  * deterministic stratified sampling, and per-language top-k selection —
  * the selection/rebalancing steps between raw crawl and training corpus.
  * All map-only or single-shuffle plans; nothing here collects to the
  * driver or joins two large sides.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Per-language sampling rates in per-mille. Deterministic Bernoulli via
    * the md5 hash stream: a doc is kept iff hash60("strat:" + doc_id) mod
    * 1000 falls under its language's rate — reproducible across engines,
    * machines, and re-runs (no RNG state), and embarrassingly parallel: the
    * 100 TB plan is a filtered scan, no shuffle at all. Down-samples the
    * dominant language (corpus rebalancing), keeps the tail at a higher
    * rate. */
  private val EnRatePm = 100
  private val RestRatePm = 400

  private def stratifiedSample(d: DataFrame): DataFrame = {
    val rate = when(col("lang") === "en", EnRatePm).otherwise(RestRatePm)
    d.filter(
        VecOps.hash60(concat(lit("strat:"), col("doc_id").cast("string")))
          % 1000 < rate)
      .select(col("doc_id"), col("lang"))
  }

  private val stratifiedOracle =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${VecOps.hash60Sql("'strat:' || CAST(doc_id AS VARCHAR)")} % 1000
       |      < CASE WHEN lang = 'en' THEN $EnRatePm ELSE $RestRatePm END""".stripMargin

  /** Top-k documents by length per language — the per-stratum selection
    * shape (best-of-group). The rank window is PARTITIONED (by lang), so
    * at 100 TB each language sorts independently across the cluster; no
    * single-partition window anywhere. */
  private val TopK = 5

  private def topKPerLang(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(desc("n_chars"), col("doc_id"))
    d.select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
  }

  private val topKOracle =
    s"""SELECT lang, doc_id, n_chars, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT lang, doc_id, n_chars,
       |        row_number() OVER (PARTITION BY lang
       |                           ORDER BY n_chars DESC, doc_id) AS rank
       |      FROM documents)
       |WHERE rank <= $TopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // eval-set n-gram leakage flags over the training slice
    "decontaminate" -> ((s, dir) => Decontaminate.flag(docs(s, dir))),
    "sample_stratified" -> ((s, dir) => stratifiedSample(docs(s, dir))),
    "docs_topk_lang" -> ((s, dir) => topKPerLang(docs(s, dir)))
  )

  val oracles: Map[String, String] = Map(
    "decontaminate" -> Decontaminate.flagSql("documents"),
    "sample_stratified" -> stratifiedOracle,
    "docs_topk_lang" -> topKOracle
  )
}
