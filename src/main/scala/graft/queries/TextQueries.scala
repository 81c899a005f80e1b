package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.VecOps
import graft.operators.TextOps
import graft.sources.Tables

/** Driver-facing text-analysis queries over the `documents` fixture — the
  * text pillar of the LLM-training-data pipeline (the reference has no text
  * surface, SURVEY.md §2.5; these are brief-driven extensions). Every query
  * is per-row map-only — no join, no shuffle — so the 100 TB plan is pure
  * input-split parallelism.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  private val stopList = TextOps.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  private val toksSql = TextOps.tokensSql("text")

  private val textStatsOracle =
    s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       |  len(toks)::BIGINT AS n_tokens,
       |  len(list_distinct(toks))::BIGINT AS n_uniq,
       |  ${VecOps.qroundSql(
             "coalesce(list_sum(list_transform(toks, t -> length(t)::DOUBLE)), 0.0)" +
               " / greatest(len(toks), 1)", 4)} AS mean_tok_len,
       |  ${VecOps.qroundSql(
             s"len(list_filter(toks, t -> list_contains($stopList, t)))::DOUBLE" +
               " / greatest(len(toks), 1)", 4)} AS stopword_ratio
       |FROM d""".stripMargin

  private val textQualityOracle =
    s"""WITH d AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id,
       |  length(text)::BIGINT AS n_chars,
       |  len(toks)::BIGINT AS n_tokens,
       |  ${VecOps.qroundSql(
             "(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE" +
               " / greatest(length(text), 1)", 4)} AS punct_ratio,
       |  ${VecOps.qroundSql(
             s"len(list_filter(toks, t -> list_contains($stopList, t)))::DOUBLE" +
               " / greatest(len(toks), 1)", 4)} AS stopword_ratio
       |  FROM d)
       |SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio,
       |  (n_tokens >= 10 AND punct_ratio < 0.3 AND stopword_ratio < 0.6) AS keep
       |FROM q""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> ((s, dir) => TextOps.textStats(docs(s, dir))),
    "text_quality" -> ((s, dir) => TextOps.textQuality(docs(s, dir))),
    "lang_id" -> ((s, dir) => TextOps.langId(docs(s, dir))),
    "doc_fingerprint" -> ((s, dir) => TextOps.fingerprint(docs(s, dir))),
    "token_count" -> ((s, dir) => TextOps.tokenCount(docs(s, dir)))
  )

  val oracles: Map[String, String] = Map(
    "text_stats" -> textStatsOracle,
    "text_quality" -> textQualityOracle,
    "lang_id" -> TextOps.langIdSql("documents"),
    "doc_fingerprint" -> TextOps.fingerprintSql("documents"),
    "token_count" -> TextOps.tokenCountSql("documents")
  )
}
