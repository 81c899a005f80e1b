package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2's inventory is exposed here as a named
  * query over the driver fixtures, with (where SQL-expressible) a DuckDB
  * oracle dual in [[oracleSql]]. Column names and types match between the
  * two — the driver sorts columns by name and hash-compares values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("attention")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-pipeline surface (text / dedup / similarity / streaming /
    * multimodal) and the relational analytics shapes. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MatrixQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ StreamQueries.queries ++
      RelationalQueries.queries ++ SubqueryQueries.queries ++
      MediaQueries.queries ++
      CurationQueries.queries ++ FormatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    MatrixQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ StreamQueries.oracles ++
      RelationalQueries.oracles ++ SubqueryQueries.oracles ++
      MediaQueries.oracles ++
      CurationQueries.oracles ++ FormatQueries.oracles

  /** Headline subset timed by [[Bench]] at sf0.1. */
  def benchQueries: Seq[String] = queries.keys.toSeq.sorted
}
