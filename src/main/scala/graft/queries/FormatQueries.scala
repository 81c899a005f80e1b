package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.sources.Tables

/** Source/sink format coverage: the deployable write path (partitioned
  * parquet sink with a partition-pruned read-back) and non-parquet sources
  * (JSON lines, CSV) read with pinned schemas. Each query round-trips
  * fixture data through the format and aggregates the read-back side, so
  * the DuckDB oracle (running on the original parquet) grades the whole
  * write→read path, not just the final agg.
  *
  * 100 TB notes: `partitionBy(lang)` is the layout that makes
  * language-sliced corpus reads partition-pruned scans (verified here —
  * the read-back filter never touches other languages' files); schema is
  * always pinned explicitly on JSON/CSV (inference is a full extra pass at
  * scale, and silently wrong on empty/skewed splits).
  */
object FormatQueries {

  /** Write `documents` partitioned by lang, read back ONLY lang='en' (a
    * partition-pruned scan of the sunk layout), aggregate per source. */
  private def docsSinkPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_docs_part")
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    spark.read.parquet(out)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  private val docsSinkOracle =
    """SELECT source, count(*) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin

  /** Events round-tripped through JSON lines (the landing-zone format):
    * write a typed projection, read back with the schema pinned, agg. */
  private def eventsJsonSource(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_events_json")
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").json(out)
    spark.read.schema(ev.schema).json(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        VecOps.qround(sum(col("value")), 4).as("total"))
  }

  private val eventsJsonOracle =
    s"""SELECT event_type, count(*) AS n,
       |       ${VecOps.qroundSql("sum(value)", 4)} AS total
       |FROM events GROUP BY event_type""".stripMargin

  /** Schema evolution across parquet batches: an early batch wrote only
    * (doc_id, lang); a later batch added (source, n_chars). `mergeSchema`
    * reconciles the footers by NAME and nulls the missing columns — the
    * read path every long-lived 100 TB dataset eventually needs (columns
    * get added; old files are never rewritten). mergeSchema costs a
    * footer read per file at planning time, so it's an opt-in here and at
    * scale (pin the merged schema once discovery has run). Split is
    * deterministic (doc_id parity); the aggregation counts each batch's
    * rows through the null pattern the merge produced. */
  private def docsSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_docs_evo")
    val d = Tables.documents(spark, dir)
    d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/batch=0")
    d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .write.mode("append").parquet(s"$out/batch=1")
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("source")).as("n_with_source"),
        sum(coalesce(col("n_chars"), lit(0L))).as("chars_late"))
  }

  private val docsSchemaEvolutionOracle =
    """SELECT lang, count(*) AS n,
      |  count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_with_source,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS chars_late
      |FROM documents GROUP BY lang""".stripMargin

  /** Lineitem round-tripped through CSV with a pinned schema, then the
    * TPC-H Q1 grouping — doubles survive the text round-trip exactly
    * (Spark writes shortest-round-trip representations). */
  private def lineitemCsvSource(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_lineitem_csv")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
    li.write.mode("overwrite").option("header", "true").csv(out)
    spark.read.schema(li.schema).option("header", "true").csv(out)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        VecOps.qround(sum(col("l_quantity")), 2).as("sum_qty"),
        VecOps.qround(sum(col("l_extendedprice")), -2).as("sum_price"))
  }

  private val lineitemCsvOracle =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |       ${VecOps.qroundSql("sum(l_quantity)", 2)} AS sum_qty,
       |       ${VecOps.qroundSql("sum(l_extendedprice)", -2)} AS sum_price
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Events round-tripped through ORC (the other columnar format Spark
    * ships a native vectorized reader for): typed projection written and
    * read back, then the same per-type aggregate as the JSON path — the
    * oracle grades the full write→read→agg trip against the original
    * parquet. */
  private def eventsOrcSource(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_events_orc")
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").orc(out)
    spark.read.schema(ev.schema).orc(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        VecOps.qround(sum(col("value")), 4).as("total"))
  }

  /** Bucketed co-located join — the layout that kills the per-query
    * shuffle: orders and lineitem written `bucketBy(8, orderkey)` +
    * `sortBy` as external tables, then joined on the bucket key. Both
    * sides expose the SAME 8-bucket hash partitioning, so the sort-merge
    * join needs NO Exchange on either side (proved in BucketedJoinSpec
    * with broadcast disabled) — at 100 TB this is the amortize-one-shuffle-
    * at-write-time pattern for every repeated fact⋈fact join. Graded on
    * revenue per order status through the bucketed layout vs the plain
    * parquet oracle. */
  private def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.Scratch.dir("graft_bucketed")
    def writeBucketed(df: DataFrame, name: String, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite")
        .bucketBy(8, key).sortBy(key)
        .option("path", s"$base/$name")
        .saveAsTable(name)
    }
    writeBucketed(Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus")), "g_orders_b", "o_orderkey")
    writeBucketed(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "g_lineitem_b", "l_orderkey")
    spark.table("g_lineitem_b")
      .join(spark.table("g_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        VecOps.qround(
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), -2)
          .as("revenue"))
  }

  private val bucketedJoinOracle =
    s"""SELECT o_orderstatus, count(*) AS n,
       |  ${VecOps.qroundSql("sum(l_extendedprice * (1.0 - l_discount))", -2)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderstatus""".stripMargin

  /** Range-clustered data layout — the OTHER write-time layout lever next
    * to [[bucketedJoin]]'s hash buckets: `repartitionByRange(n_chars)` +
    * `sortWithinPartitions` writes files whose per-file (and per-row-group)
    * n_chars min/max ranges are DISJOINT, so a range predicate on the
    * read-back skips whole files from the parquet footer statistics alone
    * (Z-order's 1-D special case; at 100 TB this is how time- or
    * size-sliced scans avoid touching the rest of the corpus — proved
    * file-level in RangeLayoutSpec). The graded query runs the full
    * write→filtered-read→agg trip against the unclustered oracle. */
  private def docsLayoutRange(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_docs_range")
    Tables.documents(spark, dir)
      .repartitionByRange(8, col("n_chars"), col("doc_id"))
      .sortWithinPartitions(col("n_chars"), col("doc_id"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .filter(col("n_chars") >= 200 && col("n_chars") < 400)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  private val docsLayoutRangeOracle =
    """SELECT lang, count(*) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE n_chars >= 200 AND n_chars < 400
      |GROUP BY lang""".stripMargin

  /** 2-D Z-ORDER layout round trip: documents clustered on the Morton
    * code of (n_chars, doc_id), read back through a 2-D box predicate —
    * footer stats prune files on BOTH dimensions (proved file-level in
    * ZOrderLayoutSpec; `docs_layout_range` is the 1-D special case). */
  private def docsLayoutZ(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir("graft_docs_z")
    graft.operators.ZOrder.writeClustered(
      Tables.documents(spark, dir), col("n_chars"), col("doc_id"), out, 8)
    spark.read.parquet(out)
      .filter(col("n_chars") >= 200 && col("n_chars") < 400 &&
        col("doc_id") >= 100 && col("doc_id") < 400)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  private val docsLayoutZOracle =
    """SELECT lang, count(*) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE n_chars >= 200 AND n_chars < 400
      |  AND doc_id >= 100 AND doc_id < 400
      |GROUP BY lang""".stripMargin

  /** SMALL-FILE COMPACTION — the table-maintenance verb that keeps a
    * long-lived dataset readable: a fragmented write (64 tiny files here;
    * in production, thousands of streaming micro-batch deltas — exactly
    * what `docs_ingest_stream`'s per-batch sinks accumulate) is rewritten
    * into size-targeted files, planned count = ⌈logical_bytes / target⌉.
    * Both halves are graded: the Spark side reports the MEASURED part-file
    * counts of the fragmented and compacted layouts off the filesystem
    * plus content aggregates over the compacted read-back; the oracle
    * recomputes the EXPECTED counts from the same deterministic size
    * stats — so a compaction that misses its file-count plan or drops a
    * row hash-mismatches. repartitionByRange(doc_id) keeps the compacted
    * files range-clustered (the `docs_layout_range` property), so
    * compaction also restores file-skipping, not just file counts.
    *
    * The measured count is graded as `files_match_plan` with a −1
    * tolerance rather than as a raw equality: repartitionByRange picks
    * boundaries by SAMPLING, and a range left empty by a misestimate
    * writes no file, so on an unlucky fixture the measured count can
    * legitimately land one under the plan (r6 ADVICE #1) — that is the
    * partitioner's documented contract, not a compaction bug. */
  private val CompactTargetChars = 50000L
  private val FragFiles = 64

  private def partFiles(p: String): Long =
    new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).toLong

  private def docsCompact(spark: SparkSession, dir: String): DataFrame = {
    val frag = graft.sources.Scratch.dir("graft_docs_frag")
    val comp = graft.sources.Scratch.dir("graft_docs_comp")
    Tables.documents(spark, dir)
      .repartition(FragFiles).write.mode("overwrite").parquet(frag)
    val back = spark.read.parquet(frag)
    val totalChars = back.agg(sum(col("n_chars"))).head().getLong(0)
    val nOut =
      ((totalChars + CompactTargetChars - 1) / CompactTargetChars).toInt
    back.repartitionByRange(nOut, col("doc_id"))
      .write.mode("overwrite").parquet(comp)
    val measured = partFiles(comp)
    spark.read.parquet(comp)
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
        sum(col("doc_id")).as("sum_ids"))
      .select(lit(partFiles(frag)).as("n_files_before"),
        lit(nOut.toLong).as("n_files_planned"),
        lit(measured >= nOut - 1 && measured <= nOut)
          .as("files_match_plan"),
        col("n_rows"), col("sum_chars"), col("sum_ids"))
  }

  private val docsCompactOracle =
    s"""WITH s AS (SELECT count(*) AS n_rows, sum(n_chars) AS sum_chars,
       |             sum(doc_id) AS sum_ids
       |           FROM documents)
       |SELECT CAST($FragFiles AS BIGINT) AS n_files_before,
       |       CAST((sum_chars + ${CompactTargetChars - 1}) // $CompactTargetChars AS BIGINT) AS n_files_planned,
       |       TRUE AS files_match_plan,
       |       n_rows, CAST(sum_chars AS BIGINT) AS sum_chars,
       |       CAST(sum_ids AS BIGINT) AS sum_ids
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "docs_compact" -> docsCompact _,
    "docs_sink_partitioned" -> docsSinkPartitioned _,
    "events_json_source" -> eventsJsonSource _,
    "lineitem_csv_source" -> lineitemCsvSource _,
    "events_orc_source" -> eventsOrcSource _,
    "docs_schema_evolution" -> docsSchemaEvolution _,
    "bucketed_join" -> bucketedJoin _,
    "docs_layout_range" -> docsLayoutRange _,
    "docs_layout_z" -> docsLayoutZ _
  )

  val oracles: Map[String, String] = Map(
    "docs_compact" -> docsCompactOracle,
    "docs_sink_partitioned" -> docsSinkOracle,
    "events_json_source" -> eventsJsonOracle,
    "lineitem_csv_source" -> lineitemCsvOracle,
    "events_orc_source" -> eventsJsonOracle, // same agg, same source table
    "docs_schema_evolution" -> docsSchemaEvolutionOracle,
    "bucketed_join" -> bucketedJoinOracle,
    "docs_layout_range" -> docsLayoutRangeOracle,
    "docs_layout_z" -> docsLayoutZOracle
  )
}
