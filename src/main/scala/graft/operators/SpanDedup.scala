package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeExprs, VecOps}

/** Duplicated-SPAN detection — the "exact substring dedup" signal: for every
  * document, how much of it is covered by ≥W-token runs that appear verbatim
  * in OTHER documents. Document-level LSH can't see this (a clean doc that
  * embeds one boilerplate paragraph still hashes unique); span coverage is
  * the per-doc filter signal large-scale dedup pipelines act on.
  *
  * Spark shape, sized for 100 TB:
  *   1. stride-1 window hashes per doc via the codegen'd
  *      `graft_ngram_hashes` kernel — map-only, one row per token;
  *   2. cross-doc duplicated hashes = groupBy(hash) with a partial-agg
  *      count-distinct(doc) — never a doc×doc pair join, so a span shared
  *      by a million documents costs a count, not 10¹² pairs;
  *   3. positions of duplicated windows shuffle back on hash (equi-join)
  *      and reduce per doc through ONE ordered window pass that merges
  *      overlapping [p, p+W) intervals into islands (gaps-and-islands) —
  *      exact covered-token counts, not window counts.
  *
  * All arithmetic is integer (positions, token counts), so the DuckDB
  * oracle hash-compare is exact; the only double is the final coverage
  * fraction, quantized identically in both engines.
  */
object SpanDedup {

  /** span window width in tokens: wide enough that shared idioms don't
    * flag, narrow enough to catch lifted sentences. */
  val W = 12

  /** drop threshold on the covered-token fraction. */
  val MaxDupFrac = 0.3

  private def winHashes(toks: Column): Column = NativeExprs.ngramHashes(toks, W)

  /** Per document: token/window counts, windows duplicated cross-doc,
    * exact duplicated-token coverage (interval union), coverage fraction,
    * and the keep decision. Every input doc appears (clean docs with
    * zeros). */
  def spanCoverage(docs: DataFrame): DataFrame =
    // corpus-linear tokenize+hash work: fan out few-split inputs
    spanCoverageFromToks(
      PairPlan.fanOut(docs)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks")))

  /** [[spanCoverage]] over an already-tokenized (doc_id, toks) corpus —
    * the shared-tokenize entry for composed pipelines. The window table
    * feeds THREE plan references (dup counts, the join-back, and base
    * stats ride the same tokenize) — cache it so the corpus is
    * tokenized+hashed once, not per reference (the same sized-band-table
    * pattern the LSH path uses; at 100 TB this is a persisted artifact) */
  def spanCoverageFromToks(toks: DataFrame): DataFrame = {
    val base = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      greatest(size(col("toks")) - lit(W - 1), lit(1)).cast("long")
        .as("n_windows"))
    val wins = toks.select(col("doc_id"),
      posexplode(winHashes(col("toks"))).as(Seq("p", "h")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("h"))
    // a window is duplicated iff its hash occurs in >= 2 distinct docs
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("h"))
    val marked = wins.join(dup, "h").select(col("doc_id"), col("p"))
    Caching.scoped(wins)(coverage(base, marked))
  }

  /** Shared island-merge core: `base` = per-doc (doc_id, n_tokens,
    * n_windows, + any carry columns), `marked` = duplicated window start
    * positions (doc_id, p). Gaps-and-islands — a new island starts when
    * the previous duplicated window can no longer touch this one
    * (p − prev > W) — then exact covered-token counts per doc. */
  private def coverage(base: DataFrame, marked: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val islands = marked
      .withColumn("brk",
        when(lag(col("p"), 1).over(byDoc).isNull ||
          col("p") - lag(col("p"), 1).over(byDoc) > W, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(count(lit(1)).as("nw"), min(col("p")).as("p0"),
        max(col("p")).as("p1"))
    val perDoc = islands.join(base.select(col("doc_id"), col("n_tokens")),
        "doc_id")
      // island coverage: [p0, min(p1 + W, n_tokens)) — the n_tokens clamp
      // makes the short-doc single full-text window cover exactly the doc
      .groupBy(col("doc_id"))
      .agg(sum(col("nw")).as("dup_windows"),
        sum(least(col("p1") + lit(W), col("n_tokens")) - col("p0"))
          .as("covered"))
    val frac = VecOps.qround(
      coalesce(col("covered"), lit(0L)).cast("double") /
        greatest(col("n_tokens"), lit(1L)).cast("double"), 4)
    base.join(perDoc, Seq("doc_id"), "left")
      .withColumn("dup_windows", coalesce(col("dup_windows"), lit(0L)))
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .withColumn("dup_frac", frac)
      .withColumn("keep", frac < lit(MaxDupFrac))
      .drop("nw", "p0", "p1")
  }

  /** INGEST-time span dedup — the incremental path (the span analog of
    * the MinHash `dedup_incremental` and the Bloom prefilter): the
    * existing corpus is reduced to its DISTINCT window-hash set (the
    * persisted span index — at 100 TB an append-only hash table; new
    * batches extend it with their own hashes after admission), and an
    * arriving batch's windows are marked by ONE equi-join against it —
    * the corpus text is never re-tokenized per batch. Per-lang admission
    * report: a batch doc is blocked when ≥ [[MaxDupFrac]] of its tokens
    * are covered by spans already in the corpus. */
  def spanIngest(corpus: DataFrame, batch: DataFrame): DataFrame = {
    val index = PairPlan.fanOut(corpus)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(explode(winHashes(col("toks"))).as("h"))
      .distinct()
    val toks = PairPlan.fanOut(batch)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
    val base = toks.select(col("doc_id"), col("lang"),
      size(col("toks")).cast("long").as("n_tokens"),
      greatest(size(col("toks")) - lit(W - 1), lit(1)).cast("long")
        .as("n_windows"))
    val marked = toks.select(col("doc_id"),
        posexplode(winHashes(col("toks"))).as(Seq("p", "h")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("h"))
      .join(index, Seq("h"), "left_semi")
      .select(col("doc_id"), col("p"))
    coverage(base, marked)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_batch"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_blocked"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_admitted"))
  }

  /** DuckDB oracle dual of [[spanIngest]] over the parity split of
    * `table` (even = corpus, odd = batch). */
  def ingestOracleSql(table: String): String =
    s"""WITH c AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
       |           FROM $table WHERE doc_id % 2 = 0),
       |idx AS (SELECT DISTINCT
       |          unnest(list_transform(generate_series(1, greatest(len(toks) - ${W - 1}, 1)),
       |            i -> ${VecOps.hash60Sql(s"array_to_string(toks[i:i+${W - 1}], ' ')")})) AS h
       |        FROM c),
       |b AS (SELECT doc_id, lang, ${TextOps.tokensSql("text")} AS toks
       |      FROM $table WHERE doc_id % 2 = 1),
       |d AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens FROM b),
       |w AS (SELECT doc_id,
       |        CAST(unnest(generate_series(1, greatest(len(toks) - ${W - 1}, 1))) - 1 AS BIGINT) AS p,
       |        unnest(list_transform(generate_series(1, greatest(len(toks) - ${W - 1}, 1)),
       |          i -> ${VecOps.hash60Sql(s"array_to_string(toks[i:i+${W - 1}], ' ')")})) AS h
       |      FROM b),
       |m AS (SELECT w.doc_id, w.p FROM w WHERE w.h IN (SELECT h FROM idx)),
       |br AS (SELECT doc_id, p,
       |         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
       |                OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $W
       |              THEN 1 ELSE 0 END AS brk
       |       FROM m),
       |isl AS (SELECT doc_id, p,
       |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |        FROM br),
       |ic AS (SELECT doc_id, isl, min(p) AS p0, max(p) AS p1
       |       FROM isl GROUP BY doc_id, isl),
       |cv AS (SELECT ic.doc_id,
       |         CAST(sum(least(p1 + $W, d.n_tokens) - p0) AS BIGINT) AS covered
       |       FROM ic JOIN d USING (doc_id) GROUP BY ic.doc_id),
       |pd AS (SELECT d.doc_id, d.lang,
       |         ${VecOps.qroundSql("COALESCE(cv.covered, 0)::DOUBLE / greatest(d.n_tokens, 1)::DOUBLE", 4)}
       |           < $MaxDupFrac AS keep
       |       FROM d LEFT JOIN cv ON cv.doc_id = d.doc_id)
       |SELECT lang, count(*) AS n_batch,
       |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_blocked,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
       |FROM pd GROUP BY lang""".stripMargin

  /** DuckDB oracle dual of [[spanCoverage]] (same tokens, hash stream,
    * island logic). */
  def oracleSql(table: String): String =
    s"""WITH t AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM $table),
       |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |        CAST(greatest(len(toks) - ${W - 1}, 1) AS BIGINT) AS n_windows
       |      FROM t),
       |w AS (SELECT doc_id,
       |        CAST(unnest(generate_series(1, greatest(len(toks) - ${W - 1}, 1))) - 1 AS BIGINT) AS p,
       |        unnest(list_transform(generate_series(1, greatest(len(toks) - ${W - 1}, 1)),
       |          i -> ${VecOps.hash60Sql(s"array_to_string(toks[i:i+${W - 1}], ' ')")})) AS h
       |      FROM t),
       |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |m AS (SELECT w.doc_id, w.p FROM w JOIN dup USING (h)),
       |br AS (SELECT doc_id, p,
       |         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
       |                OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $W
       |              THEN 1 ELSE 0 END AS brk
       |       FROM m),
       |isl AS (SELECT doc_id, p,
       |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |        FROM br),
       |ic AS (SELECT doc_id, isl, count(*) AS nw, min(p) AS p0, max(p) AS p1
       |       FROM isl GROUP BY doc_id, isl),
       |cv AS (SELECT ic.doc_id,
       |         CAST(sum(nw) AS BIGINT) AS dup_windows,
       |         CAST(sum(least(p1 + $W, d.n_tokens) - p0) AS BIGINT) AS covered
       |       FROM ic JOIN d USING (doc_id) GROUP BY ic.doc_id)
       |SELECT d.doc_id, d.n_tokens, d.n_windows,
       |  COALESCE(cv.dup_windows, 0) AS dup_windows,
       |  COALESCE(cv.covered, 0) AS covered,
       |  ${VecOps.qroundSql("COALESCE(cv.covered, 0)::DOUBLE / greatest(d.n_tokens, 1)::DOUBLE", 4)} AS dup_frac,
       |  ${VecOps.qroundSql("COALESCE(cv.covered, 0)::DOUBLE / greatest(d.n_tokens, 1)::DOUBLE", 4)} < $MaxDupFrac AS keep
       |FROM d LEFT JOIN cv ON cv.doc_id = d.doc_id""".stripMargin
}
