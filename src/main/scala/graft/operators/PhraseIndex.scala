package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over the corpus — the "grep the training set"
  * tool (infini-gram-style): positional posting lists + a relational
  * adjacency join, instead of a per-document scan per query.
  *
  * A phrase t₀ t₁ … t_{L-1} matches document d at position s iff the
  * posting (t_i, d, s+i) exists for every i. Rewriting pos − i = s turns
  * that into ONE equi-join and ONE aggregation:
  *
  *   postings ⋈_term phraseTerms → (phrase, doc, start = pos − i)
  *   group by (phrase, doc, start): full match ⇔ row count = phrase length
  *
  * (each posting row is unique per (doc, pos), so per (phrase, doc,
  * start) every i contributes at most one row — plain count(*) equals
  * count(DISTINCT i), no distinct aggregation needed; a phrase with a
  * REPEATED term joins one posting to several i's, which land on
  * DIFFERENT starts and still count correctly).
  *
  * 100 TB shape: posting construction is map-only over the corpus scan;
  * the phrase-term side is tiny and broadcast, so the only shuffle
  * carries candidate rows — postings whose term occurs in some query
  * phrase — not the corpus. [[indexedMatches]] is the serve-many path:
  * postings persisted once as parquet partitioned by a term-hash bucket,
  * and each query batch's scan is partition-pruned (DPP against the
  * broadcast phrase buckets) to the buckets its terms hash into —
  * the un-probed 97% of a 64-bucket index is never read.
  */
object PhraseIndex {

  /** Term-hash partition count for the persisted layout: bounded (a
    * parquet directory per bucket, never per term — vocabulary is
    * unbounded at corpus scale) while still pruning ~63/64 of the index
    * for a few-term phrase batch. */
  val Buckets = 64

  /** Positional posting list (term, doc_id, pos) — map-only. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("col").as("term"), col("doc_id"),
        col("pos").cast("long").as("pos"))

  /** (phrase_id, plen, i, term): each phrase tokenized with the SAME
    * tokenizer as the corpus (a phrase query is text too). */
  def phraseTerms(phrases: DataFrame): DataFrame =
    phrases
      .select(col("phrase_id"), TextOps.tokens(col("phrase")).as("toks"))
      .select(col("phrase_id"), size(col("toks")).cast("long").as("plen"),
        posexplode(col("toks")))
      .select(col("phrase_id"), col("plen"), col("pos").cast("long").as("i"),
        col("col").as("term"))

  /** All (phrase_id, doc_id, start) full matches of `phrases` in the
    * posting list. */
  def matchesFromPostings(post: DataFrame, phrases: DataFrame,
                          joinKeys: Seq[String] = Seq("term")): DataFrame = {
    // the term guard is semantically a no-op (the tokenizer never emits
    // empty tokens) but load-bearing for the bucketed layout: Spark's
    // PartitionPruning rule only inserts a DPP filter when the build side
    // has a selective predicate, and a filter on the pre-explode phrase
    // table gets eagerly folded into the LocalRelation — a filter on the
    // GENERATED term column survives above the Generate and qualifies
    val pt = phraseTerms(phrases).where(length(col("term")) > 0)
    val keyed =
      if (joinKeys.contains("tbucket")) pt.withColumn("tbucket", bucketOf(col("term")))
      else pt
    post.join(broadcast(keyed), joinKeys)
      .select(col("phrase_id"), col("doc_id"),
        (col("pos") - col("i")).as("start"), col("plen"))
      .where(col("start") >= 0)
      // plen is functionally determined by phrase_id — riding it in the
      // grouping key costs nothing and avoids a first() aggregate
      .groupBy(col("phrase_id"), col("doc_id"), col("start"), col("plen"))
      .agg(count(lit(1)).as("nf"))
      .where(col("nf") === col("plen"))
      .select(col("phrase_id"), col("doc_id"), col("start"))
  }

  /** One-shot phrase search: corpus → postings → matches, single pass. */
  def matches(docs: DataFrame, phrases: DataFrame): DataFrame =
    matchesFromPostings(postings(docs), phrases)

  /** Spark-internal bucketing hash — the layout is engine-private (only
    * match RESULTS are oracle-graded), so no cross-engine dual needed.
    * INT, not LONG: parquet partition-column inference reads the directory
    * values back as int, and a type mismatch would put a cast on the scan
    * side of the probe join — which blocks DPP (asserted in
    * PhraseIndexSpec). */
  private def bucketOf(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(Buckets.toLong)).cast("int")

  /** Serve-many path: postings written once, partitioned by term-hash
    * bucket; the query batch reads back only its own buckets (DPP). */
  def indexedMatches(docs: DataFrame, phrases: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val path = graft.sources.Scratch.dir("graft_phrase_index")
    postings(docs).withColumn("tbucket", bucketOf(col("term")))
      .write.mode("overwrite").partitionBy("tbucket").parquet(path)
    matchesFromPostings(spark.read.parquet(path), phrases,
      joinKeys = Seq("tbucket", "term"))
  }

  /** Per-phrase rollup (every phrase keeps a row — a zero-hit phrase is
    * an answer, not an absence): n_docs, n_hits, first matching doc. */
  def phraseStats(m: DataFrame, phrases: DataFrame): DataFrame =
    phrases.select(col("phrase_id")).join(
      m.groupBy(col("phrase_id")).agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_hits"),
        min(col("doc_id")).as("first_doc")),
      Seq("phrase_id"), "left")
      .select(col("phrase_id"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("first_doc"), lit(-1L)).as("first_doc"))
}
