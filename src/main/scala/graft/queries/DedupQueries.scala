package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, min}

import graft.operators.Dedup
import graft.sources.Tables

/** Driver-facing deduplication queries over `documents` — exact, MinHash
  * LSH (signatures + candidate pairs), SimHash, and n-gram-Jaccard
  * verification. See [[graft.operators.Dedup]] for the scale rationale
  * (bucketed band joins, never all-pairs).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** ONE clustering pass per session for the whole graded composition
    * (`dedup_clusters` / `_corpus` / `_attribution` / `_chain_audit` /
    * `_corpus_verified` / `_corpus_best` all consume the same default-
    * parameter cluster table — VERDICT r12 #3), and one shingle-set
    * build for the two exact-verification queries. Checkpointed
    * dup-mass-sized tables; Bench restores memo state between same-query
    * runs (see Caching.sessionMemo). */
  private[queries] def clustersMemo(s: SparkSession, dir: String): DataFrame =
    graft.operators.Caching.sessionMemo(s, s"dedup_clusters:$dir")(
      Dedup.dedupClusters(docs(s, dir)))

  private def setsMemo(s: SparkSession, dir: String): DataFrame =
    graft.operators.Caching.sessionMemo(s, s"dedup_sets:$dir")(
      Dedup.clusterShingleSets(docs(s, dir), clustersMemo(s, dir)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => Dedup.exactClusters(docs(s, dir))),
    // graded in exploded (doc_id, j, minhash) form: the driver's compare
    // cannot sort an array column; Dedup.minhashSig stays the array API
    "minhash_sig" -> ((s, dir) => Dedup.minhashSigExploded(docs(s, dir))),
    "dedup_minhash" -> ((s, dir) => Dedup.minhashPairs(docs(s, dir))),
    "dedup_minhash_capped" -> ((s, dir) => Dedup.minhashPairsCapped(docs(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),
    "dedup_ngram" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir))),
    // threshold yield curve over the verified candidate pairs: one
    // verification pass, every tau rung graded from the same integers
    "dedup_sweep" -> ((s, dir) =>
      Dedup.dedupSweep(docs(s, dir), Seq(300L, 500L, 700L, 900L))),
    // per-doc duplication density: the fraction of each doc's shingles
    // found in at least one other doc (doc-level curation signal)
    "doc_dup_density" -> ((s, dir) => Dedup.dupDensity(docs(s, dir))),
    // LSH band planner: analytic S-curve endpoints next to the measured
    // candidate mass per (bands, rows) factorization of the signature
    "lsh_plan" -> ((s, dir) => Dedup.lshPlan(docs(s, dir))),
    // EXACT-threshold Jaccard pair join (prefix filter / AllPairs):
    // guaranteed-complete, unlike the LSH-recall paths above
    "dedup_ssjoin" -> ((s, dir) => Dedup.ssjoinPairs(docs(s, dir))),
    // LSH recall graded against that exact truth set: candidate recall
    // (band collisions) and detected recall (est >= minEst on top)
    "dedup_minhash_recall" -> ((s, dir) => Dedup.minhashRecall(docs(s, dir))),
    // asymmetric containment |A∩B|/min(|A|,|B|) over the same candidates
    "dedup_containment" -> ((s, dir) => Dedup.ngramContainmentPairs(docs(s, dir))),
    // LSH pairs -> connected components: the cluster assignment a dedup
    // pipeline actually applies (keep one doc per cluster)
    "dedup_clusters" -> ((s, dir) => clustersMemo(s, dir)),
    // clusters -> kept corpus (anti-join the non-representative members)
    "dedup_corpus" -> ((s, dir) =>
      Dedup.dedupCorpusFrom(docs(s, dir), clustersMemo(s, dir))),
    // provenance accounting: per-source drop rate and cross-source loss
    "dedup_attribution" -> ((s, dir) =>
      Dedup.dedupAttributionFrom(docs(s, dir), clustersMemo(s, dir))),
    // transitive-chaining audit: member-vs-representative exact Jaccard
    // per cluster-size bucket (the CC-dedup failure mode, measured)
    "dedup_chain_audit" -> ((s, dir) =>
      Dedup.chainAuditFrom(clustersMemo(s, dir), setsMemo(s, dir))),
    // the fix the audit demands: drop only star-VERIFIED members
    "dedup_corpus_verified" -> ((s, dir) =>
      Dedup.dedupCorpusVerifiedFrom(docs(s, dir), clustersMemo(s, dir),
        setsMemo(s, dir))),
    // quality-aware representative: keep each cluster's LONGEST member
    "dedup_corpus_best" -> ((s, dir) =>
      Dedup.dedupCorpusBestFrom(docs(s, dir), clustersMemo(s, dir))),
    // incremental ingest: odd doc_ids are the new batch, even the existing
    // corpus; new docs near-dup'ing an existing band representative are
    // rejected, the rest admitted (per-lang counts)
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalDedup(
        d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0))
    }),
    // the SAME incremental pipeline at arrival time: new docs land as
    // files, each micro-batch runs admitCounts against the prebuilt
    // corpus index — graded against the identical one-shot oracle
    "docs_ingest_stream" -> ((s, dir) =>
      graft.streaming.StreamingOps.dedupIngestStream(s, dir)),
    // incremental CLUSTER maintenance: the odd-doc batch folded into the
    // even-corpus cluster state via the affected-subgraph CC; graded by
    // the from-scratch union clustering (exact parity is the theorem)
    "dedup_clusters_ingest" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.clustersIngest(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        stateKey = Some(s"dedup_ingest_state:$dir"))
    }),
    // dedup-state RETRACTION: every 10th doc is taken down; the persisted
    // cluster labels are repaired via affected-subgraph re-CC (label
    // re-election + split handling) — graded on exact parity with
    // from-scratch clustering of corpus∖batch
    "dedup_clusters_retract" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.clustersRetract(d, d.filter(col("doc_id") % Dedup.RetractMod === 0),
        stateKey = Some(s"dedup_retract_state:$dir"))
    }),
    // duplicated-SPAN coverage: per-doc fraction of tokens covered by
    // stride-1 W-token runs appearing verbatim in other docs — the
    // exact-substring-dedup filter signal (see graft.operators.SpanDedup)
    "dedup_spans" -> ((s, dir) =>
      graft.operators.SpanDedup.spanCoverage(docs(s, dir))),
    // SUB-document dedup: fixed-width token chunks repeated across
    // distinct documents (the paragraph/boilerplate-dedup granularity —
    // doc-level LSH can't see a shared 32-token run inside two otherwise
    // different docs). Map-only chunking into one map-side-combined
    // hash groupBy — the fine-grained dedup shape that scales to 100 TB.
    "dedup_chunks" -> ((s, dir) =>
      graft.operators.TextOps.chunk(docs(s, dir))
        .groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)),
    // ingest-time span dedup: batch windows marked by ONE equi-join
    // against the corpus's distinct window-hash index (the persisted span
    // index — corpus text never re-tokenized per batch); per-lang
    // admission counts at the coverage threshold
    "dedup_spans_ingest" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.SpanDedup.spanIngest(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
    }),
    // Bloom-filter membership prefilter for ingest: the corpus summarized
    // into a fixed 8 KB bitmap, batch membership = K broadcast bit probes;
    // FPR measured against exact fingerprints, not claimed. Batch = odd
    // docs + every 20th corpus doc re-submitted (guaranteed true dups)
    "dedup_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.BloomDedup.bloomAdmit(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1 || col("doc_id") % 20 === 0))
    }),
    // COUNTING-Bloom retraction: every 10th corpus doc taken down by
    // decrementing its probe counters (the Bloom state that HAS an inverse
    // — cell-wise + is a group, unlike the bitmap's bit_or); the admit
    // report reruns against the decremented filter (removed re-arrivals
    // now clear admission), and retract_exact grades the decremented cells
    // against a from-scratch rebuild on corpus∖removed, cell for cell
    "dedup_bloom_retract" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 2 === 0)
      graft.operators.BloomDedup.bloomRetract(corpus,
        corpus.filter(col("doc_id") % 10 === 0),
        d.filter(col("doc_id") % 2 === 1 || col("doc_id") % 20 === 0))
    }),
    // TF-WEIGHTED near-dup pairs: weighted Jaccard over token counts via
    // the multiplicity-expansion reduction (expanded multiset -> the same
    // K-plane minhash/band machinery), candidates verified on the EXACT
    // integer min/max sums — the repetition-aware similarity set-based
    // dedup can't see
    "dedup_minhash_tf" -> ((s, dir) =>
      graft.operators.Dedup.weightedTfPairs(docs(s, dir))),
    // CONTENT-DEFINED chunk dedup: boundaries from a rolling-hash modulus
    // test re-synchronize on content, so an insertion shifts one chunk,
    // not every following fingerprint (graft.operators.TextOps.chunkCdc)
    "dedup_cdc" -> ((s, dir) =>
      graft.operators.TextOps.chunkCdc(docs(s, dir))
        .groupBy(col("chunk_hash"))
        .agg(min(col("tok_n")).as("tok_n"),
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2))
  )

  private val minhashPairsOracle = {
    val est = (1 to Dedup.K)
      .map(j => s"(CASE WHEN ma.sig[$j] = mb.sig[$j] THEN 1.0 ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH bnd AS (${Dedup.minhashBandsSql(Dedup.minhashSigSql("documents"))}),
       |sig AS (${Dedup.minhashSigSql("documents")}),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bnd a JOIN bnd b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  floor(($est) / ${Dedup.K}.0 * 1e4 + 0.5) / 1e4 AS est_jaccard
       |FROM cand JOIN sig ma ON ma.doc_id = doc_a
       |          JOIN sig mb ON mb.doc_id = doc_b""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_spans" -> graft.operators.SpanDedup.oracleSql("documents"),
    "dedup_bloom" -> graft.operators.BloomDedup.oracleSql("documents"),
    "dedup_bloom_retract" ->
      graft.operators.BloomDedup.retractOracleSql("documents"),
    "dedup_spans_ingest" -> graft.operators.SpanDedup.ingestOracleSql("documents"),
    "dedup_cdc" ->
      s"""WITH ch AS (${graft.operators.TextOps.chunkCdcSql("documents")})
         |SELECT chunk_hash, CAST(min(tok_n) AS BIGINT) AS tok_n,
         |       count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
         |FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "dedup_exact" -> Dedup.exactClustersSql("documents"),
    "minhash_sig" -> Dedup.minhashSigExplodedSql("documents"),
    "dedup_minhash" -> minhashPairsOracle,
    "dedup_minhash_capped" -> Dedup.minhashPairsCappedSql("documents"),
    "dedup_minhash_tf" -> Dedup.weightedTfPairsSql("documents"),
    "dedup_simhash" -> Dedup.simhashPairsSql("documents"),
    "dedup_ngram" -> Dedup.ngramJaccardPairsSql("documents"),
    "dedup_sweep" ->
      Dedup.dedupSweepSql("documents", Seq(300L, 500L, 700L, 900L)),
    "doc_dup_density" -> Dedup.dupDensitySql("documents"),
    "lsh_plan" -> Dedup.lshPlanSql("documents"),
    "dedup_ssjoin" -> Dedup.ssjoinPairsSql("documents"),
    "dedup_minhash_recall" -> Dedup.minhashRecallSql("documents"),
    "dedup_containment" -> Dedup.ngramContainmentPairsSql("documents"),
    "dedup_clusters" -> Dedup.dedupClustersSql("documents"),
    "dedup_corpus" -> Dedup.dedupCorpusSql("documents"),
    "dedup_attribution" -> Dedup.dedupAttributionSql("documents"),
    "dedup_chain_audit" -> Dedup.chainAuditSql("documents"),
    "dedup_corpus_verified" -> Dedup.dedupCorpusVerifiedSql("documents"),
    "dedup_corpus_best" -> Dedup.dedupCorpusBestSql("documents"),
    "dedup_incremental" -> Dedup.incrementalDedupSql("documents"),
    "dedup_clusters_ingest" -> Dedup.clustersIngestSql("documents"),
    "dedup_clusters_retract" -> Dedup.clustersRetractSql("documents"),
    "docs_ingest_stream" -> Dedup.incrementalDedupSql("documents"),
    "dedup_chunks" ->
      s"""WITH c AS (${graft.operators.TextOps.chunkSql("documents")})
         |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
         |       count(*) AS n_occ
         |FROM c GROUP BY chunk_hash
         |HAVING count(DISTINCT doc_id) >= 2""".stripMargin
  )
}
