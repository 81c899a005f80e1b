package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.operators.Similarity
import graft.sources.Tables

/** Driver-facing similarity-search queries over `embeddings`: exact cosine
  * top-k, sign-LSH ANN top-k, and banded-LSH embedding near-dup pairs.
  */
object SimilarityQueries {

  /** query-side rows (vec_id < MQ) for the top-k queries. */
  private val MQ = 64
  private val TopK = 10
  private val AnnK = 5

  /** no true near-dups in the synthetic embeddings (max pairwise cosine
    * ≈ 0.51 at sf0.01) — 0.4 exercises the band join + threshold with a
    * non-empty result. */
  private val MinCos = 0.4

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  private def qSide(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < MQ)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))

  private def kvSide(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id").as("k_id"), col("vec").as("kvec"))

  private val cosSql =
    "list_dot_product(qv, kv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(kv, kv)))"

  private val topkOracle =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $MQ),
       |k AS (SELECT vec_id AS k_id, embedding::DOUBLE[] AS kv FROM embeddings),
       |p AS (SELECT q_id, k_id, $cosSql AS cos
       |      FROM q CROSS JOIN k WHERE k_id <> q_id),
       |r AS (SELECT q_id, k_id, cos,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, k_id) AS rank
       |      FROM p)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, k_id,
       |       ${VecOps.qroundSql("cos", 4)} AS cos
       |FROM r WHERE rank <= $TopK""".stripMargin

  private val annOracle =
    s"""WITH q AS (SELECT q_id, qv, ${Similarity.lshBucketSql("qv", Similarity.AnnPlanes)} AS bucket
       |           FROM (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $MQ)),
       |k AS (SELECT k_id, kv, ${Similarity.lshBucketSql("kv", Similarity.AnnPlanes)} AS bucket
       |      FROM (SELECT vec_id AS k_id, embedding::DOUBLE[] AS kv FROM embeddings)),
       |p AS (SELECT q_id, k_id, $cosSql AS cos
       |      FROM q JOIN k USING (bucket) WHERE k_id <> q_id),
       |r AS (SELECT q_id, k_id, cos,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, k_id) AS rank
       |      FROM p)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, k_id,
       |       ${VecOps.qroundSql("cos", 4)} AS cos
       |FROM r WHERE rank <= $AnnK""".stripMargin

  private val nearDupOracle = {
    val pairCos =
      "list_dot_product(a.vv, b.vv) / (sqrt(list_dot_product(a.vv, a.vv)) * sqrt(list_dot_product(b.vv, b.vv)))"
    s"""WITH v AS (SELECT vec_id, vv, ${Similarity.lshBucketSql("vv", Similarity.P)} AS sig
       |           FROM (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings)),
       |bnd AS (SELECT vec_id, vv, CAST(0 AS BIGINT) AS band, sig & 15 AS key FROM v
       |        UNION ALL
       |        SELECT vec_id, vv, CAST(1 AS BIGINT) AS band, (sig >> 4) & 15 AS key FROM v),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, $pairCos AS cos
       |         FROM bnd a JOIN bnd b
       |           ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, ${VecOps.qroundSql("cos", 4)} AS cos
       |FROM cand WHERE cos >= $MinCos""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "similar_topk" -> ((s, dir) =>
      Similarity.cosineTopK(qSide(s, dir), kvSide(s, dir), TopK)),
    "similar_ann" -> ((s, dir) =>
      Similarity.annTopK(qSide(s, dir), kvSide(s, dir), AnnK)),
    "dedup_embed" -> ((s, dir) =>
      Similarity.embeddingNearDupPairs(
        emb(s, dir).select(col("vec_id"), col("vec")), MinCos))
  )

  val oracles: Map[String, String] = Map(
    "similar_topk" -> topkOracle,
    "similar_ann" -> annOracle,
    "dedup_embed" -> nearDupOracle
  )
}
