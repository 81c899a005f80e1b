package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Attention, Sampler}

/** SQL registration of the native functions + physical-plan-shape
  * regression tests (the plan properties the 100 TB design depends on). */
class GraftExtensionsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("graft functions are SQL-callable after register()") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(dot == 32.0)

    Seq((0L, 1.0, Array(2.0, 4.0)), (0L, 1.0, Array(6.0, 8.0)))
      .toDF("g", "sc", "v").createOrReplaceTempView("ext_t")
    val lw = spark.sql(
      "SELECT g, graft_log_weighted_vec(sc, v) AS lw FROM ext_t GROUP BY g")
      .select($"lw.v").as[Seq[Double]].head()
    // equal scores -> plain mean (to fp tolerance; logaddexp reweighting)
    assert(lw.zip(Seq(4.0, 6.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    val vs = spark.sql(
      "SELECT g, graft_vec_weighted_sum(sc, v) AS s FROM ext_t GROUP BY g")
      .select($"s").as[Seq[Double]].head()
    assert(vs == Seq(8.0, 12.0))

    val lse = spark.sql(
      "SELECT g, graft_logsumexp(sc) AS z FROM ext_t GROUP BY g")
      .select($"z").as[Double].head()
    assert(math.abs(lse - (1.0 + math.log(2.0))) < 1e-12)

    // the dedup/ANN kernels, SQL-callable too
    val mh = spark.sql(
      "SELECT graft_minhash(array('a', 'b', 'c', 'd')) AS s").as[Seq[Long]].head()
    assert(mh.length == 16 && mh.forall(_ >= 0))
    val sh = spark.sql(
      "SELECT graft_simhash(array('a', 'b', 'c')) AS s").as[Long].head()
    assert(sh >= 0 && sh < (1L << 32))
    val ham = spark.sql(
      """SELECT graft_hamming(graft_sign_sketch(array(1.0d, -1.0d)),
        |                     graft_sign_sketch(array(1.0d, -1.0d))) AS h""".stripMargin)
      .as[Long].head()
    assert(ham == 0L)

    // the round-7 additions: f32 dot, n-gram hashes, integer pair mixer
    val df32 = spark.sql(
      """SELECT graft_dot_f32(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
      .as[Float].head()
    assert(df32 == 4.0f)
    val ng = spark.sql(
      "SELECT graft_ngram_hashes(array('a', 'b', 'c', 'd'), 3) AS h")
      .as[Seq[Long]].head()
    assert(ng.length == 2 && ng.forall(_ >= 0))
    val mx = spark.sql("SELECT graft_mix60(7L, 1L, 2L) AS m").as[Long].head()
    assert(mx == graft.functions.Mix60Kernel.mix60(7L, 1L, 2L))
  }

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("attention broadcast plan shape: broadcast join, no kv-side shuffle before the partial agg") {
    val emb = (0 until 64).map(i => (i.toLong, Array.fill(8)(i * 0.1)))
      .toDF("id", "vec")
    val q = emb.select(col("id").as("q_id"), col("vec").as("qvec"))
    val kv = emb.select(col("id").as("k_id"), col("vec").as("kvec"),
      col("vec").as("vvec"))
    val plan = physicalPlan(Attention.attention(q, kv))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), "broadcast plan must not be a cartesian")
  }

  test("attention blocked plan shape: tile-keyed ShuffledHashJoin (2-D tile grid)") {
    val emb = (0 until 64).map(i => (i.toLong, Array.fill(8)(i * 0.1)))
      .toDF("id", "vec")
    val q = emb.select(col("id").as("q_id"), col("vec").as("qvec"))
    val kv = emb.select(col("id").as("k_id"), col("vec").as("kvec"),
      col("vec").as("vvec"))
    // since r13 the tile grid is a SHUFFLE_HASH equi-join on the tile key
    // (codegen-friendly, unlike CartesianProductExec — VERDICT r12 #4);
    // it must never silently degrade to a broadcast join
    val plan = physicalPlan(Attention.attentionBlocked(q, kv))
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin tile grid in:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"blocked plan must not broadcast:\n$plan")
  }

  test("sampler plan shape: ObjectHashAggregate, never a pair-stream SortAggregate") {
    // the Gumbel-max argmax is a native TypedImperativeAggregate (r13):
    // a declarative max(struct) buffer dragged the whole aggregation to
    // SortAggregate, sorting the full M×N pair stream in both modes
    val emb = (0 until 64).map(i => (i.toLong, Array.fill(8)(i * 0.1)))
      .toDF("id", "vec")
    val plan = physicalPlan(Sampler.sampler(
      emb.select(col("id").as("m_id"), col("vec").as("mvec")),
      emb.select(col("id").as("k_id"), col("vec").as("kvec")),
      seed = "spec"))
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"sampler aggregation fell back to SortAggregate:\n$plan")
  }

  test("docs_profile plan shape: ONE documents scan feeds all five countDistincts") {
    // the ANALYZE-pass claim: multi-column exact distincts share a single
    // Expand over a single scan — a per-column formulation would re-read
    // the table five times
    val df = graft.SparkEntry.queries("docs_profile")(
      spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 documents scan, found $scans in:\n$plan")
    assert(plan.contains("Expand"), "multi-distinct should plan through Expand")
  }

  test("embed_gram plan shape: one embeddings scan into a partial-final hash agg, no join") {
    // the GeMM-fold claim: outer-product terms reduce through ONE
    // map-side-combined aggregation; nothing is joined or re-scanned
    val df = graft.SparkEntry.queries("embed_gram")(
      spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    val scans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 embeddings scan, found $scans in:\n$plan")
    assert(plan.contains("HashAggregate"), "terms must reduce through hash aggregation")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      "gram fold must not join")
  }

  test("decontaminate_embed plan shape: eval side broadcasts, train side never sort-merges") {
    // the 100 TB claim: the train corpus is ONE streamed map pass against
    // a broadcast eval set — any SortMergeJoin means the corpus shuffled
    val df = graft.SparkEntry.queries("decontaminate_embed")(
      spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastExchange"), s"expected broadcast eval side in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "train side must not shuffle for the join")
  }

  test("supplier_waiting plan shape: decorrelated — ONE lineitem scan, no self-join") {
    // the Q21 claim: the EXISTS + NOT EXISTS formulation would scan/shuffle
    // lineitem three times; the aggregation form scans it exactly once
    val df = graft.SparkEntry.queries("supplier_waiting")(
      spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(lineitemScans == 1,
      s"expected exactly 1 lineitem scan, found $lineitemScans in:\n$plan")
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
  }
}
