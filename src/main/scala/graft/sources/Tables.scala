package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver fixture tables (TESTDATA.md, FIXTURES.md §B).
  *
  * Schema expectations mirror the reference's constructor asserts
  * (reference attention.py:39-40, mlp.py:24-25, xentropy.py:47-48): fail
  * fast at load time, before any job is launched. All loads are plain
  * `spark.read.parquet`, so Catalyst gets full pushdown/pruning on the scan.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session memo of the LOADED (and, below, derived) table frames:
    * `spark.read.parquet` pays a driver-side footer/schema read per call
    * and the first resolution lists the directory — and the harness
    * calls each loader once per query run (~2,500 listings per bench
    * session). A DataFrame is an immutable plan, so handing every
    * caller the same object reuses the analyzed relation and its file
    * index; the DATA is still read from parquet by every action (this
    * caches no rows — the fixture paths are read-only). Entries of
    * stopped sessions are dropped on first touch, like Caching's memo. */
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def memo(spark: SparkSession, key: String)
                  (build: => DataFrame): DataFrame = {
    val app = spark.sparkContext.applicationId
    frames.keySet().removeIf(k => !k.startsWith(app + "/"))
    val full = app + "/" + key
    // NOT computeIfAbsent: the derived-frame builders nest (embeddings'
    // build calls load, which memoizes too) and ConcurrentHashMap throws
    // "Recursive update" when the nested insert lands in the same bin —
    // the same order-dependent landmine Caching.sessionMemo documents.
    val existing = frames.get(full)
    if (existing != null) existing
    else {
      val built = build
      val prev = frames.putIfAbsent(full, built)
      if (prev != null) prev else built
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown fixture table: $name")
    memo(spark, s"$dir/$name")(spark.read.parquet(s"$dir/$name.parquet"))
  }

  private def requireCols(df: DataFrame, name: String, cols: Set[String]): Unit =
    require(cols.subsetOf(df.columns.toSet),
      s"$name: expected columns $cols, found ${df.columns.mkString(",")}")

  /** The engine's "matrix" data model (SURVEY.md §1.4): one row per matrix
    * row, vector widened float->double (exact) so all downstream arithmetic
    * is f64 like the reference's correctness tests (attention.py:99-101). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    memo(spark, s"$dir/embeddings/f64") {
      val df = load(spark, dir, "embeddings")
      requireCols(df, "embeddings", Set("vec_id", "embedding", "label"))
      df.select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("vec"),
        col("label").cast("long").as("label"))
    }

  /** [[embeddings]] at the parquet file's NATIVE float32 width (no widening
    * cast) — the input to the float32 kernel parity path (the reference's
    * smoke test runs torch.float32, test_custom_op.py:22-23). */
  def embeddingsF32(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "embeddings")
    requireCols(df, "embeddings", Set("vec_id", "embedding", "label"))
    df.select(
      col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<float>").as("vec32"),
      col("label").cast("long").as("label"))
  }

  def documents(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "documents")
    requireCols(df, "documents", Set("doc_id", "text", "lang", "source", "n_chars"))
    df
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    memo(spark, s"$dir/events/ts") {
      val df = load(spark, dir, "events")
      requireCols(df, "events", Set("event_id", "ts", "user_id", "event_type", "value", "props"))
      fixEventTs(df)
    }

  /** Normalize the fixture's `ts` to TIMESTAMP (LTZ). The driver has shipped
    * two physical encodings across rounds: TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects (sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true and we rebuild a
    * micro-precision timestamp here — integer DIV, not `/`, which is double
    * and loses precision above 2^53 ns, floors exactly like DuckDB's
    * nano->micro conversion), and timestamp[us] with isAdjustedToUTC=false,
    * which Spark reads as TIMESTAMP_NTZ (watermarks and stream-stream joins
    * require LTZ; sessions pin spark.sql.session.timeZone=UTC, so the cast
    * is a micros-identity). Shared by the batch loader and the file-stream
    * source (the fix is a per-row projection, valid on streaming DataFrames
    * too). */
  def fixEventTs(df: DataFrame): DataFrame = {
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
      case _ => col("ts")
    }
    df.withColumn("ts", ts)
  }

  /** STREAMING read of the events fixture: the same parquet path consumed
    * through the file-stream source (schema pinned from the batch footer —
    * a file stream cannot infer it). This is the deployable edge: in
    * production the path is a landing directory that accumulates files and
    * each micro-batch picks up the new ones; over the static fixture it
    * yields the same rows in one (or a few) batches. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = load(spark, dir, "events").schema // footer read only
    // the fixture is a single FILE: a non-glob path makes FileStreamSource
    // force basePath = the file itself, which PartitioningAwareFileIndex
    // rejects ("Option 'basePath' must be a directory") — so glob the file
    // name and pin basePath to the fixture dir explicitly
    fixEventTs(spark.readStream.schema(schema).option("basePath", dir)
      .parquet(s"$dir/events*.parquet"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
}
