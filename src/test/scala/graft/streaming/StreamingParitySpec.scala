package graft.streaming

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.StreamQueries

/** top-level so Spark can synthesize an Encoder (inner classes can't). */
case class SpecEv(event_id: Long, ts: Timestamp, user_id: Long,
                  event_type: String, value: Double)

/** The monoid aggregates are incrementally maintainable by construction
  * (the reference's associativity contract, core.py:15-64) — these tests
  * PROVE it: the same windowed aggregate produces identical results run as
  * a batch plan and as a Structured Streaming query over the same rows, and
  * the flatMapGroupsWithState sessionizer agrees with its batch
  * window-function dual. */
class StreamingParitySpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(99)
  private val base = 1700000000L // fixed epoch anchor
  private val events: Seq[SpecEv] = (0 until 2000).map { i =>
    SpecEv(i.toLong,
      new Timestamp((base + rnd.nextInt(6 * 3600)) * 1000L),
      rnd.nextInt(20).toLong,
      s"type${rnd.nextInt(4)}",
      rnd.nextGaussian() * 5)
  }

  test("windowed count/sum/logsumexp: streaming == batch") {
    val batch = StreamingOps.windowedAgg(events.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SpecEv]
    // three micro-batches: the partial aggregates must merge across batches
    events.grouped(700).foreach(g => mem.addData(g: _*))
    val q = StreamingOps.windowedAgg(mem.toDF().withWatermark("ts", "10 hours"))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_agg")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(streamed.keySet == batch.keySet)
    for ((k, (n, total, lse)) <- batch) {
      val (sn, st, sl) = streamed(k)
      assert(sn == n, s"$k n")
      assert(math.abs(st - total) <= 1e-6, s"$k total")
      assert(math.abs(sl - lse) <= 1e-9, s"$k lse")
    }
  }

  test("flatMapGroupsWithState sessionizer == batch lag/cumsum dual") {
    val batch = StreamQueries.sessionsBatch(events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessEvent]
    mem.addData(events.map(e =>
      SessEvent(e.user_id, e.event_id, e.ts.getTime / 1000L)): _*)
    val q = Sessionize.sessions(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch)
  }
}
