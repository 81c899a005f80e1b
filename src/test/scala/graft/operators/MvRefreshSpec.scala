package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.RelationalQueries

/** Incremental view maintenance: the merge-refresh must equal a full
  * recompute exactly (integer pennies make the comparison order-free),
  * and the refresh plan must never scan the old orders partition — that
  * cost bound IS the operator. */
class MvRefreshSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val ord = graft.sources.Tables.orders(spark, dir)
  private val li = graft.sources.Tables.lineitem(spark, dir)
  private val cutoff = lit("2001-01-01").cast("timestamp")

  private def stage(): (String, String, String) = {
    val oPath = graft.sources.Scratch.dir("graft_mvspec_old")
    val dPath = graft.sources.Scratch.dir("graft_mvspec_delta")
    val vPath = graft.sources.Scratch.dir("graft_mvspec_view")
    ord.filter(col("o_orderdate") < cutoff).write.mode("overwrite").parquet(oPath)
    ord.filter(col("o_orderdate") >= cutoff).write.mode("overwrite").parquet(dPath)
    RelationalQueries.mvViewOf(spark.read.parquet(oPath), li)
      .write.mode("overwrite").parquet(vPath)
    (oPath, dPath, vPath)
  }

  test("merge-refresh equals the full recompute exactly") {
    val (_, dPath, vPath) = stage()
    val got = RelationalQueries.mvRefreshPlan(spark, vPath, dPath, li)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = RelationalQueries.mvViewOf(ord, li)
      .select(col("o_custkey"), col("n_lines"),
        graft.functions.VecOps.qround(
          col("rev_c").cast("double") / lit(100.0), 2).as("revenue"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == full)
    // the delta is non-trivial at this fixture (refresh actually merges)
    assert(spark.read.parquet(dPath).count() > 0)
  }

  test("the refresh plan never scans the old orders partition") {
    val (oPath, dPath, vPath) = stage()
    val plan = RelationalQueries.mvRefreshPlan(spark, vPath, dPath, li)
      .queryExecution.executedPlan.toString
    assert(plan.contains(dPath), "delta partition must be read")
    assert(plan.contains(vPath), "materialized view must be read")
    assert(!plan.contains(oPath),
      s"refresh must not rescan old orders:\n${plan.take(1500)}")
  }
}
