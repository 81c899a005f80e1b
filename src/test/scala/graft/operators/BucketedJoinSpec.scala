package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** The point of bucketing is the ABSENT shuffle: with broadcast disabled,
  * joining two tables bucketed 8-ways on the join key must plan zero
  * Exchange operators, while the same join over plain parquet shuffles
  * both sides. Checked on the executed (post-AQE) plan. */
class BucketedJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join plans no Exchange; plain join shuffles") {
    val base = Files.createTempDirectory("graft_bucket_spec").toString
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"))
    for ((df, name, key) <- Seq((o, "tb_orders", "o_orderkey"),
                                (l, "tb_lineitem", "l_orderkey"))) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite").bucketBy(8, key).sortBy(key)
        .option("path", s"$base/$name").saveAsTable(name)
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("tb_lineitem")
        .join(spark.table("tb_orders"), col("l_orderkey") === col("o_orderkey"))
      bucketed.collect()
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"),
        s"bucketed join still shuffles:\n$bPlan")

      val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      plain.collect()
      val pPlan = plain.queryExecution.executedPlan.toString
      assert(pPlan.contains("Exchange"),
        "control check failed: plain join should shuffle with broadcast off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
