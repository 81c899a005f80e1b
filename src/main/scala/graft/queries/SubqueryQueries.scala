package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.sources.Tables

/** Subquery, set-operation, and grouping-set shapes — the second half of
  * the classic relational surface (RelationalQueries covers the
  * scan→join→agg→top-k half). Every query here exercises a plan family a
  * general engine must get right at 100 TB:
  *
  *  - correlated scalar subqueries, written DECORRELATED from the start
  *    (the aggregate side is computed once and broadcast — never a
  *    per-row re-execution);
  *  - anti-join (`NOT IN`/`NOT EXISTS`) and double aggregation;
  *  - disjunctive predicates (OR-of-conjunction bands) that must still
  *    prune at the scan;
  *  - INTERSECT / EXCEPT set operations;
  *  - CUBE grouping sets and ntile window buckets.
  *
  * Determinism: quantities and keys are integral so sums/averages over
  * them are exact in both engines; money aggregates are qround'd on the
  * grid that dominates cross-engine reassociation error (see
  * RelationalQueries' scale notes). Thresholds derived from an aggregate
  * (avg balance, avg quantity) are quantized to 1e-4 in BOTH engines
  * before any comparison, so boundary rows cannot flip.
  */
object SubqueryQueries {

  /** Q2-style correlated max: the customer(s) holding their nation's top
    * account balance. Decorrelated: per-nation max is a 25-row aggregate,
    * broadcast back onto customer; the oracle keeps the textbook
    * correlated form. Equality is on the raw max (max returns an input
    * value, no arithmetic) — exact in both engines. */
  private def nationTopBalance(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val mx = c.groupBy(col("c_nationkey").as("mk"))
      .agg(max(col("c_acctbal")).as("max_bal"))
    c.join(broadcast(mx),
        col("c_nationkey") === col("mk") && col("c_acctbal") === col("max_bal"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"),
        VecOps.qround(col("c_acctbal"), 2).as("acctbal"))
  }

  private val nationTopBalanceOracle =
    s"""SELECT n_name, c_name, ${VecOps.qroundSql("c_acctbal", 2)} AS acctbal
       |FROM customer c JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
       |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin

  /** Q13-style distribution: how many customers placed 0, 1, 2, … orders
    * in 2001. LEFT OUTER (so zero-order customers survive as the null
    * bucket) followed by a second aggregation over the first's result —
    * the double-agg shape. count(o_orderkey) ignores nulls, turning the
    * outer join's misses into the 0 bucket. */
  private def orderCountDist(s: SparkSession, dir: String): DataFrame = {
    val o01 = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === 2001)
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, dir)
      .join(o01, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private val orderCountDistOracle =
    """SELECT n_orders, count(*) AS n_customers
      |FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
      |      FROM customer LEFT JOIN
      |        (SELECT o_custkey, o_orderkey FROM orders
      |         WHERE year(o_orderdate) = 2001) o
      |        ON c_custkey = o_custkey
      |      GROUP BY c_custkey)
      |GROUP BY n_orders""".stripMargin

  /** Q14-style promo share: % of Q1-1996 revenue from PROMO-type parts.
    * Conditional aggregation (sum of a CASE) in one pass; the percentage
    * is computed FROM the two cent-rounded sums, so both engines divide
    * identical doubles — bit-identical result. part is dimension-sized
    * and broadcasts; the date filter pushes to the lineitem scan. */
  private def promoShare(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        VecOps.qround(sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)), 2)
          .as("promo_rev"),
        VecOps.qround(sum(rev), 2).as("total_rev"),
        count(lit(1)).as("n"))
      .withColumn("promo_pct",
        VecOps.qround(lit(100.0) * col("promo_rev") / col("total_rev"), 4))
      .select(col("promo_pct"), col("promo_rev"), col("total_rev"), col("n"))
  }

  private val promoShareOracle = {
    val promo = VecOps.qroundSql(
      "sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)", 2)
    val total = VecOps.qroundSql("sum(l_extendedprice * (1.0 - l_discount))", 2)
    s"""SELECT ${VecOps.qroundSql("100.0 * promo_rev / total_rev", 4)} AS promo_pct,
       |  promo_rev, total_rev, n
       |FROM (SELECT $promo AS promo_rev, $total AS total_rev, count(*) AS n
       |      FROM lineitem JOIN part ON l_partkey = p_partkey
       |      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')""".stripMargin
  }

  /** Q16-style supplier count: distinct suppliers able to ship each
    * (brand, size-band), excluding blacklisted (negative-balance)
    * suppliers via NOT IN — planned as a broadcast LEFT ANTI join (the
    * exclusion list is tiny; at 100 TB it stays a broadcast because
    * blacklists are dimension-sized). lineitem stands in for partsupp as
    * the part↔supplier association (the fixture has no partsupp). */
  private def supplierCnt(s: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        floor((col("p_size") - 1) / 10).cast("long").as("size_band"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  private val supplierCntOracle =
    """SELECT p_brand, CAST(floor((p_size - 1) / 10) AS BIGINT) AS size_band,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, size_band""".stripMargin

  /** Q17-style small-quantity revenue: revenue from Brand#23 line items
    * ordered at under half the part's average quantity. The correlated
    * `avg` decorrelates to a per-part aggregate joined back (broadcast —
    * one row per part). Quantities are integral doubles, so sum and count
    * are exact and the average is the same IEEE division in both engines;
    * the 1e-4 quantization is belt-and-braces on the comparison
    * threshold. Filter-before-join: only Brand#23 lines are scanned
    * twice, never the whole table. */
  private def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val pk = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
    val avgq = li.groupBy(col("l_partkey").as("ak"))
      .agg(VecOps.qround(avg(col("l_quantity")), 4).as("avg_qty"))
    li.join(broadcast(avgq), col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(VecOps.qround(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n"))
  }

  private val smallQtyRevenueOracle =
    s"""WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
       |            FROM lineitem JOIN part ON l_partkey = p_partkey
       |            WHERE p_brand = 'Brand#23'),
       |a AS (SELECT l_partkey AS ak, ${VecOps.qroundSql("avg(l_quantity)", 4)} AS avg_qty
       |      FROM li GROUP BY l_partkey)
       |SELECT ${VecOps.qroundSql("sum(l_extendedprice)", 2)} AS revenue, count(*) AS n
       |FROM li JOIN a ON l_partkey = ak
       |WHERE l_quantity < avg_qty * 0.5""".stripMargin

  /** Q18-style large-volume orders: orders totalling > 250 units, with
    * their customer. The HAVING-IN shape: the qualifying-key set is an
    * aggregate over the fact table joined back to orders (sum of integral
    * quantities — exact, so the > 250 cut is deterministic). At 100 TB
    * the qualifying set is small (99th percentile is ~262) and broadcasts
    * back; the big groupBy is the only full shuffle. */
  private val BigQty = 250.0

  private def bigOrderCustomers(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("bk"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > BigQty)
    Tables.orders(s, dir)
      .join(broadcast(big), col("o_orderkey") === col("bk"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        VecOps.qround(col("o_totalprice"), 2).as("totalprice"),
        VecOps.qround(col("total_qty"), 2).as("total_qty"))
  }

  private val bigOrderCustomersOracle =
    s"""WITH t AS (SELECT l_orderkey, sum(l_quantity) AS tq
       |           FROM lineitem GROUP BY l_orderkey
       |           HAVING sum(l_quantity) > $BigQty)
       |SELECT c_custkey, c_name, o_orderkey,
       |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       |  ${VecOps.qroundSql("o_totalprice", 2)} AS totalprice,
       |  ${VecOps.qroundSql("tq", 2)} AS total_qty
       |FROM orders JOIN t ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Q19-style disjunctive bands: revenue from three (brand × quantity ×
    * size) OR-bands. The predicate is an OR of conjunctions spanning both
    * join sides — the plan test is that Catalyst still extracts the
    * part-only disjuncts (brand ∈ {...}, size ≤ 15) to prune the part
    * scan before the join rather than filtering post-join only. */
  private def brandBands(s: SparkSession, dir: String): DataFrame = {
    val band1 = col("p_brand") === "Brand#12" &&
      col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
    val band2 = col("p_brand") === "Brand#23" &&
      col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
    val band3 = col("p_brand") === "Brand#34" &&
      col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(band1 || band2 || band3)
      .agg(
        VecOps.qround(
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n"))
  }

  private val brandBandsOracle =
    s"""SELECT ${VecOps.qroundSql("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue,
       |  count(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin

  /** Q22-style idle high-balance customers: above-average balance, no
    * order since 2000. Scalar-subquery threshold (global avg, quantized
    * 1e-4 in both engines, then broadcast as a 1-row cross join) + NOT
    * EXISTS anti-join. The anti-join probe side is just the distinct
    * recent buyer keys. */
  private def idleCustomers(s: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0.0)
      .agg(VecOps.qround(avg(col("c_acctbal")), 4).as("ab"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_idle"),
        VecOps.qround(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  private val idleCustomersOracle =
    s"""WITH ab AS (SELECT ${VecOps.qroundSql("avg(c_acctbal)", 4)} AS ab
       |            FROM customer WHERE c_acctbal > 0.0)
       |SELECT c_mktsegment, count(*) AS n_idle,
       |  ${VecOps.qroundSql("sum(c_acctbal)", 2)} AS total_bal
       |FROM customer, ab
       |WHERE c_acctbal > ab
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       |GROUP BY c_mktsegment""".stripMargin

  /** Q15-style top supplier: revenue per supplier for one quarter, then
    * the supplier(s) hitting the maximum — the aggregate-of-aggregate
    * scalar subquery. The max side is a 1-row broadcast over the ALREADY
    * cent-rounded per-supplier sums, so the equality compares doubles
    * both engines agree on exactly. */
  private def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(VecOps.qround(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mr"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("mr"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  private val topSupplierOracle =
    s"""WITH r AS (SELECT l_suppkey,
       |             ${VecOps.qroundSql(
              "sum(l_extendedprice * (1.0 - l_discount))", 2)} AS total_rev
       |           FROM lineitem
       |           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |           GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM r JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM r)""".stripMargin

  /** INTERSECT / EXCEPT set operations: customers who bought in both 1996
    * and 1997 vs. only in 1996. Spark plans both as hash joins over the
    * deduplicated key sets (LeftSemi / LeftAnti with distinct) — same
    * shuffle shape as any equi-join, no special scaling hazard. */
  private def repeatBuyers(s: SparkSession, dir: String): DataFrame = {
    def buyers(yr: Int) = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()
    val both = buyers(1996).intersect(buyers(1997))
      .select(lit("both").as("tag"), col("o_custkey").as("custkey"))
    val only96 = buyers(1996).except(buyers(1997))
      .select(lit("only_1996").as("tag"), col("o_custkey").as("custkey"))
    both.unionByName(only96)
  }

  private val repeatBuyersOracle =
    """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      |y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |SELECT 'both' AS tag, o_custkey AS custkey
      |FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
      |UNION ALL
      |SELECT 'only_1996' AS tag, o_custkey AS custkey
      |FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)""".stripMargin

  /** CUBE over (priority, status): all four grouping sets in one Expand +
    * single aggregation pass (same plan family as the ROLLUP query —
    * rows fan out once per set, partial aggs still combine map-side).
    * grouping_id disambiguates subtotal rows from genuine NULL keys. */
  private def priorityStatusCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        VecOps.qround(sum(col("o_totalprice")), -2).as("total"))
      .select(col("gid"), col("o_orderpriority"), col("o_orderstatus"),
        col("n"), col("total"))

  private val priorityStatusCubeOracle =
    s"""SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       |  o_orderpriority, o_orderstatus, count(*) AS n,
       |  ${VecOps.qroundSql("sum(o_totalprice)", -2)} AS total
       |FROM orders
       |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  /** ntile window buckets: per-segment balance quartiles (count + bounds
    * per quartile). The window partitions by segment — fully parallel,
    * no global sort — and the (acctbal, custkey) ordering is a total
    * order, so tile assignment is deterministic in both engines. */
  private def customerNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        VecOps.qround(min(col("c_acctbal")), 2).as("lo"),
        VecOps.qround(max(col("c_acctbal")), 2).as("hi"))
  }

  private val customerNtileOracle =
    s"""SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile, count(*) AS n,
       |  ${VecOps.qroundSql("min(c_acctbal)", 2)} AS lo,
       |  ${VecOps.qroundSql("max(c_acctbal)", 2)} AS hi
       |FROM (SELECT c_mktsegment, c_acctbal,
       |        ntile(4) OVER (PARTITION BY c_mktsegment
       |                       ORDER BY c_acctbal, c_custkey) AS quartile
       |      FROM customer)
       |GROUP BY c_mktsegment, quartile""".stripMargin

  /** Q20-style nested grouped semi-join: suppliers (in five nations) who
    * DOMINATE some Brand#1-3 part — their shipped quantity for it exceeds
    * 2× that part's per-supplier average. The groupwise-average
    * "correlated" subquery is decorrelated from the start: one
    * (part,supplier) aggregate, one per-part rollup OF that aggregate
    * (no second fact scan), joined back on partkey. Both comparison
    * sides are 1e-4-quantized before the `>` so boundary groups cannot
    * flip between engines. At 100 TB the rollup is tiny (|parts|) and
    * broadcast; the fact is scanned once with the brand filter pushed. */
  private def dominantSuppliers(s: SparkSession, dir: String): DataFrame = {
    val brands = Seq("Brand#1", "Brand#2", "Brand#3")
    val g = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_brand").isin(brands: _*))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(VecOps.qround(sum(col("l_quantity")), 4).as("q"))
    val t = g.groupBy(col("l_partkey").as("t_partkey"))
      .agg(VecOps.qround(sum(col("q")) / count(lit(1)), 4).as("avgq"))
    val nations = (0 to 4).map(i => s"NATION_$i")
    g.join(broadcast(t), col("l_partkey") === col("t_partkey"))
      .filter(col("q") > lit(2.0) * col("avgq"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("n_dominant"))
  }

  private val dominantSuppliersOracle =
    s"""WITH g AS (SELECT l_partkey, l_suppkey,
       |             ${VecOps.qroundSql("sum(l_quantity)", 4)} AS q
       |           FROM lineitem JOIN part ON l_partkey = p_partkey
       |           WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
       |           GROUP BY l_partkey, l_suppkey),
       |t AS (SELECT l_partkey AS t_partkey,
       |        ${VecOps.qroundSql("sum(q) / count(*)", 4)} AS avgq
       |      FROM g GROUP BY l_partkey),
       |d AS (SELECT l_suppkey, count(*) AS n_dominant
       |      FROM g JOIN t ON l_partkey = t_partkey
       |      WHERE q > 2.0 * avgq
       |      GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, n_name, n_dominant
       |FROM d JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')""".stripMargin

  /** Q11-style important parts: parts whose shipped value exceeds 1.3× the
    * MEAN per-part value — a HAVING filter against a global scalar
    * aggregate. The scalar subquery is decorrelated by construction: the
    * per-part rollup is computed once, its 1-row mean is broadcast back as
    * a cross join, and the filter runs map-side. The threshold factor is
    * scale-free (a fixed share of total, as in TPC-H Q11, selects nothing
    * once |parts| grows past 1/fraction). Both comparison sides are
    * cent-quantized before the `>` so boundary parts cannot flip between
    * engines. The |parts|-row rollup is localCheckpoint'ed so BOTH the
    * mean and the filter derive from one materialized table — without it
    * Catalyst inlines the rollup twice and scans the fact twice (verified
    * on the formatted plan). At 100 TB that is one lineitem scan plus a
    * parts-sized intermediate, never two fact scans. */
  private def importantParts(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rv"),
        count(lit(1)).as("n"))
      .localCheckpoint(true)
    val mean = perPart.agg(avg(col("rv")).as("av"))
    perPart.crossJoin(broadcast(mean))
      .filter(VecOps.qround(col("rv"), 2) > VecOps.qround(lit(1.3) * col("av"), 2))
      .select(col("l_partkey"), VecOps.qround(col("rv"), 2).as("part_value"),
        col("n"))
  }

  private val importantPartsOracle =
    s"""WITH pp AS (SELECT l_partkey,
       |              sum(l_extendedprice * (1.0 - l_discount)) AS rv,
       |              count(*) AS n
       |            FROM lineitem GROUP BY l_partkey),
       |t AS (SELECT avg(rv) AS av FROM pp)
       |SELECT l_partkey, ${VecOps.qroundSql("rv", 2)} AS part_value, n
       |FROM pp, t
       |WHERE ${VecOps.qroundSql("rv", 2)} > ${VecOps.qroundSql("1.3 * av", 2)}""".stripMargin

  /** Q16-style supplier variety: how many DISTINCT suppliers ship each
    * (brand, type) of small parts, excluding blacklisted suppliers (the
    * negative-balance stand-in for Q16's complaint filter). Two distinct
    * plan features: a NOT IN rewritten as a broadcast LEFT ANTI join (the
    * blacklist is dimension-sized at any scale), and count(DISTINCT) whose
    * dedup Spark executes as a two-phase partial aggregate — (brand, type,
    * suppkey) dedup map-side, counts final-side — never a global set. */
  private def supplierVariety(s: SparkSession, dir: String): DataFrame = {
    val blacklist = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_size").between(1, 25))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_ship"))
  }

  private val supplierVarietyOracle =
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS n_supp,
      |  count(*) AS n_ship
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size BETWEEN 1 AND 25
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "important_parts" -> importantParts,
    "supplier_variety" -> supplierVariety,
    "dominant_suppliers" -> dominantSuppliers,
    "nation_top_balance" -> nationTopBalance,
    "order_count_dist" -> orderCountDist,
    "promo_share" -> promoShare,
    "supplier_cnt" -> supplierCnt,
    "small_qty_revenue" -> smallQtyRevenue,
    "big_order_customers" -> bigOrderCustomers,
    "brand_bands" -> brandBands,
    "idle_customers" -> idleCustomers,
    "repeat_buyers" -> repeatBuyers,
    "top_supplier" -> topSupplier,
    "priority_status_cube" -> priorityStatusCube,
    "customer_ntile" -> customerNtile
  )

  val oracles: Map[String, String] = Map(
    "important_parts" -> importantPartsOracle,
    "supplier_variety" -> supplierVarietyOracle,
    "dominant_suppliers" -> dominantSuppliersOracle,
    "nation_top_balance" -> nationTopBalanceOracle,
    "order_count_dist" -> orderCountDistOracle,
    "promo_share" -> promoShareOracle,
    "supplier_cnt" -> supplierCntOracle,
    "small_qty_revenue" -> smallQtyRevenueOracle,
    "big_order_customers" -> bigOrderCustomersOracle,
    "brand_bands" -> brandBandsOracle,
    "idle_customers" -> idleCustomersOracle,
    "repeat_buyers" -> repeatBuyersOracle,
    "top_supplier" -> topSupplierOracle,
    "priority_status_cube" -> priorityStatusCubeOracle,
    "customer_ntile" -> customerNtileOracle
  )
}
