package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** PAGERANK over the bipartite supplier↔part shipment graph — the
  * iterated-sparse-matvec / link-analysis family (the remaining classic
  * iterated fold after the k-means, PQ, and BPE trainer loops): each
  * iteration is one join of the rank vector against the edge list plus a
  * map-side-combined re-aggregation per destination, the Pregel-style
  * message-passing shape expressed relationally.
  *
  * Graph: one node per supplier and per part (ids disambiguated onto one
  * axis as 2·part / 2·supplier+1), one DIRECTED edge each way per distinct
  * (supplier, part) shipping pair — so the graph is symmetric and has no
  * dangling nodes (every node's out-degree ≥ 1), which keeps the update
  * exactly r' = (1−d)/N + d·Σ_in r/deg with no dangling-mass term.
  *
  * Cross-engine determinism: the damping constants and 1/N seeds are IEEE
  * divisions of identical doubles; per-edge contributions r/deg divide an
  * (identical, previous-iteration-quantized) rank by an exact integer
  * degree; each iteration's per-node sum is quantized to 1e-9 before the
  * next iteration reads it — reassociation error of these ≤10³-term
  * ~1e-4-magnitude sums sits near 1e-13, five orders below the grid (the
  * same argument as every graded money sum, see VecOps.qround).
  *
  * Scale shape: the edge list is built once (one distinct = one shuffle)
  * and localCheckpoint'ed with its out-degrees attached; each iteration
  * shuffles the |V|-sized rank vector to the edges' src partitioning and
  * re-aggregates |E| messages down to |V| map-combined partial sums.
  * Lineage is cut per iteration, so iteration i+1's plan starts from a
  * materialized rank table instead of inlining (and re-executing)
  * iterations 1..i — the [[Similarity.kmeansTrain]] contract. At 100 TB
  * the honest upgrade is bucketing edges by src so the per-iteration
  * rank shuffle is the ONLY data movement; the relational shape here is
  * already that plan minus the persisted bucketing.
  */
object LinkRank {

  val Damping = 0.85
  /** 1 − [[Damping]] as its OWN literal: `1.0 - 0.85` is not the double
    * `0.15`, and both engines must parse the identical constant. */
  val Residual = 0.15
  /** rank quantization grid per iteration (1e-9 — see determinism note). */
  val RankDigits = 9

  /** Directed symmetric edge list: 2·l_partkey ↔ 2·l_suppkey+1, one edge
    * per distinct shipping pair per direction. The distinct runs on the
    * ONE-direction pair set (half the shuffle of distinct-after-union) and
    * the two directions are unioned after — they cannot collide because src
    * parity differs (odd = supplier, even = part), so the union of two
    * distinct sets is distinct. */
  def edges(li: DataFrame): DataFrame = {
    val pairs = li
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
    pairs.select((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst"))
      .union(pairs.select((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst")))
  }

  /** [[edges]] with each edge's src out-degree attached (window, not
    * groupBy+join — one exchange by src instead of two plus a join), plus
    * the node table and count, materialized once for an iteration loop.
    * `ew` comes back checkpointed PARTITIONED BY src and `nodes` inherits
    * that partitioning (node = src), so each iteration's rank join
    * (node = src) and movement join (node = node) are exchange-free — the
    * only per-round data movement is the groupBy(dst) message shuffle. */
  private def edgeSetup(li: DataFrame): (DataFrame, DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val ew = edges(li)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val nodes = ew.select(col("src").as("node")).distinct()
    (ew, nodes, nodes.count())
  }

  /** `iters` PageRank iterations over [[edges]] of `li`; returns
    * (node, r) with r quantized to the iteration grid — hash-gradable. */
  def ranks(li: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "ranks needs at least one iteration")
    val (ew, nodes, n) = edgeSetup(li)
    var r = nodes.select(col("node"), (lit(1.0) / lit(n.toDouble)).as("r"))
    for (_ <- 1 to iters) {
      r = ew.join(r, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(VecOps.qround(
          lit(Residual) / lit(n.toDouble) +
            lit(Damping) * sum(col("r") / col("deg")), RankDigits).as("r"))
        .localCheckpoint(true)
    }
    r
  }

  /** CONVERGENCE-GATED PageRank (the `kmeans_train_conv` stance applied to
    * the link-analysis family): iterate until the max per-node rank
    * movement drops below `epsRel`·(1/N) — RELATIVE to the uniform seed
    * rank, because absolute movement scales as 1/N and a fixed absolute ε
    * would fire at iteration 1 on a big graph and never on a small one.
    * Emits (iters, node, r) of the stopping round.
    *
    * The stop decision is cross-engine EXACT: each round's ranks are
    * 1e-9-quantized before the next round reads them, so the movement
    * max-of-differences is a max over identical doubles, and the
    * threshold is the same IEEE division epsRel/N in both engines.
    * Loop control is ONE scalar aggregate over the |V|-row rank table per
    * round — control, never data (the collect-requantize protocol).
    * Measured: the fixture graph's movement·N decays ≈0.85×/round from
    * ~17–19, so epsRel = 9.0 stops at round 5 (sf0.001) vs 6 (sf0.01,
    * sf0.1) — the data decides, not the count; `maxIters` bounds the
    * chain and the oracle's CTE depth. */
  def ranksConverged(li: DataFrame, epsRel: Double, maxIters: Int): DataFrame = {
    require(maxIters >= 1, "ranksConverged needs at least one iteration")
    val (ew, nodes, n) = edgeSetup(li)
    val eps = epsRel / n.toDouble
    var r = nodes.select(col("node"), (lit(1.0) / lit(n.toDouble)).as("r"))
      .localCheckpoint(true)
    def step(prev: DataFrame): DataFrame =
      ew.join(prev.select(col("node"), col("r")), col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(VecOps.qround(
          lit(Residual) / lit(n.toDouble) +
            lit(Damping) * sum(col("r") / col("deg")), RankDigits).as("r"))
    var it = 0
    var moved = Double.MaxValue
    // TWO rounds per materialization barrier (VERDICT r11 "Next" #3a; was
    // one barrier + one |V|⋈|V| movement join EACH round): both rounds'
    // ranks plus the incoming rank ride in ONE lazily-checkpointed plan —
    // the intermediate round's subplan appears twice (feeding round 2 and
    // as the movement column) but its message shuffle is a ReusedExchange,
    // so only its ~|V|-row final agg re-runs — and the movement scalars
    // are the action that materializes the checkpoint. Per block: two |E|
    // message shuffles (each mapped once), one barrier, one scalar job,
    // one planning/codegen cycle. The symmetric graph has no dangling
    // nodes, so the inner movement joins cover the full vertex set, and
    // both rounds' stopping checks are exact: if round it+1's movement is
    // already below ε the loop stops THERE and emits round it+1's ranks,
    // which rode along as a column.
    while (moved >= eps && it < maxIters) {
      if (it + 1 == maxIters) { // odd budget left: one last single round
        val next = step(r)
          .join(r.select(col("node"), col("r").as("r0")), "node")
          .localCheckpoint(false)
        moved = next.agg(max(abs(col("r") - col("r0")))).head.getDouble(0)
        r = next.select(col("node"), col("r"))
        it += 1
      } else {
        val r1 = step(r)
        val pair = step(r1)
          .join(r1.select(col("node"), col("r").as("r1")), "node")
          .join(r.select(col("node"), col("r").as("r0")), "node")
          .localCheckpoint(false)
        val m = pair.agg(max(abs(col("r1") - col("r0"))).as("m1"),
          max(abs(col("r") - col("r1"))).as("m2")).head
        val m1 = m.getDouble(0)
        if (m1 < eps) { // converged after the block's FIRST round
          moved = m1
          r = pair.select(col("node"), col("r1").as("r"))
          it += 1
        } else {
          moved = m.getDouble(1)
          r = pair.select(col("node"), col("r"))
          it += 2
        }
      }
    }
    r.select(lit(it.toLong).as("iters"), col("node"), col("r"))
  }

  /** The SQL dual: the same chain with one CTE pair per iteration. */
  def ranksSql(iters: Int): String = {
    // every CTE MATERIALIZED, and the degree join hoisted out of the
    // rounds (`ed`): DuckDB's default CTE inlining re-executes the whole
    // upstream chain per reference, so the un-materialized `iters`-round
    // chain re-derived the DISTINCT edge set once per round — the sf1
    // gate's oracle-side timeout on this query (VERDICT r14 #4); the
    // conv sibling learned the same lesson at sf0.1 in r13
    val sb = new StringBuilder
    sb ++= s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey*2 + 1 AS src, l_partkey*2 AS dst FROM lineitem
       |           UNION
       |           SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2 + 1 AS dst FROM lineitem),
       |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |ed AS MATERIALIZED (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, 1.0 / n AS r FROM nodes, nn)""".stripMargin
    for (i <- 1 to iters) sb ++= s""",
       |r$i AS MATERIALIZED (SELECT ed.dst AS node,
       |          ${VecOps.qroundSql(s"$Residual / nn.n + $Damping * sum(p.r / ed.deg)", RankDigits)} AS r
       |        FROM ed JOIN r${i - 1} p ON p.node = ed.src, nn
       |        GROUP BY ed.dst, nn.n)""".stripMargin
    sb ++= s"\nSELECT node, r FROM r$iters"
    sb.toString
  }

  /** Dual of [[ranksConverged]]: chain `maxIters` rounds, compute each
    * round's max movement, find the first round below epsRel/N, emit that
    * round via guarded UNION ALL branches (the `kmeans_train_conv` oracle
    * shape). Every CTE is MATERIALIZED — the movement CTEs reference each
    * rank table twice, and DuckDB's default inlining re-executes the whole
    * upstream chain per reference (measured: the un-materialized 8-round
    * chain at sf0.1 exhausted disk; materialized it runs in seconds). */
  def ranksConvSql(epsRel: Double, maxIters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey*2 + 1 AS src, l_partkey*2 AS dst FROM lineitem
       |           UNION
       |           SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2 + 1 AS dst FROM lineitem),
       |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, 1.0 / n AS r FROM nodes, nn)""".stripMargin
    for (i <- 1 to maxIters) sb ++= s""",
       |r$i AS MATERIALIZED (SELECT e.dst AS node,
       |          ${VecOps.qroundSql(s"$Residual / nn.n + $Damping * sum(p.r / deg.deg)", RankDigits)} AS r
       |        FROM e JOIN deg USING (src) JOIN r${i - 1} p ON p.node = e.src, nn
       |        GROUP BY e.dst, nn.n)""".stripMargin
    for (i <- 1 to maxIters) sb ++= s""",
       |dm$i AS MATERIALIZED (SELECT max(abs(a.r - b.r)) AS m
       |        FROM r$i a JOIN r${i - 1} b USING (node))""".stripMargin
    val trace = (1 to maxIters)
      .map(t => s"SELECT $t AS t, (SELECT m FROM dm$t) AS m")
      .mkString(" UNION ALL ")
    val branches = (1 to maxIters).map(t =>
      s"""SELECT (SELECT it FROM conv) AS iters, node, r
         |FROM r$t WHERE (SELECT it FROM conv) = $t""".stripMargin)
      .mkString("\nUNION ALL\n")
    sb ++= s""",
       |conv AS (SELECT CAST(coalesce(min(t), $maxIters) AS BIGINT) AS it
       |         FROM ($trace), nn WHERE m < $epsRel / nn.n)
       |$branches""".stripMargin
    sb.toString
  }
}
