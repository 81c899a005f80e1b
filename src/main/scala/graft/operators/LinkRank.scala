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
    * per distinct shipping pair per direction. */
  def edges(li: DataFrame): DataFrame =
    li.select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
      .union(li.select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")))
      .distinct()

  /** `iters` PageRank iterations over [[edges]] of `li`; returns
    * (node, r) with r quantized to the iteration grid — hash-gradable. */
  def ranks(li: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "ranks needs at least one iteration")
    val e = edges(li).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ew = e.join(deg, "src").localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint(true)
    val n = nodes.count()
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

  /** The SQL dual: the same chain with one CTE pair per iteration. */
  def ranksSql(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT DISTINCT l_suppkey*2 + 1 AS src, l_partkey*2 AS dst FROM lineitem
       |           UNION
       |           SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2 + 1 AS dst FROM lineitem),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / n AS r FROM nodes, nn)""".stripMargin
    for (i <- 1 to iters) sb ++= s""",
       |r$i AS (SELECT e.dst AS node,
       |          ${VecOps.qroundSql(s"$Residual / nn.n + $Damping * sum(p.r / deg.deg)", RankDigits)} AS r
       |        FROM e JOIN deg USING (src) JOIN r${i - 1} p ON p.node = e.src, nn
       |        GROUP BY e.dst, nn.n)""".stripMargin
    sb ++= s"\nSELECT node, r FROM r$iters"
    sb.toString
  }
}
