package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components: PageRank
  * (Brin & Page 1998) over the part↔supplier bipartite graph implied by
  * lineitem — "which parts/suppliers sit at the center of the supply
  * network" is the same question every entity-resolution / seed-selection
  * pipeline asks of its duplicate or citation graph.
  *
  * Engine-defined INTEGER arithmetic so the ranks are oracle-replayable
  * bit-for-bit (float PageRank can never share a DuckDB oracle — the
  * per-partition add order alone diverges it): ranks live at a 10⁹ scale,
  * every edge carries `R_src div deg_src` (floored once, identically, per
  * edge), and the damping step is `[[PrBase]] + (Σ contrib · [[PrDampPct]])
  * div 100` — the (0.15, 0.85) mix in exact integer form. The per-round
  * floor loss
  * is the documented semantic (≤ 1 unit per edge + 1 per node at the 1e9
  * scale); both engines replay it exactly.
  *
  * The iteration count is FIXED ([[PrIters]]) and the DuckDB oracle
  * unrolls the rounds as chained CTEs — the suite's Lloyd-unroll
  * technique (k-means, BPE). Plan shape per round: the rank frame is
  * node-sized (tiny next to the edge list), so it BROADCASTS onto the
  * edges and the only shuffle is the map-side-combinable groupBy(dst) —
  * the Pregel round in its cheapest Spark form. The edge list is derived
  * once and localCheckpointed (4 rounds would otherwise re-scan and
  * re-distinct lineitem each).
  */
object GraphPack {

  private[graft] val PrIters = 4
  private[graft] val PrScale = 1000000000L // rank unit: 1e-9 of a node
  /** Damping in integer percent and the derived restart mass — ONE
    * definition interpolated into the Spark expression, the oracle's
    * round CTE, and the invariant spec's floor: the engines (and the
    * spec's bound) can only disagree if the shared constant changes. */
  private[graft] val PrDampPct = 85L
  private[graft] val PrBase = PrScale * (100 - PrDampPct) / 100

  /** Undirected bipartite edges, both directions, in one integer node-id
    * space: part p → node 2p, supplier s → node 2s+1. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select((col("l_partkey") * 2).as("p"),
        (col("l_suppkey") * 2 + 1).as("q"))
      .distinct()
    pairs.select(col("p").as("src"), col("q").as("dst"))
      .unionByName(pairs.select(col("q").as("src"), col("p").as("dst")))
      .localCheckpoint()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- PageRank top-100 ------------------------------------------------
    // 4 damped rounds, integer-exact; output the decoded top-100 hubs
    // (ORDER BY rank DESC with a total tiebreak). Suppliers are ~20×
    // rarer than parts with ~20× the degree, so they surface as the
    // hubs — the spec pins that structural fact, the oracle pins the
    // VALUES.
    "g1_pagerank" -> ((s, d) => {
      val e = edges(s, d)
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      var ranks = deg.select(col("node"), lit(PrScale).as("r"))
      for (_ <- 1 to PrIters) {
        val rd = ranks.join(deg, "node")
          .select(col("node").as("src"), expr("r div deg").as("contrib"))
        ranks = e.join(broadcast(rd), "src")
          .groupBy(col("dst").as("node"))
          .agg(expr(s"${PrBase}L + (sum(contrib) * ${PrDampPct}L) div 100")
            .as("r"))
      }
      ranks
        .select(
          when(col("node") % 2 === 0, lit("part"))
            .otherwise(lit("supplier")).as("node_type"),
          expr("node div 2").as("key"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("node_type"), col("key"))
        .limit(100)
    })
  )

  /** One damped round as a CTE body: ranks `$prev` → `$cur`. */
  private def roundSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT e.dst AS node,
       |    $PrBase + SUM(p.r // d.deg) * $PrDampPct // 100 AS r
       |  FROM edges e
       |  JOIN $prev p ON p.node = e.src
       |  JOIN deg d ON d.node = e.src
       |  GROUP BY e.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "g1_pagerank" -> {
      val rounds = (1 to PrIters).map(i =>
        roundSql(if (i == 1) "r0" else s"r${i - 1}", s"r$i"))
        .mkString(",\n")
      s"""WITH pairs AS (SELECT DISTINCT l_partkey * 2 AS p,
         |    l_suppkey * 2 + 1 AS q FROM lineitem),
         |edges AS (SELECT p AS src, q AS dst FROM pairs
         |  UNION ALL SELECT q, p FROM pairs),
         |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY src),
         |r0 AS (SELECT node, $PrScale AS r FROM deg),
         |$rounds
         |SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
         |    AS node_type,
         |  node // 2 AS key, CAST(r AS BIGINT) AS rank
         |FROM r$PrIters
         |ORDER BY rank DESC, node_type, key LIMIT 100""".stripMargin
    }
  )
}
