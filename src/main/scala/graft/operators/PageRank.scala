package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer fixed-point PAGERANK (Page, Brin, Motwani & Winograd, "The
  * PageRank Citation Ranking", 1999) — the link-graph importance signal
  * a crawl-prioritization / corpus-weighting pipeline runs over its host
  * graph (which domains deserve crawl budget; which sources get corpus
  * weight). Bounded iteration count, no convergence test — the fixpoint
  * loop is data-independent, so the plan is too.
  *
  * EXACT integer arithmetic throughout: ranks are fixed-point x1e12
  * longs, every division is a floor, so any engine replays the result
  * bit-for-bit (floating-point PageRank cannot be oracle-checked — ulp
  * summation order diverges). Update rule per iteration:
  *
  *   r'(v) = (15 * 1e12) div (100 * N)  +  (85 * Σ_in w * (r(u) div deg(u))) div 100
  *
  * Contract: every node must have at least one OUT-edge (no dangling
  * mass — a symmetrized/co-occurrence graph satisfies this by
  * construction; callers with genuinely directed graphs drop or
  * self-loop danglings first). Nodes are `edges`' distinct sources.
  *
  * Scale shape (a 100 TB host graph): parallel edges collapse to
  * (src, dst, w) ONCE up front — the per-iteration join input shrinks
  * to the distinct-edge set and multiplicity rides as an exact weight.
  * Each iteration is one equi-join of edges with the rank table on the
  * uniform src key plus one map-side-combined sum onto dst — two
  * shuffles per iteration, rank-table-sized frames only (never edge
  * expansion beyond the join itself). Ranks are eagerly
  * localCheckpoint'ed per iteration so plan depth stays O(1) in the
  * iteration count (the connected-components lesson).
  */
object PageRank {

  /** @param edges (src, dst) directed edge instances (parallel edges =
    *              weight); src/dst must be the same id domain, and every
    *              dst must also appear as a src (validated — a dst-only
    *              node would silently swallow its inbound mass)
    * @param iters fixed iteration count (>= 1)
    * @return (node, pr_x1e12, deg) — deg is the weighted out-degree
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // TOTAL mass is normalized to 1e12 (r0 = 1e12 div N per node), so
    // every intermediate stays far inside Long: s <= 1e12, 85*s <=
    // 8.5e13, per-edge w*(r div deg) <= r. The tradeoff is resolution:
    // per-node fixed-point granularity is 1e12/N (N > 1e12 is refused
    // implicitly by r0 flooring to 0 — raise the scale before the node
    // count gets there).
    val scale = 1000000000000L // 1e12
    val e = edges.select(col("src"), col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("deg"))
      .localCheckpoint(true)
    val n = deg.count()
    require(n > 0, "PageRank needs a non-empty graph")
    // enforce the no-dangling contract instead of silently dropping
    // dst-only nodes (and the mass flowing into them): one anti-join
    // over the already-grouped distinct-edge set
    val dangling = e.join(deg, e("dst") === deg("node"), "left_anti")
      .select("dst").limit(1).collect()
    require(dangling.isEmpty,
      s"dangling node ${dangling.headOption.map(_.get(0)).orNull}: every " +
        "dst must also have out-edges (symmetrize the graph or drop/" +
        "self-loop danglings first) — a dst-only node would silently " +
        "swallow its inbound mass")
    val base = (15L * scale) / (100L * n)
    // the rank table CARRIES deg: one join per iteration (edges ⋈
    // ranks) instead of two (edges ⋈ (ranks ⋈ deg)), and the final
    // deg re-attach join disappears — same values, deg just rides the
    // rank-table-sized frame
    var ranks = deg.select(col("node"), lit(scale / n).as("r"), col("deg"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks, e("src") === col("node"))
        .select(col("dst"), (col("w") * expr("r div deg")).as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = deg.select(col("node"), col("deg"))
        .join(sums, col("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"),
          col("deg"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("pr_x1e12"), col("deg"))
  }
}
