package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting + local clustering coefficient — the graph
  * health / community-structure signal next to [[PageRank]] in a corpus
  * link-analysis pass (spam clusters and boilerplate farms show up as
  * near-cliques; isolated pages as zero-triangle nodes).
  *
  * Algorithm: canonicalize to distinct undirected edges, then orient
  * every edge from its lower-(degree, id) endpoint to the higher one.
  * Each triangle then has EXACTLY ONE "wedge" node with out-edges to the
  * other two, so it is counted once, and the quadratic wedge step fans
  * out from each node's OUT-degree — which degree-ordering bounds by
  * O(sqrt(|E|)) on any graph (the Chiba–Nishizeki / Schank–Wagner
  * bound). This is the standard scale-out triangle algorithm: a
  * high-degree hub contributes its edges as wedge LEGS, never as wedge
  * CENTERS, so no task ever enumerates a hub's neighbor pairs.
  *
  * Shuffle budget: canonicalize (1 distinct) + degree (1 agg, reuses the
  * edge partitioning) + two equi-joins (wedge build, wedge close) + the
  * per-node roll-up. All joins are on uniform keys after orientation;
  * no window over neighbor lists, no cross join, nothing driver-side.
  *
  * Clustering coefficient is emitted FIXED-POINT:
  * cc_x1e6 = floor(2e6 * triangles / (deg * (deg - 1))) — integer-exact
  * across engines (0 when deg < 2).
  */
object Triangles {

  /** Per-node triangle participation over an edge list (any direction;
    * duplicates and self-loops tolerated — canonicalized away first).
    * Returns (node, deg, triangles, cc_x1e6) for every node with at
    * least one edge. */
  def perNode(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // The canonical edge set feeds the degree table (twice, via the
    // union), the orientation join, and the wedge-closure join — and
    // its SUBTREE is the caller's edge construction (for the supplier
    // graph: a lineitem self-join + weight aggregate), which exchange
    // reuse only partially dedupes. Checkpoint it eagerly (the PageRank
    // discipline): the thresholded edge list is far smaller than the
    // construction input, so materializing once and reading it from
    // block storage in all four consumers beats re-running the
    // construction — at any scale where the edge list fits the cluster
    // (it must: the wedge join materializes it anyway).
    val und = edges.select(
        least(col(edges.columns(0)), col(edges.columns(1))).as("u"),
        greatest(col(edges.columns(0)), col(edges.columns(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // node-degree table: consumed by the two orientation joins and the
    // final output join — checkpoint for the same reason (tiny: one row
    // per node)
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)

    // orient each edge low-(deg, id) -> high-(deg, id); u < v already,
    // so a degree tie keeps the id order
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"))

    // wedges a->{b,c} with b < c (each unordered out-pair once), closed
    // by the canonical undirected edge {b,c}
    val x = oriented.select(col("a"), col("b"))
    val y = oriented.select(col("a"), col("b").as("c"))
    val wedges = x.join(y, Seq("a")).filter(col("b") < col("c"))
    val tri = wedges.join(und,
      col("u") === least(col("b"), col("c")) &&
        col("v") === greatest(col("b"), col("c")))
      .select("a", "b", "c")

    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))

    deg.join(perNode, Seq("node"), "left")
      .select(
        col("node"),
        col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          expr("(2000000 * coalesce(triangles, 0)) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_x1e6"))
  }
}
