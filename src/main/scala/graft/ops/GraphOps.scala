package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the layer that turns pairwise
  * similarity output (kNN graphs, near-dup pairs) into corpus-level
  * signals. Connected components live in [[Dedup.dedupClusters]]; this
  * object holds the rank/centrality side.
  */
object GraphOps {

  /** Fixed-iteration PageRank (Page, Brin, Motwani & Winograd 1999)
    * over a directed edge list (src, dst). `iters` is FIXED — no
    * convergence test — so the result is a deterministic closed-form
    * function of the graph (value-oracle-able); production runs pick
    * iters ~ O(log n / log(1/d)) or wrap this in the same
    * driver-convergence loop as [[KMeansOps.lloyd]]. Dangling-node
    * mass (nodes with no out-edges) redistributes uniformly each
    * iteration, the standard correction — Σ rank stays 1 exactly.
    *
    * Scale (the Pregel shape on Catalyst): per iteration, ONE join of
    * the node-sized rank table against the edge list on src + ONE
    * groupBy(dst) with map-side partial aggregation — shuffle volume
    * is O(edges) per iteration and nothing else; the dangling mass is
    * a 1-row broadcast; hub-node skew on dst is AQE-split territory.
    * The rank table is localCheckpointed each iteration so the plan
    * stays iteration-depth-constant (the lazy-checkpoint CC device).
    * Output: (id, rank) over every node appearing as src or dst.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val base = nodes.join(outdeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    val n = nodes.agg(count(lit(1)).as("n"))
    var ranks = base.crossJoin(broadcast(n))
      .select(col("id"), col("outdeg"), (lit(1.0) / col("n")).as("rank"))
    var it = 0
    while (it < iters) {
      val dangling = ranks.filter(col("outdeg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contrib = e.join(
          ranks.select(col("id").as("src"), (col("rank") / col("outdeg")).as("c")),
          Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("contrib"))
      ranks = base
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(n)).crossJoin(broadcast(dangling))
        .select(col("id"), col("outdeg"),
          ((lit(1.0) - damping) / col("n")
            + lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("dm") / col("n")))
            .as("rank"))
        .localCheckpoint(eager = false)
      it += 1
    }
    ranks.select(col("id"), col("rank"))
  }
}
