package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives shared by the dedup-clustering ops.
  *
  * The one that matters at 100 TB is min-label connected components:
  * pairwise near-dup hits (from ANY generator — jaccard inverted index,
  * MinHash+verify, substring windows) become dedup groups by taking
  * each component's minimum doc id as the group label.
  */
object GraphOps {

  /** Min-label connected components over an undirected pair list.
    *
    * `pairs` carries one row per undirected edge as (d1, d2); nodes are
    * the edge endpoints plus `extraNodes` (single-column frames of ids
    * — isolated nodes that must still receive their own label, e.g. the
    * self-connected duplicate groups of llm_dedup_cluster). Returns
    * (id, lbl) with lbl = the component's minimum id, localCheckpointed
    * (safe to use after the caller releases `pairs`).
    *
    * Shape: bounded min-label propagation — each round is ONE join +
    * ONE aggregate over the self-looped edge list (the self-loop
    * carries the node's own label into the min and doubles as the
    * fixed-point signal), seeded with the neighborhood minimum so
    * cliques converge in a single confirming round; non-clique chains
    * pointer-double between rounds, so convergence is O(log diameter)
    * and the 16-round cap covers any graph this side of 2^16 hops.
    * Throws rather than return truncated labels. At 100 TB this is the
    * alternating large-star/small-star shape.
    *
    * Round structure: exactly ONE action per round — the changed-node
    * count on the propagated frame. Each round's frames are LAZY
    * local checkpoints: the logical plan truncates to a LogicalRDD
    * immediately — the per-round self-join would otherwise DOUBLE the
    * plan every round, and a deep chain graph's 2^rounds plan string
    * OOMs the driver in the listener's explain rendering long before
    * the data is a problem — and the checkpointed partitions persist
    * across rounds, so no round ever re-derives the chain of previous
    * rounds (the old loop released each round's cache before its
    * dependent materialized, which re-ran every prior round's join
    * per action — quadratic recompute). The converged round never
    * builds the jump join, exactly as before. Edges are persisted
    * pre-partitioned on the propagation join key, so on a cluster
    * each round's sort-merge/hash join exchanges only the
    * (node-sized) label frame, never the (edge-sized) adjacency —
    * E-row shuffles per round drop from two to the one the d1-regroup
    * fundamentally needs.
    */
  def connectedComponents(pairs: DataFrame, extraNodes: Seq[DataFrame] = Nil): DataFrame = {
    val nodes = extraNodes
      .map(_.toDF("d1"))
      .foldLeft(pairs.select(col("d1")).unionByName(pairs.select(col("d2").as("d1"))))(
        _.unionByName(_))
      .distinct()
    val edges = pairs.select("d1", "d2")
      .unionByName(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .unionByName(nodes.select(col("d1"), col("d1").as("d2")))
      .repartition(col("d2"))
      .persist()
    var labels = edges.groupBy(col("d1").as("id")).agg(min("d2").as("lbl"))
    var converged = false
    var rounds = 0
    while (!converged && rounds < 16) {
      val prop = edges
        .join(labels.withColumnRenamed("id", "d2"), "d2")
        .groupBy(col("d1").as("id"))
        .agg(min("lbl").as("lbl"),
          min(when(col("d1") === col("d2"), col("lbl"))).as("old"))
        .localCheckpoint(false)
      // ONE action per round: the changed-label count. It materializes
      // this round's checkpoint (and, transitively, the previous
      // round's still-lazy pointer-jump checkpoint).
      converged = prop
        .agg(count(when(col("lbl") < col("old"), lit(1)))).first().getLong(0) == 0L
      labels =
        if (converged) prop.select("id", "lbl")
        else
          // pointer-jump: follow each node's new label to THAT node's
          // new label; labels only ever point at node ids, so the
          // self-join is total and chain depth halves per round. Lazy —
          // the next round's count materializes it off the checkpointed
          // `prop` partitions.
          prop.as("c")
            .join(prop.select(col("id").as("lbl"), col("lbl").as("lbl2")).as("p"), "lbl")
            .select(col("id"), col("lbl2").as("lbl"))
            .localCheckpoint(false)
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: min-label propagation not converged after $rounds rounds " +
          "(component diameter > 2^16?) — refusing to return truncated labels")
    val out = labels.select("id", "lbl").localCheckpoint()
    edges.unpersist()
    out
  }

  /** Damped PageRank over the undirected pair list, ENTIRELY in
    * fixed-point integer arithmetic: ranks carry 1e6 units, the 0.85
    * damping is the exact floor division `r * 85 div (100 * deg)`, and
    * the teleport term is the integer 150000 — so there is NO floating
    * point anywhere, and the result is bit-identical under any
    * partitioning or engine. Every node of this graph has degree >= 1
    * (nodes ARE edge endpoints), so there is no dangling-mass term.
    * Each iteration is one join + one aggregate over the symmetric
    * edge list; per-iteration localCheckpoint keeps lineage flat; all
    * internal caches are released. Returns (id, pr_fp, deg).
    */
  def pagerankFp(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val edges = pairs.select("d1", "d2")
      .unionByName(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .persist()
    val deg = edges.groupBy(col("d1").as("id")).agg(count(lit(1)).as("deg"))
      .persist()
    var r = deg.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      r = edges
        .join(r.withColumnRenamed("id", "u"), col("d1") === col("u"))
        .join(deg.select(col("id").as("u2"), col("deg").as("du")),
          col("d1") === col("u2"))
        .select(col("d2").as("id"), expr("r * 85 div (100 * du)").as("c"))
        .groupBy("id")
        .agg((lit(150000L) + sum("c")).as("r"))
        .localCheckpoint()
    }
    val out = r.join(deg, "id")
      .select(col("id"), col("r").as("pr_fp"), col("deg"))
      .localCheckpoint()
    edges.unpersist()
    deg.unpersist()
    out
  }
}
