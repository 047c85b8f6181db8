package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative whole-graph numeric propagation over a pair list — the
  * step past connected components (Dedup.dupClusters/dupClustersStar):
  * PageRank-style centrality over the duplicate graph ranks which copy
  * of a near-dup cluster is the "hub" (most-connected variant), a
  * useful retention signal when clusters are large and quality scores
  * tie.
  */
object GraphOps {

  /** PageRank with INTEGER arithmetic (ranks are longs scaled by
    * `scale`; every division is integral `div`), fixed iteration count,
    * over the undirected graph of `pairs`. Float PageRank is not
    * cross-engine comparable — double sums are addition-order-dependent
    * — but scaled-long ranks with integral division are bit-identical
    * on any engine and any partitioning, which makes a distributed run
    * oracle-checkable against unrolled SQL (q105). Damping is the
    * classic 0.85, applied as `(85 * x) div 100`.
    *
    * Scale shape: edges and degrees materialize once (checkpointed —
    * they are reused every iteration; an unbroken lineage would recompute
    * the signature pipeline per iteration). Each iteration is one
    * equi-join keyed on the edge source + one groupBy on the destination
    * — both map-side-combinable shuffles proportional to |E|. The node
    * count is the one driver-side scalar (same justification as the
    * k-means centroid collect: O(1), never the data). Isolated docs
    * (no duplicate edges) are out of scope: rank is only defined over
    * the pair graph's nodes.
    */
  def pageRankInt(pairs: DataFrame, aCol: String, bCol: String,
                  iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(true)
    val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
      .select(col("u").as("id"), col("d"))
      .localCheckpoint(true)
    val n = deg.count()
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var r = deg.select(col("id"), col("d"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      val contrib = r.select(col("id").as("cid"), expr("r div d").as("c"))
      val sums = e.join(contrib, col("u") === col("cid"))
        .groupBy("v").agg(sum("c").as("s"))
      r = deg.join(sums, deg("id") === sums("v"), "left")
        .select(deg("id"), deg("d"),
          (lit(base) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
        .localCheckpoint(true)
    }
    r
  }
}
