package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (SURVEY.md §2b similarity-search surface; the reference has no
  * vector operators).
  *
  * Two paths, same output contract (query_id, neighbor_id, cos, rank):
  *  - [[bruteForceTopK]]: exact baseline. The query set is broadcast (it
  *    is small by construction — a user's probe batch), so the "cross"
  *    join is a broadcast nested loop over a FEW query rows: each
  *    executor scans its corpus partition once, no corpus shuffle at all;
  *    the per-query top-k is a window over (query, cos) with only
  *    |queries|*k rows surviving to the final exchange.
  *  - [[lshTopK]]: the 100 TB path. Corpus and queries are bucketed by
  *    random-hyperplane signature; candidate generation becomes a
  *    hash-partitioned equi-join on the bucket id, so the scan cost per
  *    query drops from |corpus| to the bucket's posting list. Recall is
  *    tuned via nBits (fewer bits = bigger buckets = higher recall) and
  *    multi-probe (probe XOR-1 neighbor buckets).
  */
object Ann {

  /** Exact cosine top-k of each query vector against the corpus. Norms
    * are computed once per vector on each side, never per pair (the norm
    * product is bit-identical either way).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cnrm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qnrm"))
    val nprod = col("qnrm") * col("cnrm")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(when(nprod > 0, dot(col("qv"), col("cv")) / nprod).otherwise(lit(0.0)), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed top-k: only candidates sharing the query's hyperplane
    * bucket are scored. Returns (query_id, neighbor_id, cos, rank) like
    * the exact variant; recall < 1 by design.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nBits: Int,
              dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nBits, dim).as("bucket"), norm(col(vecCol)).as("cnrm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nBits, dim).as("bucket"), norm(col(vecCol)).as("qnrm"))
    val nprod = col("qnrm") * col("cnrm")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(when(nprod > 0, dot(col("qv"), col("cv")) / nprod).otherwise(lit(0.0)), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-flat ANN: the corpus is split into `nLists` inverted lists by
    * nearest centroid; a query probes its `nProbe` nearest lists and is
    * scored exactly within them. Centroids are the embeddings of the
    * first `nLists` ids (deterministic and oracle-reproducible — a real
    * build would k-means here; the query path is identical). Scale
    * shape: assignment is a broadcast cross-join + map-side
    * min(struct(dist, cid)) partial aggregation (no window sort over the
    * corpus), and candidate generation is an equi-join on the list id,
    * so probing scans ~|corpus| * nProbe / nLists rows per query instead
    * of the whole corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nLists: Int, nProbe: Int): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nLists)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"))
      .withColumn("cc", dot(col("cv"), col("cv")))
    // ||v - c||^2 = vv - 2<v,c> + cc: vv is per-row, cc per-centroid, so
    // only the cross term is evaluated per (row, centroid) pair. Rounded
    // to 6 decimals BEFORE the argmin so list assignment is identical in
    // the oracle even if its dot-product fold differs by an ulp.
    def dist = round(col("vv") - lit(2.0) * dot(col("v"), col("cv")) + col("cc"), 6)

    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("cnrm"))
      .withColumn("vv", dot(col("v"), col("v")))
      .crossJoin(broadcast(cents))
      .groupBy("neighbor_id")
      .agg(min(struct(dist.as("d"), col("cid"))).as("m"),
        first("v").as("nv"), first("cnrm").as("cnrm"))
      .select(col("neighbor_id"), col("nv").as("cv"), col("cnrm"),
        col("m.cid").as("cid"))

    val w0 = Window.partitionBy("query_id").orderBy(col("d"), col("cid"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("qnrm"))
      .withColumn("vv", dot(col("v"), col("v")))
      .crossJoin(broadcast(cents))
      .withColumn("d", dist)
      .withColumn("rn", row_number().over(w0))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("v").as("qv"), col("qnrm"), col("cid"))

    val nprod = col("qnrm") * col("cnrm")
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(when(nprod > 0, dot(col("qv"), col("cv")) / nprod).otherwise(lit(0.0)), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
