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
    *
    * `multiProbe` = number of XOR-1 neighbor buckets to probe in
    * addition to the query's own: probing bucket^(1<<i) for the first
    * `multiProbe` hyperplanes reaches vectors that fell on the other
    * side of ONE hyperplane — the dominant near-miss mode, since a true
    * neighbor's probability of disagreeing on exactly one bit is the
    * largest failure term. The explode happens on the QUERY side (small,
    * broadcast), so the corpus is still scanned once with one bucket per
    * vector and candidate volume grows only (1+multiProbe)×, not by
    * re-hashing the corpus. Probed keys are distinct, so no candidate
    * dedup is needed.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nBits: Int,
              dim: Int = 64, multiProbe: Int = 0): DataFrame = {
    require(multiProbe >= 0 && multiProbe <= nBits,
      s"multiProbe must be in [0, nBits=$nBits]")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nBits, dim).as("bucket"), norm(col(vecCol)).as("cnrm"))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nBits, dim).as("bucket"), norm(col(vecCol)).as("qnrm"))
    val q = if (multiProbe == 0) q0 else {
      val probeKeys = lit(0L) +: (0 until multiProbe).map(i => lit(1L << i))
      q0.select(col("query_id"), col("qv"), col("qnrm"),
        explode(array(probeKeys.map(m => col("bucket").bitwiseXOR(m)): _*)).as("bucket"))
    }
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

  /** Attribute-constrained exact top-k: like [[bruteForceTopK]] but a
    * neighbor must also share `attrCol` with the query (the "filtered
    * vector search" every retrieval stack needs — same-language / same-
    * shard / same-tenant neighbors). The attribute equality is part of
    * the broadcast-join CONDITION, so non-matching corpus rows are
    * discarded before any dot product is computed; the corpus still
    * never shuffles and the scan reads only (id, vec, attr) columns.
    */
  def bruteForceTopKFiltered(corpus: DataFrame, queries: DataFrame,
                             idCol: String, vecCol: String, attrCol: String,
                             k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(attrCol).as("__ca"), norm(col(vecCol)).as("cnrm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(attrCol).as("__qa"), norm(col(vecCol)).as("qnrm"))
    val nprod = col("qnrm") * col("cnrm")
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("__ca") === col("__qa"))
      .select(col("query_id"), col("neighbor_id"),
        round(when(nprod > 0, dot(col("qv"), col("cv")) / nprod).otherwise(lit(0.0)), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic k-means centroid build for IVF. Seeds are the
    * `nLists` vectors with the smallest md5-derived key (an order-free
    * deterministic "shuffle"; no RNG, so the DuckDB oracle rebuilds the
    * identical centroids), then `iters` Lloyd iterations: assign every
    * vector to its nearest centroid (broadcast cross term + map-side
    * argmin, same shape as the probe path) and recompute per-dimension
    * means. Means are rounded to 6 decimals so cross-engine summation-
    * order ulp drift cannot flip a later argmin; distances are rounded
    * before the argmin for the same reason. Empty clusters drop out
    * (identically on both engines).
    *
    * `sampleOneIn` keeps only ids whose md5-key ≡ 0 (mod sampleOneIn)
    * for the BUILD — at 100 TB the centroid estimate needs only a
    * sample, not the corpus; the final assignment in [[ivfTopKWith]]
    * still covers every vector.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nLists: Int, iters: Int = 2,
                      sampleOneIn: Int = 1, reliable: Boolean = false): DataFrame = {
    require(nLists >= 1 && iters >= 0 && sampleOneIn >= 1,
      s"need nLists >= 1, iters >= 0, sampleOneIn >= 1; got $nLists/$iters/$sampleOneIn")
    import graft.functions.TextFunctions.tokenHash64
    val keyed = corpus.select(col(idCol).cast("long").as("sid"), col(vecCol).as("v"))
      .withColumn("h", tokenHash64(concat(lit("ivf_"), col("sid").cast("string"))))
    // materialized once (checkpoint truncates lineage): the seed scan
    // plus every Lloyd iteration references this frame — without
    // truncation each reference re-plans the corpus scan + hash
    // projection. reliable=false → localCheckpoint (executor-local
    // blocks, fast single-node path); reliable=true → sparkContext
    // checkpoint dir, survives executor loss mid-build on a real
    // cluster (caller must setCheckpointDir) — same switch as
    // Dedup.dupClusters.
    val build = {
      val b = if (sampleOneIn <= 1) keyed
        else keyed.filter(pmod(col("h"), lit(sampleOneIn.toLong)) === 0)
      if (reliable) b.checkpoint(true) else b.localCheckpoint(true)
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    // global (partition-less) window is DELIBERATE and bounded: it runs
    // after limit(nLists), so it sees <= nLists rows (the seed set), not
    // the corpus — the "No Partition Defined" warning it triggers is
    // about a <= few-hundred-row frame
    val seedW = Window.orderBy("h", "sid")
    var cents = build.orderBy("h", "sid").limit(nLists)
      .withColumn("cid", row_number().over(seedW).cast("long"))
      .select(col("cid"), transform(col("v"), x => x.cast("double")).as("cv"))
    for (_ <- 1 to iters) {
      val withCc = cents.withColumn("cc", dot(col("cv"), col("cv")))
      val d = round(col("vv") - lit(2.0) * dot(col("v"), col("cv")) + col("cc"), 6)
      val assigned = build
        .withColumn("vv", dot(col("v"), col("v")))
        .crossJoin(broadcast(withCc))
        .groupBy("sid")
        .agg(min(struct(d.as("d"), col("cid"))).as("m"), first(col("v")).as("v"))
        .select(col("m.cid").as("cid"), col("v"))
      val next = meanPool(assigned, "cid", "v")
        .withColumnRenamed("centroid", "cv")
      // Materialize the (tiny: nLists × dim doubles) centroid table on
      // the driver between iterations — MLlib-style Lloyd. Without this
      // the lineage RE-SCANS the corpus once per prior iteration inside
      // every later stage (measured: the q54 plan read embeddings 6×);
      // collect + re-literal is value-identity, so oracle parity holds.
      cents = next.as[(Long, Array[Double])].collect().sortBy(_._1).toSeq
        .toDF("cid", "cv")
    }
    cents
  }

  /** Per-key mean pooling of vectors — grouped embedding centroids (the
    * k-means mean step, exposed as its own operator: per-dimension
    * partial avg over a posexplode, reassembled in position order).
    * Means are rounded to 6 decimals for cross-engine reproducibility.
    * Scale: one shuffle on (key, pos) with map-side partial sums — never
    * collects a group's vectors anywhere.
    */
  def meanPool(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(keyCol, "pos")
      .agg(round(avg(col("x").cast("double")), 6).as("m"))
      .groupBy(keyCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col(keyCol), transform(col("pm"), e => e.getField("m")).as("centroid"))

  /** IVF-flat ANN: the corpus is split into `nLists` inverted lists by
    * nearest centroid; a query probes its `nProbe` nearest lists and is
    * scored exactly within them. Centroids are the embeddings of the
    * first `nLists` ids (deterministic trivial build — [[ivfTopKKmeans]]
    * is the real build; the probe path is identical). Scale shape:
    * assignment is a broadcast cross-join + map-side
    * min(struct(dist, cid)) partial aggregation (no window sort over the
    * corpus), and candidate generation is an equi-join on the list id,
    * so probing scans ~|corpus| * nProbe / nLists rows per query instead
    * of the whole corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nLists: Int, nProbe: Int): DataFrame =
    ivfTopKWith(corpus, queries, idCol, vecCol, k, nProbe,
      corpus.orderBy(col(idCol)).limit(nLists)
        .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv")))

  /** IVF-flat ANN over [[kmeansCentroids]] — the production build. */
  def ivfTopKKmeans(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nLists: Int, nProbe: Int, iters: Int = 2,
                    sampleOneIn: Int = 1): DataFrame =
    ivfTopKWith(corpus, queries, idCol, vecCol, k, nProbe,
      kmeansCentroids(corpus, idCol, vecCol, nLists, iters, sampleOneIn))

  /** Semantic deduplication (SemDeDup, Abbas et al. arXiv:2303.09540):
    * cluster the embedding space with [[kmeansCentroids]], then within
    * each cluster drop every vector that has a LOWER-id cluster-mate
    * with cosine >= `eps` — one deterministic representative per
    * semantic-duplicate set survives. Returns every input id with its
    * cluster and keep verdict: (vec_id, cid, keep).
    *
    * Scale shape: centroid assignment is the IVF broadcast-argmin (the
    * corpus never shuffles for it); pair generation is ONE shuffle — a
    * self-equi-join on the cluster id, which AQE's skew-join can split —
    * and the per-cluster O(m²) candidate cost is the algorithm's
    * explicit knob: nLists grows with the corpus so |cluster| stays
    * roughly constant (the paper runs 50k clusters at web scale). The
    * assigned frame is checkpointed once because three plan legs (both
    * join sides + the verdict join) read it; cosine is rounded to 4
    * decimals BEFORE the threshold so an engine's ulp drift cannot flip
    * a verdict.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               nLists: Int, eps: Double, iters: Int = 2,
               sampleOneIn: Int = 1): DataFrame = {
    val cs = kmeansCentroids(corpus, idCol, vecCol, nLists, iters, sampleOneIn)
      .withColumn("cc", dot(col("cv"), col("cv")))
    def dist = round(col("vv") - lit(2.0) * dot(col("v"), col("cv")) + col("cc"), 6)
    val assigned = corpus
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"))
      .withColumn("vv", dot(col("v"), col("v")))
      .crossJoin(broadcast(cs))
      .groupBy("vid")
      .agg(min(struct(dist.as("d"), col("cid"))).as("m"),
        first("v").as("v"), first("nrm").as("nrm"))
      .select(col("vid"), col("v"), col("nrm"), col("m.cid").as("cid"))
      .localCheckpoint(true)
    val a = assigned.select(col("cid"), col("vid").as("ia"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cid"), col("vid").as("ib"),
      col("v").as("vb"), col("nrm").as("nb"))
    val nprod = col("na") * col("nb")
    val dropped = a.join(b, Seq("cid"))
      .filter(col("ia") > col("ib") &&
        round(when(nprod > 0, dot(col("va"), col("vb")) / nprod)
          .otherwise(lit(0.0)), 4) >= eps)
      .select(col("ia").as("vid")).distinct()
      .withColumn("dropped", lit(true))
    assigned.join(dropped, Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("cid"),
        coalesce(!col("dropped"), lit(true)).as("keep"))
  }

  /** IVF probe/score path over an explicit centroid table (cid, cv). */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  nProbe: Int, centroids: DataFrame): DataFrame = {
    val cents = centroids.withColumn("cc", dot(col("cv"), col("cv")))
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

  /** Recall@k evaluation — the harness every approximate index needs
    * before it replaces brute force in production: per query, the
    * fraction of GROUND-TRUTH neighbors (any (query_id, neighbor_id)
    * frame, typically [[bruteForceTopK]]) that the CANDIDATE result
    * (e.g. [[lshTopK]], [[ivfTopK]]) recovered. Returns
    * (query_id, n_truth, n_hit, recall) with recall rounded to 4
    * decimals for cross-engine hash stability.
    *
    * Scale shape: one semi-join on (query_id, neighbor_id) + two
    * per-query counts — all keyed by query id, AQE-splittable; result
    * cardinality = |queries|, independent of corpus size.
    */
  def recallAtK(truth: DataFrame, candidate: DataFrame): DataFrame = {
    val t = truth.select("query_id", "neighbor_id")
    val c = candidate.select("query_id", "neighbor_id")
    val nTruth = t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
    val nHit = t.join(c, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    nTruth.join(nHit, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_truth").cast("double"), 4).as("recall"))
  }
}
