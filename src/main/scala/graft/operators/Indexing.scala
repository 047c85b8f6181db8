package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokenHash64, tokens}

/** Retrieval-side operators: the index-building half of a corpus
  * pipeline (the reference's word finder, usr_functions.c:153-186, is
  * the SCAN form of the same question — "which lines contain w"; an
  * inverted index is that answer precomputed for every term at once).
  */
object Indexing {

  /** Capped inverted index: per token, the document frequency and the
    * `cap` LOWEST doc ids containing it (ascending — a deterministic,
    * fixed-width posting sample; real IR systems cap postings the same
    * way for the head of the vocabulary). The full df is exact; only
    * the id list is capped.
    *
    * Scale: one (token, doc) distinct + hash agg for df; the cap runs
    * as a row_number window per token — WindowGroupLimit prunes to
    * `cap` rows per partition BEFORE the exchange (the q07 top-k
    * machinery), so a stopword's million-doc posting never materializes
    * on one task. Returns (w, df, doc_ids).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val postings = docs
      .select(col(idCol).cast("long").as("id"),
        explode(tokens(col(textCol))).as("w"))
      .distinct()
    val dfreq = postings.groupBy("w").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("w").orderBy("id")
    val capped = postings.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .groupBy("w").agg(sort_array(collect_list(col("id"))).as("doc_ids"))
    dfreq.join(capped, Seq("w"))
  }

  /** BM25-lite ranked retrieval for a fixed term set — the scoring half
    * of search over a corpus (Robertson-Spärck Jones BM25 with the
    * repo's integer discipline): idf as floor-log2 bits (the q120
    * surprisal code length) and the tf saturation
    * (k1+1)·tf / (tf + k1·(1−b+b·dl/avgdl)) in milli-scaled integer
    * division with k1=1.2, b=0.75 — every division in one canonical
    * order, so scores are exact Longs any engine reproduces. A float
    * log/ln would NOT cross engines bit-identically; bits do.
    *
    * Scale: ONE corpus token pass — dl and the per-term tfs pivot into
    * the same per-doc hash agg (terms are literals, so each tf is a
    * conditional sum column); df/avgdl are bounded aggregates broadcast
    * back, and the top-k cut is TakeOrdered. (The first cut aggregated
    * dl and hits separately — two full corpus scans; ExplainAudit
    * showed the doubled parquet scan.) Returns
    * (id, n_terms_hit, score_milli) for the k best (score desc, id)
    * docs.
    */
  def bm25LiteTopK(docs: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tok = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
    val tfCols = terms.map(t =>
      sum(when(col("w") === t, 1L).otherwise(0L)).as(s"__tf_$t"))
    val perDoc = tok.groupBy("id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val dl = perDoc.select("id", "dl")
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
    val hits = perDoc.select(col("id"),
        explode(map(terms.flatMap(t =>
          Seq(lit(t), col(s"__tf_$t"))): _*)).as(Seq("w", "tf")))
      .filter(col("tf") > 0)
    val df_ = hits.groupBy("w").agg(count(lit(1)).as("df"))
    val idf = df_.join(broadcast(stats))
      .select(col("w"), (length(bin(expr("n_docs div df"))) - 1)
        .cast("long").as("idf_bits"))
    hits
      .join(broadcast(idf), Seq("w"))
      .join(dl, Seq("id"))
      .join(broadcast(stats))
      // avgdl_m = milli-tokens per doc; dln_m = dl/avgdl in milli;
      // K_m = k1*(1-b+b*dln) in milli; part = idf * (k1+1)*tf/(tf+K)
      .withColumn("__avgdl_m", expr("(n_tokens * 1000) div n_docs"))
      .withColumn("__dln_m", expr("(dl * 1000000) div __avgdl_m"))
      .withColumn("__k_m", expr("(1200 * (250 + (750 * __dln_m) div 1000)) div 1000"))
      .withColumn("__part",
        expr("idf_bits * ((tf * 2200 * 1000) div (tf * 1000 + __k_m))"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("__part").as("score_milli"))
      .orderBy(col("score_milli").desc, col("id"))
      .limit(k)
  }

  /** Per-document n-gram NOVELTY against a training corpus — the
    * memorization screen of Lee et al. 2022 / McCoy et al. run at
    * ingest: what fraction of an eval document's word n-grams never
    * occur in the train half. The corpus md5-splits like
    * [[Curation.bigramSurprisal]]; grams travel as CODEGEN'D xxhash64
    * keys (the q125 `hashGrams` trade: 8-byte keys through the
    * exchange; an engine-side collision can only UNDERCOUNT novelty by
    * one gram, odds ~2e-10 at oracle scale — the oracle joins the
    * exact gram STRINGS, so the hash never has to be reproduced
    * cross-engine. The first cut digested every gram occurrence
    * through an md5 UDF: 11.1 s at sf10 vs DuckDB's 3.3; xxhash64
    * keeps the per-occurrence work inside whole-stage codegen). One
    * distinct on the train side, one gram-keyed left join — both
    * shuffle-bounded by gram volume; the join is mandatory for EVERY
    * eval gram (misses are the signal), so no bloom can prune it.
    * Docs with fewer than n tokens have no grams and are not scored.
    * Returns (id, n_grams, n_unseen, novelty_ppm) for eval docs.
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, trainPpm: Long = 800000L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val gramUdf = udf { (toks: Seq[String]) =>
      if (toks == null || toks.size < n) Array.empty[String]
      else Array.tabulate(toks.size - n + 1)(i =>
        toks.slice(i, i + n).mkString(" "))
    }
    val base = docs.select(col(idCol).as("id"),
        (pmod(tokenHash64(concat(lit("novel_"), col(idCol).cast("string"))),
          lit(1000000L)) < trainPpm).as("is_train"),
        explode(gramUdf(tokens(col(textCol)))).as("__gram"))
      .select(col("id"), col("is_train"), xxhash64(col("__gram")).as("g"))
    val trainSet = base.filter(col("is_train")).select("g").distinct()
      .withColumn("seen", lit(1L))
    base.filter(!col("is_train"))
      .join(trainSet, Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("novelty_ppm", expr("(n_unseen * 1000000) div n_grams"))
  }

  /** Exact multi-word phrase search via POSITIONAL postings — the
    * operator [[invertedIndex]] (doc-level postings) cannot answer:
    * which documents contain `phrase` as consecutive tokens, where,
    * and how often. Candidate generation is phrase-words-only: the
    * token stream filters to the m phrase words BEFORE any exchange
    * (an `isin` the scan can evaluate), then m-1 equi-joins on
    * (doc, position + offset) verify adjacency — each join keyed on
    * (id, pos), so a stopword-heavy phrase shuffles its posting lists,
    * never the corpus, and AQE splits a hot word's partition. Returns
    * one row per matching doc: (id, n_matches, first_pos), positions
    * 1-based. Overlapping matches count separately (the literal
    * consecutive-window semantics).
    *
    * Scale: shuffle volume = Σ posting(w_i); no window, no per-doc
    * state. Degenerate inputs: a repeated word in the phrase is just
    * two joins against the same posting list at different offsets —
    * correct by construction.
    */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val toks = docs.select(col(idCol).cast("long").as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.distinct: _*))
    val first = toks.filter(col("w") === phrase.head)
      .select(col("id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (word, i)) =>
        val ti = toks.filter(col("w") === word)
          .select(col("id"), (col("pos") - i).as("p0"))
        acc.join(ti, Seq("id", "p0"))
    }
    matched.groupBy("id")
      .agg(count(lit(1)).as("n_matches"),
        (min(col("p0")) + 1).cast("long").as("first_pos"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of a SEMANTIC ranking
    * (exact cosine over the doc embeddings, [[Ann.bruteForceTopK]]) and
    * a LEXICAL ranking (distinct-token Jaccard against the query doc's
    * token set) — the standard hybrid-retrieval shape every RAG stack
    * runs: `score(d) = Σ_lists 1/(rrfK + rank_list(d))`, here in exact
    * integer ppm (`1000000 div (rrfK + rank)`) so both engines fuse
    * bit-identically.
    *
    * Scale: the query set is broadcast on BOTH signals — the corpus
    * token explode joins broadcast query tokens (posting-style, never
    * all-pairs) and the embedding side reuses the broadcast-join brute
    * scorer; fusion itself touches only |Q|·2·listK rank rows. At
    * 100 TB the lexical side's shuffle is bounded by corpus tokens ∩
    * query vocabulary, not by the corpus.
    *
    * `docs` and `emb` must share the id domain (doc_id == vec_id).
    * Returns (query_id, neighbor_id, n_lists, rrf_ppm, rnk), top `k`
    * fused neighbors per query.
    */
  def rrfHybridTopK(docs: DataFrame, emb: DataFrame, idCol: String,
                    textCol: String, vecCol: String, queryMax: Long,
                    listK: Int, rrfK: Int, k: Int): DataFrame = {
    require(listK >= k, s"listK=$listK must be >= k=$k")
    val sem = Ann.bruteForceTopK(emb, emb.filter(col(idCol) < queryMax),
        idCol, vecCol, listK)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val tok = docs.select(col(idCol).cast("long").as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("w"))
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("nt"))
    val qtok = tok.filter(col("id") < queryMax)
      .select(col("id").as("query_id"), col("w"))
    val qsize = sizes.filter(col("id") < queryMax)
      .select(col("id").as("query_id"), col("nt").as("qnt"))
    val inter = tok.join(broadcast(qtok), Seq("w"))
      .filter(col("id") =!= col("query_id"))
      .groupBy("query_id", "id").agg(count(lit(1)).as("inter"))
    val jac = inter.join(sizes, Seq("id")).join(broadcast(qsize), Seq("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        expr("inter * 1000000 div (nt + qnt - inter)").as("jac_ppm"))
    val wl = Window.partitionBy("query_id")
      .orderBy(col("jac_ppm").desc, col("neighbor_id").asc)
    val lex = jac.withColumn("rank", row_number().over(wl))
      .filter(col("rank") <= listK)
      .select("query_id", "neighbor_id", "rank")
    val fused = sem.unionByName(lex)
      .groupBy("query_id", "neighbor_id")
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(expr(s"1000000 div ($rrfK + rank)")).cast("long").as("rrf_ppm"))
    val wf = Window.partitionBy("query_id")
      .orderBy(col("rrf_ppm").desc, col("neighbor_id").asc)
    fused.withColumn("rnk", row_number().over(wf).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** The STANDING half of [[bm25LiteTopK]] split for ingest-time reuse
    * (the q203/q206-q209 persisted-index pattern applied to retrieval):
    * ONE corpus token pass yields the three tables a BM25 scorer needs —
    *  - postings (wb, w, id, tf): the full inverted index with term
    *    frequencies, `wb` a `buckets`-way term shard (write it
    *    PARTITIONED BY wb and a probe's equi-filter prunes to its
    *    terms' shard files — the cid-partitioned IVF layout applied to
    *    a term dictionary, which is too wide to partition by raw `w`);
    *  - doclen (id, dl): per-doc token counts (docs with no tokens have
    *    no postings and no dl row — exactly [[bm25LiteTopK]]'s perDoc
    *    domain);
    *  - stats (n_docs, n_tokens): the two corpus scalars.
    * df is NOT stored: it is derivable per probed term from its own
    * postings, so the index never goes stale against itself.
    */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String,
                buckets: Int): (DataFrame, DataFrame, DataFrame) = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val tok = docs.select(col(idCol).cast("long").as("id"),
      explode(tokens(col(textCol))).as("w"))
    val postings = tok.groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("wb", pmod(xxhash64(col("w")), lit(buckets.toLong)))
      .select("wb", "w", "id", "tf")
    val doclen = postings.groupBy("id").agg(sum("tf").as("dl"))
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("n_tokens"))
    (postings, doclen, stats)
  }

  /** Index MAINTENANCE for the standing BM25 index — the q219/q221 LSH
    * upsert doctrine applied to retrieval (a corpus receives documents
    * continuously; probing is read-only, an accepted batch must be
    * FOLDED INTO the standing index, never force a rebuild): merge
    * `batch` into a prebuilt [[bm25Index]] triple with UPSERT
    * semantics — a batch id already present REPLACES its old rows (the
    * re-ingest of an edited document), a new id appends. Batch ids
    * must be unique within the batch.
    *
    * Exactness is structural: postings and doclen are pure PER-DOCUMENT
    * functions of the text (tf, dl — no cross-document state), so
    * `postings MINUS batch-ids' rows UNION postings(batch)` is
    * row-identical to `bm25Index(corpus with batch applied)`; df is
    * not stored (derived at probe time from the postings themselves,
    * [[bm25Index]] scaladoc), so nothing else can go stale. The stats
    * row folds incrementally — n_docs/n_tokens are Long sums, so
    * `old − replaced docs' contribution + batch contribution` is exact
    * integer arithmetic. merge == rebuild is proven bit-exact per
    * frame in Bm25MaintenanceSpec, including the zero-token
    * replacement edge (a doc re-ingested empty leaves the doclen/stats
    * domain, exactly as a rebuild would drop it).
    *
    * Cost/plan shape: only the BATCH tokenizes; the batch-id set
    * BROADCASTS into one anti join, so the standing postings stream
    * once map-side and never shuffle, and the removed-contribution
    * aggregate reads the (much smaller) doclen table with the same
    * broadcast semi join. Physical write story for a wb-partitioned
    * store: new rows land only in the batch's terms' shards and the
    * replaced ids' shards are identifiable from the same stream, so an
    * upsert rewrites TOUCHED term shards only — untouched shard files
    * are untouched.
    */
  def bm25IndexUpsert(postings: DataFrame, doclen: DataFrame,
                      stats: DataFrame, batch: DataFrame,
                      idCol: String, textCol: String,
                      buckets: Int): (DataFrame, DataFrame, DataFrame) = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val (bPostings, bDoclen, _) = bm25Index(batch, idCol, textCol, buckets)
    val bIds = batch.select(col(idCol).cast("long").as("id")).distinct()
    val p2 = postings.join(broadcast(bIds), Seq("id"), "left_anti")
      .select("wb", "w", "id", "tf")
      .unionByName(bPostings)
    val d2 = doclen.join(broadcast(bIds), Seq("id"), "left_anti")
      .unionByName(bDoclen)
    // replaced contribution: bounded by the batch (semi join on doclen);
    // count/sum over zero rows -> 0/NULL, coalesced so an append-only
    // batch folds cleanly
    val removed = doclen.join(broadcast(bIds), Seq("id"), "left_semi")
      .agg(count(lit(1)).as("__r_docs"),
        coalesce(sum("dl"), lit(0L)).as("__r_tokens"))
    val added = bDoclen.agg(count(lit(1)).as("__a_docs"),
      coalesce(sum("dl"), lit(0L)).as("__a_tokens"))
    val s2 = stats.crossJoin(broadcast(removed)).crossJoin(broadcast(added))
      .select(
        (col("n_docs") - col("__r_docs") + col("__a_docs")).as("n_docs"),
        (col("n_tokens") - col("__r_tokens") + col("__a_tokens")).as("n_tokens"))
    (p2, d2, s2)
  }

  /** The DELETE half of BM25 index maintenance (the tombstone pass a
    * takedown or retention policy runs — [[bm25IndexUpsert]]'s sibling,
    * q221's shape): remove `deletedIds` (one id column; ids absent from
    * the index are no-ops) from a prebuilt [[bm25Index]] triple. The
    * deleted-id set BROADCASTS into the two anti joins, so postings and
    * doclen each stream once map-side and never shuffle; the stats row
    * folds down by the deleted docs' (bounded, semi-joined) dl
    * contribution in exact Long arithmetic. delete == rebuild over
    * (corpus MINUS deleted) bit-exactly, by the same per-document
    * purity argument as the upsert — proven per frame in
    * Bm25MaintenanceSpec.
    */
  def bm25IndexDelete(postings: DataFrame, doclen: DataFrame,
                      stats: DataFrame,
                      deletedIds: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val del = deletedIds
      .select(col(deletedIds.columns.head).cast("long").as("id")).distinct()
    val p2 = postings.join(broadcast(del), Seq("id"), "left_anti")
      .select("wb", "w", "id", "tf")
    val d2 = doclen.join(broadcast(del), Seq("id"), "left_anti")
    val removed = doclen.join(broadcast(del), Seq("id"), "left_semi")
      .agg(count(lit(1)).as("__r_docs"),
        coalesce(sum("dl"), lit(0L)).as("__r_tokens"))
    val s2 = stats.crossJoin(broadcast(removed))
      .select((col("n_docs") - col("__r_docs")).as("n_docs"),
        (col("n_tokens") - col("__r_tokens")).as("n_tokens"))
    (p2, d2, s2)
  }

  /** The PROBE half: score `terms` against a persisted [[bm25Index]] —
    * row-identical to [[bm25LiteTopK]] over the same corpus (the split
    * is definitional; spec'd). The postings filter carries BOTH the
    * term equality and the term-shard equality, so a wb-partitioned
    * index reads only the probed terms' shard directories; df and idf
    * are recomputed from the touched postings alone; doclen joins only
    * the hit docs. Nothing here scans the corpus text.
    */
  def bm25ProbeTopK(postings: DataFrame, doclen: DataFrame, stats: DataFrame,
                    terms: Seq[String], buckets: Int, k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val termBuckets = terms.map { t =>
      // the same xxhash64(seed 42) + pmod the index side applied,
      // evaluated at PLAN time so the wb predicate is a literal IN —
      // the shape partition pruning needs
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType, 42L)
      val m = buckets.toLong
      (((h % m) + m) % m): java.lang.Long
    }.distinct
    val hits = postings
      .filter(col("wb").isin(termBuckets: _*) && col("w").isin(terms: _*))
      .select("id", "w", "tf")
    val df_ = hits.groupBy("w").agg(count(lit(1)).as("df"))
    val idf = df_.join(broadcast(stats))
      .select(col("w"), (length(bin(expr("n_docs div df"))) - 1)
        .cast("long").as("idf_bits"))
    hits
      .join(broadcast(idf), Seq("w"))
      .join(doclen, Seq("id"))
      .join(broadcast(stats))
      .withColumn("__avgdl_m", expr("(n_tokens * 1000) div n_docs"))
      .withColumn("__dln_m", expr("(dl * 1000000) div __avgdl_m"))
      .withColumn("__k_m", expr("(1200 * (250 + (750 * __dln_m) div 1000)) div 1000"))
      .withColumn("__part",
        expr("idf_bits * ((tf * 2200 * 1000) div (tf * 1000 + __k_m))"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("__part").as("score_milli"))
      .orderBy(col("score_milli").desc, col("id"))
      .limit(k)
  }
}
