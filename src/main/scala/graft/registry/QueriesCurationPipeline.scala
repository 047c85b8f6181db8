package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Scale.MaterializeOps
import graft.engine.Tables._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.multimodal.Multimodal
import graft.operators.{Ann, Bpe, Chunking, Curation, Dedup, GraphOps, Indexing, Relational, Sketches, TextJobs}

import graft.QueryShared._

/** CurationPipeline query registry — corpus curation: mixing, selection, budgets, shuffling, reports.
  * Split verbatim from SparkEntry (round 12): every entry is the
  * original closure/SQL, unchanged; SparkEntry concatenates the
  * family maps back into the driver contract.
  */
private[graft] object QueriesCurationPipeline {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q40_quality_by_source" -> ((s, d) => {
      documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(qualityScore(col("text"))), 4).as("avg_quality"),
          sum(tokenCount(col("text")).cast("long")).as("total_tokens"))
        .orderBy("source")
    }),

    "q64_curation_pipeline" -> ((s, d) => {
      // end-to-end curation: exact-dedup keepers ∩ langId='en' ∩
      // quality >= 0.5, kept doc/token counts per source — the composed
      // form of q29 + q28 + q40
      val docs = documents(s, d)
      val keepers = Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      // one tokenize per surviving doc, shared by lang + quality + count
      docs.join(keepers, Seq("doc_id"), "left_semi")
        .withColumn("toks", tokens(col("text")))
        .filter(langIdFrom(col("toks")) === "en" &&
          qualityScoreFrom(col("text"), col("toks")) >= 0.5)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(size(col("toks")).cast("long")).as("kept_tokens"))
        .orderBy("source")
    }),

    "q72_source_mix" -> ((s, d) =>
      // deterministic weighted mixing: downsample three sources, keep the
      // rest; per-source kept counts prove the mix
      Curation.sourceMix(documents(s, d), "source", "doc_id",
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("source")),

    "q73_hash_sample_k" -> ((s, d) =>
      // fixed 5-doc eval carve-out per source, stable across runs
      Curation.hashSamplePerGroup(documents(s, d), "source", "doc_id", 5)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")),

    "q65_hash_split" -> ((s, d) =>
      // deterministic train/val/test split: md5-keyed bucket per doc —
      // reproducible across runs/engines, unlike rand()-based sampling
      documents(s, d)
        .select(col("source"),
          pmod(tokenHash64(concat(lit("split_"), col("doc_id").cast("string"))),
            lit(100L)).as("b"))
        .withColumn("split",
          when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "split")),

    "q98_zorder" -> ((s, d) => {
      // z-value computation itself (the layout operator's key): morton
      // interleave of customer x order-day — oracle recomputes the same
      // bit arithmetic; the LAYOUT effect (narrow per-file ranges on both
      // dims after range partitioning) is asserted in ScaleSpec
      orders(s, d)
        .select(col("o_orderkey"),
          pmod(col("o_custkey"), lit(1024L)).as("x"),
          pmod(datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")),
            lit(1024)).cast("long").as("y"))
        .select(col("o_orderkey"), col("x"), col("y"),
          graft.engine.Scale.zValue2(col("x"), col("y"), 10).as("zval"))
        .orderBy("o_orderkey")
    }),

    "q102_shuffle_shards" -> ((s, d) =>
      // deterministic global training-order shuffle: md5-derived sort
      // key, shard = key mod 16, exact in-shard position — the
      // reproducible pre-write shuffle of a training pipeline
      // (Curation.shuffleShards scaladoc for the 100 TB shape)
      Curation.shuffleShards(documents(s, d), "doc_id", 16)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")),

    "q103_stratified_sample" -> ((s, d) =>
      // exact-quota stratified sample: precisely ceil(0.125 * n_s) docs
      // per source, smallest sample-hash first — histogram-thresholded
      // with boundary refinement, never a full per-group ranking
      Curation.stratifiedSample(documents(s, d), "source", "doc_id", 0.125)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")),

    "q108_metadata_audit" -> ((s, d) =>
      // precomputed-metadata validation: does documents.n_chars agree
      // with the text payload? The standard sanity pass a pipeline runs
      // after ingest — map-only + one bounded rollup per source
      documents(s, d).groupBy("source")
        .agg(sum(col("n_chars")).as("sum_meta_chars"),
          sum(length(col("text")).cast("long")).as("sum_text_chars"),
          sum(when(col("n_chars") === length(col("text")), 1L).otherwise(0L))
            .as("n_consistent"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")),

    "q114_quality_classifier" -> ((s, d) =>
      // Frozen-weight linear quality model applied corpus-wide — pure
      // integer features/score, so the keep/drop verdict is
      // bit-reproducible on any engine or partition count
      // (Curation.linearQualityScore scaladoc). Map-only, no shuffle.
      Curation.linearQualityScore(documents(s, d), "doc_id", "text",
          wLen = 3L, wStop = 2L, wAlpha = 5L, wWlen = -1L, threshold = 4000L)
        .orderBy("id")),

    "q133_budget_select" -> ((s, d) => {
      // Token-budget data selection: q114's frozen integer quality
      // model ranks the corpus, and the maximal best-first prefix that
      // fits a 12K-token budget is selected via a DISTRIBUTED prefix
      // sum (one range exchange + a one-row-per-partition collect —
      // never a single-partition global window). Integer scores make
      // the order, and so the selected set, engine-exact
      // (Curation.budgetSelect scaladoc).
      val docs = documents(s, d)
      val scored = Curation.linearQualityScore(docs, "doc_id", "text",
          wLen = 3L, wStop = 2L, wAlpha = 5L, wWlen = -1L, threshold = 4000L)
        .select(col("id"), col("score"))
      val toks = docs.select(col("doc_id").cast("long").as("id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      Curation.budgetSelect(scored.join(toks, "id"), "id", "score",
          "n_tokens", budget = 12000L)
        .orderBy("id")
    }),

    "q136_pps_sample" -> ((s, d) => {
      // Probability-proportional-to-size sampling: p_i = min(1,
      // ntok_i/1000) on a deterministic md5 coin, with the integer
      // Horvitz-Thompson weight attached (Curation.ppsSample scaladoc).
      val base = documents(s, d).select(col("doc_id").cast("long").as("id"),
        size(tokens(col("text"))).cast("long").as("ntok"))
      Curation.ppsSample(base, "id", "ntok", ratePerMillion = 1000L)
        .orderBy("id")
    }),

    "q139_dsir_select" -> ((s, d) =>
      // DSIR data selection (arXiv:2302.03169): importance weights
      // between the 'en' slice and the raw corpus over 1024 hashed
      // bigram buckets, in exact integer bits — the weight table is
      // bounded and broadcast, the corpus never shuffles on a pair key
      // (Curation.dsirSelect scaladoc).
      Curation.dsirSelect(documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en", nBuckets = DsirBuckets, topM = 100)
        .orderBy(col("score").desc, col("id"))),

    "q141_temperature_mix" -> ((s, d) =>
      // XLM-style p^0.5 temperature rebalancing across languages:
      // integer per-lang keep rates from the driver-side BigInt formula
      // (bounded collect: one row per lang), applied as a map-only
      // md5-coin filter (Curation.temperatureSample scaladoc).
      Curation.temperatureSample(documents(s, d), "doc_id", "lang",
          budgetDivisor = 2L)
        .orderBy("id")),

    "q143_source_drift" -> ((s, d) =>
      // Per-source cross-vs-self entropy gap (integer-bits KL proxy):
      // the per-ingest mixture-health monitor (Curation.sourceDrift
      // scaladoc).
      Curation.sourceDrift(documents(s, d), "doc_id", "text", "source")
        .orderBy("src")),

    "q156_rendezvous_shards" -> ((s, d) => {
      // Elastic re-sharding audit under rendezvous (HRW) hashing: assign
      // every doc under the old (12) and new (16) fleet, count movers
      // per new shard. HRW's contract — movers land ONLY on the added
      // shards — is visible in the result: n_moved = 0 for shard < 12
      // (Curation.rendezvousAssign scaladoc; map-only, zero shuffle
      // before the 16-key count agg).
      val docs = documents(s, d).select(col("doc_id"))
      val v1 = Curation.rendezvousAssign(docs, "doc_id", HrwOldShards,
        HrwSalt, "shard_v1")
      Curation.rendezvousAssign(v1, "doc_id", HrwNewShards, HrwSalt, "shard")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard") =!= col("shard_v1"), 1L).otherwise(0L)).as("n_moved"))
        .orderBy("shard")
    }),

    "q157_skyline" -> ((s, d) =>
      // Pareto frontier (min price, max size) over part — the
      // multi-objective "best offers" operator. Distributed as local
      // skyline per partition + one tiny final pass over survivors,
      // never the O(n²) dominance join the oracle runs
      // (Relational.skylineMinMax scaladoc). Prices compare as exact
      // cents.
      Relational.skylineMinMax(
          part(s, d).select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"),
            col("p_size")),
          "p_partkey", "price_c", "p_size")
        .orderBy("price_c", "p_partkey")),

    "q176_assoc_rules" -> ((s, d) =>
      // Market-basket rules over per-user event-type baskets:
      // support/confidence/lift as fused integer ratios; pair fan-out
      // bounded by the type-domain constant, marginals broadcast
      // (Relational.assocRules scaladoc).
      Relational.assocRules(events(s, d), "user_id", "event_type")
        .orderBy("antecedent", "consequent")),

    "q185_cooccur_recs" -> ((s, d) =>
      // "Bought X, also bought Y": per-part top-3 co-purchase partners
      // by exact integer cosine² over order baskets — basket-keyed
      // pair fan-out, never catalog×catalog
      // (Relational.cooccurRecsTopK scaladoc).
      Relational.cooccurRecsTopK(
          lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey",
          minBoth = CooccurMinBoth, topK = CooccurTopK)
        .select(col("item").as("part_id"), col("rec_item").as("rec_part_id"),
          col("n_both"), col("n_item"), col("n_rec"), col("score_ppm"),
          col("rn"))
        .orderBy("part_id", "rn")),

    "q199_activity_select" -> ((s, d) => {
      // Max conflict-free sessions per user (earliest-end greedy,
      // provably optimal) over the q183 activity windows — the
      // scheduling complement of q183's coverage sum
      // (Relational.activitySelect scaladoc); oracle replays the fold
      // as a rank-indexed recursive CTE.
      val iv = events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + lit(IntervalSessionSec * 1000000L))
          .as("e_us"))
      Relational.activitySelect(iv, "user_id", "s_us", "e_us")
        .select(col("k").as("user_id"), col("n_total"), col("n_selected"))
        .orderBy("user_id")
    }),

    "q200_corpus_report" -> ((s, d) => {
      // Corpus health report — the daily monitoring composition a
      // curation pipeline alerts on: doc count, unique-content count
      // (q29's fingerprint), total token volume, and long-doc count,
      // as one (metric, value) frame. Four independent aggs over ONE
      // scanned frame; each metric is a single bounded row.
      val docs = documents(s, d)
      val base = docs.select(col("text"),
        fingerprint(col("text")).as("fp"),
        size(tokens(col("text"))).cast("long").as("ntok"))
      base.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique_texts"),
          sum(col("ntok")).as("total_tokens"),
          count(when(col("ntok") >= 50, 1)).as("n_len50"))
        .select(explode(map(
          lit("n_docs"), col("n_docs").cast("long"),
          lit("n_len50"), col("n_len50").cast("long"),
          lit("n_unique_texts"), col("n_unique_texts").cast("long"),
          lit("total_tokens"), col("total_tokens").cast("long")))
          .as(Seq("metric", "value")))
        .orderBy("metric")
    }),

    "q237_budget_waterfill" -> ((s, d) => {
      // Integer water-filling over per-source token supplies at a 60%
      // total budget — the fair-division allocation a mixing plan runs
      // before q65's weighted mix: under-supplied sources satisfied in
      // full (ascending-supply walk), the rest capped at the water
      // level, all exact integers (Curation.waterFill scaladoc). The
      // per-source supply table is the ONE corpus agg; the fold is a
      // bounded driver pass; oracle replays the walk as a recursive
      // CTE over the ranked sources.
      val sup = documents(s, d)
        .select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
        .groupBy("source").agg(sum("nt").as("sv"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("sv")).toSeq
      val budget = sup.map(_._2).sum * 60L / 100L
      val alloc = Curation.waterFill(sup, budget).toMap
      import s.implicits._
      sup.map { case (src, sv) =>
        (src, sv, alloc(src), if (alloc(src) == sv) 1L else 0L) }
        .toDF("source", "supply_tokens", "allocated_tokens", "fully_satisfied")
        .orderBy("source")
    }),

    "q248_basket_rules" -> ((s, d) => {
      // Market-basket association rules over order brand-baskets:
      // support, directed confidence and lift (exact integer ppm,
      // canonical division order — the same floor-division contract
      // the oracle replays) for every brand pair co-purchased in at
      // least MinSup orders. Pair fan-out is C(brands,2) ≤ 300 per
      // order — bounded by the BRAND domain, never order size — and
      // runs MAP-SIDE from one basket agg. Lift's division order
      // (conf first, then × N ÷ cnt_b) keeps every intermediate under
      // 2⁶³ at any corpus size.
      val li = lineitem(s, d).select(col("l_orderkey").as("o"),
        col("l_partkey"))
      val pt = part(s, d).select(col("p_partkey").as("l_partkey"),
        col("p_brand"))
      // posting-list form, not a basket self-join (the q185 lesson,
      // re-confirmed here: the self-join shape measured 25x/decade
      // into sf10 — distinct exchange + two join sorts + the join
      // exchange; this one collect_sets per order once and fans the
      // <=C(25,2) pairs map-side): ONE order-keyed exchange, then two
      // generators and a 300-key agg
      val sets = li.join(pt, "l_partkey")
        .select(col("o"), col("p_brand").as("b"))
        .groupBy("o").agg(sort_array(collect_set(col("b"))).as("bs"))
      val nOrders = sets.count()
      val cnt = sets.select(explode(col("bs")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("cnt"))
      val pairs = sets
        .select(col("bs"), explode(col("bs")).as("ba"))
        .select(col("ba"), explode(col("bs")).as("bb"))
        .filter(col("ba") < col("bb"))
        .groupBy(col("ba").as("b_a"), col("bb").as("b_b"))
        .agg(count(lit(1)).as("support"))
      pairs
        .join(cnt.select(col("b").as("b_a"), col("cnt").as("cnt_a")), "b_a")
        .join(cnt.select(col("b").as("b_b"), col("cnt").as("cnt_b")), "b_b")
        .filter(col("support") >= BasketMinSup)
        .select(col("b_a"), col("b_b"), col("support"),
          col("cnt_a"), col("cnt_b"),
          expr("support * 1000000 div cnt_a").as("conf_ab_ppm"),
          expr(s"((support * 1000000 div cnt_a) * ${nOrders}L) div cnt_b")
            .as("lift_ppm"))
        .orderBy("b_a", "b_b")
    }),

    "q259_quality_dup_lift" -> ((s, d) => {
      // Curation cross-signal: are low-quality docs more likely
      // near-duplicates? Quality deciles (the q40 score; decile cut on
      // the exact 4-decimal value scaled to an integer, so no float
      // boundary crosses engines) × the q33 simhash dup membership,
      // dup rate per decile in exact ppm — the lift table that decides
      // whether a dedup pass doubles as a quality filter. One quality
      // projection, one dup-id semi-structure, one 10-row agg.
      val docs = documents(s, d)
      val qual = docs.select(col("doc_id"),
          qualityScore(col("text")).as("q"))
        .withColumn("decile",
          least(expr("cast(floor(q * 10000 + 0.5d) as bigint) div 1000"), lit(9L)))
      val pairs = Dedup.simHashDup(docs, "doc_id", "text", nBits = 16)
      val dupIds = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
        .withColumn("is_dup", lit(1L))
      qual.join(dupIds, Seq("doc_id"), "left")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
        .withColumn("dup_ppm", expr("n_dup * 1000000 div n_docs"))
        .orderBy("decile")
    }),

    "q266_priority_sample" -> ((s, d) =>
      // Priority sampling (Duffield et al. 2007): EXACT-size weighted
      // sample of k=50 documents, weight = text length — bottom-k of
      // the integer key u div w over a deterministic 60-bit md5 coin,
      // so heavier docs are likelier in; map-only + TakeOrdered, and
      // the same corpus yields the same sample on every engine
      // (Curation.prioritySample scaladoc).
      Curation.prioritySample(
        documents(s, d).select(col("doc_id"), length(col("text")).as("w")),
        "doc_id", "w", k = 50)),
  )

  val oracleSql: Map[String, String] = Map(

    "q40_quality_by_source" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT source, text, $TOKS AS toks FROM documents),
         |s AS (SELECT source, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop FROM t),
         |q AS (SELECT source, n_tokens,
         |  floor((least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3)*10000 + 0.5)/10000.0 AS quality
         | FROM s)
         |SELECT source, COUNT(*) AS n_docs, round(avg(quality), 4) AS avg_quality,
         | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q29 + q28 + q40 composed: dedup keepers ∩ lang='en' ∩ quality>=0.5.
    "q64_curation_pipeline" -> {
      def cnt(markers: Seq[String]) = {
        val in = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($in)))"
      }
      val m = LangMarkers.toMap
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH k AS (SELECT min(doc_id) AS doc_id FROM documents
         | GROUP BY md5(regexp_replace(lower(trim(text)),'\\s+',' ','g'))),
         |d2 AS (SELECT d.* FROM documents d JOIN k USING (doc_id)),
         |t AS (SELECT source, text, $TOKS AS toks FROM d2),
         |s AS (SELECT source, text, toks,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop,
         |  ${cnt(m("en"))} AS s_en, ${cnt(m("de"))} AS s_de,
         |  ${cnt(m("fr"))} AS s_fr, ${cnt(m("es"))} AS s_es
         | FROM t),
         |q AS (SELECT source, n_tokens,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |       WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
         |       WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
         |       WHEN s_de > s_en THEN 'de'
         |       ELSE 'en' END AS lang,
         |  floor((least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3)*10000 + 0.5)/10000.0 AS quality
         | FROM s)
         |SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
         |FROM q WHERE lang = 'en' AND quality >= 0.5
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q72_source_mix" ->
      s"""WITH m AS (SELECT source,
         | ${duckHash("concat('mix_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 AS key
         | FROM documents)
         |SELECT source, COUNT(*) AS n_kept FROM m
         |WHERE key < (CASE WHEN source = 'src0' THEN 500000
         |                  WHEN source = 'src1' THEN 250000
         |                  WHEN source = 'src2' THEN 0
         |                  ELSE 1000000 END)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q73_hash_sample_k" ->
      s"""WITH m AS (SELECT source, doc_id,
         | ${duckHash("concat('sample_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 AS key
         | FROM documents),
         |r AS (SELECT source, doc_id,
         |  row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rn FROM m)
         |SELECT source, doc_id FROM r WHERE rn <= 5
         |ORDER BY source, doc_id""".stripMargin,

    "q65_hash_split" ->
      s"""WITH b AS (SELECT source,
         | ${duckHash("concat('split_', CAST(doc_id AS VARCHAR))", 15)} % 100 AS b
         | FROM documents)
         |SELECT source,
         | CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
         | COUNT(*) AS n
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q98_zorder" -> {
      // bit-interleave generated from the same (bit, position) pairs as
      // Scale.zValue2(_, _, 10)
      val z = (0 until 10).flatMap(b => Seq(
        s"(((x >> $b) & 1) << ${2 * b})", s"(((y >> $b) & 1) << ${2 * b + 1})"))
        .mkString(" | ")
      s"""WITH t AS (SELECT o_orderkey,
         |  CAST(o_custkey % 1024 AS BIGINT) AS x,
         |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS y
         | FROM orders)
         |SELECT o_orderkey, x, y, CAST($z AS BIGINT) AS zval
         |FROM t ORDER BY o_orderkey""".stripMargin
    },

    "q102_shuffle_shards" ->
      s"""WITH m AS (SELECT doc_id,
         | ${duckHash("concat('shuffle_', CAST(doc_id AS VARCHAR))", 15)} AS h
         | FROM documents)
         |SELECT doc_id, h % 16 AS shard,
         | row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS pos
         |FROM m ORDER BY shard, pos""".stripMargin,

    // the histogram + boundary-refinement plan must select EXACTLY the
    // rank <= ceil(frac*n) head of each group's (key, id) ordering —
    // the oracle spells out that definition directly
    "q103_stratified_sample" ->
      s"""WITH m AS (SELECT source, doc_id,
         | ${duckHash("concat('strat_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 AS key
         | FROM documents),
         |n AS (SELECT source, COUNT(*) AS n FROM m GROUP BY 1),
         |r AS (SELECT m.source, m.doc_id,
         |  row_number() OVER (PARTITION BY m.source ORDER BY key, doc_id) AS rn, n.n
         | FROM m JOIN n USING (source))
         |SELECT source, doc_id FROM r
         |WHERE rn <= CAST(ceil(0.125 * n) AS BIGINT)
         |ORDER BY source, doc_id""".stripMargin,

    "q108_metadata_audit" ->
      """SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_meta_chars,
        | CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
        | CAST(SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
        | COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // Integer feature/score twin; DuckDB's `//` floors like Spark's
    // `div` truncates — identical for the nonnegative operands here.
    "q114_quality_classifier" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id AS id, text, $TOKS AS toks FROM documents),
         |c AS (SELECT id,
         |  CAST(len(toks) AS BIGINT) AS ntok,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS nstop,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS nalpha,
         |  CAST(length(text) AS BIGINT) AS nchars
         | FROM t),
         |f AS (SELECT id,
         |  least(ntok, 100) AS f_len,
         |  CASE WHEN ntok > 0 THEN 1000 * nstop // ntok ELSE 0 END AS f_stop,
         |  CASE WHEN nchars > 0 THEN 1000 * nalpha // nchars ELSE 0 END AS f_alpha,
         |  CASE WHEN ntok > 0 THEN nchars // ntok ELSE 0 END AS f_wlen
         | FROM c)
         |SELECT id, f_len, f_stop, f_alpha, f_wlen,
         |  3*f_len + 2*f_stop + 5*f_alpha - 1*f_wlen AS score,
         |  3*f_len + 2*f_stop + 5*f_alpha - 1*f_wlen >= 4000 AS keep
         |FROM f ORDER BY id""".stripMargin
    },

    // The PPS inclusion rule and HT weight recomputed in the same Long
    // arithmetic on the same md5 coin (Curation.ppsSample scaladoc)
    "q136_pps_sample" ->
      s"""WITH t AS (SELECT doc_id AS id,
         |  CAST(len($TOKS) AS BIGINT) AS ntok FROM documents),
         |p AS (SELECT id, ntok, least(1000000, ntok * 1000) AS p_num,
         |  ${duckHash("concat('pps_', CAST(id AS VARCHAR))", 15)} % 1000000 AS h
         | FROM t)
         |SELECT id, ntok, p_num, ntok * 1000000 // p_num AS ht_size
         |FROM p WHERE h < p_num ORDER BY id""".stripMargin,

    // q114's integer score CTEs + a window cumsum over (score DESC, id)
    // — DuckDB's single-threaded global window IS sound at oracle
    // scale; the engine side replaces it with the distributed prefix
    // sum (Curation.budgetSelect scaladoc)
    "q133_budget_select" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id AS id, text, $TOKS AS toks FROM documents),
         |c AS (SELECT id,
         |  CAST(len(toks) AS BIGINT) AS ntok,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS nstop,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS nalpha,
         |  CAST(length(text) AS BIGINT) AS nchars
         | FROM t),
         |f AS (SELECT id, ntok,
         |  least(ntok, 100) AS f_len,
         |  CASE WHEN ntok > 0 THEN 1000 * nstop // ntok ELSE 0 END AS f_stop,
         |  CASE WHEN nchars > 0 THEN 1000 * nalpha // nchars ELSE 0 END AS f_alpha,
         |  CASE WHEN ntok > 0 THEN nchars // ntok ELSE 0 END AS f_wlen
         | FROM c),
         |s AS (SELECT id,
         |  CAST(3*f_len + 2*f_stop + 5*f_alpha - 1*f_wlen AS BIGINT) AS score,
         |  ntok AS n_tokens FROM f),
         |cum AS (SELECT id, score, n_tokens,
         |  CAST(SUM(n_tokens) OVER (ORDER BY score DESC, id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         | FROM s)
         |SELECT id, score, n_tokens, cum_tokens FROM cum
         |WHERE cum_tokens <= 12000 ORDER BY id""".stripMargin
    },

    // the bounded 1024-bucket weight table and the integer-bits
    // log-ratio recomputed verbatim; the top-100 cut is total-ordered
    // (score desc, id) so the selected SET is deterministic
    "q139_dsir_select" ->
      s"""WITH t AS (SELECT doc_id AS id, lang = 'en' AS tgt, $TOKS AS toks FROM documents),
         |f AS (SELECT id, tgt, unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         |  ELSE list_transform(generate_series(1, len(toks)-1),
         |    i -> toks[i] || ' ' || toks[i+1]) END) AS gram FROM t),
         |fb AS (SELECT id, tgt,
         |  ${duckHash("concat('dsir_', gram)", 15)} % $DsirBuckets AS b FROM f),
         |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt_raw,
         |  CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_tgt
         | FROM fb GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt_raw) AS BIGINT) AS n_raw,
         |  CAST(SUM(cnt_tgt) AS BIGINT) AS n_tgt FROM c),
         |w AS (SELECT b, CAST((length(bin(tot.n_raw // (cnt_raw + 1))) - 1)
         |  - (length(bin(tot.n_tgt // (cnt_tgt + 1))) - 1) AS BIGINT) AS wt
         | FROM c, tot)
         |SELECT fb.id, CAST(COUNT(*) AS BIGINT) AS n_feat,
         | CAST(SUM(w.wt) AS BIGINT) AS score
         |FROM fb JOIN w USING (b) GROUP BY 1
         |ORDER BY score DESC, id LIMIT 100""".stripMargin,

    // the driver-side BigInt rate formula re-derived in HUGEINT; sqrt
    // is IEEE-correctly-rounded in both engines so floor(sqrt(n)*1000)
    // is bit-identical
    "q141_temperature_mix" ->
      s"""WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         |s AS (SELECT lang, n,
         |  CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS sl FROM g),
         |tot AS (SELECT CAST(SUM(sl) AS BIGINT) AS ssum,
         |  CAST(SUM(n) AS BIGINT) // 2 AS t FROM s),
         |r AS (SELECT lang, CAST(LEAST(CAST(1000000 AS HUGEINT),
         |  CAST(tot.t AS HUGEINT) * sl * 1000000 // (CAST(tot.ssum AS HUGEINT) * n))
         |  AS BIGINT) AS rate_ppm FROM s, tot)
         |SELECT d.doc_id AS id, d.lang, r.rate_ppm
         |FROM documents d JOIN r USING (lang)
         |WHERE ${duckHash("concat('tmix_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 < r.rate_ppm
         |ORDER BY id""".stripMargin,

    // one (source, token) agg feeds self- and cross-entropy; the global
    // table derives from it, never a second corpus scan
    "q143_source_drift" ->
      s"""WITH sc AS (SELECT source AS src, w, CAST(COUNT(*) AS BIGINT) AS cnt_s
         | FROM (SELECT source, unnest($TOKS) AS w FROM documents) GROUP BY 1, 2),
         |ns AS (SELECT src, CAST(SUM(cnt_s) AS BIGINT) AS n_s FROM sc GROUP BY 1),
         |gc AS (SELECT w, CAST(SUM(cnt_s) AS BIGINT) AS cnt_g FROM sc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt_g) AS BIGINT) AS n FROM gc),
         |j AS (SELECT sc.src, sc.cnt_s, ns.n_s, gc.cnt_g, tot.n
         | FROM sc JOIN ns USING (src) JOIN gc USING (w) CROSS JOIN tot),
         |a AS (SELECT src, MAX(n_s) AS n_tokens,
         |  CAST(SUM(cnt_s * (length(bin(n_s // cnt_s)) - 1)) AS BIGINT) AS self_bits,
         |  CAST(SUM(cnt_s * (length(bin(n // cnt_g)) - 1)) AS BIGINT) AS cross_bits
         | FROM j GROUP BY 1)
         |SELECT src, n_tokens,
         | (self_bits * 1000) // n_tokens AS self_bits_per_1k,
         | (cross_bits * 1000) // n_tokens AS cross_bits_per_1k,
         | ((cross_bits - self_bits) * 1000) // n_tokens AS drift_per_1k
         |FROM a ORDER BY src""".stripMargin,

    // HRW argmax per fleet size as row_number over (h DESC, s DESC) —
    // the tie order matching Spark's greatest(struct(h, s))
    "q156_rendezvous_shards" -> {
      def assign(name: String, n: Int) =
        s"""$name AS (SELECT doc_id, s FROM (
           |  SELECT d.doc_id, sh.s,
           |   row_number() OVER (PARTITION BY d.doc_id ORDER BY
           |     ${duckHash(s"concat('$HrwSalt', CAST(sh.s AS VARCHAR), '_', CAST(d.doc_id AS VARCHAR))", 15)} DESC,
           |     sh.s DESC) AS rn
           |  FROM documents d CROSS JOIN
           |   (SELECT unnest(generate_series(0, ${n - 1})) AS s) sh) t
           | WHERE rn = 1)""".stripMargin
      s"""WITH ${assign("a1", HrwOldShards)},
         |${assign("a2", HrwNewShards)}
         |SELECT CAST(a2.s AS BIGINT) AS shard,
         | CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN a2.s <> a1.s THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
         |FROM a2 JOIN a1 USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // the textbook dominance anti-join — the engine's two-pass local
    // skyline must equal it exactly
    "q157_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |  CAST(round(p_retailprice*100,0) AS BIGINT) AS price_c,
        |  CAST(p_size AS BIGINT) AS p_size FROM part)
        |SELECT p_partkey, price_c, p_size FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
        |    AND (b.price_c < a.price_c OR b.p_size > a.p_size))
        |ORDER BY price_c, p_partkey""".stripMargin,

    // same per-user distinct baskets and fused integer ratios
    "q176_assoc_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
        |m AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
        |nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users FROM ut),
        |p AS (SELECT a.t AS antecedent, b.t AS consequent,
        |  CAST(COUNT(*) AS BIGINT) AS n_both
        | FROM ut a JOIN ut b ON a.u = b.u AND a.t <> b.t GROUP BY 1, 2)
        |SELECT antecedent, consequent, n_both,
        | ma.n_t AS n_ant, mc.n_t AS n_cons,
        | CAST(n_both * 1000000 // n_users AS BIGINT) AS support_ppm,
        | CAST(n_both * 1000000 // ma.n_t AS BIGINT) AS confidence_ppm,
        | CAST((n_both * n_users * 1000) // (ma.n_t * mc.n_t) AS BIGINT) AS lift_milli
        |FROM p JOIN m ma ON p.antecedent = ma.t
        |JOIN m mc ON p.consequent = mc.t CROSS JOIN nu
        |ORDER BY 1, 2""".stripMargin,

    // the basket self-join brute force; rec_item is unique per item so
    // the rank order is total
    "q185_cooccur_recs" ->
      s"""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         |m AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
         |pr AS (SELECT a.i AS item, b.i AS rec_item,
         |  CAST(COUNT(*) AS BIGINT) AS n_both
         | FROM bi a JOIN bi b ON a.b = b.b AND a.i <> b.i GROUP BY 1, 2
         | HAVING COUNT(*) >= $CooccurMinBoth),
         |sc AS (SELECT item, rec_item, n_both, ma.n_i AS n_item,
         |  mb.n_i AS n_rec,
         |  (n_both * n_both * 1000000) // (ma.n_i * mb.n_i) AS score_ppm
         | FROM pr JOIN m ma ON pr.item = ma.i JOIN m mb ON pr.rec_item = mb.i),
         |r AS (SELECT *, row_number() OVER (PARTITION BY item
         |   ORDER BY score_ppm DESC, n_both DESC, rec_item) AS rn FROM sc)
         |SELECT item AS part_id, rec_item AS rec_part_id, n_both, n_item,
         | n_rec, CAST(score_ppm AS BIGINT) AS score_ppm,
         | CAST(rn AS BIGINT) AS rn
         |FROM r WHERE rn <= $CooccurTopK ORDER BY 1, rn""".stripMargin,

    // the greedy fold replayed one rank per recursion round; every
    // user advances in lockstep, rounds = max intervals per user
    "q199_activity_select" ->
      s"""WITH RECURSIVE b AS (SELECT user_id AS k, epoch_us(ts) AS s,
         |  epoch_us(ts) + CAST(${IntervalSessionSec} AS BIGINT) * 1000000 AS e
         | FROM events),
         |rk AS (SELECT k, s, e,
         |  CAST(row_number() OVER (PARTITION BY k ORDER BY e, s) AS BIGINT) AS r
         | FROM b),
         |g(k, r, cur, cnt) AS (
         |  -- greedy cursor seeded at the engine's exact sentinel
         |  -- (Long.MinValue in activitySelect), not -1: intervals
         |  -- starting before 1970 (s < -1) must be accepted by the
         |  -- first pick on both sides
         |  SELECT k, CAST(0 AS BIGINT),
         |   CAST(-9223372036854775807 AS BIGINT) - 1, CAST(0 AS BIGINT)
         |  FROM (SELECT DISTINCT k FROM rk) t
         |  UNION ALL
         |  SELECT g.k, g.r + 1,
         |   CASE WHEN rk.s >= g.cur THEN rk.e ELSE g.cur END,
         |   CASE WHEN rk.s >= g.cur THEN g.cnt + 1 ELSE g.cnt END
         |  FROM g JOIN rk ON rk.k = g.k AND rk.r = g.r + 1)
         |SELECT k AS user_id, CAST(MAX(r) AS BIGINT) AS n_total,
         | CAST(arg_max(cnt, r) AS BIGINT) AS n_selected
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // four one-row aggregates over the same base, unioned as the
    // (metric, value) report frame
    "q200_corpus_report" ->
      s"""WITH base AS (SELECT text,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |  CAST(len($TOKS) AS BIGINT) AS ntok FROM documents)
         |SELECT metric, value FROM (
         | SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM base
         | UNION ALL SELECT 'n_len50', CAST(COUNT(*) AS BIGINT)
         |  FROM base WHERE ntok >= 50
         | UNION ALL SELECT 'n_unique_texts', CAST(COUNT(DISTINCT fp) AS BIGINT) FROM base
         | UNION ALL SELECT 'total_tokens', CAST(SUM(ntok) AS BIGINT) FROM base)
         |ORDER BY metric""".stripMargin,

    // the ascending-supply walk replayed as a recursive CTE; LEAST(s,
    // rem // m) is the engine's exact integer rule
    "q237_budget_waterfill" ->
      s"""WITH RECURSIVE sup AS (SELECT source,
         |  CAST(SUM(len($TOKS)) AS BIGINT) AS s FROM documents GROUP BY 1),
         |b AS (SELECT (SUM(s) * 60) // 100 AS budget FROM sup),
         |ord AS (SELECT source, s,
         |  CAST(row_number() OVER (ORDER BY s, source) AS BIGINT) AS rk
         | FROM sup),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ord),
         |rec(rk, rem, a) AS (
         |  SELECT CAST(0 AS BIGINT), budget, CAST(0 AS BIGINT) FROM b
         |  UNION ALL
         |  SELECT o.rk,
         |   rec.rem - LEAST(o.s, rec.rem // (nn.n - rec.rk)),
         |   LEAST(o.s, rec.rem // (nn.n - rec.rk))
         |  FROM rec JOIN ord o ON o.rk = rec.rk + 1 CROSS JOIN nn)
         |SELECT o.source, o.s AS supply_tokens, r.a AS allocated_tokens,
         | CAST(r.a = o.s AS BIGINT) AS fully_satisfied
         |FROM ord o JOIN rec r ON r.rk = o.rk
         |ORDER BY o.source""".stripMargin,

    // same brand baskets, same floor-division order for conf and lift
    "q248_basket_rules" ->
      s"""WITH bk AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
         | FROM lineitem JOIN part ON p_partkey = l_partkey),
         |n AS (SELECT COUNT(DISTINCT o) AS n FROM bk),
         |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM bk GROUP BY 1),
         |p AS (SELECT x.b AS b_a, y.b AS b_b, CAST(COUNT(*) AS BIGINT) AS support
         | FROM bk x JOIN bk y ON x.o = y.o AND x.b < y.b GROUP BY 1, 2)
         |SELECT b_a, b_b, support, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
         | CAST(support * 1000000 // ca.cnt AS BIGINT) AS conf_ab_ppm,
         | CAST(((support * 1000000 // ca.cnt) * (SELECT n FROM n)) // cb.cnt
         |   AS BIGINT) AS lift_ppm
         |FROM p JOIN c ca ON ca.b = p.b_a JOIN c cb ON cb.b = p.b_b
         |WHERE support >= $BasketMinSup
         |ORDER BY 1, 2""".stripMargin,

    // q40's quality replay cut into deciles on the exact 4-decimal
    // value; dup membership from q33's 16-bit simhash replay
    "q259_quality_dup_lift" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
         |s AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop FROM t),
         |q AS (SELECT doc_id,
         |  floor((least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3)*10000 + 0.5)/10000.0 AS quality
         | FROM s),
         |dec AS (SELECT doc_id,
         |  least(CAST(floor(quality * 10000 + 0.5) AS BIGINT) // 1000, 9) AS decile
         | FROM q),
         |w2 AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h2 AS (SELECT id, ${duckHash("w", 15)} AS h FROM w2),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h2 CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b
         | GROUP BY 1, 2),
         |sh2 AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |cp AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh2 a JOIN sh2 b ON a.simhash = b.simhash AND a.id < b.id),
         |du AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM cp UNION ALL SELECT id_b AS id FROM cp))
         |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN du.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         | CAST(SUM(CASE WHEN du.id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |   // COUNT(*) AS BIGINT) AS dup_ppm
         |FROM dec LEFT JOIN du ON du.id = dec.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // identical 60-bit coin and floor-division key; LIMIT after the
    // total (pkey, doc_id) order is the same bottom-k
    "q266_priority_sample" -> {
      val h = duckHash("concat('ps_', CAST(doc_id AS VARCHAR))", 15)
      s"""WITH dcs AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS weight FROM documents),
        |k AS (SELECT doc_id, weight, $h // weight AS pkey
        |  FROM dcs WHERE weight >= 1)
        |SELECT CAST(row_number() OVER (ORDER BY pkey, doc_id)
        |   AS BIGINT) AS "rank",
        | doc_id, weight, CAST(pkey AS BIGINT) AS pkey
        |FROM k ORDER BY pkey, doc_id LIMIT 50""".stripMargin
    },
  )
}
