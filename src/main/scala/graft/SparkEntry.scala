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

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7 (build plan). Every entry in [[queries]] has a matching DuckDB
  * oracle in [[oracleSql]] unless the operator is not SQL-expressible
  * (noted per query).
  *
  * Cross-engine determinism rules used throughout (so hash-compare
  * against DuckDB is exact, not approximate):
  *  - money/double sums go through per-row `cents()` (round to int,
  *    then exact integer SUM) — double summation order never matters;
  *  - averages are ratios of exact integers, rounded at the end;
  *  - every query ends in a total ORDER BY (unique tiebreaker included);
  *  - computed integers are cast to BIGINT on both sides (DuckDB's
  *    SUM(int) widens to HUGEINT, Spark's size() narrows to int);
  *  - hashes are md5-derived on both sides (DuckDB lacks xxhash64);
  *  - timestamps are emitted as formatted strings (parquet ns
  *    timestamps truncate to Spark's µs; strings at second granularity
  *    are engine-neutral).
  */
object SparkEntry {

  /** Per-row money→cents: round(x*100) as exact integer. IEEE double
    * product and round are bit-identical across engines; integer sums
    * are order-independent — this removes ALL float-accumulation
    * divergence from oracle comparison.
    */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
    * curation pipeline composes the engine's signature surface (dedup +
    * text analysis + aggregation) in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q64_curation_pipeline")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- //
  // Shared DuckDB SQL fragments (kept adjacent to the Spark twins).  //
  // ---------------------------------------------------------------- //

  /** DuckDB twin of TextFunctions.tokens. */
  private val TOKS =
    "CASE WHEN length(trim(text))=0 THEN []::VARCHAR[] ELSE string_split_regex(trim(text),'\\s+') END"

  /** DuckDB twin of TextFunctions.tokenHash32 / tokenHash64. */
  private def duckHash(expr: String, hexChars: Int): String =
    s"CAST(concat('0x', substr(md5($expr),1,$hexChars)) AS BIGINT)"

  /** q52's SimHash width, shared by the Spark query and its oracle SQL.
    * 60 = the full tokenHash64 width: Hamming<=2 bands are then 20 bits
    * wide, which keeps bucket occupancy ~constant as the corpus grows
    * (measured at sf1: 2.83 s vs 8.56 s for the old 32-bit width, whose
    * ~11-bit bands went quadratic — 7.4x growth per data decade).
    */
  private val SimHashBitsQ52 = 60

  /** q137's KMV size: rsd ≈ 1/sqrt(k-2) ≈ 12.7%. Shared with the oracle
    * SQL (same k in the row_number cutoff and the (k-1)·2^60 estimator).
    */
  private val KmvK = 64

  /** q138's count-min geometry and fixed probe list, shared by the Spark
    * query and its oracle SQL. `zzz_absent` exercises the missing-cell
    * (never-seen token) path: count-min still answers, overestimate-only.
    */
  private val CmsDepth = 4
  private val CmsWidth = 1024
  private val CmsProbeWords = Seq("a", "batch", "fast", "hash", "key",
    "merge", "row", "scan", "slow", "sort", "spark", "table", "the",
    "value", "window", "zzz_absent")

  /** q223/q224's log-bucket quantile sketch geometry: 5 sub-bucket bits
    * ⇒ relative error < 2^-5 ≈ 3.1%, state ≤ 64·32 = 2048 cells per
    * group forever. Shared with the oracle SQL (same bit arithmetic)
    * and the quantile targets (ppm, integer rank rule).
    */
  private val LbSubBits = 5
  private val LbQPpms = Seq(500000L, 900000L, 990000L)

  /** The shared WITH-chain of the q223/q224 oracles: recompute the
    * log-bucket sketch (pure bit arithmetic — deterministic in any
    * engine), apply the integer rank rule, decode the selected bucket's
    * lower bound + width, and compute the exact discrete quantile under
    * the SAME rank rule from the raw value histogram.
    */
  private lazy val logBucketOracleCore: String = {
    val s = LbSubBits
    val w = 1L << s
    val qs = LbQPpms.mkString(", ")
    s"""WITH v AS (SELECT o_orderpriority AS grp,
       |  CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
       |cells AS (SELECT grp,
       |  CAST(length(bin(v)) - 1 AS BIGINT) * $w
       |    + (v >> GREATEST(length(bin(v)) - 1 - $s, 0))
       |    - (CAST(1 AS BIGINT) << ((length(bin(v)) - 1)
       |        - GREATEST(length(bin(v)) - 1 - $s, 0))) AS k,
       |  COUNT(*) AS cnt
       | FROM v GROUP BY 1, 2),
       |n AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_total
       | FROM cells GROUP BY 1),
       |q AS (SELECT CAST(unnest([$qs]) AS BIGINT) AS q_ppm),
       |r AS (SELECT grp, n_total, q_ppm,
       |  GREATEST((n_total * q_ppm + 999999) // 1000000, 1) AS rnk
       | FROM n CROSS JOIN q),
       |cum AS (SELECT grp, k,
       |  SUM(cnt) OVER (PARTITION BY grp ORDER BY k) AS c FROM cells),
       |sel AS (SELECT r.grp, q_ppm, n_total,
       |  MIN(CASE WHEN c >= rnk THEN k END) AS kb
       | FROM r JOIN cum ON r.grp = cum.grp GROUP BY 1, 2, 3),
       |est AS (SELECT grp, q_ppm, n_total,
       |  ((kb % $w) + (CAST(1 AS BIGINT)
       |     << (CAST(kb // $w AS INT) - GREATEST(CAST(kb // $w AS INT) - $s, 0))))
       |    << GREATEST(CAST(kb // $w AS INT) - $s, 0) AS est,
       |  CAST(1 AS BIGINT) << GREATEST(CAST(kb // $w AS INT) - $s, 0) AS width
       | FROM sel),
       |ex AS (SELECT grp, v, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
       |excum AS (SELECT grp, v,
       |  SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS c FROM ex),
       |exact AS (SELECT r.grp, q_ppm, MIN(CASE WHEN c >= rnk THEN v END) AS exact
       | FROM r JOIN excum ON r.grp = excum.grp GROUP BY 1, 2)""".stripMargin
  }

  /** q226's phrase denylist, shared with the oracle SQL. Chosen to
    * exercise the automaton: mid-word hits (`ash` inside `hash`),
    * cross-word-boundary phrases (`order s`, `scan merge`), a pattern
    * nested inside another's matches (`an me` inside `scan merge`), and
    * a never-matching entry (absent patterns simply emit no rows).
    */
  private val BlockPatterns = Seq("an me", "ash", "hash", "order s",
    "scan merge", "slow", "zz_absent")

  /** The shared WITH-chain of the q232/q233 HLL oracles: recompute the
    * md5 registers (bucket = low 6 bits, rho = 55 − bit_length of the
    * rest, MAX per bucket) and the integer raw estimator.
    */
  private lazy val hllOracleCore: String = {
    val m = Sketches.HllBuckets
    val rmax = Sketches.HllRhoMax
    s"""WITH hh AS (SELECT event_type,
       |  ${duckHash("concat('hll_', CAST(user_id AS VARCHAR))", 15)} AS h
       | FROM events WHERE user_id IS NOT NULL),
       |rr AS (SELECT event_type, h % $m AS bucket,
       |  CASE WHEN h // $m = 0 THEN $rmax
       |   ELSE $rmax - length(bin(h // $m)) END AS rho
       | FROM hh),
       |regs AS (SELECT event_type, bucket, MAX(rho) AS reg
       | FROM rr GROUP BY 1, 2),
       |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_present,
       |  CAST(SUM(CAST(1 AS BIGINT) << ($rmax - reg))
       |    + ($m - COUNT(*)) * ${1L << 55} AS BIGINT) AS s_scaled
       | FROM regs GROUP BY 1),
       |fin AS (SELECT event_type, n_present, s_scaled,
       |  CAST((${Sketches.HllAlphaPpm}::HUGEINT * ${m * m} * ${1L << 55})
       |    // (CAST(s_scaled AS HUGEINT) * 1000000) AS BIGINT) AS est_hll
       | FROM agg)""".stripMargin
  }

  /** q240's exact-Jaccard ground-truth threshold (0.5 — decorrelated
    * from q182's 0.7 so the eval exercises a different operating
    * point). Shared with the oracle SQL.
    */
  private val DedupEvalTPpm = 500000L

  /** q240's evaluation-sample size: the eval runs on the md5-bottom-N
    * docs, a FIXED-size deterministic sample, so ground-truth cost is
    * sf-invariant above N docs (the unsampled form measured
    * 13.3×/decade into sf10 — an eval must sample, not brute-force
    * the corpus). Shared with the oracle SQL.
    */
  private val DedupEvalSampleN = 4000

  /** q241's ordered funnel definition, shared with the oracle SQL:
    * the strictly time-increasing subsequence a user must traverse.
    */
  private val FunnelStages = Seq("signup", "view", "click", "purchase")

  /** q248's minimum pair support (orders containing both brands),
    * shared with the oracle SQL.
    */
  private val BasketMinSup = 50L

  /** q257's conversion deadline (7 days in microseconds), shared with
    * the oracle SQL.
    */
  private val FunnelWindowUs = 7L * 86400L * 1000000L

  /** q227's parent-snapshot cutoff (orders span 1995..2001 in the
    * testdata): lineitems referencing orders on/after it are the
    * late-arriving orphans the audit must count. Shared with the
    * oracle SQL.
    */
  private val RefIntCutoff = "1999-01-01"

  /** q139's hashed-feature space (DSIR): the weight table is bounded at
    * this many rows regardless of corpus size — the paper's own trick
    * for web scale. Shared with the oracle SQL's % modulus.
    */
  private val DsirBuckets = 1024

  /** q152's fixed query-term set, shared with the oracle SQL. */
  private val Bm25Terms = Seq("hash", "window", "spark")

  /** q156's rendezvous-sharding fleet sizes + hash salt, shared with the
    * oracle SQL (the movement bound being measured is 12 -> 16 shards).
    */
  private val HrwSalt = "hrw"
  private val HrwOldShards = 12
  private val HrwNewShards = 16

  /** q158's perceptron hyperparameters, shared with the oracle SQL
    * (labels 0..posMax are the +1 class; one unrolled oracle CTE pair
    * per epoch).
    */
  private val PerceptronPosMax = 4
  private val PerceptronEpochs = 3

  /** q161's BFS hop cap and q162's sample rate, shared with the oracle
    * SQL (the recursive CTE's depth guard / the md5-coin modulus).
    */
  private val BfsMaxHops = 4
  private val QsampOneIn = 4L

  /** q163's coreset size, shared with the oracle SQL (one unrolled
    * farthest-first CTE round per center past the seed).
    */
  private val KCenterK = 6

  /** q166's search phrase, shared with the oracle SQL. */
  private val PhraseQ166 = Seq("value", "table")

  /** q171's hybrid-retrieval geometry, shared with the oracle SQL:
    * query docs = ids below RrfQueryMax, per-list depth, the RRF
    * damping constant (Cormack et al. 2009's k=60), fused top-k.
    */
  private val RrfQueryMax = 5L
  private val RrfListK = 20
  private val RrfDamp = 60
  private val RrfTopK = 10

  /** q172's corpus-scaled Gopher-rule stop list, shared with the oracle
    * SQL (thresholds live in Curation.gopherRules' defaults; the oracle
    * inlines the same literals).
    */
  private val GopherStop = Seq("the", "a", "of", "and", "to")

  /** q182's Jaccard threshold (0.7 in ppm) and q183's activity-window
    * length, shared with the oracle SQL.
    */
  private val PpJoinTPpm = 700000L
  private val IntervalSessionSec = 1800L

  /** q184's core order and peel-round bound (the oracle unrolls exactly
    * this many rounds; the engine asserts fixpoint within them — the
    * two MUST move together), q185's noise floor + list depth, q186's
    * minimum series length — all shared with the oracle SQL.
    */
  private val KCoreK = 2
  private val KCoreMaxRounds = 12
  private val CooccurMinBoth = 2L
  private val CooccurTopK = 3
  private val ChangepointMinDays = 8

  /** q187's DBSCAN geometry over the customer RFM plane (x = 25·orders,
    * y = spend div 10⁶ cents — the ×25 balances the two ranges so the
    * eps ball is round), q188's TextRank geometry — all shared with the
    * oracle SQL.
    */
  private val DbscanEps = 25L
  private val DbscanMinPts = 8
  private val TextRankMinCount = 3L
  private val TextRankIters = 3
  private val TextRankTopK = 20

  /** q192's product-quantization geometry (8 subspaces × 16 codes over
    * the 64-dim embeddings, 2 Lloyd rounds per subspace, 5 query
    * vectors, top-5) — shared with the generated oracle SQL.
    */
  private val PqM = 8
  private val PqCodes = 16
  private val PqQueryMax = 5L
  private val PqK = 5

  /** q193's sorted-neighborhood window and q194's join-size salt —
    * shared with the oracle SQL (q194 reuses the q138 CMS geometry).
    */
  private val SnmWindow = 4
  private val JoinSizeSalt = "js_"

  /** q191/q197's shared ER labeling: SymSpell ed<=1 pairs, nation
    * blocking, star CC, singletons self-labeled. Checkpointed BEFORE
    * the star loop: dupClustersStar materializes nodes and edges as
    * two separate actions and each CC round is its own lineage root —
    * without this the whole posting pipeline re-executes per consumer
    * (measured 49 s -> ~16 s at sf1). Returns (cust_id, label).
    */
  private def erClusterLabels(s: SparkSession, d: String): DataFrame =
    erLabelsOf(customer(s, d))

  /** Same-nation blocking for candidate pairs over a customer-shaped
    * frame (id_a, id_b vs c_custkey/c_nationkey) — shared by the
    * from-scratch (q191/q197) and incremental (q201) ER paths.
    */
  private def erNationBlocked(pairs: DataFrame, c: DataFrame): DataFrame = {
    val nat = c.select(col("c_custkey"), col("c_nationkey"))
    pairs
      .join(nat.select(col("c_custkey").as("id_a"),
        col("c_nationkey").as("na")), Seq("id_a"))
      .join(nat.select(col("c_custkey").as("id_b"),
        col("c_nationkey").as("nb")), Seq("id_b"))
      .filter(col("na") === col("nb"))
      .select("id_a", "id_b")
  }

  /** q201/q203's ingest split: the deterministic md5-coin that sends
    * 20% of customers to the ingest batch (true) and 80% to the
    * standing corpus (false).
    */
  private def erBatchCoin: Column =
    pmod(tokenHash64(
      concat(lit("erb_"), col("c_custkey").cast("string"))), lit(5L)) === 0

  /** q203's persisted standing-label fixture: the q201 standing corpus
    * (md5-coin 80% of customers) labeled ONCE by the q191 pipeline and
    * written to a per-SF parquet — the "yesterday's labels" a real
    * ingest pipeline reads from the warehouse, so q203's measured time
    * IS the ingest cost (batch candidate join + affected-component CC),
    * not the standing recompute q201 pays inside its query (VERDICT r08
    * #6). Written on first use, reused across runs; content is
    * deterministic, so regeneration is value-identical.
    */
  private def erStandingFixturePaths(s: SparkSession, d: String): (String, String) = synchronized {
    val labels = fixturePath(d, "er_standing_labels.parquet")
    val postings = fixturePath(d, "er_standing_postings.parquet")
    lazy val corpus = customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .filter(!erBatchCoin)
    ensureFixture(labels) { tmp =>
      erLabelsOf(corpus).withColumnRenamed("cust_id", "node")
        .write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(postings) { tmp =>
      operators.Dedup.deletionKeyPostings(corpus, "c_custkey", "c_name")
        .write.mode("overwrite").parquet(tmp)
    }
    (labels, postings)
  }

  /** Fixture location for dataset dir `d`: keyed on the CANONICAL
    * dataset path's hash, not just its basename, so two roots sharing
    * a basename (/a/sf0.1 vs /b/sf0.1) never collide and a moved
    * dataset never inherits another's cache (ADVICE r9).
    */
  private def fixturePath(d: String, name: String): String = {
    val f = new java.io.File(d)
    val canonical = try f.getCanonicalPath catch { case _: java.io.IOException => f.getAbsolutePath }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .take(5).map(b => f"$b%02x").mkString
    s"/tmp/graft-fixtures/${f.getName}-$digest/$name"
  }

  /** Write-once fixture with an atomic publish: `build` writes into a
    * process-private tmp dir which is then RENAMED into place, so a
    * concurrent bench process never reads a half-written fixture. If
    * the rename loses the race (destination appeared), the tmp copy is
    * discarded and the winner's — value-identical, the generators are
    * deterministic — is used.
    */
  private def ensureFixture(path: String)(build: String => Unit): Unit = {
    val dest = new java.io.File(path)
    if (new java.io.File(dest, "_SUCCESS").exists()) return
    val tmp = new java.io.File(
      dest.getParentFile,
      s".tmp-${dest.getName}-${java.lang.ProcessHandle.current().pid()}")
    build(tmp.getPath)
    if (!tmp.renameTo(dest)) {
      // lost the publish race (or stale dest without _SUCCESS): clear a
      // broken dest once, retry, else defer to the winner
      if (!new java.io.File(dest, "_SUCCESS").exists()) {
        deleteRecursively(dest)
        if (!tmp.renameTo(dest) && !new java.io.File(dest, "_SUCCESS").exists())
          throw new java.io.IOException(s"cannot publish fixture $path")
      }
      deleteRecursively(tmp)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Persisted media fixture: a real pipeline's blobs arrive as a
    * BINARY column scanned from storage — "multimodal columns are
    * opaque binary + typed metadata" (SURVEY §2b) — not synthesized
    * inside the measured query; the deterministic PNG/WAV/AVI
    * generators are test scaffolding. Each registered media table is
    * written once per SF (value-identical on regeneration) and read
    * back, so every multimodal query measures scan + decode — where a
    * production job starts — instead of encode + decode. Same
    * write-once convention as [[erStandingFixturePaths]].
    */
  private def mediaFixture(s: SparkSession, d: String, name: String)
                          (build: => org.apache.spark.sql.Dataset[Multimodal.MediaRow])
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = synchronized {
    val path = fixturePath(d, s"media_$name.parquet")
    ensureFixture(path) { tmp =>
      build.write.mode("overwrite").parquet(tmp)
    }
    import s.implicits._
    s.read.parquet(path).as[Multimodal.MediaRow]
  }

  /** q238's persisted image-fingerprint band index: the CORPUS media's
    * (media_id % 10 != 0) aHashes banded into the Hamming≤2 pigeonhole
    * postings (no size floor — singleton buckets must match arriving
    * batch images), written once per SF next to the media fixture.
    */
  private def imageFpPostingsFixture(
      s: SparkSession, d: String,
      media: => org.apache.spark.sql.Dataset[Multimodal.MediaRow]): DataFrame = synchronized {
    val p = fixturePath(d, "imgfp_postings.parquet")
    ensureFixture(p) { tmp =>
      Dedup.hammingBandPostings(
          Multimodal.imageAHash(
            media.filter(pmod(col("media_id"), lit(10L)) =!= 0L)).toDF(),
          "media_id", "ahash", nBits = 64, maxHamming = 2)
        .write.mode("overwrite").parquet(tmp)
    }
    s.read.parquet(p)
  }

  /** q242's batch coin: an md5 bit on event_id partitions events into
    * a standing corpus (~90%) and an arriving batch (~10%) — the same
    * ingest split the q203/q222/q238 maintenance queries use, on the
    * HLL family.
    */
  private def hllBatchCoin = pmod(tokenHash64(concat(lit("hbatch_"),
    col("event_id").cast("string"))), lit(10L)) === 0L

  /** q242's persisted standing HLL sketch: the corpus events' per-type
    * registers (64 longs per group FOREVER), written once per SF. At
    * ingest the corpus is never rescanned — the sketch table is the
    * only corpus state the query reads.
    */
  private def hllStandingFixture(s: SparkSession, d: String): DataFrame = synchronized {
    val p = fixturePath(d, "hll_standing_regs.parquet")
    ensureFixture(p) { tmp =>
      Sketches.hllRegisters(events(s, d).filter(!hllBatchCoin),
          "event_type", col("user_id"), "hll_")
        .write.mode("overwrite").parquet(tmp)
    }
    s.read.parquet(p)
  }

  /** The from-scratch ER labeling over any customer-shaped frame. */
  private def erLabelsOf(c: DataFrame): DataFrame = {
    val blocked = erNationBlocked(
      operators.Dedup.editDistance1Join(c, "c_custkey", "c_name"), c)
      .materialized
    val labels = operators.Dedup.dupClustersStar(blocked, "id_a", "id_b")
    c.select(col("c_custkey").as("cust_id"))
      .join(labels.withColumnRenamed("node", "cust_id"), Seq("cust_id"),
        "left")
      .select(col("cust_id"),
        coalesce(col("label"), col("cust_id")).as("label"))
  }

  /** q167's MMR geometry (candidate pool, picks), shared with the
    * oracle SQL's unrolled greedy rounds. λ = 7/10 is hard-coded in
    * both score expressions (7·rel − 3·maxsim).
    */
  private val MmrCandC = 24
  private val MmrK = 8

  /** q170's Benford expectations: round(log10(1+1/d)·1e6) for d=1..9,
    * fixed literals shared with the oracle SQL (no float log at query
    * time on either engine).
    */
  private val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  /** The full-recompute ER oracle, shared by q191 (from-scratch
    * labeling) and q201 (incremental maintenance, which must equal the
    * recompute bit-for-bit).
    */
  private lazy val erFullRecomputeOracle: String =
    """WITH RECURSIVE pr AS (SELECT a.c_custkey ia, b.c_custkey ib
      | FROM customer a JOIN customer b
      | ON a.c_custkey < b.c_custkey AND a.c_nationkey = b.c_nationkey
      | WHERE levenshtein(a.c_name, b.c_name) <= 1),
      |e AS (SELECT ia u, ib v FROM pr UNION ALL SELECT ib, ia FROM pr),
      |reach AS (SELECT u AS node, u AS label FROM e
      | UNION SELECT e.u, r.label FROM e JOIN reach r ON e.v = r.node),
      |lab AS (SELECT node, MIN(label) lbl FROM reach GROUP BY 1),
      |allc AS (SELECT c_custkey AS cust_id,
      |  COALESCE(lab.lbl, c_custkey) AS label
      | FROM customer LEFT JOIN lab ON customer.c_custkey = lab.node),
      |sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
      | FROM allc GROUP BY 1)
      |SELECT cust_id, CAST(label AS BIGINT) AS label, csize
      |FROM allc JOIN sz USING (label) ORDER BY cust_id""".stripMargin

  /** The analytic video-fingerprint-dedup oracle (VideoCodec.dup*
    * formulas: uniform-gray window-constant frames, exact
    * 64-frame-multiple durations => dims/counts cancel and bit k is
    * gray_k*64 > sum(gray); no container ever parsed), shared by q134
    * (dense decode) and q204 (every-2nd-frame decode, which sees one
    * frame per 2-wide constant window => identical fingerprint).
    * 'v' prefix decorrelates the group pattern from q132's; candidates
    * via the same 3-chunk pigeonhole as q117/q132.
    */
  private lazy val videoFpDedupOracle: String =
    """WITH dim AS (SELECT doc_id AS id, doc_id // 10 AS gid,
      |  ((doc_id % 10) * 11) % 64 AS fw
      | FROM documents WHERE doc_id % 2 = 1),
      |hsh AS (SELECT id, fw,
      |  CAST(concat('0x', substr(md5(concat('v', CAST(gid AS VARCHAR))),1,15)) AS BIGINT) AS hp
      | FROM dim),
      |lum AS (SELECT id, k,
      |  CASE WHEN (((hp >> (k % 60)) & 1) = 1) != (k = fw)
      |       THEN 220 ELSE 30 END AS a
      | FROM hsh, LATERAL (SELECT unnest(generate_series(0, 63)) AS k) t),
      |tot AS (SELECT id, SUM(a) AS ta FROM lum GROUP BY 1),
      |bits AS (SELECT lum.id, k,
      |  CASE WHEN a*64 > ta THEN '1' ELSE '0' END AS b
      | FROM lum JOIN tot ON lum.id = tot.id),
      |bs AS (SELECT id, string_agg(b, '' ORDER BY k) AS s FROM bits GROUP BY 1),
      |cand AS (SELECT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
      | FROM bs a JOIN bs b ON a.id < b.id AND (
      |   substr(a.s, 1, 22) = substr(b.s, 1, 22) OR
      |   substr(a.s, 23, 21) = substr(b.s, 23, 21) OR
      |   substr(a.s, 44, 21) = substr(b.s, 44, 21))),
      |ham AS (SELECT id_a, id_b, CAST(list_sum(list_transform(
      |   generate_series(1, 64),
      |   i -> CASE WHEN substr(sa, i, 1) <> substr(sb, i, 1) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      | FROM cand)
      |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 2
      |ORDER BY id_a, id_b""".stripMargin

  /** The whole-corpus KMV oracle, shared by q137 (direct sketch) and
    * q168 (merged half-sketches, which must equal it bit-for-bit).
    */
  private lazy val kmvWholeCorpusOracle: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |  ${duckHash("concat('kmv_', CAST(user_id AS VARCHAR))", 15)} AS h
       | FROM events),
       |r AS (SELECT event_type, h,
       |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |b AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |  MAX(h) AS kth_min FROM r WHERE rn <= $KmvK GROUP BY 1)
       |SELECT event_type, n_kept, kth_min,
       | CASE WHEN n_kept < $KmvK THEN n_kept
       |  ELSE CAST((CAST(${KmvK - 1} AS HUGEINT) * ${Sketches.HashDomain})
       |    // GREATEST(kth_min, 1) AS BIGINT) END AS est_distinct
       |FROM b ORDER BY event_type""".stripMargin

  /** The whole-corpus count-min probe oracle, shared by q138 (direct
    * sketch) and q178 (merged half-sketches — CMS is a linear sketch,
    * so the merge must equal this bit-for-bit, the q168 property for
    * frequencies instead of distincts).
    */
  private lazy val cmsWholeCorpusOracle: String = {
    val probes = CmsProbeWords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT unnest($TOKS) AS w FROM documents),
       |rr AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS r),
       |cell AS (SELECT r,
       |  (${duckHash("concat('cms', w)", 15)} >> (15 * r)) % $CmsWidth AS c,
       |  COUNT(*) AS cnt
       | FROM tok CROSS JOIN rr GROUP BY 1, 2),
       |probe AS (SELECT unnest([$probes]) AS word),
       |pc AS (SELECT word, r,
       |  (${duckHash("concat('cms', word)", 15)} >> (15 * r)) % $CmsWidth AS c
       | FROM probe CROSS JOIN rr)
       |SELECT word, CAST(MIN(COALESCE(cell.cnt, 0)) AS BIGINT) AS est_count
       |FROM pc LEFT JOIN cell USING (r, c)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** 4×4 determinant as a SQL expression — the 24-term permutation
    * expansion over entry expressions `m(i)(j)`. Generated, not
    * hand-written, so q155's oracle cannot drop a term; signs from
    * inversion parity (the same loop the Scala solve uses).
    */
  private def det4Sql(m: Array[Array[String]]): String =
    (0 to 3).permutations.map { p =>
      val inv = p.zipWithIndex.map { case (v, i) => p.drop(i + 1).count(_ < v) }.sum
      val sign = if (inv % 2 == 0) "+" else "-"
      s"$sign (${(0 to 3).map(i => m(i)(p(i))).mkString(" * ")})"
    }.mkString(" ")

  /** q119's cluster sizing, shared by the Spark query and its oracle
    * SQL (the oracle computes the same formula in its LIMIT). SemDeDup's
    * per-cluster pair join is O(|cluster|²), so the cluster COUNT must
    * grow with the corpus to keep |cluster| ~constant — the paper runs
    * 50k clusters at web scale for exactly this reason. A fixed
    * nLists=8 measured 56x per data decade at sf10 (7.75 s -> 436 s,
    * the pair join quadratic in corpus size). Cluster size 625 makes
    * the nLists ∝ n regime start AT sf0.1 (n=5000 → the 8-list floor
    * exactly; n=20000 → 32 lists; sf10 → 320), keeping |cluster| — and
    * with it per-cluster pair volume — CONSTANT from sf0.1 upward: the
    * round-11 sweep had measured 13.8× for the sf0.1→sf1 tier under
    * the old 2500 constant, which was exactly the one-tier quadratic
    * transition while the floor still bound (pair volume 16× for 4×
    * vectors); with 625 the tier re-measures at ~4× for 4× data.
    * Every SF at or below sf0.1 is bit-identical (floor unchanged).
    */
  private val SemDedupMinLists = 8
  private val SemDedupClusterSize = 625L
  private[graft] def semDedupNLists(n: Long): Int =
    math.max(SemDedupMinLists, (n / SemDedupClusterSize).toInt)

  /** DuckDB twin of Dedup.shingles (k=3, distinct word 3-shingles). */
  private val SHINGLES3 =
    s"""SELECT DISTINCT doc_id AS id, unnest(
       |  CASE WHEN len(t) < 3 THEN [array_to_string(t,' ')]
       |       ELSE list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2],' ')) END) AS sh
       |FROM (SELECT doc_id, $TOKS AS t FROM documents)""".stripMargin

  /** GPT-2-style BPE pre-tokenizer pattern, simplified to the subset
    * Java regex and RE2 (DuckDB) interpret identically: optional leading
    * space + letter run / digit run / punctuation run. No lookarounds
    * (RE2 has none). The SAME string is passed to both engines.
    */
  private val BpePattern =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\r\\n]+"

  /** q61's ANSI SQL — one text, two engines (Spark executes it, DuckDB
    * oracles it verbatim).
    */
  private val SqlApiQuery =
    """SELECT n.n_name, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(round(o.o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** q90's ANSI SQL — correlated EXISTS / NOT EXISTS, one text, two
    * engines (Spark executes it; DuckDB oracles it verbatim). Exercises
    * Catalyst's subquery decorrelation (RewritePredicateSubquery → semi/
    * anti joins) rather than hand-built semi-joins (q05/q06).
    */
  private val ExistsSubqueryQuery =
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F')
      |ORDER BY c.c_custkey""".stripMargin

  /** q91's ANSI SQL — correlated SCALAR subquery (per-customer average),
    * decorrelated by Catalyst into an aggregate + join. Money goes
    * through the cents trick; the average of exact integers is the same
    * IEEE double on both engines (integer-valued summands < 2^53 sum
    * exactly in any order).
    */
  private val ScalarSubqueryQuery =
    """SELECT o.o_orderkey, CAST(round(o.o_totalprice*100, 0) AS BIGINT) AS total_c
      |FROM orders o
      |WHERE CAST(round(o.o_totalprice*100, 0) AS BIGINT) >
      |  2 * (SELECT avg(CAST(round(o2.o_totalprice*100, 0) AS BIGINT))
      |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  /** DuckDB twin of VectorFunctions.planeComponent(p, j). */
  private def duckPlane(p: String, j: String): String =
    s"((${duckHash(s"concat($p,'_',$j)", 7)} % 2001) - 1000)/1000.0"

  /** DuckDB cosine over DOUBLE[] lists (same fold shape as
    * VectorFunctions.cosine; differences are sub-ulp and vanish at
    * round(...,4)).
    */
  private def duckCos(a: String, b: String): String =
    s"""(CASE WHEN sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b)) > 0
       | THEN list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b)))
       | ELSE 0.0 END)""".stripMargin

  // ---------------------------------------------------------------- //
  // Queries                                                          //
  // ---------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesMain ++ queriesR11b

  private lazy val queriesMain: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- aggregation family (reference J1/J2 generalized: partial+final hash agg) ---

    "q01_agg_pricing" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_c"),
          count(lit(1)).as("n_rows"),
          round(sum(cents(col("l_quantity"))).cast("double") / 100.0 / count(lit(1)), 4).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q09_agg_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n_rows"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q10_agg_cube" -> ((s, d) => {
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    "q56_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS (non-hierarchical — not expressible as
      // rollup/cube): each flag-dimension independently
      lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n_rows"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q57_setops_multiset" -> ((s, d) => {
      // INTERSECT ALL / EXCEPT ALL multiset semantics (duplicates kept
      // with min/ difference multiplicity), tagged and unioned
      val a = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val b = orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
        .orderBy("op", "custkey")
    }),

    "q61_sql_api" -> ((s, d) => {
      // the SQL front door: the EXACT same ANSI text runs on Spark (here)
      // and on DuckDB (as its own oracle) — revenue per nation, 3-way join
      // views exist only for the (eager) analysis of s.sql — dropped
      // immediately so no session-global name keeps serving this sfDir
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      nation(s, d).createOrReplaceTempView("nation")
      try s.sql(SqlApiQuery)
      finally Seq("customer", "orders", "nation").foreach(s.catalog.dropTempView)
    }),

    "q62_bpe_tokens" -> ((s, d) =>
      // token counting both ways: whitespace tokens and a GPT-2-style
      // BPE pre-tokenizer regex (simplified to the RE2-safe subset so the
      // DuckDB oracle runs the identical pattern)
      documents(s, d)
        .select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_ws"),
          regexp_count(col("text"), lit(BpePattern)).cast("long").as("n_bpe"))
        .orderBy("doc_id")),

    "q71_array_fns" -> ((s, d) =>
      // array construction + manipulation family over grouped collects
      // (sort_array makes the nondeterministic collect_set order stable).
      // The raw array column stays out of the final projection — the
      // driver's comparator can't sort array cells; `joined` carries the
      // same information as a string.
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sort_array(collect_set(col("l_linestatus"))).as("arr"))
        .select(col("l_returnflag"),
          size(col("arr")).cast("long").as("n"),
          element_at(col("arr"), 1).as("first_e"),
          array_join(col("arr"), ",").as("joined"),
          array_contains(col("arr"), "F").as("has_f"))
        .orderBy("l_returnflag")),

    "q77_decimal_exact" -> ((s, d) =>
      // exact DECIMAL arithmetic (vs the cents trick elsewhere): sums of
      // DECIMAL(12,2) are exact on both engines; string-cast pins the
      // scale-2 representation
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("string").as("sum_dec"),
          min(col("o_totalprice").cast("decimal(12,2)")).cast("string").as("min_dec"),
          max(col("o_totalprice").cast("decimal(12,2)")).cast("string").as("max_dec"))
        .orderBy("o_orderstatus")),

    "q58_stats_agg" -> ((s, d) => {
      // statistical aggregate family; rounding absorbs the ulp-level
      // difference between Spark's merge-based (Welford) accumulation
      // and DuckDB's
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_q"),
          round(var_samp(col("l_quantity")), 4).as("var_q"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope_pq"))
        .orderBy("l_returnflag")
    }),

    "q59_edit_distance" -> ((s, d) => {
      // integer-exact Levenshtein over the nation-name cross pairs
      // (25×25 — a broadcast nested loop, no shuffle of note)
      val a = nation(s, d).select(col("n_name").as("name_a"))
      val b = nation(s, d).select(col("n_name").as("name_b"))
      a.crossJoin(broadcast(b))
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .filter(col("dist") <= 2)
        .orderBy("name_a", "name_b")
    }),

    "q60_window_range_frame" -> ((s, d) => {
      // RANGE frame over an integer day key: 30-day trailing revenue per
      // priority — range (value-based) frames, not row-based like q08.
      // The frame result depends only on (priority, day), so the window
      // runs over the bounded per-day series, never the orders table:
      // partitionBy on a 5-value key would otherwise pin ALL orders into
      // 5 tasks at any cluster size (Relational.trailingRangeSum).
      val base = orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("day"),
          cents(col("o_totalprice")).as("total_c"))
      Relational.trailingRangeSum(base, "o_orderpriority", "day",
          "total_c", 30L, "trail30_c")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("day").cast("long").as("day"), col("trail30_c"))
        .orderBy("o_orderkey")
    }),

    "q11_agg_distinct" -> ((s, d) => {
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    "q17_agg_conditional" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_discount") > 0.05,
            cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).otherwise(0L))
            .as("disc_rev_c"),
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_disc"),
          count(lit(1)).as("n"),
          round(sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).cast("double")
            / count(lit(1)), 4).as("disc_share"))
        .orderBy("l_returnflag")
    }),

    "q18_agg_having" -> ((s, d) => {
      val g = lineitem(s, d).groupBy("l_suppkey")
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
      val mean = g.agg(avg(col("sum_qty_c")).as("mean_qty_c"))
      g.join(broadcast(mean))
        .filter(col("sum_qty_c") > col("mean_qty_c"))
        .select(col("l_suppkey"), col("sum_qty_c"))
        .orderBy("l_suppkey")
    }),

    "q39_approx_distinct" -> ((s, d) => {
      // HLL++ sketch as an oracle-checked ACCURACY CONTRACT: the raw
      // estimate differs from DuckDB's approx_distinct by design, so
      // the checked columns are the exact counts (both engines compute
      // them) plus a boolean "sketch within 5% of exact" — the oracle
      // asserts TRUE, so a drifting sketch turns this row red instead
      // of hiding behind a rows-only check. rsd 0.02, not the 0.05
      // default: rsd is a STANDARD deviation and the default measured
      // 7.8% off at sf1's 1.5M-key cardinality; 0.02 holds the 5%
      // contract everywhere for ~2.7K registers. (Accuracy also
      // regression-guarded per-SF in SketchAccuracySpec.)
      // each column pre-distincts ONCE (map-side partial distinct),
      // then exact count and HLL run over the distinct set — HLL is a
      // function of the distinct SET, so the estimate is identical to
      // running it on the multiset, and the plan avoids the 4x Expand
      // Spark needs for two countDistinct + two HLL in one aggregate
      // (measured 3.6 s -> the two-shuffle form at sf0.1)
      val li = lineitem(s, d)
      def side(c: String, exactName: String, okName: String) =
        li.select(col(c)).distinct().agg(
            count(lit(1)).as(exactName),
            approx_count_distinct(col(c), 0.02).as("__a"))
          .select(col(exactName),
            (abs(col("__a") - col(exactName)) <=
              col(exactName) * 0.05).cast("long").as(okName))
      side("l_partkey", "exact_parts", "parts_ok")
        .crossJoin(side("l_orderkey", "exact_orders", "orders_ok"))
        .select(col("exact_parts"), col("exact_orders"),
          col("parts_ok"), col("orders_ok"))
    }),

    // --- scan/filter/projection (reference J3 generalized) ---

    "q02_filter_project" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") && col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), cents(col("l_extendedprice")).as("price_c"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q19_sort_limit" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("total_c"))
        .orderBy(col("total_c").desc, col("o_orderkey"))
        .limit(10)
    }),

    // --- join family ---

    "q03_join_broadcast" -> ((s, d) => {
      // nation is 25 rows at every scale — genuinely always broadcastable;
      // customer join is left to the planner (broadcast at test sf, shuffle
      // at warehouse scale via AQE).
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy("n_name")
    }),

    "q04_join_multiway" -> ((s, d) => {
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    "q05_join_semi" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q06_join_anti" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q20_join_range" -> ((s, d) => {
      // equi-key keeps the join hash-partitioned; the range predicate
      // rides along as a post-join filter condition.
      lineitem(s, d)
        .join(orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL '60' DAY"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"))
        .orderBy("o_orderpriority")
    }),

    "q21_join_asof" -> ((s, d) => {
      // as-of: for each purchase event, the most recent error event of
      // the same user at-or-before it (equi-join on user + window dedup).
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_event_id"),
          col("user_id").as("err_user_id"), col("ts").as("err_ts"))
      // merge form: no per-pair fan-out before the dedup (asOfJoinMerge
      // scaladoc); equivalence with the join+window form is tested
      Relational.asOfJoinMerge(purchases, errors,
          "user_id", "err_user_id", "ts", "err_ts", "err_event_id")
        .select(col("event_id"), col("err_event_id"))
        .orderBy("event_id")
    }),

    // --- window functions ---

    "q07_topk_group" -> ((s, d) => {
      Relational.topKPerGroup(orders(s, d), Seq("o_orderpriority"),
          col("o_totalprice").desc, col("o_orderkey").asc, 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_c"), col("rnk").cast("long").as("rnk"))
        .orderBy("o_orderpriority", "rnk")
    }),

    "q08_window_analytic" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .withColumn("prev_total_c", lag(cents(col("o_totalprice")), 1).over(w))
        .withColumn("run_total_c",
          sum(cents(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("o_custkey"), col("o_orderkey"), col("prev_total_c"), col("run_total_c"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // --- set operations (reference J4 generalized) ---

    "q12_setops" -> ((s, d) => {
      val o = orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val fin = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      urgent.except(fin).union(fin.except(urgent)).distinct()
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    }),

    "q48_pivot" -> ((s, d) => {
      orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }),

    "q49_stringagg" -> ((s, d) => {
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", array_sort(collect_list("n_name"))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    }),

    "q50_unpivot" -> ((s, d) => {
      // melt the q48 pivot back to long form: unpivot is the inverse
      val wide = orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")), "status", "n")
        .orderBy("o_orderpriority", "status")
    }),

    "q51_median" -> ((s, d) => {
      // exact interpolated median/quartiles over integer cents — the
      // (n-1)*p index rule is identical in DuckDB's quantile_cont
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(CAST(round(o_totalprice*100) AS BIGINT), 0.5)").as("median_c"),
          expr("percentile(CAST(round(o_totalprice*100) AS BIGINT), 0.25)").as("q1_c"),
          expr("percentile(CAST(round(o_totalprice*100) AS BIGINT), 0.75)").as("q3_c"))
        .select(col("o_orderstatus"), round(col("median_c"), 2).as("median_c"),
          round(col("q1_c"), 2).as("q1_c"), round(col("q3_c"), 2).as("q3_c"))
        .orderBy("o_orderstatus")
    }),

    // --- scalar function sampler ---

    "q13_string_fns" -> ((s, d) => {
      part(s, d)
        .select(split(col("p_name"), " ").getItem(0).as("color"),
          col("p_brand"), col("p_type"))
        .groupBy("color")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("p_brand")).as("n_brands"),
          max(concat(upper(substring(col("p_type"), 1, 3)), lit("-"), col("p_brand"))).as("max_code"),
          max(regexp_extract(col("p_brand"), "[0-9]+", 0).cast("long")).as("max_brand_num"))
        .orderBy("color")
    }),

    "q14_date_agg" -> ((s, d) => {
      orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy("month")
    }),

    "q67_date_arith" -> ((s, d) =>
      // date arithmetic family: +30 days, month end, days-to-month-end,
      // ISO weekday (both engines' dayofweek origins normalized to
      // Monday=0)
      orders(s, d)
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("d30"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
          datediff(last_day(col("o_orderdate")), col("o_orderdate")).cast("long").as("days_left"),
          ((dayofweek(col("o_orderdate")) + 5) % 7).cast("long").as("dow"))
        .orderBy("o_orderkey")),

    "q68_join_left_outer" -> ((s, d) => {
      // LEFT OUTER join with null-preserving aggregation: order-count
      // histogram over ALL customers (including order-less ones — an
      // inner join would silently drop them)
      val perCust = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
      perCust.groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")
    }),

    "q69_join_full_outer" -> ((s, d) => {
      // FULL OUTER join of two aggregate views; coalesce resolves the
      // side-missing keys
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("ck_a")).agg(count(lit(1)).as("n_urgent"))
      val done = orders(s, d).filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("ck_b")).agg(count(lit(1)).as("n_finished"))
      urgent.join(done, col("ck_a") === col("ck_b"), "full_outer")
        .select(coalesce(col("ck_a"), col("ck_b")).as("custkey"),
          coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
          coalesce(col("n_finished"), lit(0L)).as("n_finished"))
        .orderBy("custkey")
    }),

    "q70_approx_percentile" -> ((s, d) => {
      // Quantile sketch as an oracle-checked ACCURACY CONTRACT (the q39
      // move): Spark's percentile_approx algorithm differs from DuckDB's
      // by design, so the checked columns are the EXACT interpolated
      // p50/p95 over price cents (histogramPercentiles — quantile_cont
      // reproduces it exactly on integers, the q101/q162 precedent) plus
      // 0/1 "sketch within 2% of exact" flags the oracle asserts as 1 —
      // a drifting sketch turns this row red instead of hiding behind a
      // rows-only check.
      val base = lineitem(s, d).select(col("l_returnflag"),
        cents(col("l_extendedprice")).as("price_c"))
      val exact = Relational.histogramPercentiles(base, "l_returnflag",
        "price_c", Seq("p50_exact_c" -> 0.5, "p95_exact_c" -> 0.95))
      val approx = base.groupBy("l_returnflag").agg(
        percentile_approx(col("price_c"), lit(0.5), lit(10000)).as("__a50"),
        percentile_approx(col("price_c"), lit(0.95), lit(10000)).as("__a95"))
      exact.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("p50_exact_c"), 2).as("p50_exact_c"),
          round(col("p95_exact_c"), 2).as("p95_exact_c"),
          (abs(col("__a50") - col("p50_exact_c")) <=
            col("p50_exact_c") * 0.02).cast("long").as("p50_ok"),
          (abs(col("__a95") - col("p95_exact_c")) <=
            col("p95_exact_c") * 0.02).cast("long").as("p95_ok"))
        .orderBy("l_returnflag")
    }),

    "q80_funnel" -> ((s, d) => {
      // funnel conversion: users whose first view precedes their first
      // click precedes their first purchase — one conditional-min agg
      // per user, then one global rollup (no joins, no window)
      val perUser = events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("t_view") < col("t_click") && col("t_click") < col("t_buy"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
    }),

    "q16_json_extract" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          round(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"))
        .orderBy("event_type")
    }),

    // --- event-time operators (batch twins of the streaming surface) ---

    "q22_sessionize" -> ((s, d) => {
      Relational.sessionize(events(s, d), "user_id", "ts", 1800L)
        .select(col("user_id"), col("session_seq"),
          fmtTs(col("session_start")).as("session_start"),
          fmtTs(col("session_end")).as("session_end"), col("n_events"))
        .orderBy("user_id", "session_seq")
    }),

    // session_window twin of q22: same sessions from the built-in API
    // (the one the streaming path uses); end is last-event + gap per
    // session_window semantics, which the oracle mirrors with + INTERVAL.
    "q83_sessionize_sw" -> ((s, d) =>
      Relational.sessionizeSW(events(s, d), "user_id", "ts", 1800L)
        .select(col("user_id"),
          fmtTs(col("session_start")).as("session_start"),
          fmtTs(col("session_end")).as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")),

    "q23_window_tumbling" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
        .select(fmtTs(col("window.start")).as("window_start"), col("event_type"),
          col("n"), col("value_c"))
        .orderBy("window_start", "event_type")
    }),

    "q24_window_sliding" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(fmtTs(col("window.start")).as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type")
    }),

    // --- reference-parity text jobs over the documents table ---

    "q25_letter_count" -> ((s, d) =>
      TextJobs.letterCount(s, documents(s, d), "text")),

    "q26_word_finder" -> ((s, d) =>
      TextJobs.wordFind(documents(s, d), "text", "spark")
        .select("doc_id").orderBy("doc_id")),

    // --- text analysis ---

    "q15_wordcount" -> ((s, d) => {
      documents(s, d)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    }),

    "q27_text_stats" -> ((s, d) => {
      // one tokenize + one stats pass per document; quality is computed
      // expression-side from the integer stats (rounding stays Spark's)
      documents(s, d)
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("text"),
          textStats(col("text"), col("toks")).as("st"))
        .select(
          col("doc_id"),
          col("st._1").as("n_tokens"),
          col("st._2").as("n_subwords"),
          col("st._3").as("n_stop"),
          qualityScoreFromCounts(col("text"), col("st._1"), col("st._3"))
            .as("quality"))
        .orderBy("doc_id")
    }),

    "q28_langid" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), langId(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    }),

    "q37_rolling_hash" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), rollingHash(col("text")).as("rhash"))
        .orderBy("doc_id")
    }),

    "q40_quality_by_source" -> ((s, d) => {
      documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(qualityScore(col("text"))), 4).as("avg_quality"),
          sum(tokenCount(col("text")).cast("long")).as("total_tokens"))
        .orderBy("source")
    }),

    // --- deduplication family ---

    "q29_dedup_exact" -> ((s, d) =>
      Dedup.exact(documents(s, d), "doc_id", "text").orderBy("fp")),

    // Scale guards active (the oracle SQL mirrors the same doc-frequency /
    // bucket-size prefilters, so the hash check covers the guarded plan —
    // the one that would run at 100 TB).
    "q30_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(documents(s, d), "doc_id", "text", k = 3, minJaccard = 0.05,
          maxDocFreq = 10000)
        .orderBy("id_a", "id_b")),

    "q31_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minHashLsh(documents(s, d), "doc_id", "text",
          k = 3, bands = 4, rowsPerBand = 4, minEstJaccard = 0.25,
          maxBucketSize = 10000)
        .orderBy("id_a", "id_b")),

    "q32_simhash" -> ((s, d) =>
      Dedup.simHash(documents(s, d), "doc_id", "text", nBits = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "q78_ngram_freq" -> ((s, d) => {
      // corpus trigram frequency table (occurrences, not doc frequency —
      // positional n-grams, the LM/contamination-index building block)
      val posGrams = udf { toks: Seq[String] =>
        if (toks == null || toks.size < 3) Array.empty[String]
        else Array.tabulate(toks.size - 2)(i => toks.slice(i, i + 3).mkString(" "))
      }.asNondeterministic()
      documents(s, d)
        .select(explode(posGrams(tokens(col("text")))).as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram").asc)
        .limit(50)
    }),

    "q79_window_distribution" -> ((s, d) => {
      // distribution window functions: percent_rank / cume_dist
      // complement q43's ranking family. Only the pr <= 0.001 head of
      // each priority survives, so the positional window runs over a
      // histogram-thresholded sliver of orders (~0.1%), never the full
      // table in 5 tasks (Relational.topFractionByValue); pr/cd are the
      // same (pos-1)/(n-1) and pos/n definitions, computed from the
      // attached exact position + a broadcast partition count. The
      // ordering is unique (tie-break o_orderkey), so rank == position
      // and every cume_dist peer group is a single row. Coverage is
      // widened past 0.001 so round(pr, 6) boundary rows stay in; the
      // exact rounded filter below then matches the naive form.
      val base = orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_c"))
      Relational.topFractionByValue(base, "o_orderpriority", "total_c",
          "o_orderkey", 0.00101)
        .withColumn("pr", round(when(col("__n") === 1, lit(0.0))
          .otherwise((col("__rn") - lit(1)).cast("double") / (col("__n") - lit(1))), 6))
        .withColumn("cd", round(col("__rn").cast("double") / col("__n"), 6))
        .filter(col("pr") <= 0.001)
        .select(col("o_orderpriority"), col("o_orderkey"), col("total_c"),
          col("pr"), col("cd"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    "q75_winnow_overlap" -> ((s, d) =>
      // winnowing (MOSS) partial-overlap detection: local fingerprints,
      // pairs sharing >= 2
      Dedup.winnowOverlap(documents(s, d), "doc_id", "text",
          k = 3, w = 4, minShared = 2)
        .orderBy("id_a", "id_b")),

    "q63_dedup_clusters" -> ((s, d) =>
      // collapse the q33 simhash dup pairs into connected components;
      // label = canonical (min) doc id per cluster
      Dedup.dupClusters(
          Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
          "id_a", "id_b", iterations = 4)
        .orderBy("node")),

    // q63's pair graph through large-star/small-star CC instead of
    // bounded min-label propagation: runs to a PROVEN fixpoint (edge-set
    // signature stable), so the oracle can be the exact recursive
    // transitive closure rather than q63's unrolled k iterations.
    "q84_dedup_clusters_star" -> ((s, d) =>
      Dedup.dupClustersStar(
          Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
          "id_a", "id_b")
        .orderBy("node")),

    "q33_dedup_simhash" -> ((s, d) =>
      Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16)
        .orderBy("id_a", "id_b")),

    "q34_dedup_embedding" -> ((s, d) =>
      Dedup.embeddingNearDup(embeddings(s, d), "vec_id", "embedding",
          nBits = 8, minCosine = 0.2)
        .orderBy("id_a", "id_b")),

    // --- similarity search ---

    "q35_ann_bruteforce" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q36_ann_lsh" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.lshTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5, nBits = 4)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q46_ann_ivf" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5, nLists = 8, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // 60 bits (the full tokenHash64 width): band width must grow with
    // log(corpus) or the pigeonhole buckets go quadratic — at 32 bits
    // the Hamming<=2 bands are ~11 bits (~2K buckets), measured 7.4x
    // growth per 10x data at sf1 (8.56 s) vs 60-bit's 20-bit bands
    // (2.83 s, ~linear). The oracle SQL derives from the SAME nBits so
    // the two can't drift; the width lives in one place below.
    "q52_dedup_simhash_hamming" -> ((s, d) =>
      Dedup.simHashNearDup(documents(s, d), "doc_id", "text",
          nBits = SimHashBitsQ52, maxHamming = 2)
        .orderBy("id_a", "id_b")),

    // d=3 is where plain pigeonhole banding (q52's shape) breaks down —
    // 8-bit chunks at 32 bits — and the multi-index tables keep keys at
    // 16 bits (C(6,3)=20 tables of 3-of-6 block combinations).
    "q82_dedup_simhash_multiindex" -> ((s, d) =>
      Dedup.simHashNearDupMulti(documents(s, d), "doc_id", "text",
          nBits = 32, maxHamming = 3, nBlocks = 6)
        .orderBy("id_a", "id_b")),

    "q53_ann_lsh_multiprobe" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.lshTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5, nBits = 4, multiProbe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q54_ann_ivf_kmeans" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.ivfTopKKmeans(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5, nLists = 8, nProbe = 2, iters = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // --- multimodal plumbing (decode is a deterministic stub; see
    //     graft.multimodal.Multimodal) ---

    "q38_multimodal_features" -> ((s, d) => {
      Multimodal.mediaFeatures(s, documents(s, d))
        .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_mean"))
        .orderBy("media_id")
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

    "q74_embedding_centroids" -> ((s, d) => {
      // grouped mean pooling: per-bucket embedding centroid + its norm.
      // The centroid is exploded to (pos, m) rows — the driver's
      // comparator can't hash raw array cells, and exploded doubles
      // compare exactly (no float-to-string formatting dependence).
      val e = embeddings(s, d)
        .withColumn("bucket", pmod(col("vec_id"), lit(8L)))
      Ann.meanPool(e, "bucket", "embedding")
        .select(col("bucket"),
          round(VectorFunctions.norm(col("centroid")), 4).as("c_norm"),
          posexplode(col("centroid")).as(Seq("pos0", "m")))
        .select(col("bucket"), col("c_norm"),
          (col("pos0") + 1).cast("long").as("pos"), col("m"))
        .orderBy("bucket", "pos")
    }),

    "q76_contamination" -> ((s, d) => {
      // benchmark-leak scan: the q73 eval carve-out checked for winnowing
      // overlap against the training remainder; per eval doc, how many
      // train docs leak into it
      val docs = documents(s, d)
      val eval_ = Curation.hashSamplePerGroup(docs, "source", "doc_id", 5)
      val train = docs.join(eval_.select("doc_id"), Seq("doc_id"), "left_anti")
      Curation.contaminationCheck(train, eval_, "doc_id", "text",
          k = 3, w = 4, minShared = 2)
        .groupBy("eval_id")
        .agg(count(lit(1)).as("n_leaking_train_docs"),
          max(col("n_shared")).as("max_shared"))
        .orderBy("eval_id")
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

    "q66_image_resize" -> ((s, d) => {
      // REAL decode → nearest-neighbor resample → re-encode → decode →
      // stats; oracle computes the same sums from the pattern formula
      // through the same index mapping
      Multimodal.imageStats(
          Multimodal.resizeImages(mediaFixture(s, d, "img_real")(
            Multimodal.mediaWithRealImages(s, documents(s, d))), 10, 8))
        .toDF()
        .orderBy("media_id")
    }),

    "q55_image_decode" -> ((s, d) => {
      // REAL javax.imageio decode of generated PNG fixtures; the oracle
      // computes the same pixel sums analytically from the pattern
      // formula (PNG is lossless), so a hash match proves the
      // encode→decode roundtrip bit-exact.
      Multimodal.imageStats(mediaFixture(s, d, "img_real")(
          Multimodal.mediaWithRealImages(s, documents(s, d))))
        .toDF()
        .orderBy("media_id")
    }),

    "q81_audio_decode" -> ((s, d) => {
      // REAL javax.sound.sampled decode of generated 16-bit PCM WAV
      // fixtures; the oracle computes the same sample sums analytically
      // from the pattern formula (PCM WAV is lossless), so a hash match
      // proves the encode→decode roundtrip bit-exact — the audio twin
      // of q55.
      Multimodal.audioStats(mediaFixture(s, d, "audio_real")(
          Multimodal.mediaWithRealAudio(s, documents(s, d))))
        .toDF()
        .orderBy("media_id")
    }),

    "q47_frame_stats" -> ((s, d) => {
      // frame-sampling UDTF (4 frames per media blob) aggregated per
      // frame index; mean-sums go through x10000 integer rounding so the
      // oracle compare is exact
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, documents(s, d)), 4)
        .toDF()
        .groupBy("frame_idx")
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(round(col("byte_mean") * 10000).cast("long")).as("sum_mean_x1e4"))
        .select(col("frame_idx").cast("long").as("frame_idx"), col("n"),
          col("total_bytes"), col("sum_mean_x1e4"))
        .orderBy("frame_idx")
    }),

    // --- tf-idf-lite (SURVEY.md §2b text analysis) ---

    "q41_tfidf" -> ((s, d) => {
      // integer-arithmetic tf-idf: idf_x1000 = (N*1000) div df — exact on
      // both engines (no cross-engine log()/double-accumulation drift)
      val docs = documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dfreq, "word")
        .crossJoin(broadcast(n))
        // `div` is integral long division like DuckDB's // — the `/`
        // operator would round through double and can disagree by 1
        .withColumn("tfidf", col("tf") * expr("(n_docs * 1000) div df"))
        .filter(col("tf") >= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("df"), col("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("word"))
        .limit(50)
    }),

    // --- set ops: intersect (q12 covers except/union) ---

    "q42_setops_intersect" -> ((s, d) => {
      val o = orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val fin = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      urgent.intersect(fin)
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    }),

    // --- window-function sampler: rank/dense_rank/lead/ntile ---

    "q43_window_ranking" -> ((s, d) => {
      // ranking family over a 5-value partition key: the naive single
      // window (rank + dense_rank + lead + ntile) disables Spark's
      // WindowGroupLimit pruning (ntile/lead are not rank-like) and
      // sorts ALL orders in 5 tasks. Split instead: a rank-ONLY first
      // window is map-side pruned to 11 rows per partition per task
      // (plan-asserted in ScaleSpec); dense_rank/lead re-run over that
      // <= 11-row prefix (positional functions agree on a prefix); and
      // ntile(4) of the FULL partition is pure arithmetic on
      // (rank, broadcast count) — Relational.ntileOf.
      import org.apache.spark.sql.expressions.Window
      val base = orders(s, d).select(col("o_orderpriority"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("total_c").desc, col("o_orderkey"))
      // 11th row exists solely to feed lead() of the rank-10 row
      val surv = base.withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 11)
      val ns = base.groupBy("o_orderpriority").agg(count(lit(1)).as("__n"))
      surv.join(broadcast(ns), Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("o_orderkey"), col("total_c"),
          col("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          lead("o_orderkey", 1).over(w).as("next_key"),
          Relational.ntileOf(col("rnk"), col("__n"), 4).cast("long").as("quartile"))
        .filter(col("rnk") <= 10)
        .orderBy("o_orderpriority", "rnk")
    }),

    // --- math-function sampler (IEEE-exact ops only: sqrt is correctly
    //     rounded, products/floor/ceil/abs/mod are exact on integral-valued
    //     doubles — no libm transcendental drift) ---
    //
    // Half-up rounding is spelled floor(x + 0.5), not round(x): Spark's
    // Round on DoubleType routes every row through BigDecimal.valueOf +
    // setScale — the only allocating expression in this chain (measured
    // 1.8x the cost of the same aggregate without it) and the part that
    // made pre-JIT-peak bench samples of this query swing 4x (VERDICT r05).
    // Caveat: floor(x + 0.5) is NOT universally identical to half-up
    // rounding (x + 0.5 can round up in binary for x just below a .5
    // boundary, e.g. 0.49999999999999994); the equivalence here is
    // empirical — the ProfileQ44 diff check found 0 diffs on this data
    // distribution at sf0.1 — and the oracle SQL uses the same spelling.

    "q44_math_fns" -> ((s, d) => {
      lineitem(s, d).groupBy("l_returnflag").agg(
          sum(floor(sqrt(col("l_quantity")) * 10000 + 0.5).cast("long")).as("sum_sqrt_q"),
          sum((col("l_quantity") * col("l_quantity")).cast("long")).as("sum_sq_q"),
          sum(floor(col("l_extendedprice")).cast("long")).as("sum_floor_p"),
          sum(ceil(col("l_discount") * 100).cast("long")).as("sum_ceil_d"),
          sum(abs(col("l_quantity") - 25.0).cast("long")).as("sum_absdev"),
          sum(pmod(col("l_orderkey"), lit(7L))).as("sum_mod7"))
        .orderBy("l_returnflag")
    }),

    // --- JSON → map functions (from_json + explode over map) ---

    "q45_json_map" -> ((s, d) => {
      import org.apache.spark.sql.types.{MapType, StringType}
      events(s, d)
        .select(col("event_type"),
          explode(from_json(col("props"), MapType(StringType, StringType)))
            .as(Seq("key", "val")))
        .groupBy("event_type", "key")
        .agg(count(lit(1)).as("n"),
          min(col("val").cast("long")).as("min_v"),
          max(col("val").cast("long")).as("max_v"))
        .orderBy("event_type", "key")
    }),

    // --- LLM-pipeline round 4: repetition quality, PII redaction,
    //     chunking, sequence packing, boilerplate detection ---

    "q85_repetition_metrics" -> ((s, d) =>
      // Gopher-style repetition signals; integer counts come from one
      // map-only UDF pass, ratios are expression-side (one rounding site)
      documents(s, d)
        .select(col("doc_id"), repetitionStats(tokens(col("text"))).as("r"))
        .select(col("doc_id"),
          col("r._1").as("n_2grams"), col("r._2").as("top_2gram_n"),
          col("r._3").as("n_3grams"), col("r._4").as("dup_3gram_occ"),
          round(when(col("r._1") > 0,
            col("r._2").cast("double") / col("r._1").cast("double"))
            .otherwise(lit(0.0)), 4).as("top_2gram_ratio"),
          round(when(col("r._3") > 0,
            col("r._4").cast("double") / col("r._3").cast("double"))
            .otherwise(lit(0.0)), 4).as("dup_3gram_ratio"))
        .orderBy("doc_id")),

    "q86_pii_redact" -> ((s, d) => {
      // documents carry no natural PII, so a deterministic fixture
      // derived from doc_id is appended inside the query (the oracle
      // appends the identical string) — the redaction chain then runs on
      // real match positions in real text
      val withPii = documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" mail u"), col("doc_id").cast("string"),
          lit("@h"), pmod(col("doc_id"), lit(100L)).cast("string"), lit(".example.com"),
          lit(" tel 555-"), lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
          lit("-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" ip 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
          lit("."), pmod(col("doc_id") * 7, lit(256L)).cast("string")).as("text"))
      withPii
        .select(col("doc_id"), Curation.piiCounts(col("text")).as("p"),
          md5(Curation.redactPii(col("text"))).as("red_hash"))
        .select(col("doc_id"), col("p.n_emails"), col("p.n_phones"),
          col("p.n_ips"), col("red_hash"))
        .orderBy("doc_id")
    }),

    "q87_chunk_tokens" -> ((s, d) =>
      Chunking.chunkTokens(documents(s, d), "doc_id", "text",
          chunkSize = 16, stride = 12)
        .orderBy("id", "chunk_idx")),

    "q88_seq_packing" -> ((s, d) =>
      Chunking.packedSpans(documents(s, d), "doc_id", "text", budget = 256)
        .withColumnRenamed("offset", "tok_offset") // OFFSET is reserved in DuckDB
        .orderBy("doc_id")),

    "q89_boilerplate_ratio" -> ((s, d) =>
      Curation.boilerplateRatio(documents(s, d), "doc_id", "text",
          k = 3, minDocFreq = 5)
        .orderBy("id")),

    // --- SQL-surface widening: subqueries, exact percentiles,
    //     regexp_extract_all, date spine ---

    "q90_exists_subquery" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      try s.sql(ExistsSubqueryQuery)
      finally Seq("customer", "orders").foreach(s.catalog.dropTempView)
    }),

    "q91_scalar_subquery" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders")
      try s.sql(ScalarSubqueryQuery)
      finally s.catalog.dropTempView("orders")
    }),

    "q92_percentile" -> ((s, d) =>
      // EXACT percentiles (vs q70's approx sketch): interpolated
      // (percentile = ANSI percentile_cont) and discrete
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)")
            .cast("long").as("p90_disc"))
        .orderBy("l_returnflag")),

    "q93_regexp_extract_all" -> ((s, d) =>
      // all matches per document (not just the first): count + an
      // order-preserving digest of the full match list
      documents(s, d).select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]*ar[a-z]*"), lit(0)))
            .cast("long").as("n_matches"),
          md5(array_join(
            regexp_extract_all(col("text"), lit("[a-z]*ar[a-z]*"), lit(0)), ","))
            .as("match_hash"))
        .orderBy("doc_id")),

    "q94_date_spine" -> ((s, d) => {
      // gap-filled daily rollup: generated date spine LEFT JOIN facts —
      // days with no orders appear with zero counts (a plain groupBy
      // silently drops them)
      val daily = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("rev_c"))
      val spine = s.range(1).select(explode(sequence(
        to_date(lit("1995-01-01")), to_date(lit("1995-03-31")))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("rev_c"), lit(0L)).as("rev_c"))
        .orderBy("day")
    }),

    "q95_heavy_hitters" -> ((s, d) => {
      // exact corpus-level heavy hitters (tokens above 1/200 of all
      // occurrences): ONE scan of documents, one shuffle on the token
      // (partial agg map-side); the corpus total re-aggregates the
      // already-reduced counts frame — not the corpus — into a
      // broadcast 1-row frame. Sketches (Misra-Gries) only matter when
      // the DISTINCT token count itself cannot be aggregated.
      val tok = documents(s, d).select(explode(tokens(col("text"))).as("word"))
      val counts = tok.groupBy("word").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      counts.join(broadcast(total))
        .filter(col("cnt") * 200 > col("total"))
        .select(col("word"), col("cnt"),
          round(col("cnt").cast("double") / col("total").cast("double"), 6)
            .as("freq"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    "q96_nullsafe_join" -> ((s, d) => {
      // null-safe equality join (<=> / IS NOT DISTINCT FROM): nulls match
      // nulls — the join key a plain equi-join silently drops
      val n = nation(s, d)
        .select(col("n_nationkey"), col("n_name"),
          expr("nullif(n_regionkey, 2)").as("rk"))
      val r = region(s, d)
        .select(col("r_name"), expr("nullif(r_regionkey, 2)").as("rk"))
      n.join(r, n("rk") <=> r("rk"), "left")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy("n_nationkey")
    }),

    "q97_histogram" -> ((s, d) =>
      // equi-width histogram via width_bucket over exact cents (integer
      // arithmetic => bucket boundaries cannot float-flip cross-engine)
      orders(s, d)
        .select(width_bucket(cents(col("o_totalprice")),
          lit(0L), lit(50000000L), lit(20)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

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

    "q99_join_asof_forward" -> ((s, d) => {
      // forward as-of with tolerance: for each purchase, the EARLIEST
      // error of the same user within the next 24 hours (merge form —
      // no pair fan-out; tolerance compared in exact integer µs)
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_event_id"),
          col("user_id").as("err_user_id"), col("ts").as("err_ts"))
      Relational.asOfJoinMergeDirected(purchases, errors,
          "user_id", "err_user_id", "ts", "err_ts", "err_event_id",
          forward = true, toleranceSeconds = 86400L)
        .select(col("event_id"), col("err_event_id"))
        .orderBy("event_id")
    }),

    "q100_interval_overlap" -> ((s, d) => {
      // overlapping-interval pairs via bucket replication + equi-join
      // (never a cross product; pairs emitted once, no dedup shuffle):
      // high-value orders as [order day, +7d] intervals
      val base = orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("long").as("s"))
      val a = base.select(col("o_orderkey").as("id_a"), col("s").as("s_a"),
        (col("s") + 7).as("e_a"))
      val b = base.select(col("o_orderkey").as("id_b"), col("s").as("s_b"),
        (col("s") + 7).as("e_b"))
      // Registered output is PER-INTERVAL degree stats, not the pair
      // list: pair count grows quadratically with interval density
      // (measured 101x per data decade — the output itself was the
      // scaling-gate waiver), while this aggregate is one row per
      // qualifying order. The groupBy exploits the join's existing
      // bucket partitioning; the raw pair stream stays available as
      // Relational.intervalOverlapJoin for callers that want rows.
      Relational.intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", 8L)
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("ov",
          (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")) + 1)
            .cast("long"))
        .groupBy(col("id_a").as("id"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(col("ov")).cast("long").as("sum_overlap_days"),
          max(col("ov")).cast("long").as("max_overlap_days"))
        .orderBy("id")
    }),

    "q101_histogram_percentile" -> ((s, d) => {
      // exact interpolated quartiles WITHOUT the per-group multiset
      // buffer Spark's percentile() holds (scale twin of q51): value
      // histogram + cumulative counts over the bounded cents domain
      // (Relational.histogramPercentiles); same (n-1)*p rule, so the
      // two must agree bit-for-bit
      Relational.histogramPercentiles(
          orders(s, d).select(col("o_orderstatus"),
            cents(col("o_totalprice")).as("c")),
          "o_orderstatus", "c",
          Seq("median_c" -> 0.5, "q1_c" -> 0.25, "q3_c" -> 0.75))
        .select(col("o_orderstatus"), round(col("median_c"), 2).as("median_c"),
          round(col("q1_c"), 2).as("q1_c"), round(col("q3_c"), 2).as("q3_c"))
        .orderBy("o_orderstatus")
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

    "q104_dedup_retention" -> ((s, d) =>
      // retention policy after exact dedup: keep each duplicate group's
      // highest-quality copy (ties -> smallest doc_id). One groupBy with
      // a struct-max — map-side partial maxes, so even a viral duplicate
      // with millions of copies never materializes as a group
      documents(s, d)
        .select(fingerprint(col("text")).as("fp"), col("doc_id"),
          round(qualityScore(col("text")) * 10000).cast("long").as("q"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_copies"),
          max(struct(col("q").as("q"), (-col("doc_id")).as("nid"))).as("m"))
        .select(col("fp"), (-col("m.nid")).as("keep_id"),
          col("m.q").as("kept_q"), col("n_copies"))
        .orderBy("fp")),

    "q105_pagerank_dupgraph" -> ((s, d) =>
      // PageRank (3 iterations, 0.85 damping) over the q63 simhash dup
      // graph, in scaled-long INTEGER arithmetic so both engines compute
      // bit-identical ranks — float sums are addition-order-dependent
      // and can never hash-match across engines. Per iteration: one
      // equi-join on the edge source + one groupBy on the destination
      // (GraphOps.pageRankInt scaladoc for the 100 TB shape).
      GraphOps.pageRankInt(
          Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
          "id_a", "id_b", iters = 3)
        .select(col("id").as("doc_id"), col("r").as("rank_scaled"),
          col("d").as("degree"))
        .orderBy("doc_id")),

    "q106_supplier_region_rollup" -> ((s, d) => {
      // snowflake rollup over BOTH balance-carrying dims: suppliers and
      // customers roll through nation -> region (dims broadcast); top
      // supplier per region via struct-max (ties -> max name), debt
      // customers via conditional count. Closes the last unexercised
      // table (supplier) and the acctbal columns.
      val supAgg = supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(cents(col("s_acctbal"))).as("sum_supp_acct_c"),
          max(struct(cents(col("s_acctbal")).as("b"), col("s_name").as("n"))).as("m"))
        .select(col("r_name"), col("n_suppliers"), col("sum_supp_acct_c"),
          col("m.n").as("top_supplier"))
      val custAgg = customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("n_debt_customers"))
      // both sides are |regions| rows; broadcast beats the planner's
      // default SMJ (AQE would fix it at runtime, but say so in the plan)
      supAgg.join(broadcast(custAgg), Seq("r_name")).orderBy("r_name")
    }),

    "q107_part_pricing" -> ((s, d) => {
      // per part-size bucket: catalog stats and the FULL TPC-H charge
      // expression (extendedprice * (1-discount) * (1+tax)) over the
      // part<->lineitem join — part is the broadcast side; the two
      // aggregates join on the ~50-value size bucket
      val pa = part(s, d).groupBy("p_size")
        .agg(count(lit(1)).as("n_parts"),
          sum(cents(col("p_retailprice"))).as("sum_retail_c"))
      val ch = part(s, d).select(col("p_partkey"), col("p_size"))
        .join(lineitem(s, d).select(col("l_partkey"),
            cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax"))).as("charge_c")),
          col("p_partkey") === col("l_partkey"))
        .groupBy("p_size")
        .agg(sum(col("charge_c")).as("sum_charge_c"),
          count(lit(1)).as("n_lineitems"))
      pa.join(ch, Seq("p_size"))
        .select(col("p_size").cast("long").as("p_size"), col("n_parts"),
          col("sum_retail_c"), col("sum_charge_c"), col("n_lineitems"))
        .orderBy("p_size")
    }),

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

    "q109_locf_gapfill" -> ((s, d) => {
      // gap-fill + last-observation-carried-forward per series key: the
      // classic time-series densify (q94's spine, per key, with LOCF
      // instead of zero-fill). The LOCF window partitions by the 5-value
      // priority — but its INPUT is the (priority x spine) grid, bounded
      // by the date domain (450 rows here, ~5x days at any corpus
      // size), so the low-cardinality key is safe per the
      // trailingRangeSum doctrine; the fact table only feeds the tiny
      // per-(priority, day) aggregate.
      val daily = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      val spine = s.range(1).select(explode(sequence(
        to_date(lit("1995-01-01")), to_date(lit("1995-03-31")))).as("day"))
      val keys = orders(s, d).select(col("o_orderpriority")).distinct()
      val grid = keys.crossJoin(broadcast(spine))
      val w = Window.partitionBy("o_orderpriority").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("o_orderpriority", "day"), "left")
        .withColumn("rev_locf_c",
          coalesce(last(col("rev_c"), ignoreNulls = true).over(w), lit(0L)))
        .withColumn("is_observed", col("rev_c").isNotNull)
        .select(col("o_orderpriority"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("rev_locf_c"), col("is_observed"))
        .orderBy("o_orderpriority", "day")
    }),

    "q110_bpe_vocab" -> ((s, d) =>
      // BPE vocabulary LEARNING (Sennrich ACL'16): 4 rounds of pick the
      // heaviest adjacent symbol pair (ties -> lexicographically
      // smallest) and fuse it corpus-wide. State is the distinct-word
      // table, never the corpus; each round = one pair groupBy + a
      // driver top-1 + a map-only rewrite (Bpe.bpeMerges scaladoc).
      // Oracle = the same 4 rounds unrolled in SQL, like q105.
      Bpe.bpeMerges(documents(s, d), "text", iters = 4).orderBy("rank")),

    "q111_bpe_encode" -> ((s, d) =>
      // BPE ENCODING — q110's learned merges APPLIED: each distinct
      // word's segmentation after the 4 merge rounds. The word column
      // rides through the learner's map-only rewrites (Bpe.bpeEncode),
      // so encode costs nothing beyond the learn; state stays
      // vocabulary-bounded. Oracle = q110's unrolled CTE chain carrying
      // w into the rewrite CTEs.
      Bpe.bpeEncode(documents(s, d), "text", iters = 4)
        .filter(col("freq") >= 3).orderBy("w")),

    "q112_ewma" -> ((s, d) => {
      // Trailing EWMA (alpha=1/4, span=8) of purchase value per user —
      // the time-series smoother q109's gap-fill feeds. Fixed-point over
      // milli-cents: the integer fold is bit-reproducible across engines
      // where the double fold ties at 4-decimal midpoints
      // (Relational.ewmaTrailing scaladoc); the key is user_id (domain
      // grows with the corpus, no q60-style low-cardinality funnel).
      val ev = events(s, d)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .withColumn("v_mc", cents(col("value")) * 1000L)
      Relational.ewmaTrailing(ev, "user_id",
          Seq(col("ts"), col("event_id")), "v_mc",
          alphaNum = 1L, alphaDen = 4L, span = 8)
        .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
          col("v_mc"), col("ewma").as("ewma_mc"))
        .orderBy("user_id", "event_id")
    }),

    "q113_ann_filtered" -> ((s, d) => {
      // Filtered vector search: top-5 cosine neighbors RESTRICTED to the
      // query's own label (same-tenant/same-language retrieval). The
      // label equality lives in the broadcast-join condition, so
      // mismatched corpus rows drop before any dot product
      // (Ann.bruteForceTopKFiltered).
      val e = embeddings(s, d)
      Ann.bruteForceTopKFiltered(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q114_quality_classifier" -> ((s, d) =>
      // Frozen-weight linear quality model applied corpus-wide — pure
      // integer features/score, so the keep/drop verdict is
      // bit-reproducible on any engine or partition count
      // (Curation.linearQualityScore scaladoc). Map-only, no shuffle.
      Curation.linearQualityScore(documents(s, d), "doc_id", "text",
          wLen = 3L, wStop = 2L, wAlpha = 5L, wWlen = -1L, threshold = 4000L)
        .orderBy("id")),

    "q115_dedup_incremental" -> ((s, d) => {
      // Incremental near-dup: the "today's batch vs standing corpus"
      // shape (batch = doc_id % 10 == 0 as a stand-in for an ingest
      // partition). Only new x corpus pairs are generated — the corpus
      // side is the one groupBy a standing band index would persist
      // bucketed; per batch only the new side is hashed and shuffled
      // (Dedup.minHashLshAgainst scaladoc).
      val docs = documents(s, d)
      Dedup.minHashLshAgainst(
          docs.filter(pmod(col("doc_id"), lit(10L)) === 0L),
          docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
          "doc_id", "text", k = 3, bands = 4, rowsPerBand = 4,
          minEstJaccard = 0.25, maxBucketSize = 10000)
        .orderBy("new_id", "corpus_id")
    }),

    "q116_dedup_containment" -> ((s, d) =>
      // Asymmetric containment |A∩B|/|A| vs /|B|: catches subset
      // duplication (a doc quoted whole inside a longer one) that
      // Jaccard scores near zero — same single-shuffle posting-list
      // pipeline as q30 (Dedup.ngramContainment scaladoc).
      Dedup.ngramContainment(documents(s, d), "doc_id", "text",
          k = 3, minContainment = 0.6, maxDocFreq = 10000)
        .orderBy("id_a", "id_b")),

    "q117_image_phash_dedup" -> ((s, d) => {
      // Perceptual-hash image dedup: REAL PNG decode -> all-integer
      // 8x8 average-hash -> the same Hamming<=2 pigeonhole banding the
      // text SimHash path uses (Dedup.hammingNearDup). The fixture's
      // gid groups are the same picture at different sizes, which
      // byte-exact dedup cannot pair. Oracle recomputes the aHash
      // ANALYTICALLY from the cell formula (never decodes a PNG) and
      // verifies pairs by exact per-cell comparison.
      val media = mediaFixture(s, d, "img_dup")(
        Multimodal.mediaWithDupImages(s, documents(s, d)))
      Dedup.hammingNearDup(Multimodal.imageAHash(media).toDF(),
          "media_id", "ahash", nBits = 64, maxHamming = 2)
        .orderBy("id_a", "id_b")
    }),

    "q118_video_decode" -> ((s, d) =>
      // REAL video decode: pure-JDK RIFF/AVI container parse + ImageIO
      // per-frame decode (MPNG fixtures — lossless, so the oracle
      // computes per-frame pixel sums ANALYTICALLY from the frame-seed
      // pattern formula without ever seeing an AVI byte; MJPG rides the
      // identical path, exercised structurally in tests). One media row
      // fans out to nFrames fixed-width stat rows on the executors; the
      // blob never survives the stage.
      Multimodal.videoFrameStats(mediaFixture(s, d, "video_real")(
          Multimodal.mediaWithRealVideo(s, documents(s, d))))
        .toDF()
        .orderBy("media_id", "frame_idx"))
,
    "q119_semdedup" -> ((s, d) =>
      // SemDeDup (Abbas et al. arXiv:2303.09540): k-means-cluster the
      // embedding space, then keep one representative per within-cluster
      // cosine-duplicate set (lowest id). Reuses the q54 deterministic
      // k-means build; the pair join is one cid-keyed shuffle
      // (Ann.semDedup scaladoc for the 100 TB shape). nLists scales
      // with the corpus (semDedupNLists: one count job) so the
      // within-cluster O(m²) pair join stays linear in n — the oracle's
      // LIMIT computes the identical formula.
      Ann.semDedup(embeddings(s, d), "vec_id", "embedding",
          nLists = semDedupNLists(embeddings(s, d).count()), eps = 0.35)
        .orderBy("vec_id")),

    "q120_unigram_surprisal" -> ((s, d) =>
      // Perplexity-proxy quality filter: per-doc unigram surprisal in
      // all-integer bits (floor-log2 via length(bin(x)) - 1, identical
      // in DuckDB) — one corpus scan, vocab derived from the per-doc
      // occurrence agg (Curation.unigramSurprisal scaladoc).
      Curation.unigramSurprisal(documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "q121_fuzzy_join_ed1" -> ((s, d) =>
      // SymSpell deletion-neighborhood fuzzy join: Levenshtein<=1 pairs
      // via ONE shuffle on deletion keys + exact post-filter — never the
      // O(n^2) cross join a naive theta-join plans
      // (Dedup.editDistance1Join scaladoc). Customer names differ in
      // single digit positions, the classic typo-dedup shape.
      Dedup.editDistance1Join(customer(s, d), "c_custkey", "c_name")
        .orderBy("id_a", "id_b")),

    "q122_triangle_count" -> ((s, d) =>
      // how clique-like is the duplicate graph: triangle count + global
      // clustering coefficient via rank-oriented wedges (sqrt-bounded
      // fan-out at hubs — GraphOps.triangleStats scaladoc). Same edge
      // set as q105's PageRank.
      GraphOps.triangleStats(
        Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
        "id_a", "id_b")),

    "q123_snapshot_diff" -> ((s, d) => {
      // CDC changelog between two deterministic snapshot derivations of
      // orders: keys %10==3 missing from v1 (inserts), %10==5 missing
      // from v2 (deletes), %10==7 repriced (+100 cents) in v2 (updates).
      val base = orders(s, d).select(col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      val m = pmod(col("o_orderkey"), lit(10L))
      val v1 = base.filter(m =!= 3)
      val v2 = base.filter(m =!= 5)
        .withColumn("total_c",
          when(m === 7, col("total_c") + 100L).otherwise(col("total_c")))
      Relational.snapshotDiff(v1, v2, Seq("o_orderkey"))
        .filter(col("change_type") =!= "unchanged")
        .select(col("o_orderkey"), col("change_type"),
          col("old_row.total_c").as("old_total_c"),
          col("new_row.total_c").as("new_total_c"))
        .orderBy("o_orderkey")
    }),

    "q124_mad_robust" -> ((s, d) =>
      // robust spread: exact per-group MAD from two value-histogram
      // percentile passes — per-group state bounded by the cents
      // domain, never |rows| (Relational.madByGroup scaladoc); the q101
      // doctrine extended to a composed statistic.
      Relational.madByGroup(
          orders(s, d).select(col("o_orderstatus"),
            cents(col("o_totalprice")).as("total_c")),
          "o_orderstatus", "total_c")
        .select(col("o_orderstatus"), round(col("med"), 2).as("med_c"),
          round(col("mad"), 2).as("mad_c"))
        .orderBy("o_orderstatus")),

    "q125_substring_spans" -> ((s, d) =>
      // EXACT substring dedup (Lee et al. 2022 suffix-array family):
      // every maximal >=40-char span two documents share verbatim, with
      // exact 1-based coordinates — per-position 40-gram posting lists
      // + diagonal islands, never a cross join; winnowing (q75) only
      // approximates this with sampled fingerprints. hashGrams: 8-byte
      // xxhash64 keys through every exchange/join — measured 6.9 s vs
      // 11.4 s at sf1 (string-mode equivalence is property-tested; the
      // ~C²/2⁶⁵ collision bound is ~2e-10 at oracle scale, and the
      // string-exact DuckDB oracle would catch one)
      // (Dedup.exactSubstringSpans scaladoc).
      Dedup.exactSubstringSpans(documents(s, d), "doc_id", "text", minLen = 40,
          hashGrams = true)
        .orderBy("id_a", "id_b", "start_a", "start_b")),

    "q126_substring_removal" -> ((s, d) =>
      // the REMOVAL half of Lee et al. exact dedup: q125's spans are
      // merged per losing doc (higher id) and cut; every doc returns
      // with removal accounting + an md5 of its cleaned text (fixed-
      // width however large the docs are). Whole-doc duplicates clean
      // to the empty string (Dedup.removeDuplicateSpans scaladoc).
      // hashGrams mirrors q125 (same measured trade, same oracle check).
      Dedup.removeDuplicateSpans(documents(s, d), "doc_id", "text", minLen = 40,
          hashGrams = true)
        .orderBy("id")),

    "q127_bloom_incremental" -> ((s, d) => {
      // ingest-time dedup: the standing corpus (doc_id % 10 != 3)
      // collapses to ONE bloom filter over 80-char prefix fingerprints;
      // the arriving batch (doc_id % 10 == 3) is might_contain-pruned
      // BEFORE any shuffle and an exact equi-join verifies survivors —
      // output is exact (no bloom false negatives; false positives die
      // in the join), so the oracle is the plain join
      // (Dedup.bloomIncrementalExact scaladoc).
      val docs = documents(s, d)
      Dedup.bloomIncrementalExact(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 3),
          docs.filter(pmod(col("doc_id"), lit(10)) === 3),
          "doc_id", "text", prefixLen = 80)
        .orderBy("batch_id", "corpus_id")
    }),

    "q128_incremental_agg" -> ((s, d) => {
      // materialized-aggregate maintenance: v1's per-priority (sum_v, n)
      // is rolled forward by q123's CDC changelog — only |changelog|
      // rows and the changed groups ever shuffle; the oracle is the
      // FULL recompute on v2, so the hash compare IS the proof that
      // incremental == recompute (Relational.incrementalSumCount).
      val base = orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority").as("g"), cents(col("o_totalprice")).as("v"))
      val m = pmod(col("o_orderkey"), lit(10L))
      val v1 = base.filter(m =!= 3)
      val v2 = base.filter(m =!= 5)
        .withColumn("v", when(m === 7, col("v") + 100L).otherwise(col("v")))
      val v1agg = v1.groupBy("g")
        .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      Relational.incrementalSumCount(v1agg,
          Relational.snapshotDiff(v1, v2, Seq("o_orderkey")), "g", "v")
        .orderBy("g")
    }),

    "q129_ann_recall" -> ((s, d) => {
      // index-quality eval: recall@5 of the q36 LSH index against the
      // q35 brute-force ground truth, per query — the measurement that
      // decides whether an approximate index may replace exact search
      // (Ann.recallAtK scaladoc).
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
      Ann.recallAtK(
          Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5),
          Ann.lshTopK(e, q, "vec_id", "embedding", k = 5, nBits = 4))
        .orderBy("query_id")
    }),

    "q130_selfrepeat_spans" -> ((s, d) =>
      // WITHIN-document repeat spans — the id_a == id_b, diag != 0
      // half-plane of the Lee et al. loop q125 leaves out: a doc
      // repeating its own >= 15-char substring (boilerplate headers,
      // chorus lines) reports each maximal repeat with exact 1-based
      // coordinates, first occurrence in start_a. minLen 15, not 40:
      // the corpus's genuine self-repeats live at that scale (262
      // repeated 15-grams at sf0.01; zero 40-grams)
      // (Dedup.selfRepeatSpans scaladoc).
      Dedup.selfRepeatSpans(documents(s, d), "doc_id", "text", minLen = 15,
          hashGrams = true)
        .orderBy("id", "start_a", "start_b")),

    "q131_selfrepeat_removal" -> ((s, d) =>
      // the COMPLETE Lee et al. cut: cross-doc spans (higher id loses
      // its copy) AND within-doc repeats (the doc loses the later
      // copy) merged into one interval set per doc and cut in one
      // pass — q126's machinery with includeSelf, at q130's minLen
      // (Dedup.removeDuplicateSpans scaladoc).
      Dedup.removeDuplicateSpans(documents(s, d), "doc_id", "text", minLen = 15,
          hashGrams = true, includeSelf = true)
        .orderBy("id")),

    "q132_audio_fingerprint_dedup" -> ((s, d) => {
      // Audio near-dup: REAL WAV decode -> 64-window integer energy
      // fingerprint -> the same Hamming<=2 pigeonhole banding as the
      // image (q117) and text (q52) paths. Fixture groups share one
      // amplitude pattern at different durations with one window
      // flipped per member (same-group pairs sit at Hamming exactly 2;
      // byte-exact dedup pairs nothing). Oracle derives the fingerprint
      // ANALYTICALLY from the amplitude formula — never decodes a WAV —
      // so a hash match proves the decode->window->threshold roundtrip
      // (Multimodal.audioFingerprint scaladoc).
      val media = mediaFixture(s, d, "audio_dup")(
        Multimodal.mediaWithDupAudio(s, documents(s, d)))
      Dedup.hammingNearDup(Multimodal.audioFingerprints(media).toDF(),
          "media_id", "fhash", nBits = 64, maxHamming = 2)
        .orderBy("id_a", "id_b")
    }),

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

    "q134_video_fingerprint_dedup" -> ((s, d) => {
      // Video near-dup: REAL AVI container parse + MPNG frame decode ->
      // 64-window temporal luminance fingerprint -> the same Hamming<=2
      // pigeonhole banding as images (q117) and audio (q132) — the
      // fingerprint-dedup triad complete. Fixture groups share one
      // temporal pattern at different durations/frame dims with one
      // window flipped per member (same-group pairs at Hamming exactly
      // 2); the oracle derives the fingerprint ANALYTICALLY from the
      // gray formula — never parses a container — so a hash match
      // proves the parse->decode->window->threshold roundtrip
      // (Multimodal.videoFingerprint scaladoc).
      val media = mediaFixture(s, d, "video_dup")(
        Multimodal.mediaWithDupVideo(s, documents(s, d)))
      Dedup.hammingNearDup(Multimodal.videoFingerprints(media).toDF(),
          "media_id", "fhash", nBits = 64, maxHamming = 2)
        .orderBy("id_a", "id_b")
    }),

    "q135_pmi_collocations" -> ((s, d) => {
      // Bigram collocation mining, PMI-ranked: score =
      // cnt_ab·1e6 div (cnt_a·cnt_b) is a positive constant times
      // P(ab)/(P(a)·P(b)), so ranking by it IS ranking by PMI (log is
      // monotone) — and it stays in exact Long arithmetic, no float
      // log to diverge between engines. cnt_ab >= 5 is the standard
      // sparse-pair cutoff. Scale shape: two hash aggs (words,
      // bigrams) + two shuffled joins on word keys; top-50 goes
      // through TakeOrdered, never a global sort.
      val biGrams = udf { toks: Seq[String] =>
        if (toks == null || toks.size < 2) Array.empty[String]
        else Array.tabulate(toks.size - 1)(i => toks(i) + " " + toks(i + 1))
      }.asNondeterministic()
      val toksDf = documents(s, d).select(tokens(col("text")).as("t"))
      val uni = toksDf.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val bi = toksDf.select(explode(biGrams(col("t"))).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt_ab"))
        .filter(col("cnt_ab") >= 5)
        .select(split(col("gram"), " ").getItem(0).as("w1"),
          split(col("gram"), " ").getItem(1).as("w2"), col("cnt_ab"))
      bi.join(uni.select(col("w").as("w1"), col("cnt").as("cnt_a")), "w1")
        .join(uni.select(col("w").as("w2"), col("cnt").as("cnt_b")), "w2")
        .withColumn("score", expr("cnt_ab * 1000000 DIV (cnt_a * cnt_b)"))
        .select("w1", "w2", "cnt_ab", "score")
        .orderBy(col("score").desc, col("cnt_ab").desc, col("w1"), col("w2"))
        .limit(50)
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

    "q137_kmv_distinct" -> ((s, d) =>
      // KMV distinct-count sketch, the DETERMINISTIC alternative to
      // q39's HLL: the k smallest md5 hashes are a pure function of the
      // data, so DuckDB recomputes the sketch itself and the estimate
      // hash-compares exactly (Sketches.KmvAgg scaladoc). Per-group
      // state = 64 longs, map-side combined — shuffle is |groups|×64
      // longs at any corpus size.
      Sketches.kmvDistinct(events(s, d), "event_type", col("user_id"),
          k = KmvK, saltPrefix = "kmv_")
        .orderBy("event_type")),

    "q138_cms_heavy" -> ((s, d) => {
      // Count-min sketch frequency probe: the whole sketch is d·w=4096
      // cells from ONE bounded-domain hash agg; the probe list and
      // cells both broadcast, so probing adds no shuffle
      // (Sketches.cmsBuild scaladoc). Overestimate-only guarantee
      // asserted vs exact counts in SketchesSpec.
      val cells = Sketches.cmsBuild(documents(s, d), "text",
        d = CmsDepth, w = CmsWidth, saltPrefix = "cms")
      Sketches.cmsProbe(s, cells, CmsProbeWords,
          d = CmsDepth, w = CmsWidth, saltPrefix = "cms")
        .orderBy("word")
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

    "q140_int8_ann" -> ((s, d) => {
      // Scalar int8 quantization + integer dot-product top-k: exact
      // Long scores, so the ranking needs NO rounding epsilon — and the
      // quantized corpus is 4x smaller in memory (Ann.int8QuantTopK
      // scaladoc). Recall vs float brute force asserted in DedupAnnSpec.
      val e = embeddings(s, d)
      Ann.int8QuantTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("qdot"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q141_temperature_mix" -> ((s, d) =>
      // XLM-style p^0.5 temperature rebalancing across languages:
      // integer per-lang keep rates from the driver-side BigInt formula
      // (bounded collect: one row per lang), applied as a map-only
      // md5-coin filter (Curation.temperatureSample scaladoc).
      Curation.temperatureSample(documents(s, d), "doc_id", "lang",
          budgetDivisor = 2L)
        .orderBy("id")),

    "q142_bigram_surprisal" -> ((s, d) =>
      // Stupid-backoff bigram LM surprisal in exact integer bits,
      // train/eval md5-split — the deterministic stand-in for the
      // CCNet-style LM perplexity filter (Curation.bigramSurprisal
      // scaladoc).
      Curation.bigramSurprisal(documents(s, d), "doc_id", "text")
        .orderBy("id")),

    "q143_source_drift" -> ((s, d) =>
      // Per-source cross-vs-self entropy gap (integer-bits KL proxy):
      // the per-ingest mixture-health monitor (Curation.sourceDrift
      // scaladoc).
      Curation.sourceDrift(documents(s, d), "doc_id", "text", "source")
        .orderBy("src")),

    "q144_kmv_jaccard" -> ((s, d) =>
      // Pairwise customer-set overlap between order statuses from the
      // per-group KMV sketches alone — the theta-sketch trick: the raw
      // sets are never compared, so the pair stage costs |G|^2 * k at
      // any corpus size (Sketches.kmvJaccard scaladoc).
      Sketches.kmvJaccard(orders(s, d), "o_orderstatus", col("o_custkey"),
          k = KmvK, saltPrefix = "kj_")
        .orderBy("g_a", "g_b")),

    "q145_trimmed_mean" -> ((s, d) =>
      // Exact 10% two-sided trimmed mean per order status over the
      // (group, cents) HISTOGRAM — ordered state bounded by the value
      // domain, never |rows| (Relational.trimmedMeanByGroup scaladoc;
      // the q124 MAD machinery's shape).
      Relational.trimmedMeanByGroup(orders(s, d), "o_orderstatus",
          cents(col("o_totalprice")), trimPpm = 100000L)
        .orderBy("o_orderstatus")),

    "q146_perplexity_buckets" -> ((s, d) =>
      // CCNet-style head/middle/tail LM-score terciles per source: the
      // thresholds come from a value-domain histogram (two collected
      // integers), never a global sort (Curation.perplexityBuckets
      // scaladoc).
      Curation.perplexityBuckets(documents(s, d), "doc_id", "text", "source")
        .orderBy("src", "bucket")),

    "q147_centroid_outliers" -> ((s, d) =>
      // Embedding-space outlier screen: lowest-50 cosine-to-centroid;
      // centroid = one bounded agg shipped as a literal, scoring
      // map-only (Ann.centroidFarthest scaladoc).
      Ann.centroidFarthest(embeddings(s, d), "vec_id", "embedding", k = 50)),

    "q148_inverted_index" -> ((s, d) =>
      // Capped inverted index: exact per-term df + the 10 lowest doc
      // ids; the cap prunes per-partition BEFORE the exchange
      // (WindowGroupLimit), so stopword postings never serialize onto
      // one task (Indexing.invertedIndex scaladoc).
      Indexing.invertedIndex(documents(s, d), "doc_id", "text", cap = 10)
        // fixed-width posting rendering: the harness comparator hashes
        // scalar cells only (ArrayType crashes its pandas sort), so the
        // sorted id list rides as one comma-joined string — content
        // identical, type oracle-comparable
        .withColumn("doc_ids", array_join(col("doc_ids"), ","))
        .orderBy("w")),

    "q149_ngram_novelty" -> ((s, d) =>
      // Per-doc 8-gram novelty vs the md5 train half — the memorization
      // screen; grams ride the exchange as 60-bit hashes (q125's
      // hashGrams trade; a collision can only undercount by one gram)
      // (Indexing.ngramNovelty scaladoc).
      Indexing.ngramNovelty(documents(s, d), "doc_id", "text", n = 8)
        .orderBy("id")),

    "q150_weighted_median" -> ((s, d) =>
      // Quantity-weighted lower median of extended price per return
      // flag — all integer (2*cumw >= W), value-domain-bounded window
      // (Relational.weightedMedianByGroup scaladoc).
      Relational.weightedMedianByGroup(lineitem(s, d), "l_returnflag",
          cents(col("l_extendedprice")), round(col("l_quantity")).cast("long"))
        .orderBy("l_returnflag")),

    "q151_token_gini" -> ((s, d) =>
      // Per-source token-frequency Gini in exact integer ppm — the
      // Zipf-skew corpus monitor; tie blocks make the rank sum
      // well-defined without any ordering decision (Curation.tokenGini
      // scaladoc).
      Curation.tokenGini(documents(s, d), "doc_id", "text", "source")
        .orderBy("src")),

    "q152_bm25_topk" -> ((s, d) =>
      // BM25-lite ranked retrieval in exact integers: floor-log2 idf
      // bits + milli-scaled tf saturation, canonical division order —
      // a float log would not cross engines (Indexing.bm25LiteTopK
      // scaladoc).
      Indexing.bm25LiteTopK(documents(s, d), "doc_id", "text",
          Bm25Terms, k = 20)
        .orderBy(col("score_milli").desc, col("id"))),

    "q153_prefix_rerank_ann" -> ((s, d) => {
      // Matryoshka-style two-stage retrieval: 16-dim prefix dot for
      // candidates, full 64-dim cosine rerank — the full vector only
      // touches |queries|*candidateK pairs (Ann.prefixRerankTopK
      // scaladoc; recall vs brute force asserted in SelectionLmSpec).
      val e = embeddings(s, d)
      Ann.prefixRerankTopK(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 5, prefixDim = 16, candidateK = 50)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q154_table_profile" -> ((s, d) =>
      // One-pass ingest audit: per-column nulls + KMV distinct
      // estimates from a SINGLE aggregation over one scan — the
      // Deequ-class delivery check (Sketches.profileTable scaladoc).
      // value canonicalizes to cents so both engines hash the same
      // string.
      Sketches.profileTable(events(s, d), Seq(
          "event_id" -> col("event_id"),
          "event_type" -> col("event_type"),
          "props" -> col("props"),
          "user_id" -> col("user_id"),
          "value_cents" -> cents(col("value"))),
          k = KmvK, saltPrefix = "prof_")
        .orderBy("column")),

    "q155_linreg_train" -> ((s, d) => {
      // In-engine model TRAINING: exact integer sufficient statistics
      // (one map-side-combined agg) + exact BigInt Cramer solve — the
      // trainer behind q114's frozen-weight scorer; weights are a
      // deterministic function of the corpus, oracle re-derives them
      // through a generated 24-term determinant expansion in HUGEINT
      // (Curation.linearFitStats/linearFitSolve scaladoc).
      val w = Curation.linearFitSolve(
        Curation.linearFitStats(documents(s, d), "text").head())
      import s.implicits._
      w.toDF("feature", "weight_ppm").orderBy("feature")
    }),

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

    "q158_perceptron_train" -> ((s, d) =>
      // In-engine CLASSIFIER training: batch perceptron on int8-quantized
      // embeddings (y = label <= 4), exact integer trajectory — one
      // bounded aggregation per epoch, weights never leave the driver
      // (Ann.perceptronTrain scaladoc). The oracle replays all three
      // epochs in unrolled CTEs.
      Ann.perceptronTrain(embeddings(s, d), "vec_id", "embedding",
          "label", posMax = PerceptronPosMax, epochs = PerceptronEpochs)
        .orderBy("epoch")),

    "q159_merge_upsert" -> ((s, d) => {
      // CDC round trip, write side: apply q123's changelog back onto v1
      // with MERGE semantics — the result must BE v2, and the oracle
      // derives v2 directly, so the equality is checked end-to-end
      // (Relational.applyChangelog scaladoc).
      val base = orders(s, d).select(col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      val m = pmod(col("o_orderkey"), lit(10L))
      val v1 = base.filter(m =!= 3)
      val v2 = base.filter(m =!= 5)
        .withColumn("total_c",
          when(m === 7, col("total_c") + 100L).otherwise(col("total_c")))
      Relational.applyChangelog(v1,
          Relational.snapshotDiff(v1, v2, Seq("o_orderkey")), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "q160_scd2_history" -> ((s, d) =>
      // SCD Type-2 dimension history: per-user event_type validity
      // intervals (change-collapsed), the table a point-in-time as-of
      // join probes (Relational.scd2History scaladoc). Timestamps
      // emitted as second-granularity strings per the cross-engine
      // rules.
      Relational.scd2History(events(s, d), "user_id", "ts", "event_type",
          "event_id")
        .select(col("user_id"), col("event_type"),
          fmtTs(col("valid_from")).as("valid_from"),
          fmtTs(col("valid_to")).as("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_type")),

    "q161_bfs_hops" -> ((s, d) =>
      // Blast-radius query: multi-source BFS (4 hops) over the q105
      // simhash dup graph from the doc_id % 50 == 0 seed set — which
      // docs are transitively near a flagged set (GraphOps.bfsHops
      // scaladoc). The oracle is a DuckDB recursive CTE over the
      // identical edge list.
      GraphOps.bfsHops(
          Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
          "id_a", "id_b",
          documents(s, d).filter(pmod(col("doc_id"), lit(50L)) === 0),
          "doc_id", maxHops = BfsMaxHops)
        .select(col("id").as("doc_id"), col("hops"))
        .orderBy("doc_id")),

    "q162_hashsample_quantile" -> ((s, d) => {
      // Deterministic approximate quantiles: a 1-in-4 md5-coin sample
      // (reproducible, engine-neutral — the q137-for-q39 move applied
      // to q70's opaque percentile sketch) feeding the bounded-state
      // histogram percentile machinery; error vs the exact q101
      // medians is regression-guarded in SketchAccuracySpec.
      val sampled = orders(s, d).filter(
        pmod(tokenHash64(concat(lit("qsamp_"), col("o_orderkey").cast("string"))),
          lit(QsampOneIn)) === 0)
      Relational.histogramPercentiles(
          sampled.select(col("o_orderstatus"), cents(col("o_totalprice")).as("price_c")),
          "o_orderstatus", "price_c",
          Seq("est_median_c" -> 0.5, "est_p90_c" -> 0.9))
        .select(col("o_orderstatus"),
          round(col("est_median_c"), 2).as("est_median_c"),
          round(col("est_p90_c"), 2).as("est_p90_c"))
        .orderBy("o_orderstatus")
    }),

    "q163_kcenter_coreset" -> ((s, d) =>
      // Diversity-maximizing coreset: greedy k-center (farthest-first)
      // over the embeddings — k exemplars covering the space, one
      // bounded-agg corpus scan per round (Ann.kCenterGreedy scaladoc);
      // the oracle replays all rounds in unrolled CTEs.
      Ann.kCenterGreedy(embeddings(s, d), "vec_id", "embedding",
          k = KCenterK)
        .orderBy("rank")),

    "q164_group_mode" -> ((s, d) =>
      // Exact per-group mode with deterministic ties (largest count,
      // then smallest value): two map-side-combinable aggregations,
      // state bounded by the (source × lang) domain — the scale-safe
      // form of "most common value", vs a rank window over raw rows.
      documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("source")
        .agg(min(struct((-col("cnt")).as("nc"), col("lang").as("l"))).as("m"),
          sum(col("cnt")).as("n_docs"))
        .select(col("source"), col("m.l").as("mode_lang"),
          (-col("m.nc")).as("n_mode"), col("n_docs"))
        .orderBy("source")),

    "q165_video_scene_cuts" -> ((s, d) =>
      // Scene-cut detection over REAL AVI decode (keyframe selection
      // primitive): exact integer mean-gray change between consecutive
      // frames, map-only, blob dies in-stage
      // (Multimodal.videoSceneCuts scaladoc). The fixture's windows are
      // piecewise-constant, so the oracle derives every cut position
      // analytically.
      Multimodal.videoSceneCuts(mediaFixture(s, d, "video_dup")(
          Multimodal.mediaWithDupVideo(s, documents(s, d))))
        .toDF()
        .orderBy("media_id")),

    "q166_phrase_match" -> ((s, d) =>
      // Exact positional phrase search — the retrieval operator the
      // doc-level inverted index (q148) cannot answer: candidate
      // postings filter to the phrase words BEFORE any exchange, then
      // adjacency verifies via (doc, pos+offset) equi-joins
      // (Indexing.phraseMatch scaladoc).
      Indexing.phraseMatch(documents(s, d), "doc_id", "text", PhraseQ166)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "q167_mmr_rerank" -> ((s, d) =>
      // MMR diverse re-ranking of the query-0 top-24 candidates
      // (k = 8, λ = 0.7): the post-retrieval step that stops k
      // near-duplicates of the best hit from filling a RAG context
      // window — exact integer trajectory, candidates bounded at
      // candC×dim driver doubles (Ann.mmrRerank scaladoc).
      Ann.mmrRerank(embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, candC = MmrCandC, k = MmrK)
        .orderBy("rank")),

    "q168_kmv_merge" -> ((s, d) => {
      // Sketch MERGEABILITY, proven: sketch each md5-half of events
      // separately, merge the bounded sketch tables, and the result
      // must be BIT-IDENTICAL to the whole-corpus sketch — the oracle
      // is q137's whole-corpus SQL verbatim. This is the property that
      // lets incremental/partitioned ingest maintain distinct counts
      // without ever rescanning history (Sketches.kmvMergeEstimate
      // scaladoc).
      val ev = events(s, d)
      val coin = pmod(tokenHash64(concat(lit("half_"),
        col("event_id").cast("string"))), lit(2L))
      def half(m: Int) = Sketches.kmvSketches(ev.filter(coin === m),
        "event_type", col("user_id"), k = KmvK, saltPrefix = "kmv_")
      Sketches.kmvMergeEstimate(half(0), half(1), "event_type", k = KmvK)
        .orderBy("event_type")
    }),

    "q169_equidepth_buckets" -> ((s, d) => {
      // Equi-depth (quartile) binning of order value — the feature
      // discretization step: boundaries from the bounded-state
      // histogram percentiles (ONE collect of 3 doubles), assignment a
      // map-only comparison against broadcast literals, stats one agg.
      val o = orders(s, d).select(cents(col("o_totalprice")).as("price_c"))
        .withColumn("__g", lit(1))
      val b = Relational.histogramPercentiles(o, "__g", "price_c",
        Seq("b1" -> 0.25, "b2" -> 0.5, "b3" -> 0.75)).head()
      val (b1, b2, b3) = (b.getDouble(1), b.getDouble(2), b.getDouble(3))
      o.withColumn("bucket",
          (lit(1L) + when(col("price_c") > b1, 1L).otherwise(0L)
            + when(col("price_c") > b2, 1L).otherwise(0L)
            + when(col("price_c") > b3, 1L).otherwise(0L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("price_c").as("min_c"),
          max("price_c").as("max_c"), sum("price_c").as("sum_c"))
        .orderBy("bucket")
    }),

    "q170_benford_audit" -> ((s, d) => {
      // Benford first-digit audit of prices (fraud/synthetic-data
      // screen for numeric columns): observed vs expected leading-digit
      // mix in exact integer ppm; expectations are fixed log10(1+1/d)
      // literals shared with the oracle. One map-side-combinable
      // 9-key agg.
      // leading digit by integer range dispatch, not substring(cast):
      // the string path materializes 60M Long.toString calls at sf10 —
      // measured 13.2 s vs 9.2 s for this all-integer when-chain (both
      // engines agree on the VALUE; the oracle keeps its string form)
      val leadDigit = {
        val c = col("c")
        (1 to 18).foldLeft(when(lit(false), 0L)) { (acc, k) =>
          val lo = math.pow(10, k - 1).toLong
          val hi = if (k == 18) Long.MaxValue else math.pow(10, k).toLong
          acc.when(c >= lo && c < hi, expr(s"c div ${lo}L"))
        }
      }
      // ONE corpus scan collapses to <= 9 rows; the ppm arithmetic
      // happens on the collected rows (the q141 bounded-collect class —
      // a broadcast-total formulation re-executed the scan subtree for
      // the total, measured 2x the scan cost at sf10)
      val byDigit = lineitem(s, d)
        .select(cents(col("l_extendedprice")).as("c"))
        .filter(col("c") > 0)
        .withColumn("digit", leadDigit.cast("long"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n_obs"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val n = byDigit.map(_._2).sum
      import s.implicits._
      byDigit.toSeq.map { case (digit, obs) =>
        val obsPpm = obs * 1000000L / n
        val exp = BenfordPpm(digit.toInt - 1)
        (digit, obs, obsPpm, exp, obsPpm - exp)
      }.toDF("digit", "n_obs", "obs_ppm", "exp_ppm", "dev_ppm")
        .orderBy("digit")
    }),

    "q171_rrf_fusion" -> ((s, d) =>
      // Hybrid retrieval: exact-cosine semantic list + distinct-token
      // Jaccard lexical list over the SAME id domain (doc_id == vec_id),
      // fused by reciprocal rank in integer ppm. Both candidate
      // generators broadcast the query side; fusion touches only
      // |Q|*2*listK rank rows (Indexing.rrfHybridTopK scaladoc).
      Indexing.rrfHybridTopK(
          documents(s, d),
          embeddings(s, d).withColumnRenamed("vec_id", "doc_id"),
          "doc_id", "text", "embedding",
          queryMax = RrfQueryMax, listK = RrfListK, rrfK = RrfDamp,
          k = RrfTopK)
        .orderBy("query_id", "rnk")),

    "q172_gopher_rules" -> ((s, d) =>
      // Gopher-style quality-rule dashboard per source: five integer-
      // exact rules (word count, mean word length, long-word, unique-
      // ratio repetition, distinct-stopword prose screen), flag counts
      // and pass ppm (Curation.gopherRules scaladoc).
      Curation.gopherRules(documents(s, d), "doc_id", "text", "source",
          stopWords = GopherStop)
        .orderBy("src")),

    "q173_nb_confusion" -> ((s, d) =>
      // In-engine Naive Bayes language classifier: log2-quantized
      // add-one likelihoods (integer-exact train -> predict ->
      // confusion; Curation.naiveBayesConfusion scaladoc). The model is
      // one vocabulary-bounded (class, token) agg; scoring joins each
      // eval token once per class.
      Curation.naiveBayesConfusion(documents(s, d), "doc_id", "text", "lang")
        .orderBy("actual", "predicted")),

    "q174_sssp_cheapest" -> ((s, d) => {
      // Weighted blast radius: Bellman-Ford (4 rounds) over the q105
      // dup graph with md5-derived integer edge weights, multi-source
      // from the q161 seed set — min-COST contamination route, not just
      // hop count (GraphOps.ssspHops scaladoc). The oracle enumerates
      // the same <=4-edge paths in a bounded recursive CTE.
      val pairs = Dedup.simHashDup(documents(s, d), "doc_id", "text",
        nBits = 16)
      val weighted = pairs.withColumn("w",
        lit(1L) + pmod(tokenHash64(concat(lit("sp_"),
          col("id_a").cast("string"), lit("_"),
          col("id_b").cast("string"))), lit(9L)))
      GraphOps.ssspHops(weighted, "id_a", "id_b", "w",
          documents(s, d).filter(pmod(col("doc_id"), lit(50L)) === 0),
          "doc_id", maxHops = BfsMaxHops)
        .select(col("id").as("doc_id"), col("dist"))
        .orderBy("doc_id")
    }),

    "q175_cohort_retention" -> ((s, d) =>
      // Product-analytics retention triangle: users cohorted by first
      // active ISO week, (cohort, offset) active counts + ppm ratio —
      // all user-key-partitioned aggs (Relational.cohortRetention
      // scaladoc).
      Relational.cohortRetention(events(s, d), "user_id", "ts")
        .orderBy("cohort_week", "offset_w")),

    "q176_assoc_rules" -> ((s, d) =>
      // Market-basket rules over per-user event-type baskets:
      // support/confidence/lift as fused integer ratios; pair fan-out
      // bounded by the type-domain constant, marginals broadcast
      // (Relational.assocRules scaladoc).
      Relational.assocRules(events(s, d), "user_id", "event_type")
        .orderBy("antecedent", "consequent")),

    "q177_autocorr_daily" -> ((s, d) => {
      // Lag-1 autocorrelation of each event type's daily spend series:
      // integer-cent day sums -> exact Long moment sums -> one IEEE
      // double ratio per group (Relational.autocorrLag1 scaladoc on why
      // this is bit-reproducible cross-engine).
      val daily = events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("v_c"))
      Relational.autocorrLag1(daily, "event_type", "day", "v_c")
        .orderBy("grp")
    }),

    "q178_cms_merge" -> ((s, d) => {
      // CMS MERGEABILITY, proven: sketch each md5-half of documents
      // separately, merge cellwise, probe — must be BIT-IDENTICAL to
      // the q138 whole-corpus sketch (CMS is linear; the q168 property
      // for frequencies). The oracle is q138's SQL verbatim.
      val docs = documents(s, d)
      val coin = pmod(tokenHash64(concat(lit("half_"),
        col("doc_id").cast("string"))), lit(2L))
      def half(m: Int) = Sketches.cmsBuild(docs.filter(coin === m), "text",
        d = CmsDepth, w = CmsWidth, saltPrefix = "cms")
      Sketches.cmsProbe(s, Sketches.cmsMerge(Seq(half(0), half(1))),
          CmsProbeWords, d = CmsDepth, w = CmsWidth, saltPrefix = "cms")
        .orderBy("word")
    }),

    "q179_ppr_dupgraph" -> ((s, d) =>
      // Personalized PageRank (3 iterations) over the dup graph,
      // teleporting only to the q161 seed set — TrustRank-style
      // proximity in the same scaled-long integer arithmetic as q105
      // (GraphOps.personalizedPageRankInt scaladoc).
      GraphOps.personalizedPageRankInt(
          Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
          "id_a", "id_b",
          documents(s, d).filter(pmod(col("doc_id"), lit(50L)) === 0),
          "doc_id", iters = 3)
        .select(col("id").as("doc_id"), col("r").as("rank_scaled"),
          col("d").as("degree"))
        .orderBy("doc_id")),

    "q180_attribution" -> ((s, d) => {
      // Last-touch attribution: each purchase credits the most recent
      // non-purchase event of the same user within a 24 h lookback —
      // the merge-form as-of join (no pair fan-out), then a 4-row
      // channel rollup with exact ppm shares.
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_id").as("t_id"), col("user_id").as("t_user"),
          col("ts").as("t_ts"), col("event_type").as("channel"))
      val attributed = Relational.asOfJoinMergeDirected(purchases, touches,
        "user_id", "t_user", "ts", "t_ts", "t_id", forward = false,
        toleranceSeconds = 86400L)
      val counts = attributed.groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"))
      counts
        .crossJoin(broadcast(counts.agg(sum("n_purchases").as("n_total"))))
        .select(col("channel"), col("n_purchases").cast("long").as("n_purchases"),
          expr("n_purchases * 1000000 div n_total").as("share_ppm"))
        .orderBy("channel")
    }),

    "q181_markov_transitions" -> ((s, d) => {
      // Event-sequence Markov transition matrix: per-user ordered lag
      // pairs, (from, to) counts, row-normalized in exact ppm. State is
      // bounded by the |type|^2 domain; the window partitions by user.
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy("from_type").agg(sum("n").as("n_from"))
      tr.join(broadcast(tot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n").cast("long").as("n"),
          expr("n * 1000000 div n_from").as("p_ppm"))
        .orderBy("from_type", "to_type")
    }),

    "q182_ppjoin" -> ((s, d) =>
      // EXACT set-similarity self-join with prefix filtering
      // (PPJoin-lite): every 3-shingle-Jaccard >= 0.7 pair, no LSH
      // recall loss, no all-pairs — rare-first global shingle order
      // keeps prefix postings short (Dedup.ppJoinShingles scaladoc).
      // The oracle is the brute-force quadratic join: the filter must
      // lose NOTHING.
      Dedup.ppJoinShingles(documents(s, d), "doc_id", "text",
          tPpm = PpJoinTPpm)
        .orderBy("id_a", "id_b")),

    "q183_interval_union" -> ((s, d) => {
      // Total covered time per user from overlapping 30-min activity
      // windows: sweep-line island merge, one exchange, exact integer
      // microseconds (Relational.intervalUnionLength scaladoc).
      val iv = events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + lit(IntervalSessionSec * 1000000L)).as("e_us"))
      Relational.intervalUnionLength(iv, "user_id", "s_us", "e_us")
        .select(col("k").as("user_id"), col("n_islands"),
          expr("covered_us div 1000000").as("covered_s"))
        .orderBy("user_id")
    }),

    "q184_kcore" -> ((s, d) => {
      // Dense-backbone query: 2-core of the dup graph AUGMENTED with
      // bounded chain edges (consecutive ids within blocks of 8) —
      // chains dangling off clique anchors peel away round by round,
      // paths BETWEEN anchors survive, so the peel is genuinely
      // iterative (GraphOps.kCore scaladoc). The oracle unrolls the
      // same rounds; the engine asserts fixpoint within them.
      val docs = documents(s, d)
      val dup = Dedup.simHashDup(docs, "doc_id", "text", nBits = 16)
        .select("id_a", "id_b")
      val ids = docs.select(col("doc_id"))
      val chain = ids.as("a").join(ids.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            pmod(col("a.doc_id"), lit(8L)) < 7)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      GraphOps.kCore(dup.unionByName(chain).distinct(), "id_a", "id_b",
          k = KCoreK, maxRounds = KCoreMaxRounds)
        .select(col("id").as("doc_id"), col("core_deg"))
        .orderBy("doc_id")
    }),

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

    "q186_changepoint" -> ((s, d) => {
      // At-most-one mean-shift detection per user over the daily spend
      // series: exact integer CUSUM statistic, argmax split point,
      // ties to the earliest day (Relational.meanShiftCut scaladoc).
      val daily = events(s, d).groupBy(col("user_id"),
          to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("v_c"))
      Relational.meanShiftCut(daily, "user_id", "day", "v_c",
          minDays = ChangepointMinDays)
        .select(col("grp").as("user_id"), col("n_days"),
          date_format(col("cut_day"), "yyyy-MM-dd").as("cut_day"),
          col("score"))
        .orderBy("user_id")
    }),

    "q187_dbscan_rfm" -> ((s, d) => {
      // Density clustering (grid-partitioned DBSCAN) over the customer
      // RFM plane: eps-grid candidate join, exact integer L2 cut,
      // core/border/noise with deterministic min-label borders
      // (Ann.dbscanGrid scaladoc). Oracle is the brute-force eps-join
      // + recursive-closure labeling.
      val rfm = orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"),
          sum(cents(col("o_totalprice"))).as("spend_c"))
        .select(col("o_custkey").as("id"),
          (col("n_ord") * 25).cast("long").as("x"),
          expr("spend_c div 1000000").as("y"))
      Ann.dbscanGrid(rfm, "id", "x", "y",
          eps = DbscanEps, minPts = DbscanMinPts)
        .select(col("id").as("cust_id"), col("role"), col("label"))
        .orderBy("cust_id")
    }),

    "q188_textrank_keywords" -> ((s, d) => {
      // TextRank keyword extraction (Mihalcea & Tarau 2004): windowed
      // co-occurrence edges (offsets 1-2, ONE doc-partitioned window
      // exchange — no position self-join) weighted by corpus count,
      // WEIGHTED integer PageRank, top-20. Unweighted ranks collapse
      // to uniform on this near-complete vocabulary graph — the
      // weights carry all the signal (GraphOps.weightedPageRankInt
      // scaladoc).
      val edges = documents(s, d)
        .select(explode(cooccurPairsUdf(2)(tokens(col("text")))).as("pr"))
        .groupBy(col("pr._1").as("u"), col("pr._2").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= TextRankMinCount)
      GraphOps.weightedPageRankInt(edges, "u", "v", "w",
          iters = TextRankIters)
        .orderBy(col("r").desc, col("id").asc)
        .limit(TextRankTopK)
        .select(col("id").as("word"), col("r").as("rank_i"))
    }),

    "q189_audio_silence" -> ((s, d) =>
      // VAD-lite: silence segmentation over REAL WAV decode — map-only,
      // per-file run merge inside the stage, blob never shuffles; the
      // oracle derives silent windows from the fixture amplitude
      // formula, no WAV decoded (Multimodal.audioSilenceSegments
      // scaladoc).
      Multimodal.audioSilenceSegments(mediaFixture(s, d, "audio_dup")(
          Multimodal.mediaWithDupAudio(s, documents(s, d)))).toDF()
        .orderBy("media_id", "seg")),

    "q190_theilsen_trend" -> ((s, d) => {
      // Robust revenue trend per return flag: exact Theil-Sen over the
      // daily series — median-of-slopes is immune to the outlier days
      // that tilt q155's least-squares fit (Relational.theilSenSlope
      // scaladoc; pair fan-out bounded by the day domain, never the
      // corpus).
      val daily = lineitem(s, d).groupBy(col("l_returnflag"),
          to_date(col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("rev_c"))
        .select(col("l_returnflag"),
          datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
          col("rev_c").as("y"))
      Relational.theilSenSlope(daily, "l_returnflag", "x", "y")
        .select(col("grp").as("l_returnflag"), col("n_pairs"),
          col("slope_milli"))
        .orderBy("l_returnflag")
    }),

    "q191_entity_resolution" -> ((s, d) => {
      // Record-linkage composition (the pipeline q121 stops short of):
      // SymSpell ed<=1 candidate pairs -> nation blocking -> star CC
      // collapse -> per-entity cluster label + size; singletons
      // self-label. Every stage is the proven machinery (q121, q84).
      val out = erClusterLabels(s, d)
      val sizes = out.groupBy("label").agg(count(lit(1)).as("csize"))
      out.join(sizes, Seq("label"))
        .select(col("cust_id"), col("label"), col("csize").cast("long").as("csize"))
        .orderBy("cust_id")
    }),

    "q192_pq_ann" -> ((s, d) => {
      // Product-quantization ANN: 8 subspace codebooks (q54's Lloyd
      // semantics per subspace), corpus stored as 8 codes/vector,
      // queries scored by asymmetric-distance lookup-table sums in
      // fixed subspace order (Ann.pqTopK scaladoc). The oracle replays
      // all 8 k-means builds + the LUT chain in generated SQL.
      val e = embeddings(s, d)
      Ann.pqTopK(e, e.filter(col("vec_id") < PqQueryMax), "vec_id",
          "embedding", k = PqK, m = PqM, codesPerSub = PqCodes, iters = 2)
        .select(col("query_id"), col("neighbor_id"), col("adist"),
          col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q193_snm_dedup" -> ((s, d) => {
      // Sorted-neighborhood blocking + exact verify: candidates within
      // 4 sorted-name positions, kept at levenshtein <= 1 — the
      // sort-based complement of q121's deletion-key blocking
      // (Dedup.sortedNeighborhoodPairs scaladoc: distributed rank, no
      // single-partition window).
      val c = customer(s, d)
      val named = c.select(col("c_custkey"), col("c_name"))
      Dedup.sortedNeighborhoodPairs(c, "c_custkey", "c_name",
          window = SnmWindow)
        .join(named.select(col("c_custkey").as("id_a"),
          col("c_name").as("na")), Seq("id_a"))
        .join(named.select(col("c_custkey").as("id_b"),
          col("c_name").as("nb")), Seq("id_b"))
        .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
        .filter(col("dist") <= 1)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy("id_a", "id_b")
    }),

    "q194_cms_joinsize" -> ((s, d) => {
      // Join-size estimation from two count-min sketches (the
      // count-min inner-product estimator): overestimate-only sizing
      // of |events ⋈ orders on customer| from d·w cells per side —
      // the sketch algebra a join planner consults without reading
      // either table (Sketches.cmsJoinSizeEstimate scaladoc).
      val ev = events(s, d).select(col("user_id").as("k"))
      val od = orders(s, d).select(col("o_custkey").as("k"))
      val est = Sketches.cmsJoinSizeEstimate(
        Sketches.cmsBuildKeys(ev, "k", CmsDepth, CmsWidth, JoinSizeSalt),
        Sketches.cmsBuildKeys(od, "k", CmsDepth, CmsWidth, JoinSizeSalt))
      val exact = ev.groupBy("k").agg(count(lit(1)).as("na"))
        .join(od.groupBy("k").agg(count(lit(1)).as("nb")), Seq("k"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long")
          .as("exact_join_size"))
      est.crossJoin(exact)
        .select(col("est_join_size"), col("exact_join_size"),
          // explicit NULL on exact=0 (disjoint key sets) — mirrors the
          // oracle's guarded CASE; Spark's div yields null there anyway
          // but the contract should be stated, not incidental
          when(col("exact_join_size") > 0,
            expr("est_join_size * 1000000 div exact_join_size"))
            .as("over_ppm"))
    }),

    "q195_gapfill_interp" -> ((s, d) => {
      // Linear-interpolation gap fill over per-user daily spend (the
      // interpolating complement of q109's LOCF): interior calendar
      // gaps get the exact integer line between their observed
      // anchors; one window exchange, map-side explode
      // (Relational.gapFillInterpolate scaladoc).
      val daily = events(s, d).groupBy(col("user_id"),
          to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("v_c"))
        .select(col("user_id"),
          datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
          col("v_c"))
      Relational.gapFillInterpolate(daily, "user_id", "x", "v_c")
        .select(col("k").as("user_id"), col("x").as("day_num"),
          col("v").as("v_c"), col("kind"))
        .orderBy("user_id", "day_num")
    }),

    "q196_gram_matrix" -> ((s, d) =>
      // Exact int8 Gram matrix X'X over the embedding corpus — the
      // covariance/PCA sufficient statistic: one quantized corpus
      // pass, dim² Long state per partition, |partitions|·dim² cells
      // shuffled (Ann.int8GramMatrix scaladoc).
      Ann.int8GramMatrix(embeddings(s, d), "embedding")
        .select(col("i"), col("j"), col("s").cast("long").as("s"))
        .orderBy("i", "j")),

    "q197_golden_record" -> ((s, d) => {
      // Survivorship (the "golden record" step completing q191's ER
      // pipeline): per entity cluster, field-wise best values —
      // representative name from the MIN member id, max balance,
      // majority segment with deterministic (count desc, segment asc)
      // ties — all as plain aggs over the shared cluster labels.
      val lab = erClusterLabels(s, d)
      val full = customer(s, d)
        .select(col("c_custkey").as("cust_id"), col("c_name"),
          cents(col("c_acctbal")).as("bal_c"), col("c_mktsegment"))
        .join(lab, Seq("cust_id"))
      val agg = full.groupBy("label").agg(
        count(lit(1)).cast("long").as("n_members"),
        min(struct(col("cust_id"), col("c_name"))).getField("c_name")
          .as("rep_name"),
        max("bal_c").cast("long").as("max_bal_c"))
      val mode = full.groupBy("label", "c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("label")
        .agg(min(struct((col("cnt") * -1).as("nc"), col("c_mktsegment")))
          .getField("c_mktsegment").as("top_segment"))
      agg.join(mode, Seq("label"))
        .select(col("label"), col("n_members"), col("rep_name"),
          col("max_bal_c"), col("top_segment"))
        .orderBy("label")
    }),

    "q198_kmv_window_rollup" -> ((s, d) => {
      // Trailing-7-day distinct-user rollup from MERGED per-day KMV
      // sketches — days sketch once, windows merge buffers, raw rows
      // never re-read per window (Sketches.kmvWindowRollup scaladoc;
      // exactness of the merge is q168's proven property). The oracle
      // recomputes each window's sketch from scratch — merge must
      // equal it bit-for-bit.
      val ev = events(s, d).select(
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("day_num"),
        col("user_id"))
      Sketches.kmvWindowRollup(ev, "day_num", col("user_id"), k = KmvK,
          windowDays = 7, saltPrefix = "kmvw_")
        .select(col("wday").as("day_num"), col("n_kept"), col("kth_min"),
          col("est_distinct"))
        .orderBy("day_num")
    }),

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

    "q202_video_scenes_sampled" -> ((s, d) =>
      // Every-2nd-frame scene-cut detection (VERDICT r07 #6): the
      // keyframe-pipeline tuning of q165 — RIFF chunking still walks
      // every frame, PNG decode (the 7-8x/decade cost) runs on half of
      // them. first_cut is the ORIGINAL frame index of the sample that
      // saw the change; the oracle derives every sampled comparison
      // analytically from the fixture's window-gray formula
      // (Multimodal.videoSceneCutsSampled scaladoc).
      Multimodal.videoSceneCutsSampled(mediaFixture(s, d, "video_dup")(
          Multimodal.mediaWithDupVideo(s, documents(s, d))), every = 2)
        .toDF()
        .orderBy("media_id")),

    "q201_er_incremental" -> ((s, d) => {
      // Incremental/persisted ER (VERDICT r07 #4): the standing corpus
      // (deterministic md5-coin 80% of customers) is labeled once via
      // the q191 pipeline; the remaining 20% arrives as an ingest
      // batch whose candidate pairs are the batch-internal SymSpell
      // join PLUS the batch-vs-standing posting join
      // (Dedup.editDistance1JoinAgainst) — the standing corpus is
      // never self-re-joined — and Dedup.incrementalClusterLabels
      // merges them touching only affected components. The oracle is
      // the FULL recompute over all customers (q191's SQL verbatim):
      // a green row PROVES incremental == recompute.
      val c = customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val corpus = c.filter(!erBatchCoin)
      val batch = c.filter(erBatchCoin)
      val standing = erLabelsOf(corpus).withColumnRenamed("cust_id", "node")
      val newEdges = erNationBlocked(
          operators.Dedup.editDistance1Join(batch, "c_custkey", "c_name"), c)
        .unionAll(erNationBlocked(
          operators.Dedup
            .editDistance1JoinAgainst(batch, corpus, "c_custkey", "c_name")
            .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b")),
          c))
        .materialized
      val labels = operators.Dedup
        .incrementalClusterLabels(standing, newEdges, "id_a", "id_b")
      val all = c.select(col("c_custkey").as("cust_id"))
        .join(labels.withColumnRenamed("node", "cust_id"), Seq("cust_id"), "left")
        .select(col("cust_id"),
          coalesce(col("label"), col("cust_id")).as("label"))
      val sizes = all.groupBy("label").agg(count(lit(1)).as("csize"))
      all.join(sizes, Seq("label"))
        .select(col("cust_id"), col("label").cast("long").as("label"),
          col("csize").cast("long").as("csize"))
        .orderBy("cust_id")
    }),

    "q203_er_ingest" -> ((s, d) => {
      // The ingest-shaped ER query (VERDICT r08 #6): q201 PROVES
      // incremental == recompute but pays the standing-label recompute
      // inside the query; here the standing side is PERSISTED parquet
      // fixtures (erStandingFixturePaths — written once, like a
      // warehouse index maintained across ingests): the (node, label)
      // clustering AND the corpus's deletion-key postings (the
      // reusable SymSpell index, Dedup.deletionKeyPostings scaladoc).
      // The measured time is therefore the per-batch ingest cost —
      // batch SymSpell self-join + batch keys vs persisted postings +
      // affected-component star CC + the full labeled output the
      // oracle contract demands. Oracle stays the FULL recompute — a
      // green row proves persisted-index ingest == recompute.
      val c = customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val batch = c.filter(erBatchCoin)
      val (labelsPath, postingsPath) = erStandingFixturePaths(s, d)
      val standing = s.read.parquet(labelsPath)
      val postings = s.read.parquet(postingsPath)
      val newEdges = erNationBlocked(
          operators.Dedup.editDistance1Join(batch, "c_custkey", "c_name"), c)
        .unionAll(erNationBlocked(
          operators.Dedup
            .editDistance1JoinPostings(batch, postings, "c_custkey", "c_name")
            .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b")),
          c))
        .materialized
      val labels = operators.Dedup
        .incrementalClusterLabels(standing, newEdges, "id_a", "id_b")
      val all = c.select(col("c_custkey").as("cust_id"))
        .join(labels.withColumnRenamed("node", "cust_id"), Seq("cust_id"), "left")
        .select(col("cust_id"),
          coalesce(col("label"), col("cust_id")).as("label"))
      val sizes = all.groupBy("label").agg(count(lit(1)).as("csize"))
      all.join(sizes, Seq("label"))
        .select(col("cust_id"), col("label").cast("long").as("label"),
          col("csize").cast("long").as("csize"))
        .orderBy("cust_id")
    }),

    "q204_video_fp_dedup_sampled" -> ((s, d) => {
      // q134's fingerprint-dedup with every-2nd-frame DECODE (VERDICT
      // r08 #4): the dup-video fixture's windows are 2 frames wide and
      // piecewise-constant, so the sampled 64-window fingerprint
      // EQUALS the dense one exactly (videoFingerprintSampled
      // scaladoc) and the oracle is q134's analytic formula verbatim —
      // a hash match proves the sampled decode path reproduces the
      // full fingerprint at half the decode cost.
      val media = mediaFixture(s, d, "video_dup")(
        Multimodal.mediaWithDupVideo(s, documents(s, d)))
      Dedup.hammingNearDup(
          Multimodal.videoFingerprintsSampled(media, every = 2).toDF(),
          "media_id", "fhash", nBits = 64, maxHamming = 2)
        .orderBy("id_a", "id_b")
    }),

    "q205_video_frames_sampled" -> ((s, d) =>
      // q118's per-frame decode stats at every-2nd-frame DECODE
      // (VERDICT r08 #4): frame_idx keeps the ORIGINAL container
      // index, so the oracle is q118's analytic formula restricted to
      // even frames — decode work halves, the schema and sums stay
      // exact.
      Multimodal.videoFrameStatsSampled(mediaFixture(s, d, "video_real")(
          Multimodal.mediaWithRealVideo(s, documents(s, d))), every = 2)
        .toDF()
        .orderBy("media_id", "frame_idx")),

    "q206_lsh_ingest" -> ((s, d) => {
      // q115's incremental near-dup with the standing band index
      // PERSISTED (the q203 pattern applied to the LSH family): the
      // corpus's (band, band_key, postings) table is the index a
      // warehouse maintains across ingests
      // (Dedup.minHashBandPostings scaladoc) — written once per SF,
      // read back, so the measured time is the batch's own hashing +
      // the band equi-join. Same pairs as q115 (signatures are a pure
      // per-doc function), same oracle.
      val docs = documents(s, d)
      val postings = lshPostingsFixture(s, d, docs)
      Dedup.minHashLshJoinPostings(
          docs.filter(pmod(col("doc_id"), lit(10L)) === 0L), postings,
          "doc_id", "text", k = 3, bands = 4, rowsPerBand = 4,
          minEstJaccard = 0.25)
        .orderBy("new_id", "corpus_id")
    }),

    "q207_ann_ivf_ingest" -> ((s, d) => {
      // q54's IVF-kmeans ANN with the standing index PERSISTED (the
      // q203/q206 fixture pattern applied to the ANN family): the
      // centroid table plus the cid-PARTITIONED inverted lists are the
      // index a vector store maintains across ingests, so the measured
      // time is the batch's own probe argmins + the probed lists' scan
      // — the k-means build and the corpus-wide list filing happen
      // once, at index build. Same result as q54 (ivfTopKWith IS
      // ivfTopKProbe ∘ ivfListAssignments), same oracle.
      val e = embeddings(s, d)
      val (cents, lists) = ivfIndexFixture(s, d, e)
      Ann.ivfTopKProbe(e.filter(col("vec_id") < 5), cents, lists,
          "vec_id", "embedding", k = 5, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q208_simhash_ingest" -> ((s, d) => {
      // q82's multi-index SimHash family in its INGEST shape with the
      // standing index PERSISTED (the q203/q206/q207 fixture pattern):
      // the corpus's capped (tbl, key, postings) multi-index table is
      // written once per SF and read back, so the measured time is the
      // batch's own hashing + C(6,3)=20 key explode + the table
      // equi-join. Candidate recall is exact by the block-pigeonhole
      // argument (Manku et al. WWW'07), verification is the exact
      // bit_count Hamming distance — the oracle mirrors the split and
      // the corpus-side bucket cap.
      val docs = documents(s, d)
      val postings = simHashPostingsFixture(s, d, docs)
      Dedup.simHashJoinPostings(
          docs.filter(pmod(col("doc_id"), lit(10L)) === 0L), postings,
          "doc_id", "text", nBits = 32, maxHamming = 3, nBlocks = 6)
        .orderBy("new_id", "corpus_id")
    }),

    "q209_ann_lsh_ingest" -> ((s, d) => {
      // q53's multi-probe LSH ANN with the standing index PERSISTED
      // (the q207 pattern applied to the hyperplane-LSH path): the
      // corpus's bucket assignments are written once per SF PARTITIONED
      // BY bucket, so a query batch's equi-join reads only its probed
      // buckets' files via dynamic partition pruning. Same result as
      // q53 (lshTopK IS lshTopKProbe ∘ lshBucketAssignments), same
      // oracle.
      val e = embeddings(s, d)
      Ann.lshTopKProbe(e.filter(col("vec_id") < 5),
          lshIndexFixture(s, d, e), "vec_id", "embedding",
          k = 5, nBits = 4, multiProbe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "q210_url_dedup" -> ((s, d) => {
      // URL-level crawl dedup (Curation.canonicalizeUrl scaladoc): raw
      // surface forms — case-varied scheme/host, www. prefix, default
      // port, trailing slash, tracking params, param order, fragment —
      // collapse onto one canonical page key. The raw URLs are derived
      // deterministically from the documents table (the corpus has no
      // URL column) with enough mod-variation to exercise every rule;
      // the oracle rebuilds the SAME derivation and normalization in
      // SQL. Map-side expression + one hash agg: q29's scale shape.
      val raw = documents(s, d).select(col("doc_id"),
        rawUrl(col("doc_id"), col("source"), col("lang")).as("url"))
      operators.Curation.urlDedup(raw, "doc_id", "url")
        .orderBy("canonical_url")
    }),

    "q211_compaction_plan" -> ((s, d) => {
      // Lakehouse small-file compaction planner
      // (Relational.compactionPlan scaladoc): the file manifest is
      // derived from events — each (event_type, user_id) cell is a
      // "file" of bytes = its value-cents sum — then packed into
      // ~50 KB output bins by size-DESC exclusive-cumsum div target.
      // Planning shuffles file METADATA only (one window per table
      // partition); the oracle replays the same two windows.
      val files = events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(cents(col("value"))).as("bytes"))
      operators.Relational.compactionPlan(
          files, "event_type", "user_id", "bytes", targetBytes = 50000L)
        .select(col("tbl"), col("file").cast("long").as("file"),
          col("bytes"), col("bin"), col("bin_files"), col("bin_bytes"))
        .orderBy("tbl", "bin", "file")
    }),

    "q212_skew_safe_agg" -> ((s, d) => {
      // Hot-key aggregation via the salted two-phase rewrite plus the
      // (key, value)-distinct count rewrite (Relational.skewSafeAgg
      // scaladoc) — event_type IS the skew shape at warehouse scale (5
      // keys over everything). Oracle is the PLAIN single-phase GROUP
      // BY: the green row proves the rewrite is an identity on
      // results, which is the whole point of a skew rewrite.
      val ev = events(s, d).select(col("event_type"),
        cents(col("value")).as("v_c"), col("event_id"))
      operators.Relational.skewSafeAgg(ev, "event_type", "v_c",
          "event_id", salts = 16)
        .select(col("k").as("event_type"), col("n_rows"), col("sum_v"),
          col("min_v"), col("max_v"), col("n_distinct_v"))
        .orderBy("event_type")
    }),

    "q213_bm25_ingest" -> ((s, d) => {
      // BM25 against a PERSISTED standing inverted index (the ingest
      // pattern applied to retrieval): the wb-partitioned postings are
      // probed with plan-time shard literals, so the measured time is
      // the touched postings + the doclen join — never a corpus text
      // scan (Indexing.bm25ProbeTopK scaladoc). Same rows as q152.
      val (postings, doclen, stats) = bm25IndexFixture(s, d)
      Indexing.bm25ProbeTopK(postings, doclen, stats, Bm25Terms,
          buckets = Bm25IndexBuckets, k = 20)
        .orderBy(col("score_milli").desc, col("id"))
    }),

    "q214_heavy_hitters" -> ((s, d) => {
      // Misra-Gries heavy hitters with the PODS-mergeable merge rule:
      // the summary is <= k-1 counters per task at ANY corpus size, and
      // the output is the q39-style accuracy contract — every exact
      // heavy hitter (count*k > n) must be retained, never overcounted,
      // and undercounted by at most n/k (Sketches.mgHeavyHitters
      // scaladoc; guarantees proven property-style in SketchesSpec).
      Sketches.mgHeavyHitters(
          documents(s, d).select(explode(tokens(col("text"))).as("w")),
          col("w"), k = 100)
        .select(col("w"), col("exact_cnt"),
          col("found").cast("long").as("found"),
          col("no_over").cast("long").as("no_over"),
          col("within_bound").cast("long").as("within_bound"))
        .orderBy("w")
    }),

    "q215_dedup_keeper" -> ((s, d) => {
      // Exact dedup with the QUALITY keeper policy (Dedup.exactKeeperBy
      // scaladoc): per content cluster keep the highest-quality member,
      // ties to the lowest id — the curation-grade upgrade of q29's
      // min-id rule. One fingerprint exchange carries both the rank and
      // the cluster size.
      Dedup.exactKeeperBy(documents(s, d), "doc_id", "text",
          qualityScore(col("text")))
        .orderBy("fp")
    }),

    "q216_bloom_join" -> ((s, d) => {
      // Bloom-pruned equi-join (Relational.bloomPrunedEquiJoin
      // scaladoc): a zero-shuffle bloom over the selective customer
      // subset's keys prunes the orders side MAP-SIDE before its
      // exchange; the exact join condition drops bloom false
      // positives, so the oracle is the PLAIN join — the green row
      // proves the prune is a result-identity, which is the whole
      // point of a semi-join filter.
      val vip = customer(s, d)
        .filter(col("c_acctbal") >= 9000.0)
        .select(col("c_custkey"), col("c_nationkey"))
      // expectedKeys sized to the selective side (~10% of customers up
      // through sf10): the default 4M-capacity per-partition blooms are
      // a 100 TB setting whose build cost (4 MB bit array per task,
      // driver OR-merge) dominated this query's 2.3 s flat floor in the
      // round-10 sweep; 64K capacity is ~60 KB per task at the same fpp
      Relational.bloomPrunedEquiJoin(orders(s, d), vip,
          "o_custkey", "c_custkey", expectedKeys = 1L << 16)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("rev_c"))
        .orderBy("c_nationkey")
    }),

    "q217_neardup_keeper" -> ((s, d) => {
      // The full NEAR-dup curation pass (q33 pairs -> q84 star CC ->
      // q215's keeper rule generalized): every doc gets a cluster label
      // (CC label for edge-touched docs, self for singletons), then per
      // cluster the highest-quality member survives, ties to min id
      // (Dedup.clusterKeeper scaladoc). This is the pass a training
      // pipeline actually ships — near-identical pages collapse AND the
      // cleanest copy is the one kept.
      val docs = documents(s, d)
      val labels = Dedup.dupClustersStar(
        Dedup.simHashDup(docs, "doc_id", "text", nBits = 16),
        "id_a", "id_b")
      val members = docs
        .select(col("doc_id"), qualityScore(col("text")).as("q"))
        .join(labels, col("doc_id") === col("node"), "left")
        .select(coalesce(col("label"), col("doc_id")).as("cluster"),
          col("doc_id"), col("q"))
      Dedup.clusterKeeper(members, "cluster", "doc_id", col("q"))
        .orderBy("cluster")
    }),

    "q218_ppjoin_ingest" -> ((s, d) => {
      // EXACT set-similarity ingest against a PERSISTED prefix-posting
      // index (the last candidate-generation family to get its ingest
      // form — Dedup.ppJoinAgainstPostings scaladoc): the batch ranks
      // its shingles by the index's own rarity order and equi-joins the
      // corpus's prefix postings; the exact verify touches candidate
      // ids only; NO recall loss (prefix theorem under the shared
      // order, spec'd against brute force). Oracle = the brute-force
      // batch x corpus Jaccard join.
      val (dfreq, postings, sets) = ppJoinIndexFixture(s, d)
      val batch = documents(s, d)
        .filter(pmod(col("doc_id"), lit(10L)) === 0L)
      Dedup.ppJoinAgainstPostings(batch, dfreq, postings, sets,
          "doc_id", "text", PpJoinTPpm)
        .orderBy("new_id", "corpus_id")
    }),

    "q219_lsh_index_upsert" -> ((s, d) => {
      // Index MAINTENANCE (the other half of the q206 ingest story:
      // probing is read-only, an accepted batch must also be FOLDED
      // INTO the standing index): the batch's band lists broadcast
      // against the persisted uncapped index, and only the TOUCHED
      // buckets are rewritten — cost ∝ batch + touched buckets, never
      // the index (Dedup.minHashBandPostingsUpsert scaladoc). Output =
      // the touched buckets' post-merge membership; oracle recomputes
      // the bands over corpus ∪ batch and restricts to buckets with a
      // batch member — the green row proves merge == recompute.
      val docs = documents(s, d)
      val batch = docs.filter(pmod(col("doc_id"), lit(10L)) === 0L)
      Dedup.minHashBandPostingsUpsert(
          lshPostingsFullFixture(s, d, docs), batch,
          "doc_id", "text", k = 3, bands = 4, rowsPerBand = 4)
        .select(col("band").cast("long").as("band"), col("band_key"),
          size(col("lst")).cast("long").as("n"),
          array_join(transform(col("lst"),
            x => x.getField("id").cast("string")), ",").as("ids"))
        .orderBy("band", "band_key")
    }),

    "q220_substring_ingest" -> ((s, d) => {
      // EXACT substring spans of a batch against a PERSISTED standing
      // gram index (the Lee et al. family's ingest form —
      // Dedup.exactSubstringSpansAgainstPostings scaladoc): the batch
      // hashes its own 40-grams, the fan-out cap reads the PERSISTED
      // df table (corpus-side freq <= 1000; singleton corpus grams
      // stay eligible — the batch occurrence is the pair's other
      // side), and the index is never re-aggregated or shuffled.
      val (postings, gramdf) = substringIndexFixture(s, d)
      val batch = documents(s, d)
        .filter(pmod(col("doc_id"), lit(10L)) === 0L)
      Dedup.exactSubstringSpansAgainstPostings(batch, postings, gramdf,
          "doc_id", "text", minLen = 40, maxGramFreq = 1000)
        .select(col("id_a").as("new_id"), col("id_b").as("corpus_id"),
          col("start_a"), col("start_b"), col("span_len"))
        .orderBy("new_id", "corpus_id", "start_a", "start_b")
    }),

    "q221_lsh_index_delete" -> ((s, d) => {
      // The DELETE half of index maintenance (q219's sibling — the
      // tombstone pass a takedown/retention policy runs): a deterministic
      // md5-free coin (corpus ids with id%7==0) tombstones ~14% of the
      // standing index; only buckets that CONTAINED a deleted member
      // are rewritten (fully-emptied buckets disappear), untouched
      // buckets untouched, the index streams once against the broadcast
      // tombstone set (Dedup.minHashBandPostingsDelete scaladoc).
      // Oracle recomputes the bands over corpus MINUS deleted,
      // restricted to touched buckets — delete == recompute.
      val docs = documents(s, d)
      val deleted = docs
        .filter(pmod(col("doc_id"), lit(10L)) =!= 0L &&
          pmod(col("doc_id"), lit(7L)) === 0L)
        .select(col("doc_id"))
      Dedup.minHashBandPostingsDelete(
          lshPostingsFullFixture(s, d, docs), deleted)
        .select(col("band").cast("long").as("band"), col("band_key"),
          size(col("lst")).cast("long").as("n"),
          array_join(transform(col("lst"),
            x => x.getField("id").cast("string")), ",").as("ids"))
        .orderBy("band", "band_key")
    }),

    "q222_ann_ivf_upsert" -> ((s, d) => {
      // IVF list UPSERT against FROZEN corpus-trained centroids (the
      // ANN-side q219: real IVF systems freeze the codebook between
      // retrains and fold new vectors into their argmin lists):
      // assignment is a pure per-vector function of the centroids, so
      // merged-touched-lists == recompute-over-union is definitional —
      // the oracle proves the ENGINE's assignments (round-6dp argmin,
      // q54 semantics) agree on every touched list. Only batch vectors
      // are assigned here; corpus lists come from the persisted
      // cid-partitioned fixture.
      val e = embeddings(s, d)
      val (cents, lists) = ivfCorpusIndexFixture(s, d, e)
      val batch = e.filter(pmod(col("vec_id"), lit(10L)) === 0L)
      val bAssign = Ann.ivfListAssignments(batch, "vec_id", "embedding", cents)
        .select(col("cid").cast("long").as("cid"),
          col("neighbor_id").cast("long").as("vec_id"))
      val touched = bAssign.select("cid").distinct()
      lists.select(col("cid"), col("neighbor_id").cast("long").as("vec_id"))
        .join(broadcast(touched), Seq("cid"), "left_semi")
        .unionByName(bAssign)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"),
          array_join(transform(sort_array(collect_list(col("vec_id"))),
            v => v.cast("string")), ",").as("ids"))
        .orderBy("cid")
    }),

    "q223_logbucket_quantiles" -> ((s, d) => {
      // Log-bucket quantile sketch (HdrHistogram bucketing / DDSketch
      // with gamma = 2^-5): p50/p90/p99 of order value per priority
      // class from a sketch whose state is <= 64*2^5 cells per group
      // FOREVER — one map-side-combined agg, no corpus sort (the
      // latency/price dashboard quantile at 100 TB). est = selected
      // bucket's lower bound; the exact discrete quantile (same integer
      // rank rule over q92's value-domain histogram) rides along, and
      // the two contract booleans assert the structural guarantee
      // est <= exact < est + width (relative error < 2^-5). The oracle
      // recomputes sketch AND exact, so every column hash-compares
      // (Sketches.logBucketCells scaladoc).
      val o = orders(s, d).select(col("o_orderpriority").as("grp"),
        cents(col("o_totalprice")).as("v"))
      val cells = Sketches.logBucketCells(o, "grp", col("v"), LbSubBits)
      val est = Sketches.logBucketQuantiles(cells, LbQPpms, LbSubBits)
      val exact = Sketches.exactDiscQuantiles(o, "grp", col("v"), LbQPpms)
      est.join(exact.select("grp", "q_ppm", "exact"), Seq("grp", "q_ppm"))
        .select(col("grp"), col("q_ppm"), col("n_total"), col("est"),
          col("exact"),
          (col("est") <= col("exact")).cast("long").as("le_exact"),
          (col("exact") < col("est") + col("width")).cast("long").as("lt_ub"))
        .orderBy("grp", "q_ppm")
    }),

    "q224_logbucket_merge" -> ((s, d) => {
      // Sketch LINEARITY proven for quantiles (the q168/q178 property
      // on the log-bucket sketch): sketch each md5-half of orders
      // separately, merge cellwise, and the quantile rows must equal
      // the whole-corpus sketch's — the oracle is q223's est side
      // verbatim. This is what lets a warehouse keep per-day/partition
      // quantile-sketch columns and answer global percentiles without
      // re-reading history (Sketches.logBucketMerge scaladoc).
      val o = orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("v"))
      val coin = pmod(tokenHash64(concat(lit("lbq_"),
        col("o_orderkey").cast("string"))), lit(2L))
      def half(m: Int) = Sketches.logBucketCells(
        o.filter(coin === m), "grp", col("v"), LbSubBits)
      Sketches.logBucketQuantiles(
          Sketches.logBucketMerge(Seq(half(0), half(1))), LbQPpms, LbSubBits)
        .drop("width")
        .orderBy("grp", "q_ppm")
    }),

    "q225_skew_safe_join" -> ((s, d) => {
      // Skew-safe fact->dim equi-join (the q212 hot-key doctrine on
      // JOINS): lineitem rows salt deterministically on their row id,
      // supplier replicates per salt, the join runs on (suppkey, salt)
      // so a viral supplier's volume spreads over 8 reducers instead
      // of one. Result is IDENTICAL to the plain join — the oracle IS
      // the plain join, so the green row proves the rewrite is a
      // result identity (Relational.skewSafeJoin scaladoc).
      val joined = Relational.skewSafeJoin(
        lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber"), cents(col("l_extendedprice")).as("price_c")),
        supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        "l_suppkey", "s_suppkey",
        concat(col("l_orderkey"), lit("_"), col("l_linenumber")), salts = 8)
      joined.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_li"), sum("price_c").as("sum_price_c"))
        .select(col("s_nationkey").cast("long").as("nation_key"),
          col("n_li"), col("sum_price_c"))
        .orderBy("nation_key")
    }),

    "q226_blocklist_screen" -> ((s, d) =>
      // Phrase-denylist screening via ONE Aho-Corasick pass per
      // document (map-only; the automaton is KBs in the closure):
      // every occurrence of every pattern — overlapping, mid-word,
      // cross-word-boundary — counted at its end position, then rolled
      // up per pattern. The oracle replays the count positionally
      // (substr at every start), so the hash match proves the
      // automaton's occurrence semantics (Curation.blocklistScreen
      // scaladoc).
      Curation.blocklistScreen(documents(s, d), "doc_id", "text",
          BlockPatterns)
        .groupBy("pat")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("cnt").cast("long").as("total_occ"))
        .orderBy("pat"))
  )

  private lazy val queriesR11b: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q227_ref_integrity" -> ((s, d) => {
      // Referential-integrity audit — the ingest gate a warehouse runs
      // before publishing a delivery: per FK constraint, child count +
      // orphan count (+ exact ppm). The order-snapshot constraint
      // checks lineitem against a DATE-CUTOFF parent snapshot — the
      // late-arriving-fact scenario where orphans are real, not a data
      // bug. Each constraint is one left join + conditional count
      // (parents reduced to their key column first, so the audit
      // shuffles keys, never payloads); at 100 TB the selective-parent
      // cases ride q216's bloom-pruned join. NULL FKs are not orphans
      // (SQL semantics).
      val li = lineitem(s, d)
      val snap = orders(s, d)
        .filter(col("o_orderdate") < lit(RefIntCutoff).cast("timestamp"))
        .select(col("o_orderkey").as("pk"))
      val ord = orders(s, d)
      val cust = customer(s, d).select(col("c_custkey").as("pk"))
      val nat = nation(s, d).select(col("n_nationkey").as("pk"))
      def audit(name: String, child: DataFrame, fk: String,
                parent: DataFrame): DataFrame =
        child.select(col(fk).as("fk"))
          .join(parent, col("fk") === col("pk"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("fk").isNotNull && col("pk").isNull, 1L)
              .otherwise(0L)).as("n_orphan"))
          .select(lit(name).as("fk_name"), col("n_child"), col("n_orphan"))
      audit("customer.nation", customer(s, d), "c_nationkey", nat)
        .unionByName(audit("lineitem.order_snapshot", li, "l_orderkey", snap))
        .unionByName(audit("orders.customer", ord, "o_custkey", cust))
        .withColumn("orphan_ppm",
          expr("(n_orphan * 1000000L) div n_child"))
        .orderBy("fk_name")
    }),

    "q228_event_paths" -> ((s, d) => {
      // Top-20 user-journey trigrams (path mining — the product-
      // analytics complement of q181's Markov matrix): per user the
      // event sequence orders by (ts, event_id), two leads share ONE
      // user-key window exchange, and the trigram agg is bounded by
      // |event type|^3 keys no matter the corpus; top-20 with full
      // deterministic tie order (n desc, then the trigram).
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("t1"))
        .withColumn("t2", lead("t1", 1).over(w))
        .withColumn("t3", lead("t1", 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy("t1", "t2", "t3")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    }),

    "q229_embedding_drift" -> ((s, d) => {
      // Per-label embedding drift vs the global centroid — the
      // mixture-health monitor for vector corpora (a label whose
      // centroid swings away from global signals a bad encoder batch
      // or distribution shift; the q143 idea in embedding space).
      // Components quantize to integer milli-units (floor(x*1000) on
      // the exact double — q140's canonicalization), so per-(label,
      // pos) sums are EXACT Longs from one map-side-combined agg over
      // ONE corpus scan; centroids are truncating-div integer means,
      // global derives from the label sums (no second scan), and the
      // final cosine^2 ppm is computed driver-side in BigInt over the
      // <= |labels|*dim collected cells (the q141 bounded-collect
      // class). Sign rides the dot: cos2_ppm = sign(dot)*dot^2*1e6
      // div (|c_l|^2*|c_g|^2) — exact integers, no sqrt.
      val sums = embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("m", floor(col("x").cast("double") * 1000).cast("long"))
        .groupBy("label", "pos")
        .agg(sum("m").as("s"), count(lit(1)).as("n"))
        .collect()
      val labels = sums.map(_.getAs[Long]("label")).distinct.sorted
      val dim = sums.map(_.getAs[Int]("pos")).max + 1
      val sByL = labels.map { l =>
        val rs = sums.filter(_.getAs[Long]("label") == l)
        val arr = new Array[Long](dim)
        rs.foreach(r => arr(r.getAs[Int]("pos")) = r.getAs[Long]("s"))
        l -> (arr, rs.head.getAs[Long]("n"))
      }.toMap
      val gSum = new Array[Long](dim)
      var gN = 0L
      sByL.values.foreach { case (arr, n) =>
        (0 until dim).foreach(i => gSum(i) += arr(i)); gN += n }
      val cg = gSum.map(_ / gN)
      val gg = cg.map(c => BigInt(c) * c).sum
      val out = labels.map { l =>
        val (arr, n) = sByL(l)
        val cl = arr.map(_ / n)
        val dot = (0 until dim).map(i => BigInt(cl(i)) * cg(i)).sum
        val ss = cl.map(c => BigInt(c) * c).sum
        val cos2 = if (ss == 0 || gg == 0) BigInt(0)
          else (dot * dot * 1000000) / (ss * gg)
        (l, n, dot.toLong, (if (dot < 0) -cos2 else cos2).toLong)
      }
      import s.implicits._
      out.toSeq.toDF("label", "n_vecs", "dot", "cos2_ppm")
        .orderBy("label")
    }),

    "q230_ann_ivfpq" -> ((s, d) => {
      // IVF-PQ probe against the PERSISTED compressed index (FAISS
      // IVFPQ / Jégou IVFADC, no residual encoding): coarse probe
      // selects 2 of 8 inverted lists per query, the cid-partitioned
      // coded lists are read ONLY for those lists (dynamic partition
      // pruning) and hold 8 codes per vector instead of 64 floats —
      // the q207 pruned-scan and q192 compressed-scoring stories
      // COMPOSED, which is the default production ANN shape at 100 TB
      // (Ann.ivfPqTopKProbe scaladoc). Oracle replays the coarse
      // k-means chain, the 8 subspace k-means chains, and the
      // fixed-order ADC sum.
      val e = embeddings(s, d)
      val (cents, books, codedLists) = ivfPqIndexFixture(s, d, e)
      Ann.ivfPqTopKProbe(e.filter(col("vec_id") < PqQueryMax), cents,
          codedLists, books, "vec_id", "embedding",
          k = PqK, nProbe = 2, m = PqM)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    "q231_skipping_audit" -> ((s, d) => {
      // Zone-map data-skipping audit — QUANTIFIES the layout claim
      // behind q98's z-order: per candidate file layout (z-order
      // value-bins vs a single-dimension sort's bins), per workload
      // predicate, how many files min/max zone maps let the scanner
      // skip. Bins are VALUE-DOMAIN (zval div 2^14, x div 16 — both
      // deterministic, 64 bins each; no sampled range partitioner in
      // the result path); the zone-map table is |layout|*|bins| rows,
      // the predicate check a tiny literal cross join over it. The
      // expected shape IS the q98 thesis: the x-sort layout skips only
      // x-predicates, z-order skips on BOTH dimensions.
      val zExpr = graft.engine.Scale.zValue2(col("x"), col("y"), 10)
      val base = orders(s, d).select(
        pmod(col("o_custkey"), lit(1024L)).as("x"),
        pmod(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")), lit(1024)).cast("long").as("y"))
      val files = base
        .select(col("x"), col("y"), zExpr.as("zv"))
        .select(col("x"), col("y"),
          explode(array(
            struct(lit("zorder").as("layout"),
              expr("zv div 16384L").as("bin")),
            struct(lit("xsort").as("layout"),
              expr("x div 16L").as("bin")))).as("lb"))
        .select(col("lb.layout").as("layout"), col("lb.bin").as("bin"),
          col("x"), col("y"))
        .groupBy("layout", "bin")
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
      val preds = Seq(
        ("x_40_59", 40L, 59L, 0L, 1023L),
        ("y_100_149", 0L, 1023L, 100L, 149L),
        ("xy_small", 40L, 59L, 100L, 149L))
      import s.implicits._
      val pdf = preds.toDF("pred", "xlo", "xhi", "ylo", "yhi")
      files.crossJoin(broadcast(pdf))
        .withColumn("skip",
          (col("max_x") < col("xlo")) || (col("min_x") > col("xhi")) ||
          (col("max_y") < col("ylo")) || (col("min_y") > col("yhi")))
        .groupBy("layout", "pred")
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("skip"), 1L).otherwise(0L)).as("n_skip"),
          sum(when(col("skip"), col("n_rows")).otherwise(0L)).as("rows_skipped"))
        .withColumn("skip_ppm", expr("(n_skip * 1000000L) div n_files"))
        .orderBy("layout", "pred")
    }),

    "q232_hll_distinct" -> ((s, d) => {
      // Deterministic HyperLogLog (md5-register form): unlike q39's
      // engine-private native HLL (whose binary state forced an
      // accuracy-contract oracle), these registers are a pure function
      // of the key set — bucket/rho from the shared 60-bit md5, MAX
      // per bucket — so the DuckDB oracle recomputes the SKETCH and
      // the integer raw estimator hash-compares exactly, with the
      // exact count and its error riding along in the row. State: 64
      // registers per group forever; ONE map-side-combined hash agg
      // (Sketches.hllRegisters scaladoc). The KMV counterpart at the
      // same (group, key) domain is q137.
      val ev = events(s, d)
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(ev, "event_type", col("user_id"), "hll_"))
      val exact = ev.filter(col("user_id").isNotNull)
        .groupBy(col("event_type").as("grp"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      est.join(exact, Seq("grp"))
        .withColumn("err_ppm", expr(
          "(abs(est_hll - exact_distinct) * 1000000L) div exact_distinct"))
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q233_hll_merge" -> ((s, d) => {
      // HLL MERGEABILITY proven (the q168/q178/q224 property on the
      // max-semilattice sketch): registers of each md5-half merged by
      // groupwise MAX must reproduce the whole-corpus registers
      // bit-for-bit — the oracle is q232's est side verbatim. MAX
      // merge is also IDEMPOTENT (re-merging a sketch is a no-op),
      // the property that makes HLL columns safe under at-least-once
      // ingest (Sketches.hllMerge scaladoc).
      val ev = events(s, d)
      val coin = pmod(tokenHash64(concat(lit("hhalf_"),
        col("event_id").cast("string"))), lit(2L))
      def half(m: Int) = Sketches.hllRegisters(ev.filter(coin === m),
        "event_type", col("user_id"), "hll_")
      Sketches.hllEstimate(Sketches.hllMerge(Seq(half(0), half(1))))
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q234_lpa_communities" -> ((s, d) =>
      // Community detection over the q105 dup graph via SYNCHRONOUS
      // deterministic label propagation (3 rounds, most-frequent
      // neighbor label, ties count-desc-then-label-asc): the
      // dense-core structure min-label CC (q63) cannot see — a weakly
      // bridged pair of clusters keeps two labels here where CC
      // collapses them. Per round one edge join + two node-keyed aggs;
      // oracle = the SAME three rounds unrolled
      // (GraphOps.labelPropagation scaladoc).
      GraphOps.labelPropagation(
          Dedup.simHashDup(documents(s, d), "doc_id", "text", nBits = 16),
          "id_a", "id_b", rounds = 3)
        .groupBy("lbl")
        .agg(count(lit(1)).as("n_members"), min("id").as("min_id"))
        .select(col("lbl").as("community"), col("n_members"), col("min_id"))
        .orderBy("community")),

    "q235_quantile_rollup" -> ((s, d) =>
      // Trailing-7-day p50/p99 of event value from MERGED per-day
      // log-bucket sketches (the q198 sketch-OLAP pattern for
      // QUANTILES): days sketch once, windows merge bounded cell
      // tables — raw rows never re-read per window; the oracle
      // recomputes every window FROM SCRATCH, so the hash match proves
      // merge == direct (Sketches.logBucketWindowRollup scaladoc).
      Sketches.logBucketWindowRollup(
          events(s, d).select(
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .cast("long").as("day"),
            cents(col("value")).as("v")),
          "day", col("v"), LbSubBits, windowDays = 7,
          qPpms = Seq(500000L, 990000L))
        .orderBy("wday", "q_ppm")),

    "q236_negative_pairs" -> ((s, d) =>
      // Deterministic negative-pair sampling for contrastive training:
      // docs ranked on an md5 ring (distributed prefix-sum rank, no
      // single-partition window), each doc pairs with the ring
      // neighbors at offsets {1, 37, 1001} modulo N — hash-derived,
      // coin-free, so the same corpus yields the same negatives on
      // every run (Curation.negativePairs scaladoc). Oracle replays
      // the ring with one row_number window.
      Curation.negativePairs(documents(s, d), "doc_id",
          offsets = Seq(1, 37, 1001), saltPrefix = "neg_")
        .orderBy("id_a", "off")),

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

    "q238_image_fp_ingest" -> ((s, d) => {
      // Image-fingerprint INGEST against the persisted band index —
      // the q206/q208 standing-index pattern completed for the
      // multimodal fingerprint family: the corpus's aHash pigeonhole
      // postings live in a write-once fixture, an arriving batch
      // (media_id % 10 == 0) decodes + hashes only ITSELF, bands 3
      // ways, equi-joins the index, and the exact popcount verdict
      // runs on touched buckets only (Dedup.hammingJoinPostings
      // scaladoc). Oracle recomputes both sides' aHashes analytically
      // from the q117 cell formula — no PNG decoded oracle-side.
      val media = mediaFixture(s, d, "img_dup")(
        Multimodal.mediaWithDupImages(s, documents(s, d)))
      val postings = imageFpPostingsFixture(s, d, media)
      val batch = Multimodal.imageAHash(
        media.filter(pmod(col("media_id"), lit(10L)) === 0L)).toDF()
      Dedup.hammingJoinPostings(batch, postings, "media_id", "ahash",
          nBits = 64, maxHamming = 2)
        .select(col("id_a").as("new_id"), col("id_b").as("corpus_id"),
          col("hamming"))
        .orderBy("new_id", "corpus_id")
    }),

    "q239_pit_lookup" -> ((s, d) => {
      // Point-in-time dimension lookup — the query SCD2 history exists
      // to answer: each purchase joined to the user's STATE (latest
      // non-purchase event type) valid AT purchase time, via the
      // single-exchange as-of merge against the q160 validity table
      // (no pair fan-out; valid_from <= ts inclusive). Purchases
      // before any state report 'none' (left-anti complement). State
      // at t over collapsed SCD2 intervals == last event <= t, and the
      // data has no same-(user, ts) collisions at any SF, so the
      // oracle replays the lookup directly over the raw events.
      val ev = events(s, d)
      val hist = Relational.scd2History(
          ev.filter(col("event_type") =!= "purchase"),
          "user_id", "ts", "event_type", "event_id")
        .select(col("user_id").as("h_user"), col("event_type").as("state"),
          col("valid_from"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents(col("value")).as("value_c"))
      val matched = Relational.asOfJoinMergeDirected(facts, hist,
        "user_id", "h_user", "ts", "valid_from", "valid_from",
        forward = false)
      val none = facts.join(matched.select(col("event_id").as("m_id")),
        col("event_id") === col("m_id"), "left_anti")
      matched.select(col("state"), col("value_c"))
        .unionByName(none.select(lit("none").as("state"), col("value_c")))
        .groupBy("state")
        .agg(count(lit(1)).as("n_purchases"), sum("value_c").as("sum_value_c"))
        .orderBy("state")
    }),

    "q240_dedup_eval" -> ((s, d) => {
      // Candidate-quality audit for the dedup index — the harness a
      // team tunes banding with (q129's recall@k idea applied to
      // near-dup candidates): ground truth = the EXACT Jaccard >= 0.5
      // pair set (ppJoinShingles — no recall loss by construction),
      // candidates = the 16-bit simhash equality buckets, metrics =
      // precision/recall in exact ppm, both computed on the
      // md5-bottom-N FIXED-size sample — the 100 TB-right eval shape:
      // ground-truth cost never grows with the corpus (the unsampled
      // form measured 13.3×/decade into sf10). One semi-join over two
      // pair frames; counts are three bounded driver actions.
      import s.implicits._
      val docs = documents(s, d)
        .withColumn("__k", tokenHash64(concat(lit("deval_"),
          col("doc_id").cast("string"))))
        .orderBy(col("__k"), col("doc_id")).limit(DedupEvalSampleN)
        .drop("__k")
      val truth = Dedup.ppJoinShingles(docs, "doc_id", "text",
          tPpm = DedupEvalTPpm)
        .select("id_a", "id_b")
      val cand = Dedup.simHashDup(docs, "doc_id", "text", nBits = 16)
        .select("id_a", "id_b")
      val nT = truth.count()
      val nC = cand.count()
      val nH = cand.join(truth, Seq("id_a", "id_b"), "left_semi").count()
      Seq((nT, nC, nH,
          if (nC > 0) nH * 1000000L / nC else 0L,
          if (nT > 0) nH * 1000000L / nT else 0L))
        .toDF("n_truth", "n_cand", "n_hit", "precision_ppm", "recall_ppm")
    }),

    "q241_funnel" -> ((s, d) =>
      // Ordered-funnel conversion over the event stream: users
      // progressing signup -> view -> click -> purchase as a strictly
      // time-increasing subsequence, with per-stage conversion in
      // exact ppm. Greedy-earliest min-agg per stage — one hash
      // exchange on user_id per stage, partitioning reused across the
      // stage joins, never a per-user event buffer
      // (Relational.funnelStages scaladoc).
      Relational.funnelStages(events(s, d), "user_id", "ts",
        "event_type", FunnelStages)),

    "q242_hll_ingest" -> ((s, d) => {
      // HLL sketch INGEST against the persisted register table — the
      // q203/q222/q238 standing-state pattern on the cardinality
      // family: the corpus's per-type registers live in a write-once
      // fixture (64 longs per group forever), an arriving batch
      // (md5 coin on event_id, ~10%) hashes only ITSELF, and the
      // groupwise-MAX merge touches sketch rows, never corpus events.
      // Because MAX-merge == whole-corpus recompute bit-for-bit
      // (q233's proven property), the oracle is the full-corpus
      // sketch recomputation — the green row PROVES ingest == rebuild.
      val standing = hllStandingFixture(s, d)
      val batch = Sketches.hllRegisters(events(s, d).filter(hllBatchCoin),
        "event_type", col("user_id"), "hll_")
      Sketches.hllEstimate(Sketches.hllMerge(Seq(standing, batch)))
        .withColumnRenamed("grp", "event_type")
        .orderBy("event_type")
    }),

    "q243_table_fingerprint" -> ((s, d) =>
      // Order-invariant dataset content fingerprint — how two 100 TB
      // replicas are compared without shipping data: 16 bucket rows of
      // (count, bit_xor of the 60-bit row hash, modular sum), a pure
      // function of each bucket's row multiset. ONE map-side-combined
      // agg, 3 longs of state per bucket at any size
      // (Relational.bucketFingerprints scaladoc).
      Relational.bucketFingerprints(lineitem(s, d),
          tokenHash64(concat(lit("fpb_"), col("l_orderkey").cast("string"))),
          tokenHash64(concat(lit("fpr_"), concat_ws("|",
            col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"),
            cents(col("l_extendedprice")).cast("string"),
            col("l_returnflag")))),
          nBuckets = 16)
        .orderBy("bucket")),

    "q244_merkle_diff" -> ((s, d) => {
      // Merkle drill-down diff: compare two order snapshots (q123's
      // insert/delete/update derivation, sparsified to 3 keys per
      // 1000 so flagged buckets stay a strict subset) by exchanging
      // 64 fingerprint rows per side, then re-scan ONLY the flagged
      // buckets to classify changes — scan volume in the second pass
      // is proportional to the changed fraction, never the table.
      // Flagging is replayed by the oracle, so a (cryptographically
      // negligible) fingerprint collision would change both sides
      // identically.
      val base = orders(s, d).select(col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      val m = pmod(col("o_orderkey"), lit(1000L))
      val v1 = base.filter(m =!= 3)
      val v2 = base.filter(m =!= 5)
        .withColumn("total_c",
          when(m === 7, col("total_c") + 100L).otherwise(col("total_c")))
      val bHash = tokenHash64(concat(lit("mdb_"),
        col("o_orderkey").cast("string")))
      val rHash = tokenHash64(concat(lit("mdr_"),
        concat_ws("|", col("o_orderkey").cast("string"),
          col("total_c").cast("string"))))
      def fp(v: DataFrame, side: String) =
        Relational.bucketFingerprints(v, bHash, rHash, nBuckets = 64)
          .select(col("bucket"), col("n_rows").as(s"n_$side"),
            col("xor_h").as(s"x_$side"), col("sum_mod").as(s"s_$side"))
      val flagged = fp(v1, "a").join(fp(v2, "b"), Seq("bucket"), "full_outer")
        .filter(!(col("n_a") <=> col("n_b")) || !(col("x_a") <=> col("x_b")) ||
          !(col("s_a") <=> col("s_b")))
        .select("bucket")
      def restrict(v: DataFrame) = v
        .withColumn("bucket", pmod(bHash, lit(64L)))
        .join(broadcast(flagged), Seq("bucket"))
      Relational.snapshotDiff(restrict(v1), restrict(v2),
          Seq("bucket", "o_orderkey"))
        .filter(col("change_type") =!= "unchanged")
        .groupBy("bucket")
        .agg(sum(when(col("change_type") === "insert", 1L).otherwise(0L)).as("n_insert"),
          sum(when(col("change_type") === "delete", 1L).otherwise(0L)).as("n_delete"),
          sum(when(col("change_type") === "update", 1L).otherwise(0L)).as("n_update"))
        .orderBy("bucket")
    }),

    "q245_zipf_anchors" -> ((s, d) => {
      // Zipf tail diagnostic without a float log: the rank-doubling
      // document-frequency ratios df(r)/df(2r) at anchor ranks
      // r = 1..256 (powers of two) over word 3-shingles — for an ideal
      // Zipf(s) curve every ratio is 2^s, so drift across anchors
      // exposes where the curve bends (the head/tail transition a
      // tokenizer or dedup pass shifts). Shingle dfs are ONE
      // map-side-combined agg; the global top-512 is a TakeOrdered
      // (per-partition heap, never a global sort); ranking runs on
      // those 512 rows only.
      val freqs = documents(s, d)
        .select(explode(Dedup.shingles(col("text"), 3)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val top = freqs.orderBy(col("freq").desc, col("tok").asc).limit(512)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("freq").desc, col("tok").asc))
            .cast("long"))
      val anchors = (0 to 8).map(i => (1L << i))
      top.filter(col("rank").isin(anchors: _*))
        .join(top.select(col("rank").as("rank2"), col("freq").as("freq2")),
          col("rank2") === col("rank") * 2)
        .select(col("rank"), col("tok"), col("freq"), col("freq2"),
          expr("freq * 1000000 div freq2").as("ratio_ppm"))
        .orderBy("rank")
    }),

    "q246_gap_fill" -> ((s, d) => {
      // Time-series regularization: each user's sparse event stream
      // becomes a dense daily series via last-observation-carried-
      // forward, then rolls up to "total carried value per day" —
      // the state-as-of-day-D series a metrics warehouse serves.
      // Daily close = struct-max argmax per (user, day); the grid and
      // LOCF window are bounded by the DATE domain per user, never by
      // event volume (Relational.gapFillLocf scaladoc).
      val ev = events(s, d).select(col("user_id"),
        to_date(col("ts")).as("day"), col("ts"), col("event_id"),
        cents(col("value")).as("value_c"))
      val closes = ev.groupBy("user_id", "day")
        .agg(max(struct(col("ts"), col("event_id"), col("value_c"))).as("m"))
        .select(col("user_id"), col("day"), col("m.value_c").as("value_c"))
      Relational.gapFillLocf(closes, "user_id", "day", "value_c")
        .groupBy("day")
        .agg(count(lit(1)).as("n_users"), sum("filled").as("sum_value_c"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_users"), col("sum_value_c"))
        .orderBy("day")
    }),

    "q247_daily_anomaly" -> ((s, d) => {
      // Robust outlier flags on the daily revenue series — the
      // monitoring alarm a pipeline hangs on its output tables: a day
      // is anomalous when its |total − median| exceeds 3× the median
      // absolute deviation, with LOWER medians (rank ⌈n/2⌉) so every
      // quantity is an exact integer and no interpolation crosses
      // engines. The series is date-domain bounded (one agg row per
      // day), so the rank windows run over ≤ a few thousand rows at
      // any SF — the q101/q124 bounded-window doctrine.
      val daily = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("total_c"))
      def lowerMedian(df: DataFrame, c: String): Long = {
        val n = df.count()
        df.orderBy(col(c).asc).limit(((n + 1) / 2).toInt)
          .orderBy(col(c).desc).limit(1).head().getLong(0)
      }
      val med = lowerMedian(daily.select(col("total_c")), "total_c")
      val dev = daily.select(abs(col("total_c") - med).as("dev_c"))
      val mad = lowerMedian(dev, "dev_c")
      daily
        .withColumn("dev_c", abs(col("total_c") - med))
        .withColumn("med_c", lit(med))
        .withColumn("mad_c", lit(mad))
        .withColumn("is_anomaly",
          when(col("dev_c") > lit(3L) * mad, 1L).otherwise(0L))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("total_c"), col("med_c"), col("mad_c"), col("dev_c"),
          col("is_anomaly"))
        .orderBy("day")
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

    "q249_retention_cohorts" -> ((s, d) => {
      // Retention cohort triangle: users grouped by signup day, and
      // for each day-offset k the share still active k days later —
      // the growth-accounting matrix every product warehouse serves.
      // Cohort = each user's FIRST signup day (one agg); activity =
      // distinct (user, day) over all events (one agg); one
      // co-partitioned join on user, then a (cohort, k) count agg.
      // Matrix size is bounded by the date domain squared, never by
      // user or event volume.
      val ev = events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      val active = ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val sizes = cohort.groupBy("cohort_day")
        .agg(count(lit(1)).as("n_cohort"))
      cohort.join(active, "user_id")
        .filter(col("day") >= col("cohort_day"))
        .select(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("k"))
        .groupBy("cohort_day", "k")
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cohort_day")
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("k").cast("long").as("k"), col("n_active"), col("n_cohort"),
          expr("n_active * 1000000 div n_cohort").as("retained_ppm"))
        .orderBy("cohort_day", "k")
    }),

    "q250_activity_streaks" -> ((s, d) => {
      // Islands-and-gaps: consecutive-day activity streaks per user
      // via the classic (day_number − row_number) island key, rolled
      // up to the streak-length distribution (islands of that length,
      // and users whose LONGEST streak is that length). The per-user
      // window runs over DISTINCT active days — bounded by the date
      // domain, never event volume; the rollups are date-domain-sized
      // aggs.
      val active = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val islands = active
        .withColumn("g",
          datediff(col("day"), lit("1990-01-01").cast("date"))
            - row_number().over(w))
        .groupBy("user_id", "g").agg(count(lit(1)).as("len"))
      val perIsland = islands.groupBy("len")
        .agg(count(lit(1)).as("n_islands"))
      val perUserMax = islands.groupBy("user_id")
        .agg(max(col("len")).as("len"))
        .groupBy("len").agg(count(lit(1)).as("n_users_max"))
      perIsland.join(perUserMax, Seq("len"), "full_outer")
        .select(col("len").as("streak_len"),
          coalesce(col("n_islands"), lit(0L)).as("n_islands"),
          coalesce(col("n_users_max"), lit(0L)).as("n_users_max"))
        .orderBy("streak_len")
    }),

    "q251_time_in_state" -> ((s, d) => {
      // TIME-WEIGHTED state accounting over the q160/q239 SCD2
      // validity intervals: microseconds each user spends in each
      // state (latest non-purchase event type), open intervals capped
      // at the corpus horizon, with each state's share of total held
      // time in ppm. Duration sums are additive over the collapse, so
      // the oracle can replay on RAW per-event intervals while the
      // engine aggregates the collapsed history — interval counts
      // check the collapse itself. The window is per-user; every
      // rollup is a state-domain-sized agg. share divides by
      // (grand div 1e6), the canonical order that cannot overflow at
      // any corpus size.
      val np = events(s, d).filter(col("event_type") =!= "purchase")
      val hist = Relational.scd2History(np, "user_id", "ts",
        "event_type", "event_id")
      val horizon = np.agg(max(col("ts"))).head().getTimestamp(0)
      val agg = hist
        .withColumn("end_ts", coalesce(col("valid_to"), lit(horizon)))
        .select(col("event_type").as("state"),
          (unix_micros(col("end_ts")) - unix_micros(col("valid_from")))
            .as("d_us"))
        .groupBy("state")
        .agg(count(lit(1)).as("n_intervals"), sum("d_us").as("total_us"))
      agg.crossJoin(broadcast(agg.select(sum("total_us").as("g"))))
        .select(col("state"), col("n_intervals"), col("total_us"),
          expr("total_us div (g div 1000000)").as("share_ppm"))
        .orderBy("state")
    }),

    "q252_k_anonymity" -> ((s, d) => {
      // k-anonymity audit — the privacy gate a release pipeline runs
      // beside q86's PII redaction: group customers by quasi-identifier
      // tuple (nation, segment, $1000 balance band) and report, for
      // each k, how many groups and rows fall below k members (a row
      // in a small group is re-identifiable). ONE QI-domain-bounded
      // group agg, then 3 bounded rollups via a broadcast k frame.
      // The balance band offsets by +1 band before the integer
      // division so truncation == floor on both engines for negative
      // balances.
      import s.implicits._
      val groups = customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000")
            .as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("n"))
      groups.crossJoin(broadcast(Seq(2L, 5L, 10L).toDF("k")))
        .groupBy("k")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < col("k"), 1L).otherwise(0L)).as("n_small_groups"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L)).as("n_risky_rows"),
          sum(col("n")).as("n_rows"))
        .select(col("k"), col("n_groups"), col("n_small_groups"),
          col("n_risky_rows"),
          expr("n_risky_rows * 1000000 div n_rows").as("risky_ppm"))
        .orderBy("k")
    }),

    "q253_decayed_leaderboard" -> ((s, d) => {
      // Trending leaderboard with a one-week half-life, decay as an
      // INTEGER right-shift (count >> age_weeks) so both engines agree
      // bit-for-bit where an exponential float decay never would.
      // Daily counts are one agg; the per-user score is a second agg
      // over date-domain-bounded rows; top-20 is a TakeOrdered.
      val daily = events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val horizon = daily.agg(max(col("day"))).head().getDate(0)
      daily
        .withColumn("age_w",
          (datediff(lit(horizon), col("day")) / 7).cast("int"))
        .groupBy("user_id")
        // Clamp the shift at 63: JVM long shifts mask the count mod
        // 64, so an unclamped >= 64-week age would silently STOP
        // decaying (c >> 64 == c); at 63 any positive count is 0.
        .agg(sum(expr("shiftright(c, least(age_w, 63))")).as("score"),
          sum("c").as("n_events"))
        .orderBy(col("score").desc, col("user_id").asc)
        .limit(20)
    }),

    "q254_heaps_anchors" -> ((s, d) => {
      // Heaps-law vocabulary-growth anchors — q245's companion
      // diagnostic: |vocab(first N docs)| at doubling prefixes, with
      // the doubling ratio in exact ppm (Heaps V = K·n^β makes every
      // ratio 2^β, so drift shows where novelty decays — the signal a
      // dedup/curation pass shifts). One shingle→min-doc agg, then
      // ONE pass of conditional sums (a 1-row frame); no per-anchor
      // rescan.
      import s.implicits._
      val first = documents(s, d)
        .select(explode(Dedup.shingles(col("text"), 3)).as("sh"),
          col("doc_id"))
        .groupBy("sh").agg(min("doc_id").as("first_id"))
      val anchors = (5 to 12).map(1L << _) // 32 .. 4096
      val sums = first.agg(
        sum(when(col("first_id") < anchors.head, 1L).otherwise(0L))
          .as(s"v${anchors.head}"),
        anchors.tail.map(n =>
          sum(when(col("first_id") < n, 1L).otherwise(0L)).as(s"v$n")): _*)
        .head()
      val v = anchors.map(n => n -> sums.getAs[Long](s"v$n")).toMap
      anchors.tail.map { n =>
        val (h, f) = (v(n / 2), v(n))
        (n, h, f, if (h > 0) f * 1000000L / h else 0L)
      }.toDF("prefix_docs", "vocab_half", "vocab", "growth_ppm")
        .orderBy("prefix_docs")
    }),

    "q255_interarrival_hist" -> ((s, d) => {
      // Inter-arrival latency distribution per event type: the gap to
      // each user's NEXT event of the same type, bucketed on
      // floor(log2(seconds)) — the log-scale latency histogram a
      // monitoring stack draws, in pure integer bit arithmetic
      // (length(bin(x)), the q232 rho trick; no float log). One
      // per-user window (lead), then a (type, bucket) count agg
      // bounded by |types| × 64 buckets.
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(unix_micros(col("ts")), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("gap_s", expr("(nxt - unix_micros(ts)) div 1000000"))
        .withColumn("bucket",
          when(col("gap_s") <= 0L, lit(0L))
            .otherwise(length(bin(col("gap_s"))).cast("long")))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket")
    }),

    "q256_unpivot_roundtrip" -> ((s, d) =>
      // UNPIVOT (stack) completing the q56 reshape family: the
      // priority × status matrix pivots WIDE (pinned value list — no
      // value-discovery job) and stacks back to long form; the oracle
      // is the direct long-form count, so the green row proves
      // pivot∘unpivot is the identity on the contingency table. Both
      // steps are one 5×3-cell agg; absent cells surface as NULL and
      // are dropped to match the direct counts.
      orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          expr("stack(3, 'F', `F`, 'O', `O`, 'P', `P`) AS (o_orderstatus, n)"))
        .filter(col("n").isNotNull)
        .orderBy("o_orderpriority", "o_orderstatus"))
,
    "q257_windowed_funnel" -> ((s, d) =>
      // Conversion-DEADLINE funnel: each stage within 7 days of the
      // step it extends. Greedy-earliest (q241's shape) is provably
      // insufficient under deadlines, so every stage carries its full
      // reachable-timestamp closure — user-key joins with the band
      // predicate inside the hash join, exchanges reused stage to
      // stage (Relational.funnelStagesWindowed scaladoc + spec
      // counterexample).
      Relational.funnelStagesWindowed(events(s, d), "user_id", "ts",
        "event_type", FunnelStages, windowUs = FunnelWindowUs)),

    "q258_ab_readout" -> ((s, d) =>
      // Deterministic A/B experiment readout: users assigned to arms
      // by an md5 coin (the same salt-keyed assignment a real
      // experiment platform persists — restart-stable, no RNG), per
      // arm the exposed-user count, converters (any purchase),
      // conversion in exact ppm, and revenue. Two user-keyed aggs and
      // a 2-row rollup; assignment is a map-side expression, so the
      // readout costs one pass at any corpus size.
      events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"),
          sum(when(col("event_type") === "purchase",
            cents(col("value"))).otherwise(0L)).as("value_c"))
        .withColumn("arm",
          when(pmod(tokenHash64(concat(lit("ab_"),
            col("user_id").cast("string"))), lit(2L)) === 0L, "control")
            .otherwise("treatment"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          sum("converted").as("n_converted"),
          sum("value_c").as("sum_value_c"))
        .withColumn("conv_ppm",
          expr("n_converted * 1000000 div n_users"))
        .orderBy("arm")),

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
          least(expr("cast(round(q * 10000) as bigint) div 1000"), lit(9L)))
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

    "q260_kaplan_meier" -> ((s, d) => {
      // Survival analysis: the Kaplan-Meier estimator over
      // time-to-first-purchase after signup, with users who never
      // purchase RIGHT-CENSORED at the corpus horizon — the
      // time-to-event curve a growth team reads. Survival is the
      // running integer product S ← S·(n−d) div n in ppm (one floor
      // per step, replayed by the oracle's recursive CTE — no float
      // product to cross engines). Durations are two user-keyed aggs;
      // the day table is date-domain bounded (≤ a few thousand rows at
      // any SF), so the risk-set suffix sums and the product fold are
      // the documented bounded-driver class.
      val ev = events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("s_day"))
      val pu = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("p_day"))
      val horizon = ev.agg(max(to_date(col("ts")))).head().getDate(0)
      val dur = su.join(pu, Seq("user_id"), "left")
        .select(
          when(col("p_day").isNotNull && col("p_day") >= col("s_day"),
            datediff(col("p_day"), col("s_day")))
            .otherwise(datediff(lit(horizon), col("s_day"))).as("t"),
          (col("p_day").isNotNull && col("p_day") >= col("s_day"))
            .cast("long").as("is_event"))
      val byDay = dur.groupBy("t")
        .agg(sum("is_event").as("d"), sum(lit(1L) - col("is_event")).as("c"))
        .orderBy("t")
        .collect() // date-domain bounded
      val total = byDay.map(r => r.getLong(1) + r.getLong(2)).sum
      var atRisk = total
      var surv = 1000000L
      val rows = byDay.map { r =>
        val (t, dd, cc) = (r.getInt(0), r.getLong(1), r.getLong(2))
        val n = atRisk
        if (dd > 0 && n > 0) surv = surv * (n - dd) / n
        atRisk -= (dd + cc)
        (t.toLong, n, dd, cc, surv)
      }.toSeq
      import s.implicits._
      rows.toDF("t_days", "n_risk", "n_events", "n_censored", "surv_ppm")
        .orderBy("t_days")
    }),

    "q261_seasonal_baseline" -> ((s, d) => {
      // Forecast-baseline evaluation: the seasonal-naive predictor
      // (next value = same weekday last week) scored against the
      // actual daily revenue, absolute percentage error in exact ppm
      // per day — the baseline every forecasting model must beat, and
      // the first question a metrics team asks of a series. One
      // date-domain-bounded agg, a 7-day self-join on the day grid
      // (lag-7 via join, not a global window), and an overall
      // lower-median error row rides along (rank ⌈n/2⌉, the q247
      // exact-integer convention).
      val daily = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("total_c"))
      val scored = daily.alias("a")
        .join(daily.select(col("day").as("pd"), col("total_c").as("pred_c")),
          col("pd") === date_sub(col("day"), 7))
        .select(col("day"), col("total_c"), col("pred_c"),
          expr("abs(total_c - pred_c) * 1000000 div total_c").as("ape_ppm"))
      val n = scored.count()
      val med = scored.select(col("ape_ppm"))
        .orderBy(col("ape_ppm").asc).limit(((n + 1) / 2).toInt)
        .orderBy(col("ape_ppm").desc).limit(1).head().getLong(0)
      scored
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("total_c"), col("pred_c"), col("ape_ppm"),
          lit(med).as("median_ape_ppm"))
        .orderBy("day")
    }),

    "q262_benford_audit" -> ((s, d) => {
      // Benford first-digit audit — the classic fabricated-data
      // screen: the leading significant digit of each order total
      // (in cents — leading digit is scale-invariant) against the
      // canonical Benford mass log10(1+1/d), carried as the 9
      // hard-coded ppm constants so no engine computes a log. One
      // map-side digit extraction + a 9-key agg; deviation in ppm.
      val benford = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
        8 -> 51153L, 9 -> 45757L)
      import s.implicits._
      val exp = broadcast(benford.toDF("digit", "benford_ppm"))
      orders(s, d)
        .select(cents(col("o_totalprice")).as("v"))
        .filter(col("v") > 0L)
        .withColumn("digit",
          substring(col("v").cast("string"), 1, 1).cast("int"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(
          orders(s, d).filter(cents(col("o_totalprice")) > 0L)
            .agg(count(lit(1)).as("total"))))
        .withColumn("observed_ppm", expr("n * 1000000 div total"))
        .join(exp, Seq("digit"))
        .withColumn("abs_diff_ppm",
          abs(col("observed_ppm") - col("benford_ppm")))
        .select(col("digit"), col("n"), col("observed_ppm"),
          col("benford_ppm"), col("abs_diff_ppm"))
        .orderBy("digit")
    }),

    "q263_cluster_size_hist" -> ((s, d) => {
      // Duplicate-cluster SIZE distribution — the dedup report a
      // curation run ships beside the keeper pass (q217): how many
      // clusters of each size, and how many docs they hold, over the
      // q63 simhash dup graph's connected components. Star CC labels
      // (O(log² n) rounds, checkpointed) then two domain-bounded aggs
      // — the histogram is as wide as the largest cluster, never the
      // corpus.
      val pairs = Dedup.simHashDup(documents(s, d), "doc_id", "text",
        nBits = 16)
      Dedup.dupClustersStar(pairs, "id_a", "id_b")
        .groupBy("label").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("size") * col("n_clusters"))
        .orderBy("size")
    })
  )

  /** q210's deterministic raw-URL derivation (shared with its oracle by
    * construction): doc_id mods pick the surface variation — scheme
    * case / www. prefix, an explicit default port, a trailing slash,
    * tracking-param placement and param order, a fragment — while
    * (source, lang, doc_id mod 250) pins the canonical page.
    */
  private def rawUrl(id: Column, source: Column, lang: Column): Column = {
    val base = (id % 250L).cast("string")
    val scheme = when(id % 4L === 0L, "https://")
      .when(id % 4L === 1L, "HTTPS://")
      .when(id % 4L === 2L, "https://WWW.")
      .otherwise("HTTPS://www.")
    val port = when(id % 2L === 0L, ":443").otherwise("")
    val slash = when(id % 5L === 0L, "/").otherwise("")
    val query = when(id % 3L === 0L,
        concat(lit("?id="), base, lit("&lang="), lang,
          lit("&utm_source=feed")))
      .when(id % 3L === 1L,
        concat(lit("?lang="), lang, lit("&id="), base))
      .otherwise(concat(lit("?utm_campaign=x&id="), base,
        lit("&lang="), lang, lit("#top")))
    concat(scheme, source, lit(".Example.COM"), port,
      lit("/Articles/"), base, slash, query)
  }

  /** q206's persisted standing LSH band index (the q203 fixture
    * convention): built once per SF from the corpus split, parquet'd,
    * read back.
    */
  private def lshPostingsFixture(s: SparkSession, d: String,
                                 docs: DataFrame): DataFrame = synchronized {
    val path = fixturePath(d, "lsh_band_postings.parquet")
    ensureFixture(path) { tmp =>
      operators.Dedup.minHashBandPostings(
          docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
          "doc_id", "text", k = 3, bands = 4, rowsPerBand = 4,
          maxBucketSize = 10000)
        .write.mode("overwrite").parquet(tmp)
    }
    s.read.parquet(path)
  }

  /** q209's persisted standing hyperplane-LSH index (the q207 fixture
    * convention): the corpus's bucket assignments at q36/q53's
    * parameters, PARTITIONED BY bucket so a probe's equi-join prunes
    * to its probed buckets' files.
    */
  private def lshIndexFixture(s: SparkSession, d: String,
                              e: DataFrame): DataFrame = synchronized {
    val path = fixturePath(d, "lsh_buckets.parquet")
    ensureFixture(path) { tmp =>
      operators.Ann.lshBucketAssignments(e, "vec_id", "embedding", nBits = 4)
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    }
    // partition-column type inference reads bucket back as INT —
    // restore the long the probe side joins on
    s.read.parquet(path).withColumn("bucket", col("bucket").cast("long"))
  }

  /** q208's persisted standing SimHash multi-index (the q203/q206
    * fixture convention): the corpus split's capped (tbl, key,
    * postings) table at q82's parameters, written once per SF.
    */
  private def simHashPostingsFixture(s: SparkSession, d: String,
                                     docs: DataFrame): DataFrame = synchronized {
    val path = fixturePath(d, "simhash_postings.parquet")
    ensureFixture(path) { tmp =>
      operators.Dedup.simHashMultiIndexPostings(
          docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
          "doc_id", "text", nBits = 32, maxHamming = 3, nBlocks = 6,
          maxBucketSize = 10000)
        .write.mode("overwrite").parquet(tmp)
    }
    s.read.parquet(path)
  }

  /** q213's term-shard count, shared by the index build and the probe's
    * plan-time bucket literals.
    */
  private val Bm25IndexBuckets = 64

  /** q213's persisted standing inverted index (the q203/q206-q209
    * fixture convention applied to retrieval): `Indexing.bm25Index` —
    * the full (wb, w, id, tf) postings PARTITIONED BY the term shard
    * wb (so a probe's literal-IN on its terms' shards prunes to those
    * directories), the (id, dl) doclen table, and the 1-row corpus
    * stats — written once per SF, read back.
    */
  private def bm25IndexFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = synchronized {
    val pPath = fixturePath(d, "bm25_postings.parquet")
    val dPath = fixturePath(d, "bm25_doclen.parquet")
    val sPath = fixturePath(d, "bm25_stats.parquet")
    lazy val built = operators.Indexing.bm25Index(
      documents(s, d), "doc_id", "text", buckets = Bm25IndexBuckets)
    ensureFixture(pPath) { tmp =>
      built._1.write.mode("overwrite").partitionBy("wb").parquet(tmp)
    }
    ensureFixture(dPath) { tmp =>
      built._2.write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(sPath) { tmp =>
      built._3.write.mode("overwrite").parquet(tmp)
    }
    // partition-column type inference reads wb back as INT — restore
    // the long the probe's literals compare against
    (s.read.parquet(pPath).withColumn("wb", col("wb").cast("long")),
     s.read.parquet(dPath), s.read.parquet(sPath))
  }

  /** q219's persisted UNCAPPED standing LSH band index (the
    * maintenance-side sibling of [[lshPostingsFixture]]: an index you
    * UPSERT must keep full buckets — the cap is a probe-time filter, a
    * capped store loses members unrecoverably).
    */
  private def lshPostingsFullFixture(s: SparkSession, d: String,
                                     docs: DataFrame): DataFrame = synchronized {
    val path = fixturePath(d, "lsh_band_postings_full.parquet")
    ensureFixture(path) { tmp =>
      operators.Dedup.minHashBandPostings(
          docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
          "doc_id", "text", k = 3, bands = 4, rowsPerBand = 4,
          maxBucketSize = Int.MaxValue)
        .write.mode("overwrite").parquet(tmp)
    }
    s.read.parquet(path)
  }

  /** q220's persisted standing substring-gram index: the corpus's
    * per-position 40-gram xxhash64 postings and their frequency table
    * (`Dedup.substringGramIndex`), written once per SF.
    */
  private def substringIndexFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = synchronized {
    val pPath = fixturePath(d, "substring_postings.parquet")
    val fPath = fixturePath(d, "substring_gramdf.parquet")
    lazy val built = operators.Dedup.substringGramIndex(
      documents(s, d).filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
      "doc_id", "text", minLen = 40)
    ensureFixture(pPath) { tmp =>
      built._1.write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(fPath) { tmp =>
      built._2.write.mode("overwrite").parquet(tmp)
    }
    (s.read.parquet(pPath), s.read.parquet(fPath))
  }

  /** q218's persisted standing PPJoin index (the ingest pattern applied
    * to exact set similarity): `Dedup.ppJoinIndex` — the corpus's
    * global shingle-rarity table, its PREFIX postings at q182's
    * threshold, and its sorted full shingle sets — written once per SF.
    */
  private def ppJoinIndexFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = synchronized {
    val fPath = fixturePath(d, "ppjoin_dfreq.parquet")
    val pPath = fixturePath(d, "ppjoin_postings.parquet")
    val sPath = fixturePath(d, "ppjoin_sets.parquet")
    lazy val built = operators.Dedup.ppJoinIndex(
      documents(s, d).filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
      "doc_id", "text", PpJoinTPpm)
    ensureFixture(fPath) { tmp =>
      built._1.write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(pPath) { tmp =>
      built._2.write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(sPath) { tmp =>
      built._3.write.mode("overwrite").parquet(tmp)
    }
    (s.read.parquet(fPath), s.read.parquet(pPath), s.read.parquet(sPath))
  }

  /** q222's persisted CORPUS-split IVF index: centroids trained on the
    * standing corpus only (vec_id%10 != 0 — frozen between retrains,
    * the production IVF policy) plus its cid-partitioned inverted
    * lists. The q207 fixture trains on the full table (its probe is a
    * read); an UPSERT needs the corpus/batch split.
    */
  private def ivfCorpusIndexFixture(s: SparkSession, d: String,
                                    e: DataFrame): (DataFrame, DataFrame) = synchronized {
    val cPath = fixturePath(d, "ivfc_centroids.parquet")
    val aPath = fixturePath(d, "ivfc_lists.parquet")
    lazy val corpus = e.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
    ensureFixture(cPath) { tmp =>
      operators.Ann.kmeansCentroids(corpus, "vec_id", "embedding",
          nLists = 8, iters = 2)
        .write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(aPath) { tmp =>
      operators.Ann.ivfListAssignments(corpus, "vec_id", "embedding",
          s.read.parquet(cPath))
        .write.mode("overwrite").partitionBy("cid").parquet(tmp)
    }
    (s.read.parquet(cPath),
     s.read.parquet(aPath).withColumn("cid", col("cid").cast("long")))
  }

  /** q207's persisted standing IVF index (the q203/q206 fixture
    * convention): q54's deterministic k-means centroid table plus the
    * corpus's inverted-list assignments, written once per SF. The
    * assignments are PARTITIONED BY cid — the physical layout whose
    * point is that a probe's list equi-join reads only its nProbe
    * lists' files, not the corpus.
    */
  private def ivfIndexFixture(s: SparkSession, d: String,
                              e: DataFrame): (DataFrame, DataFrame) = synchronized {
    val cPath = fixturePath(d, "ivf_centroids.parquet")
    val aPath = fixturePath(d, "ivf_lists.parquet")
    ensureFixture(cPath) { tmp =>
      operators.Ann.kmeansCentroids(e, "vec_id", "embedding",
          nLists = 8, iters = 2)
        .write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(aPath) { tmp =>
      operators.Ann.ivfListAssignments(e, "vec_id", "embedding",
          s.read.parquet(cPath))
        .write.mode("overwrite").partitionBy("cid").parquet(tmp)
    }
    // partition-column type inference reads cid back as INT — restore
    // the long the probe side joins on
    (s.read.parquet(cPath),
     s.read.parquet(aPath).withColumn("cid", col("cid").cast("long")))
  }

  /** q230's persisted IVF-PQ index: the q207 coarse index (centroids +
    * cid partitioning) EXTENDED with PQ compression — the per-subspace
    * codebooks (q192's audited build, lossless round-6dp doubles) and
    * the coded inverted lists (cid, neighbor_id, codes), PARTITIONED BY
    * cid so a probe reads only its nProbe lists' files — and those
    * files hold m codes per vector, not floats. Returns
    * (centroids, codebooks, codedLists).
    */
  private def ivfPqIndexFixture(s: SparkSession, d: String,
                                e: DataFrame): (DataFrame, DataFrame, DataFrame) = synchronized {
    val (cents, lists) = ivfIndexFixture(s, d, e)
    val bPath = fixturePath(d, "ivfpq_books.parquet")
    val lPath = fixturePath(d, "ivfpq_lists.parquet")
    ensureFixture(bPath) { tmp =>
      operators.Ann.pqCodebooks(e, "vec_id", "embedding", PqM, PqCodes)
        .write.mode("overwrite").parquet(tmp)
    }
    ensureFixture(lPath) { tmp =>
      val codes = operators.Ann.pqEncodeWith(e, "vec_id", "embedding",
        s.read.parquet(bPath), PqM)
      lists.select(col("cid"),
          col("neighbor_id").cast("long").as("neighbor_id"))
        .join(codes, Seq("neighbor_id"))
        .select("cid", "neighbor_id", "codes")
        .write.mode("overwrite").partitionBy("cid").parquet(tmp)
    }
    (cents, s.read.parquet(bPath),
     s.read.parquet(lPath).withColumn("cid", col("cid").cast("long")))
  }

  // ---------------------------------------------------------------- //
  // DuckDB oracles                                                   //
  // ---------------------------------------------------------------- //

  def oracleSql: Map[String, String] = Map(

    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_c,
        | CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        | COUNT(*) AS n_rows,
        | round(CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*), 4) AS avg_qty
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q09_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q10_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q56_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q57_setops_multiset" ->
      """SELECT custkey, 'intersect_all' AS op FROM (
        | SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | INTERSECT ALL
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT custkey, 'except_all' AS op FROM (
        | SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | EXCEPT ALL
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY op, custkey""".stripMargin,

    "q61_sql_api" -> SqlApiQuery,

    "q62_bpe_tokens" ->
      s"""SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS n_ws,
         | CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q71_array_fns" ->
      """WITH a AS (SELECT l_returnflag,
        |  list_sort(list(DISTINCT l_linestatus)) AS arr FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(len(arr) AS BIGINT) AS n,
        | arr[1] AS first_e,
        | array_to_string(arr, ',') AS joined,
        | list_contains(arr, 'F') AS has_f
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q77_decimal_exact" ->
      """SELECT o_orderstatus,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS sum_dec,
        | CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS min_dec,
        | CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS max_dec
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q58_stats_agg" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        | round(stddev_samp(l_quantity), 4) AS sd_q,
        | round(var_samp(l_quantity), 4) AS var_q,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
        | round(regr_slope(l_extendedprice, l_quantity), 2) AS slope_pq
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q59_edit_distance" ->
      """SELECT a.n_name AS name_a, b.n_name AS name_b,
        | CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
        |FROM nation a CROSS JOIN nation b
        |WHERE a.n_name < b.n_name AND levenshtein(a.n_name, b.n_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "q60_window_range_frame" ->
      """WITH b AS (SELECT o_orderkey, o_orderpriority,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
        | CAST(round(o_totalprice*100, 0) AS BIGINT) AS total_c FROM orders)
        |SELECT o_orderkey, o_orderpriority, CAST(day AS BIGINT) AS day,
        | CAST(SUM(total_c) OVER (PARTITION BY o_orderpriority ORDER BY day
        |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail30_c
        |FROM b ORDER BY o_orderkey""".stripMargin,

    "q11_agg_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps,
        | COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    // date_trunc('microseconds') floors DuckDB's ns timestamps exactly
    // like the Spark reader's `ts div 1000` -> timestamp_micros
    "q80_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  date_trunc('microseconds', ts) AS ts FROM events),
        |u AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        | FROM e GROUP BY 1)
        |SELECT COUNT(*) AS n_users,
        | CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        | CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        | CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM u""".stripMargin,

    "q67_date_arith" ->
      """SELECT o_orderkey,
        | strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS d30,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_left,
        | CAST((dayofweek(CAST(o_orderdate AS DATE)) + 6) % 7 AS BIGINT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q68_join_left_outer" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1)
        |SELECT n_orders, COUNT(*) AS n_customers FROM pc
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q69_join_full_outer" ->
      """WITH u AS (SELECT o_custkey AS ck_a, COUNT(*) AS n_urgent FROM orders
        |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |f AS (SELECT o_custkey AS ck_b, COUNT(*) AS n_finished FROM orders
        |  WHERE o_orderstatus = 'F' GROUP BY 1)
        |SELECT coalesce(ck_a, ck_b) AS custkey,
        | coalesce(n_urgent, 0) AS n_urgent,
        | coalesce(n_finished, 0) AS n_finished
        |FROM u FULL OUTER JOIN f ON ck_a = ck_b ORDER BY custkey""".stripMargin,

    // accuracy-contract oracles (the q39/q70 sketches): the oracle
    // recomputes the EXACT statistic both engines agree on and asserts
    // the engine's within-tolerance flags are 1 — a drifting sketch
    // flips a flag to 0 and the row hash-mismatches
    "q39_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | CAST(1 AS BIGINT) AS parts_ok,
        | CAST(1 AS BIGINT) AS orders_ok
        |FROM lineitem""".stripMargin,

    "q70_approx_percentile" ->
      """WITH b AS (SELECT l_returnflag,
        |  CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_c FROM lineitem)
        |SELECT l_returnflag,
        | round(quantile_cont(price_c, 0.5), 2) AS p50_exact_c,
        | round(quantile_cont(price_c, 0.95), 2) AS p95_exact_c,
        | CAST(1 AS BIGINT) AS p50_ok,
        | CAST(1 AS BIGINT) AS p95_ok
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_agg_conditional" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS disc_rev_c,
        | CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
        | COUNT(*) AS n,
        | round(CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*), 4) AS disc_share
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_agg_having" ->
      """WITH g AS (
        | SELECT l_suppkey, CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c
        | FROM lineitem GROUP BY 1)
        |SELECT l_suppkey, sum_qty_c FROM g
        |WHERE sum_qty_c > (SELECT avg(sum_qty_c) FROM g)
        |ORDER BY l_suppkey""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        | CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q19_sort_limit" ->
      """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS total_c
        |FROM orders ORDER BY total_c DESC, o_orderkey LIMIT 10""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_join_multiway" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_c,
        | COUNT(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q05_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q06_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q20_join_range" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_join_asof" ->
      """SELECT event_id, err_event_id FROM (
        | SELECT p.event_id, e.event_id AS err_event_id,
        |  row_number() OVER (PARTITION BY p.event_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
        | FROM events p JOIN events e
        |  ON e.user_id = p.user_id AND e.ts <= p.ts AND e.event_type = 'error'
        | WHERE p.event_type = 'purchase')
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q07_topk_group" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(round(o_totalprice*100,0) AS BIGINT) AS total_c, rnk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,

    "q08_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        | lag(CAST(round(o_totalprice*100,0) AS BIGINT)) OVER w AS prev_total_c,
        | CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_total_c
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q12_setops" ->
      """SELECT custkey FROM (
        | (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        | UNION
        | (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
        |ORDER BY custkey""".stripMargin,

    "q13_string_fns" ->
      """SELECT string_split(p_name, ' ')[1] AS color, COUNT(*) AS n,
        | COUNT(DISTINCT p_brand) AS n_brands,
        | max(concat(upper(substr(p_type,1,3)), '-', p_brand)) AS max_code,
        | CAST(max(CAST(regexp_extract(p_brand,'[0-9]+') AS BIGINT)) AS BIGINT) AS max_brand_num
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_date_agg" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_json_extract" ->
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(*) AS n,
        | round(CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS DOUBLE)/COUNT(*), 4) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_sessionize" ->
      """WITH x AS (
        | SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        | FROM events),
        |y AS (SELECT user_id, ts,
        | CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END AS brk
        | FROM x),
        |z AS (SELECT user_id, ts,
        | CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        | FROM y)
        |SELECT user_id, session_seq,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        | COUNT(*) AS n_events
        |FROM z GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // q22's session CTEs, session_window-style outputs: end = max + gap.
    "q83_sessionize_sw" ->
      """WITH x AS (
        | SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        | FROM events),
        |y AS (SELECT user_id, ts,
        | CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END AS brk
        | FROM x),
        |z AS (SELECT user_id, ts,
        | CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        | FROM y)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(max(ts) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
        | COUNT(*) AS n_events
        |FROM z GROUP BY user_id, session_seq ORDER BY 1, 2""".stripMargin,

    "q23_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q24_window_sliding" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, COUNT(*) AS n
        |FROM (SELECT event_type, unnest([
        |   time_bucket(INTERVAL 30 MINUTE, ts, TIMESTAMP '1970-01-01'),
        |   time_bucket(INTERVAL 30 MINUTE, ts, TIMESTAMP '1970-01-01') - INTERVAL 30 MINUTE]) AS ws
        |  FROM events)
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q25_letter_count" -> (
      ('A' to 'Z').map { u =>
        val l = u.toLower
        s"SELECT '$u' AS letter, CAST(COALESCE(sum(length(text) - length(replace(replace(text,'$l',''),'$u',''))),0) AS BIGINT) AS cnt FROM documents"
      }.mkString("SELECT letter, cnt FROM (", " UNION ALL ", ") ORDER BY letter")),

    "q26_word_finder" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(text, '(^|[^0-9A-Za-z])spark($|[^0-9A-Za-z])')
        |ORDER BY doc_id""".stripMargin,

    "q15_wordcount" ->
      s"""SELECT word, COUNT(*) AS cnt
         |FROM (SELECT unnest($TOKS) AS word FROM documents)
         |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "q27_text_stats" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
         |s AS (SELECT doc_id, text,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(list_sum(list_transform(
         |    list_filter(string_split_regex(text,'[^0-9A-Za-z]+'), x -> length(x) > 0),
         |    x -> CAST(ceil(length(x)/4.0) AS BIGINT))),0)
         |   + length(regexp_replace(text,'[0-9A-Za-z\\s]','','g')) AS BIGINT) AS n_subwords,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop
         | FROM t)
         |SELECT doc_id, n_tokens, n_subwords, n_stop,
         | round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |  + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |  + (CASE WHEN length(text) > 0
         |     THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |     ELSE 0.0 END)*0.3, 4) AS quality
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "q28_langid" -> {
      def cnt(markers: Seq[String]) = {
        val in = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($in)))"
      }
      val m = LangMarkers.toMap
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  ${cnt(m("en"))} AS s_en, ${cnt(m("de"))} AS s_de,
         |  ${cnt(m("fr"))} AS s_fr, ${cnt(m("es"))} AS s_es
         | FROM t)
         |SELECT doc_id,
         | CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |      WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
         |      WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
         |      WHEN s_de > s_en THEN 'de'
         |      ELSE 'en' END AS lang_guess
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "q37_rolling_hash" ->
      """SELECT doc_id,
        | CAST(list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(regexp_split_to_array(text,''), c -> CAST(ascii(c) AS BIGINT))),
        |   (a, b) -> (a*257 + b) % 2147483647) AS BIGINT) AS rhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q40_quality_by_source" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT source, text, $TOKS AS toks FROM documents),
         |s AS (SELECT source, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop FROM t),
         |q AS (SELECT source, n_tokens,
         |  round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3, 4) AS quality
         | FROM s)
         |SELECT source, COUNT(*) AS n_docs, round(avg(quality), 4) AS avg_quality,
         | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q29_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)),'\s+',' ','g')) AS fp,
        | CAST(min(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // The `kept` CTE mirrors Dedup.ngramJaccard's maxDocFreq=10000 guard
    // (an anti-join on hot shingles); sizes stay pre-filter, matching the
    // Spark plan's carried n_sh.
    "q30_dedup_ngram_jaccard" ->
      s"""WITH sh AS ($SHINGLES3),
         |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY 1),
         |df AS (SELECT sh AS s2, COUNT(*) AS d FROM sh GROUP BY 1),
         |kept AS (SELECT sh.* FROM sh JOIN df ON sh = s2 WHERE d <= 10000),
         |hs AS (SELECT id, ${duckHash("sh", 15)} AS h FROM kept),
         |common AS (
         | SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
         | FROM hs a JOIN hs b ON a.h = b.h AND a.id < b.id GROUP BY 1,2)
         |SELECT id_a, id_b,
         | round(CAST(c AS DOUBLE)/(na.n + nb.n - c), 4) AS jaccard
         |FROM common JOIN sizes na ON na.id = id_a JOIN sizes nb ON nb.id = id_b
         |WHERE round(CAST(c AS DOUBLE)/(na.n + nb.n - c), 4) >= 0.05
         |ORDER BY id_a, id_b""".stripMargin,

    "q31_dedup_minhash_lsh" ->
      s"""WITH sh AS ($SHINGLES3),
         |h AS (SELECT id, ${duckHash("sh", 7)} AS h FROM sh),
         |mh AS (SELECT id, i AS hash_idx,
         |  min((h*(2*i+1) + i*40503 + 7) % 2147483647) AS min_hash
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS i) GROUP BY 1,2),
         |bk0 AS (SELECT id, hash_idx // 4 AS band,
         |  md5(string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY hash_idx)) AS band_key
         | FROM mh GROUP BY 1,2),
         |bsz AS (SELECT band AS b2, band_key AS k2, COUNT(*) AS n FROM bk0 GROUP BY 1,2),
         |bk AS (SELECT bk0.* FROM bk0 JOIN bsz ON band = b2 AND band_key = k2
         | WHERE n <= 10000),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         | FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |est AS (SELECT c.id_a, c.id_b,
         |  round(avg(CASE WHEN ma.min_hash = mb.min_hash THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 4) AS est_jaccard
         | FROM cand c
         |  JOIN mh ma ON ma.id = c.id_a
         |  JOIN mh mb ON mb.id = c.id_b AND mb.hash_idx = ma.hash_idx
         | GROUP BY 1,2)
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    "q78_ngram_freq" ->
      s"""WITH tt AS (SELECT $TOKS AS t FROM documents),
         |g AS (SELECT unnest(
         |  CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         |       ELSE list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2],' ')) END) AS gram
         | FROM tt)
         |SELECT gram, COUNT(*) AS n FROM g GROUP BY 1
         |ORDER BY n DESC, gram ASC LIMIT 50""".stripMargin,

    "q79_window_distribution" ->
      """WITH b AS (SELECT o_orderpriority, o_orderkey,
        |  CAST(round(o_totalprice*100, 0) AS BIGINT) AS total_c FROM orders),
        |w AS (SELECT o_orderpriority, o_orderkey, total_c,
        |  round(percent_rank() OVER win, 6) AS pr,
        |  round(cume_dist() OVER win, 6) AS cd
        | FROM b WINDOW win AS (PARTITION BY o_orderpriority ORDER BY total_c DESC, o_orderkey))
        |SELECT * FROM w WHERE pr <= 0.001
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    // POSITIONAL k-gram hashes (no DISTINCT — repeats matter for window
    // minima), window-of-4 minima, distinct per doc, then the same
    // doc-frequency-capped pair pattern as q30.
    "q75_winnow_overlap" -> {
      val posHash = s"${duckHash("array_to_string(t[i:i+2], ' ')", 15)}"
      s"""WITH tt AS (SELECT doc_id AS id, $TOKS AS t FROM documents),
         |hs AS (SELECT id,
         |  CASE WHEN len(t) < 3 THEN [${duckHash("array_to_string(t, ' ')", 15)}]
         |       ELSE list_transform(generate_series(1, len(t)-2), i -> $posHash) END AS hs
         | FROM tt),
         |fp AS (SELECT DISTINCT id, unnest(
         |  CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
         |       ELSE list_transform(generate_series(1, len(hs)-3), i -> list_min(hs[i:i+3])) END) AS fp
         | FROM hs),
         |df AS (SELECT fp AS f2, COUNT(*) AS d FROM fp GROUP BY 1),
         |kept AS (SELECT fp.* FROM fp JOIN df ON fp = f2 WHERE d <= 10000)
         |SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
         |FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q32_simhash" ->
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2)
         |SELECT id AS doc_id,
         | CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_dedup_simhash" ->
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1)
         |SELECT a.id AS id_a, b.id AS id_b, a.simhash
         |FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id
         |ORDER BY id_a, id_b""".stripMargin,

    // q33's pair CTEs + 4 UNROLLED min-label-propagation iterations —
    // generated from the same iteration count as the Spark loop, so the
    // two cannot drift.
    "q63_dedup_clusters" -> {
      val iters = 4
      val prop = (1 to iters).map { k =>
        s"""l$k AS (SELECT node, MIN(label) AS label FROM (
           | SELECT node, label FROM l${k - 1}
           | UNION ALL
           | SELECT e.u AS node, l.label FROM edges e JOIN l${k - 1} l ON e.v = l.node) t
           | GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM p
         | UNION ALL SELECT id_b AS u, id_a AS v FROM p),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges),
         |$prop
         |SELECT node, label FROM l$iters ORDER BY node""".stripMargin
    },

    // Exact connected components via DuckDB's recursive CTE (the true
    // transitive closure — no iteration bound), over q63's edge source.
    // dupClustersStar runs to a verified fixpoint, so the two must agree
    // exactly; component min = MIN(label) over everything reachable.
    "q84_dedup_clusters_star" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM p
         | UNION ALL SELECT id_b AS u, id_a AS v FROM p),
         |reach AS (
         | SELECT u AS node, u AS label FROM edges
         | UNION
         | SELECT e.u AS node, r.label FROM edges e JOIN reach r ON e.v = r.node)
         |SELECT node, MIN(label) AS label FROM reach GROUP BY node
         |ORDER BY node""".stripMargin,

    "q34_dedup_embedding" -> {
      val planes =
        s"""SELECT p, list_transform(generate_series(0,63), j -> ${duckPlane("p", "j")}) AS c
           |FROM (SELECT unnest(generate_series(0,7)) AS p)""".stripMargin
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |pl AS ($planes),
         |proj AS (SELECT id, p, list_dot_product(v, c) AS proj FROM e CROSS JOIN pl),
         |bkt AS (SELECT id,
         |  CAST(SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
         | FROM proj GROUP BY 1),
         |ev AS (SELECT e.id, e.v, bkt.bucket FROM e JOIN bkt ON e.id = bkt.id)
         |SELECT a.id AS id_a, b.id AS id_b, round(${duckCos("a.v", "b.v")}, 4) AS cos
         |FROM ev a JOIN ev b ON a.bucket = b.bucket AND a.id < b.id
         |WHERE round(${duckCos("a.v", "b.v")}, 4) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q35_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |s AS (SELECT query_id, e.vec_id AS neighbor_id,
         |  round(${duckCos("qv", "e.v")}, 4) AS cos
         | FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         | FROM s)
         |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    "q36_ann_lsh" -> {
      val planes =
        s"""SELECT p, list_transform(generate_series(0,63), j -> ${duckPlane("p", "j")}) AS c
           |FROM (SELECT unnest(generate_series(0,3)) AS p)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pl AS ($planes),
         |proj AS (SELECT vec_id, p, list_dot_product(v, c) AS proj FROM e CROSS JOIN pl),
         |bkt AS (SELECT vec_id,
         |  CAST(SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
         | FROM proj GROUP BY 1),
         |ev AS (SELECT e.vec_id, e.v, bkt.bucket FROM e JOIN bkt ON e.vec_id = bkt.vec_id),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  round(${duckCos("q.v", "c.v")}, 4) AS cos
         | FROM ev c JOIN ev q ON c.bucket = q.bucket
         | WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         | FROM s)
         |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
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
         |  round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3, 4) AS quality
         | FROM s)
         |SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
         |FROM q WHERE lang = 'en' AND quality >= 0.5
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q74_embedding_centroids" ->
      """WITH e AS (SELECT vec_id % 8 AS bucket, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT bucket, pos, round(avg(x), 6) AS m FROM (
        |  SELECT bucket, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e) u
        | GROUP BY 1, 2),
        |c AS (SELECT bucket, round(sqrt(sum(m*m)), 4) AS c_norm FROM p GROUP BY 1)
        |SELECT p.bucket, c.c_norm, CAST(p.pos AS BIGINT) AS pos, p.m
        |FROM p JOIN c ON p.bucket = c.bucket ORDER BY 1, 3""".stripMargin,

    // q73's eval carve-out + q75's fingerprint CTEs composed: train side
    // is the anti-join remainder; same winnow parameters (k=3, w=4).
    "q76_contamination" -> {
      val posHash = s"${duckHash("array_to_string(t[i:i+2], ' ')", 15)}"
      s"""WITH m AS (SELECT source, doc_id,
         | ${duckHash("concat('sample_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 AS key
         | FROM documents),
         |r AS (SELECT doc_id,
         |  row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rn FROM m),
         |ev AS (SELECT doc_id FROM r WHERE rn <= 5),
         |tt AS (SELECT doc_id AS id, $TOKS AS t FROM documents),
         |hs AS (SELECT id,
         |  CASE WHEN len(t) < 3 THEN [${duckHash("array_to_string(t, ' ')", 15)}]
         |       ELSE list_transform(generate_series(1, len(t)-2), i -> $posHash) END AS hs
         | FROM tt),
         |fp AS (SELECT DISTINCT id, unnest(
         |  CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
         |       ELSE list_transform(generate_series(1, len(hs)-3), i -> list_min(hs[i:i+3])) END) AS fp
         | FROM hs),
         |efp AS (SELECT fp.id AS eval_id, fp.fp FROM fp JOIN ev ON fp.id = ev.doc_id),
         |tfp AS (SELECT fp.* FROM fp LEFT JOIN ev ON fp.id = ev.doc_id
         | WHERE ev.doc_id IS NULL),
         |pairs AS (SELECT e.eval_id, t.id AS train_id, COUNT(*) AS n_shared
         | FROM tfp t JOIN efp e ON t.fp = e.fp GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         |SELECT eval_id, COUNT(*) AS n_leaking_train_docs,
         | CAST(MAX(n_shared) AS BIGINT) AS max_shared
         |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin
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

    // Resize twin of q55: the same pattern sums through the SAME
    // nearest-neighbor index mapping ((x'·w)//10, (y'·h)//8).
    "q66_image_resize" ->
      """WITH d AS (SELECT doc_id, (doc_id % 16) + 8 AS w, (doc_id % 12) + 8 AS h
        | FROM documents WHERE doc_id % 2 = 0),
        |px AS (SELECT doc_id, (x2*w)//10 AS x, (y2*h)//8 AS y FROM d
        | CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS x2)
        | CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS y2))
        |SELECT doc_id AS media_id, CAST(10 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        | CAST(SUM((x*7 + y*11 + doc_id*3) % 256) AS BIGINT) AS sum_r,
        | CAST(SUM((x*13 + y*5 + doc_id*7) % 256) AS BIGINT) AS sum_g,
        | CAST(SUM((x*3 + y*17 + doc_id*11) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // Analytic twin of ImageCodec.channels over every (x, y) of each even
    // doc's fixture image — no PNG involved on the oracle side.
    "q55_image_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 16) + 8 AS w, (doc_id % 12) + 8 AS h
        | FROM documents WHERE doc_id % 2 = 0),
        |px AS (SELECT doc_id, w, h, x, y FROM d
        | CROSS JOIN (SELECT unnest(generate_series(0, 22)) AS x)
        | CROSS JOIN (SELECT unnest(generate_series(0, 18)) AS y)
        | WHERE x < w AND y < h)
        |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        | CAST(SUM((x*7 + y*11 + doc_id*3) % 256) AS BIGINT) AS sum_r,
        | CAST(SUM((x*13 + y*5 + doc_id*7) % 256) AS BIGINT) AS sum_g,
        | CAST(SUM((x*3 + y*17 + doc_id*11) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // Analytic twin of AudioCodec.sampleAt over every sample index of
    // each odd doc's fixture clip — no WAV involved on the oracle side.
    "q81_audio_decode" ->
      """WITH a AS (SELECT doc_id AS media_id, (doc_id % 400) + 100 AS n
        | FROM documents WHERE doc_id % 2 = 1),
        |u AS (SELECT media_id, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i FROM a),
        |s AS (SELECT media_id, ((i*7 + media_id*13) % 4096) - 2048 AS smp FROM u)
        |SELECT media_id, CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(smp) AS BIGINT) AS sum_s,
        | CAST(sum(smp*smp) AS BIGINT) AS sum_sq,
        | CAST(sum(abs(smp)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q38_multimodal_features" ->
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | round(CAST(list_sum(list_transform(regexp_split_to_array(text,''), c -> ascii(c))) AS DOUBLE)
        |   / strlen(text), 4) AS byte_mean
        |FROM documents ORDER BY media_id""".stripMargin,

    "q41_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($TOKS) AS word FROM documents),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1,2),
         |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
         | tf.tf * ((n.n_docs * 1000) // dfreq.df) AS tfidf
         |FROM tf JOIN dfreq USING (word) CROSS JOIN n
         |WHERE tf.tf >= 3
         |ORDER BY tfidf DESC, doc_id, word LIMIT 50""".stripMargin,

    "q42_setops_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q43_window_ranking" ->
      """WITH b AS (SELECT o_orderpriority, o_orderkey,
        |  CAST(round(o_totalprice*100,0) AS BIGINT) AS total_c FROM orders),
        |w AS (SELECT o_orderpriority, o_orderkey, total_c,
        |  CAST(rank() OVER win AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER win AS BIGINT) AS drnk,
        |  lead(o_orderkey, 1) OVER win AS next_key,
        |  CAST(ntile(4) OVER win AS BIGINT) AS quartile
        | FROM b WINDOW win AS (PARTITION BY o_orderpriority ORDER BY total_c DESC, o_orderkey))
        |SELECT * FROM w WHERE rnk <= 10 ORDER BY o_orderpriority, rnk""".stripMargin,

    "q44_math_fns" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(floor(sqrt(l_quantity)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_sqrt_q,
        | CAST(SUM(CAST(l_quantity*l_quantity AS BIGINT)) AS BIGINT) AS sum_sq_q,
        | CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor_p,
        | CAST(SUM(CAST(ceil(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_ceil_d,
        | CAST(SUM(CAST(abs(l_quantity-25.0) AS BIGINT)) AS BIGINT) AS sum_absdev,
        | CAST(SUM(l_orderkey % 7) AS BIGINT) AS sum_mod7
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_json_map" ->
      // list_distinct + TRY_CAST mirror Spark's from_json map semantics
      // on degenerate props (duplicate keys collapse; non-numeric values
      // null out instead of aborting the query)
      """SELECT event_type, key, COUNT(*) AS n,
        | MIN(TRY_CAST(json_extract_string(props, '$.'||key) AS BIGINT)) AS min_v,
        | MAX(TRY_CAST(json_extract_string(props, '$.'||key) AS BIGINT)) AS max_v
        |FROM (SELECT event_type, props, unnest(list_distinct(json_keys(props))) AS key FROM events) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q48_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_stringagg" ->
      """SELECT r_name,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q50_unpivot" ->
      """WITH wide AS (SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
        |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
        |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        | FROM orders GROUP BY 1)
        |SELECT o_orderpriority, 'F' AS status, f AS n FROM wide
        |UNION ALL SELECT o_orderpriority, 'O', o FROM wide
        |UNION ALL SELECT o_orderpriority, 'P', p FROM wide
        |ORDER BY o_orderpriority, status""".stripMargin,

    "q51_median" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(CAST(round(o_totalprice*100,0) AS BIGINT), 0.5), 2) AS median_c,
        | round(quantile_cont(CAST(round(o_totalprice*100,0) AS BIGINT), 0.25), 2) AS q1_c,
        | round(quantile_cont(CAST(round(o_totalprice*100,0) AS BIGINT), 0.75), 2) AS q3_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_frame_stats" ->
      """WITH fr AS (SELECT doc_id, text, strlen(text) AS L, ff.f AS frame_idx
        |  FROM documents, (SELECT unnest(generate_series(0,3)) AS f) ff),
        |c AS (SELECT doc_id, frame_idx,
        |  ((frame_idx+1)*L)//4 - (frame_idx*L)//4 AS nb,
        |  CASE WHEN ((frame_idx+1)*L)//4 - (frame_idx*L)//4 = 0 THEN 0
        |    ELSE list_sum(list_transform(regexp_split_to_array(substr(text, (frame_idx*L)//4 + 1, ((frame_idx+1)*L)//4 - (frame_idx*L)//4),''), ch -> ascii(ch))) END AS s
        |  FROM fr),
        |m AS (SELECT frame_idx, nb, CASE WHEN nb=0 THEN 0.0 ELSE round(CAST(s AS DOUBLE)/nb, 4) END AS mean FROM c)
        |SELECT CAST(frame_idx AS BIGINT) AS frame_idx, COUNT(*) AS n,
        | CAST(SUM(nb) AS BIGINT) AS total_bytes,
        | CAST(SUM(CAST(round(mean*10000,0) AS BIGINT)) AS BIGINT) AS sum_mean_x1e4
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_ann_ivf" -> {
      val dist = "round(vv - 2.0*list_dot_product(v, cv) + cc, 6)"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv, vv AS cc FROM e ORDER BY vec_id LIMIT 8),
         |ad AS (SELECT e.vec_id AS neighbor_id, e.v, c.cid, $dist AS d
         | FROM e CROSS JOIN c),
         |asgn AS (SELECT neighbor_id, v, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY d, cid) AS rn FROM ad)
         | WHERE rn = 1),
         |pd AS (SELECT e.vec_id AS query_id, e.v AS qv, c.cid, $dist AS d
         | FROM e CROSS JOIN c WHERE e.vec_id < 5),
         |probes AS (SELECT query_id, qv, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS rn FROM pd)
         | WHERE rn <= 2),
         |s AS (SELECT query_id, neighbor_id, round(${duckCos("qv", "asgn.v")}, 4) AS cos
         | FROM probes JOIN asgn USING (cid) WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         | FROM s)
         |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
    },

    // Band boundaries are DERIVED from Dedup.simHashBands(SimHashBitsQ52,
    // 2) so the SQL cannot drift from the Scala chunking (width changes
    // in ONE place); the bsz filter mirrors the default
    // maxBucketSize=10000 guard.
    "q52_dedup_simhash_hamming" -> {
      val nBits = SimHashBitsQ52
      val bands = graft.operators.Dedup.simHashBands(nBits, 2)
      val bandCase = bands.map {
        case (i, start, len) => s"WHEN $i THEN (simhash >> $start) & ${(1L << len) - 1}"
      }.mkString(" ")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,${nBits - 1})) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |bands0 AS (SELECT id, simhash, chunk,
         |  CASE chunk $bandCase END AS key
         | FROM sh CROSS JOIN (SELECT unnest(generate_series(0,${bands.size - 1})) AS chunk) c),
         |bsz AS (SELECT chunk AS c2, key AS k2, COUNT(*) AS n FROM bands0 GROUP BY 1,2),
         |bands AS (SELECT bands0.* FROM bands0 JOIN bsz ON chunk = c2 AND key = k2
         | WHERE n <= 10000),
         |cand AS (SELECT a.id AS id_a, b.id AS id_b,
         |  min(a.simhash) AS ha, min(b.simhash) AS hb
         | FROM bands a JOIN bands b ON a.chunk = b.chunk AND a.key = b.key AND a.id < b.id
         | GROUP BY 1,2)
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 2
         |ORDER BY id_a, id_b""".stripMargin
    },

    // Multi-index twin of q52 at d=3: table keys are DERIVED from
    // Dedup.simHashMultiTables(32, 6, 3) — the same block-combination
    // layout the Scala operator explodes — so the SQL cannot drift.
    "q82_dedup_simhash_multiindex" -> {
      val tables = graft.operators.Dedup.simHashMultiTables(32, 6, 3)
      val keyCase = tables.map { case (t, blocks) =>
        var off = 0
        val expr = blocks.map { case (start, len) =>
          val part = s"(((simhash >> $start) & ${(1L << len) - 1}) << $off)"
          off += len
          part
        }.mkString(" | ")
        s"WHEN $t THEN $expr"
      }.mkString(" ")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,31)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |keys0 AS (SELECT id, simhash, tbl,
         |  CASE tbl $keyCase END AS key
         | FROM sh CROSS JOIN (SELECT unnest(generate_series(0,${tables.size - 1})) AS tbl) t),
         |ksz AS (SELECT tbl AS t2, key AS k2, COUNT(*) AS n FROM keys0 GROUP BY 1,2),
         |keys AS (SELECT keys0.* FROM keys0 JOIN ksz ON tbl = t2 AND key = k2
         | WHERE n <= 10000),
         |cand AS (SELECT a.id AS id_a, b.id AS id_b,
         |  min(a.simhash) AS ha, min(b.simhash) AS hb
         | FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key AND a.id < b.id
         | GROUP BY 1,2)
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },

    // q82's simhash/multi-table CTEs split into new (id%10=0) and
    // corpus sides; the bucket cap applies to the CORPUS key lists,
    // like the Spark plan (and q115's LSH analog). The persisted-index
    // form finds the SAME pairs (table keys are a pure per-doc function
    // of nBits/maxHamming/nBlocks).
    "q208_simhash_ingest" -> {
      val tables = graft.operators.Dedup.simHashMultiTables(32, 6, 3)
      val keyCase = tables.map { case (t, blocks) =>
        var off = 0
        val expr = blocks.map { case (start, len) =>
          val part = s"(((simhash >> $start) & ${(1L << len) - 1}) << $off)"
          off += len
          part
        }.mkString(" | ")
        s"WHEN $t THEN $expr"
      }.mkString(" ")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,31)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |ck0 AS (SELECT id, simhash, tbl,
         |  CASE tbl $keyCase END AS key
         | FROM sh CROSS JOIN (SELECT unnest(generate_series(0,${tables.size - 1})) AS tbl) t
         | WHERE id % 10 <> 0),
         |ksz AS (SELECT tbl AS t2, key AS k2, COUNT(*) AS n FROM ck0 GROUP BY 1,2),
         |ck AS (SELECT ck0.* FROM ck0 JOIN ksz ON tbl = t2 AND key = k2
         | WHERE n <= 10000),
         |nk AS (SELECT id, simhash, tbl,
         |  CASE tbl $keyCase END AS key
         | FROM sh CROSS JOIN (SELECT unnest(generate_series(0,${tables.size - 1})) AS tbl) t
         | WHERE id % 10 = 0),
         |cand AS (SELECT n.id AS new_id, c.id AS corpus_id,
         |  min(n.simhash) AS hn, min(c.simhash) AS hc
         | FROM nk n JOIN ck c ON n.tbl = c.tbl AND n.key = c.key AND n.id <> c.id
         | GROUP BY 1,2)
         |SELECT new_id, corpus_id, CAST(bit_count(xor(hn, hc)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(hn, hc)) <= 3
         |ORDER BY new_id, corpus_id""".stripMargin
    },

    // q36's plan plus query-side probe explode: each query also probes
    // its bucket with hyperplane bits 0 and 1 flipped (multiProbe=2).
    "q53_ann_lsh_multiprobe" -> lshMultiprobeOracle,

    // persisted-bucket-index probe finds the SAME neighbors (the split
    // is exact: lshTopK == lshTopKProbe over lshBucketAssignments, and
    // the parquet round-trip of float vectors is lossless) — same
    // oracle
    "q209_ann_lsh_ingest" -> lshMultiprobeOracle,

    // the raw-URL derivation (rawUrl) and every normalization rule of
    // Curation.canonicalizeUrl replayed in SQL: fragment strip, scheme/
    // host lowercase, www. strip, default-port drop, slash collapse +
    // trailing-slash strip, tracking-param filter, param sort. DuckDB's
    // regexp_replace needs the explicit 'g' flag where Spark replaces
    // globally by default; both sides' param sort is binary on ASCII.
    "q210_url_dedup" ->
      """WITH raw AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 4 = 0 THEN 'https://'
        |        WHEN doc_id % 4 = 1 THEN 'HTTPS://'
        |        WHEN doc_id % 4 = 2 THEN 'https://WWW.'
        |        ELSE 'HTTPS://www.' END)
        |  || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        |  || '/Articles/' || CAST(doc_id % 250 AS VARCHAR)
        |  || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '?id=' ||
        |        CAST(doc_id % 250 AS VARCHAR) || '&lang=' || lang ||
        |        '&utm_source=feed'
        |      WHEN doc_id % 3 = 1 THEN '?lang=' || lang || '&id=' ||
        |        CAST(doc_id % 250 AS VARCHAR)
        |      ELSE '?utm_campaign=x&id=' ||
        |        CAST(doc_id % 250 AS VARCHAR) || '&lang=' || lang ||
        |        '#top' END) AS url
        | FROM documents),
        |c AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u
        | FROM raw),
        |p AS (SELECT doc_id, url,
        |  lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |    AS scheme,
        |  lower(regexp_extract(u,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
        |  regexp_extract(u,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
        |  regexp_extract(u, '\?(.*)$', 1) AS qstr
        | FROM c),
        |n AS (SELECT doc_id, url, scheme,
        |  regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
        |    '^www\.', '') AS host,
        |  regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |  CASE WHEN scheme = 'https' THEN '443'
        |       WHEN scheme = 'http' THEN '80' ELSE '' END AS defport,
        |  regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'),
        |    '/$', '') AS path1,
        |  array_to_string(list_sort(list_filter(string_split(qstr, '&'),
        |    x -> x <> '' AND NOT regexp_matches(lower(x),
        |      '^(utm_[^=]*|gclid|fbclid|ref)='))), '&') AS q2
        | FROM p),
        |k AS (SELECT doc_id, url,
        |  scheme || '://' || host
        |  || (CASE WHEN port = '' OR port = defport THEN ''
        |      ELSE ':' || port END)
        |  || (CASE WHEN path1 = '' THEN '/' ELSE path1 END)
        |  || (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END)
        |    AS canonical_url
        | FROM n)
        |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_urls,
        | CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms,
        | CAST(min(doc_id) AS BIGINT) AS keeper_id
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same two windows: size-DESC (file ASC ties) exclusive cumsum
    // div 50000 assigns the bin; a second window over (tbl, bin) reads
    // off each bin's fill. // not CAST(/): DuckDB's / rounds on cast.
    "q211_compaction_plan" ->
      """WITH f AS (SELECT event_type AS tbl, CAST(user_id AS BIGINT)
        |  AS file,
        |  CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
        |    AS bytes
        | FROM events GROUP BY 1, 2),
        |a AS (SELECT tbl, file, bytes,
        |  CAST(COALESCE(SUM(bytes) OVER (PARTITION BY tbl
        |    ORDER BY bytes DESC, file ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    // 50000 AS BIGINT) AS bin
        | FROM f)
        |SELECT tbl, file, bytes, bin,
        | CAST(count(*) OVER (PARTITION BY tbl, bin) AS BIGINT)
        |   AS bin_files,
        | CAST(SUM(bytes) OVER (PARTITION BY tbl, bin) AS BIGINT)
        |   AS bin_bytes
        |FROM a ORDER BY tbl, bin, file""".stripMargin,

    // the UNSALTED single-phase truth: the salted two-phase and the
    // (key,value)-distinct rewrites must be result-identities
    "q212_skew_safe_agg" ->
      """SELECT event_type,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
        |   AS sum_v,
        | CAST(MIN(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
        |   AS min_v,
        | CAST(MAX(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
        |   AS max_v,
        | CAST(count(DISTINCT CAST(round(value*100, 0) AS BIGINT))
        |   AS BIGINT) AS n_distinct_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the EXACT heavy-hitter set (count*k > n, k=100) with the three
    // contract booleans claimed true — retention, no overcount, and
    // undercount <= n/k are GUARANTEED by Misra-Gries theory, so the
    // hash match proves the guarantees held on this corpus
    "q214_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($TOKS) AS w FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok),
         |e AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_cnt
         | FROM tok GROUP BY 1)
         |SELECT w, exact_cnt, CAST(1 AS BIGINT) AS found,
         | CAST(1 AS BIGINT) AS no_over,
         | CAST(1 AS BIGINT) AS within_bound
         |FROM e, n WHERE exact_cnt * 100 > n_total ORDER BY w""".stripMargin,

    // the same fingerprint as q29 and the same quality formula as q40,
    // keeper = (quality DESC, doc_id ASC) rank 1 per cluster
    "q215_dedup_keeper" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text,
         |  md5(regexp_replace(lower(trim(text)),'\\s+',' ','g')) AS fp,
         |  $TOKS AS toks FROM documents),
         |s AS (SELECT doc_id, fp, text,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop
         | FROM t),
         |q AS (SELECT doc_id, fp,
         |  round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3, 4) AS quality
         | FROM s),
         |r AS (SELECT fp, doc_id, quality,
         |  CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies,
         |  row_number() OVER (PARTITION BY fp
         |    ORDER BY quality DESC, doc_id) AS rn FROM q)
         |SELECT fp, CAST(doc_id AS BIGINT) AS keep_id,
         | quality AS best_score, n_copies
         |FROM r WHERE rn = 1 ORDER BY fp""".stripMargin
    },

    // q84's simhash pairs + recursive closure, q40's quality formula,
    // keeper = (quality DESC, doc_id ASC) rank 1 per cluster;
    // singletons self-cluster via the COALESCE
    "q217_neardup_keeper" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH RECURSIVE w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM p
         | UNION ALL SELECT id_b AS u, id_a AS v FROM p),
         |reach AS (
         | SELECT u AS node, u AS label FROM edges
         | UNION
         | SELECT e.u AS node, r.label FROM edges e JOIN reach r ON e.v = r.node),
         |lab AS (SELECT node, MIN(label) AS label FROM reach GROUP BY node),
         |t AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
         |st AS (SELECT doc_id, text,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop
         | FROM t),
         |q AS (SELECT doc_id,
         |  round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3, 4) AS quality
         | FROM st),
         |m AS (SELECT CAST(COALESCE(l.label, q.doc_id) AS BIGINT) AS cluster,
         |  q.doc_id, q.quality
         | FROM q LEFT JOIN lab l ON q.doc_id = l.node),
         |r AS (SELECT cluster, doc_id, quality,
         |  CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members,
         |  row_number() OVER (PARTITION BY cluster
         |    ORDER BY quality DESC, doc_id) AS rn FROM m)
         |SELECT cluster, CAST(doc_id AS BIGINT) AS keep_id,
         | quality AS best_score, n_members
         |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin
    },

    // q219's band CTEs over the CORPUS split minus the tombstoned ids,
    // restricted to buckets that contained a deleted member — delete
    // must equal recompute on every touched bucket, and fully-emptied
    // buckets must vanish (the inner join against non-empty recompute
    // groups encodes that)
    "q221_lsh_index_delete" ->
      s"""WITH sh AS (SELECT id, sh FROM ($SHINGLES3) WHERE id % 10 <> 0),
         |h AS (SELECT id, ${duckHash("sh", 7)} AS h FROM sh),
         |mh AS (SELECT id, i AS hash_idx,
         |  min((h*(2*i+1) + i*40503 + 7) % 2147483647) AS min_hash
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS i) GROUP BY 1,2),
         |bk0 AS (SELECT id, hash_idx // 4 AS band,
         |  md5(string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY hash_idx)) AS band_key
         | FROM mh GROUP BY 1,2),
         |touched AS (SELECT DISTINCT band, band_key FROM bk0 WHERE id % 7 = 0),
         |b AS (SELECT band, band_key, CAST(COUNT(*) AS BIGINT) AS n,
         |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS ids
         | FROM bk0 WHERE id % 7 <> 0 GROUP BY 1,2)
         |SELECT CAST(b.band AS BIGINT) AS band, b.band_key, n, ids
         |FROM b JOIN touched USING (band, band_key)
         |ORDER BY band, band_key""".stripMargin,

    // q125's gram/diagonal CTEs split batch-vs-corpus: corpus-side
    // postings with the df <= 1000 cap (no lower bound — the batch
    // occurrence is the pair's other side), diagonal islands per
    // (new, corpus) pair
    "q220_substring_ingest" ->
      """WITH grams AS (
        |  SELECT doc_id AS id, p AS pos, substring(text, p, 40) AS g
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(text) - 39, 1))) AS p) t
        |  WHERE p <= length(text) - 39),
        |cg AS (SELECT * FROM grams WHERE id % 10 <> 0),
        |bg AS (SELECT * FROM grams WHERE id % 10 = 0),
        |gf AS (SELECT g FROM cg GROUP BY g HAVING count(*) <= 1000),
        |pairs AS (
        |  SELECT b.id AS new_id, b.pos AS pos_a, c.id AS corpus_id, c.pos AS pos_b
        |  FROM bg b JOIN gf USING (g) JOIN cg c USING (g)),
        |d AS (SELECT *, pos_a - pos_b AS diag,
        |  pos_a - row_number() OVER (PARTITION BY new_id, corpus_id, pos_a - pos_b
        |    ORDER BY pos_a) AS isl FROM pairs)
        |SELECT new_id, corpus_id, CAST(min(pos_a) AS BIGINT) AS start_a,
        | CAST(min(pos_b) AS BIGINT) AS start_b,
        | CAST(count(*) + 39 AS BIGINT) AS span_len
        |FROM d GROUP BY new_id, corpus_id, diag, isl
        |ORDER BY new_id, corpus_id, start_a, start_b""".stripMargin,

    // q31's band-key derivation over corpus UNION batch (= all
    // documents), restricted to buckets containing a batch member —
    // merge must equal recompute on every touched bucket
    "q219_lsh_index_upsert" ->
      s"""WITH sh AS ($SHINGLES3),
         |h AS (SELECT id, ${duckHash("sh", 7)} AS h FROM sh),
         |mh AS (SELECT id, i AS hash_idx,
         |  min((h*(2*i+1) + i*40503 + 7) % 2147483647) AS min_hash
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS i) GROUP BY 1,2),
         |bk0 AS (SELECT id, hash_idx // 4 AS band,
         |  md5(string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY hash_idx)) AS band_key
         | FROM mh GROUP BY 1,2),
         |b AS (SELECT band, band_key, CAST(COUNT(*) AS BIGINT) AS n,
         |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS ids
         | FROM bk0 GROUP BY 1,2),
         |touched AS (SELECT DISTINCT band, band_key FROM bk0 WHERE id % 10 = 0)
         |SELECT CAST(b.band AS BIGINT) AS band, b.band_key, n, ids
         |FROM b JOIN touched USING (band, band_key)
         |ORDER BY band, band_key""".stripMargin,

    // the brute-force batch x corpus Jaccard join: the prefix-posting
    // probe must find EXACTLY these pairs (no recall loss)
    "q218_ppjoin_ingest" ->
      s"""WITH sh AS ($SHINGLES3),
         |ss AS (SELECT id, list_sort(list(sh)) AS sset FROM sh GROUP BY 1),
         |p AS (SELECT a.id AS new_id, b.id AS corpus_id,
         |  CAST(len(list_intersect(a.sset, b.sset)) AS BIGINT) AS inter,
         |  CAST(len(a.sset) AS BIGINT) AS na, CAST(len(b.sset) AS BIGINT) AS nb
         | FROM ss a JOIN ss b ON a.id % 10 = 0 AND b.id % 10 <> 0)
         |SELECT new_id, corpus_id, inter,
         | CAST(inter * 1000000 // (na + nb - inter) AS BIGINT) AS jac_ppm
         |FROM p WHERE inter * 1000000 // (na + nb - inter) >= $PpJoinTPpm
         |ORDER BY new_id, corpus_id""".stripMargin,

    // the PLAIN join: the bloom prune must be a result-identity
    "q216_bloom_join" ->
      """SELECT c.c_nationkey,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(SUM(CAST(round(o.o_totalprice*100, 0) AS BIGINT))
        |   AS BIGINT) AS rev_c
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal >= 9000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q46's probe path over Ann.kmeansCentroids(nLists=8, iters=2):
    // md5-keyed seeds, two Lloyd iterations with round(·,6) means and
    // round(·,6) distances before every argmin — bit-reproducible.
    "q54_ann_ivf_kmeans" -> ivfKmeansOracle,

    // persisted-IVF-index probe finds the SAME neighbors (the split is
    // exact: ivfTopKWith == ivfTopKProbe over ivfListAssignments, and
    // the parquet round-trip of rounded-6dp centroid doubles / float
    // vectors is lossless) — same oracle
    "q207_ann_ivf_ingest" -> ivfKmeansOracle,

    // corpus-trained k-means + union assignment restricted to the
    // batch's lists: upsert == recompute on every touched list
    "q222_ann_ivf_upsert" -> ivfUpsertOracle,

    // q54's k-means CTEs (seed + 2 Lloyd rounds + full assignment),
    // then SemDeDup's verdict: drop any vector with a lower-id
    // cluster-mate at cosine >= 0.35 (rounded to 4 decimals before the
    // threshold, exactly like the Spark side).
    "q119_semdedup" -> {
      val dist = "round(vv - 2.0*list_dot_product(v, cv) + list_dot_product(cv, cv), 6)"
      def iter(prev: String, a: String, c: String) =
        s"""$a AS (SELECT sid, v, cid FROM (
           |  SELECT e.vec_id AS sid, e.v, $prev.cid,
           |   row_number() OVER (PARTITION BY e.vec_id
           |     ORDER BY round(e.vv - 2.0*list_dot_product(e.v, $prev.cv)
           |       + list_dot_product($prev.cv, $prev.cv), 6), $prev.cid) AS rn
           |  FROM e CROSS JOIN $prev) t WHERE rn = 1),
           |$c AS (SELECT cid, list(m ORDER BY pos) AS cv FROM (
           |  SELECT cid, pos, round(avg(x), 6) AS m FROM (
           |   SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM $a) u
           |  GROUP BY 1, 2) g GROUP BY 1)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv FROM embeddings),
         |seed AS (SELECT CAST(row_number() OVER (ORDER BY h, sid) AS BIGINT) AS cid, v AS cv
         | FROM (SELECT vec_id AS sid, v,
         |   ${duckHash("concat('ivf_', CAST(vec_id AS VARCHAR))", 15)} AS h
         |  FROM e ORDER BY h, sid
         |  LIMIT greatest($SemDedupMinLists,
         |    (SELECT count(*)//$SemDedupClusterSize FROM e))) t),
         |${iter("seed", "a1", "c1")},
         |${iter("c1", "a2", "c2")},
         |ad AS (SELECT e.vec_id AS vid, e.v, c2.cid, $dist AS d
         | FROM e CROSS JOIN c2),
         |asgn AS (SELECT vid, v, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY d, cid) AS rn FROM ad)
         | WHERE rn = 1),
         |dropped AS (SELECT DISTINCT a.vid FROM asgn a JOIN asgn b
         |  ON a.cid = b.cid AND a.vid > b.vid
         | WHERE round(${duckCos("a.v", "b.v")}, 4) >= 0.35)
         |SELECT asgn.vid AS vec_id, asgn.cid,
         | dropped.vid IS NULL AS keep
         |FROM asgn LEFT JOIN dropped ON asgn.vid = dropped.vid
         |ORDER BY vec_id""".stripMargin
    },

    // floor(log2(N // c)) = length(bin(x)) - 1 on both engines (x >= 1
    // always: c <= N); token-less docs drop on both sides (unnest /
    // explode emit nothing).
    "q120_unigram_surprisal" ->
      s"""WITH toks AS (SELECT doc_id, unnest($TOKS) AS w FROM documents),
         |occ AS (SELECT doc_id, w, COUNT(*) AS occ FROM toks GROUP BY 1, 2),
         |vocab AS (SELECT w, CAST(SUM(occ) AS BIGINT) AS cnt FROM occ GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab)
         |SELECT occ.doc_id,
         | CAST(SUM(occ.occ) AS BIGINT) AS n_tokens,
         | CAST(SUM(occ.occ * (length(bin(tot.n // vocab.cnt)) - 1)) AS BIGINT) AS surprisal_bits,
         | CAST((CAST(SUM(occ.occ * (length(bin(tot.n // vocab.cnt)) - 1)) AS BIGINT) * 1000)
         |   // CAST(SUM(occ.occ) AS BIGINT) AS BIGINT) AS bits_per_1k
         |FROM occ JOIN vocab USING (w) CROSS JOIN tot
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // brute-force ground truth: the oracle MAY cross-join (DuckDB local
    // correctness run at sf0.01); the Spark side must not, and its plan
    // is asserted posting-list-shaped in DedupAnnSpec
    "q121_fuzzy_join_ed1" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        | CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // q105's simhash edge CTEs, then triangles as the a<b<c triple join
    // (the oracle may enumerate naively; Spark's rank-oriented wedge
    // plan must produce the identical count) and wedges from degrees
    "q122_triangle_count" ->
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |und AS (SELECT a.id AS a, b.id AS b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |e AS (SELECT a AS u FROM und UNION ALL SELECT b FROM und),
         |deg AS (SELECT u AS id, COUNT(*) AS d FROM e GROUP BY 1),
         |tri AS (SELECT COUNT(*) AS t FROM und e1
         | JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
         | JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
         | (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
         | (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
         | (SELECT CAST(SUM((d*(d-1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
         | CASE WHEN (SELECT SUM((d*(d-1)) // 2) FROM deg) > 0
         |   THEN round(3.0 * (SELECT t FROM tri)
         |     / (SELECT SUM((d*(d-1)) // 2) FROM deg), 4)
         |   ELSE 0.0 END AS closure""".stripMargin,

    "q123_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey,
        |  CAST(round(o_totalprice*100, 0) AS BIGINT) AS total_c FROM orders),
        |v1 AS (SELECT * FROM base WHERE o_orderkey % 10 <> 3),
        |v2 AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 7 THEN total_c + 100 ELSE total_c END AS total_c
        | FROM base WHERE o_orderkey % 10 <> 5)
        |SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
        | CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
        |      WHEN v2.o_orderkey IS NULL THEN 'delete'
        |      ELSE 'update' END AS change_type,
        | v1.total_c AS old_total_c, v2.total_c AS new_total_c
        |FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        |WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
        |   OR v1.total_c <> v2.total_c
        |ORDER BY o_orderkey""".stripMargin,

    // deviations doubled to stay integral (2*median of integers is an
    // exact integer), halved after the second quantile — mirrors
    // Relational.madByGroup exactly
    "q124_mad_robust" ->
      """WITH base AS (SELECT o_orderstatus AS g,
        |  CAST(round(o_totalprice*100, 0) AS BIGINT) AS v FROM orders),
        |med AS (SELECT g, quantile_cont(v, 0.5) AS m FROM base GROUP BY 1),
        |dev AS (SELECT base.g, abs(2*base.v - CAST(round(2*med.m, 0) AS BIGINT)) AS d2
        | FROM base JOIN med USING (g))
        |SELECT med.g AS o_orderstatus, round(med.m, 2) AS med_c,
        | round(quantile_cont(dev.d2, 0.5) / 2.0, 2) AS mad_c
        |FROM dev JOIN med USING (g)
        |GROUP BY 1, med.m ORDER BY 1""".stripMargin,

    // naive form of Dedup.exactSubstringSpans: every-position 40-gram
    // equi-join (a<b), then the identical diagonal-islands merge — a
    // run of consecutive anchors on one diagonal is a maximal span
    "q125_substring_spans" ->
      """WITH grams AS (
        |  SELECT doc_id AS id, p AS pos, substring(text, p, 40) AS g
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(text) - 39, 1))) AS p) t
        |  WHERE p <= length(text) - 39),
        |gf AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 1000),
        |pairs AS (
        |  SELECT a.id AS id_a, a.pos AS pos_a, b.id AS id_b, b.pos AS pos_b
        |  FROM grams a JOIN gf USING (g) JOIN grams b USING (g)
        |  WHERE a.id < b.id),
        |d AS (SELECT *, pos_a - pos_b AS diag,
        |  pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b
        |    ORDER BY pos_a) AS isl FROM pairs)
        |SELECT id_a, id_b, CAST(min(pos_a) AS BIGINT) AS start_a,
        | CAST(min(pos_b) AS BIGINT) AS start_b,
        | CAST(count(*) + 39 AS BIGINT) AS span_len
        |FROM d GROUP BY id_a, id_b, diag, isl
        |ORDER BY id_a, id_b, start_a, start_b""".stripMargin,

    // q125's span CTEs, then per-losing-doc interval merge (islands on
    // running max end; s > prev-e breaks, touch coalesces — mirrors the
    // Scala merge rule exactly), kept segments via lag(e), and an md5
    // of the reassembled text
    "q126_substring_removal" ->
      """WITH grams AS (
        |  SELECT doc_id AS id, p AS pos, substring(text, p, 40) AS g
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(text) - 39, 1))) AS p) t
        |  WHERE p <= length(text) - 39),
        |gf AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 1000),
        |pairs AS (
        |  SELECT a.id AS id_a, a.pos AS pos_a, b.id AS id_b, b.pos AS pos_b
        |  FROM grams a JOIN gf USING (g) JOIN grams b USING (g)
        |  WHERE a.id < b.id),
        |d AS (SELECT *, pos_a - pos_b AS diag,
        |  pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b
        |    ORDER BY pos_a) AS isl FROM pairs),
        |spans AS (
        |  SELECT id_b AS id, min(pos_b) AS s, min(pos_b) + count(*) + 39 AS e
        |  FROM d GROUP BY id_a, id_b, diag, isl),
        |m AS (SELECT id, s, e, CASE WHEN s > coalesce(max(e) OVER (PARTITION BY id
        |        ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk FROM spans),
        |g2 AS (SELECT *, sum(brk) OVER (PARTITION BY id ORDER BY s, e) AS grp FROM m),
        |iv AS (SELECT id, min(s) AS s, max(e) AS e FROM g2 GROUP BY id, grp),
        |seg AS (SELECT id, coalesce(lag(e) OVER (PARTITION BY id ORDER BY s), 1) AS ks,
        |        s AS ke FROM iv),
        |tl AS (SELECT id, max(e) AS ks FROM iv GROUP BY id),
        |pieces AS (
        |  SELECT s.id, s.ks,
        |    substring(doc.text, CAST(s.ks AS INT), CAST(s.ke - s.ks AS INT)) AS p
        |  FROM seg s JOIN documents doc ON doc.doc_id = s.id
        |  UNION ALL
        |  SELECT t.id, t.ks, substring(doc.text, CAST(t.ks AS INT)) AS p
        |  FROM tl t JOIN documents doc ON doc.doc_id = t.id),
        |clean AS (SELECT id, string_agg(p, '' ORDER BY ks) AS ct FROM pieces GROUP BY id),
        |acct AS (SELECT id, CAST(count(*) AS BIGINT) AS n_cut,
        |         CAST(sum(e - s) AS BIGINT) AS removed_chars FROM iv GROUP BY id)
        |SELECT doc.doc_id AS id, coalesce(acct.n_cut, 0) AS n_cut,
        |  coalesce(acct.removed_chars, 0) AS removed_chars,
        |  CAST(length(coalesce(clean.ct, doc.text)) AS BIGINT) AS clean_len,
        |  md5(coalesce(clean.ct, doc.text)) AS clean_md5
        |FROM documents doc
        |LEFT JOIN acct ON acct.id = doc.doc_id
        |LEFT JOIN clean ON clean.id = doc.doc_id
        |ORDER BY id""".stripMargin,

    // q125's naive form on the self half-plane: same-doc anchor pairs
    // (pos_a < pos_b), same diagonal-islands merge, L=15
    "q130_selfrepeat_spans" ->
      """WITH grams AS (
        |  SELECT doc_id AS id, p AS pos, substring(text, p, 15) AS g
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(text) - 14, 1))) AS p) t
        |  WHERE p <= length(text) - 14),
        |gf AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 1000),
        |pairs AS (
        |  SELECT a.id AS id, a.pos AS pos_a, b.pos AS pos_b
        |  FROM grams a JOIN gf USING (g) JOIN grams b USING (g)
        |  WHERE a.id = b.id AND a.pos < b.pos),
        |d AS (SELECT *, pos_a - pos_b AS diag,
        |  pos_a - row_number() OVER (PARTITION BY id, pos_a - pos_b
        |    ORDER BY pos_a) AS isl FROM pairs)
        |SELECT id, CAST(min(pos_a) AS BIGINT) AS start_a,
        | CAST(min(pos_b) AS BIGINT) AS start_b,
        | CAST(count(*) + 14 AS BIGINT) AS span_len
        |FROM d GROUP BY id, diag, isl
        |ORDER BY id, start_a, start_b""".stripMargin,

    // q126's removal CTEs with BOTH half-planes in `pairs` (cross-doc
    // a.id < b.id plus within-doc a.pos < b.pos) at L=15 — the cut
    // side is id_b/pos_b in both planes, so the spans CTE is unchanged
    "q131_selfrepeat_removal" ->
      """WITH grams AS (
        |  SELECT doc_id AS id, p AS pos, substring(text, p, 15) AS g
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(text) - 14, 1))) AS p) t
        |  WHERE p <= length(text) - 14),
        |gf AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 1000),
        |pairs AS (
        |  SELECT a.id AS id_a, a.pos AS pos_a, b.id AS id_b, b.pos AS pos_b
        |  FROM grams a JOIN gf USING (g) JOIN grams b USING (g)
        |  WHERE a.id < b.id OR (a.id = b.id AND a.pos < b.pos)),
        |d AS (SELECT *, pos_a - pos_b AS diag,
        |  pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b
        |    ORDER BY pos_a) AS isl FROM pairs),
        |spans AS (
        |  SELECT id_b AS id, min(pos_b) AS s, min(pos_b) + count(*) + 14 AS e
        |  FROM d GROUP BY id_a, id_b, diag, isl),
        |m AS (SELECT id, s, e, CASE WHEN s > coalesce(max(e) OVER (PARTITION BY id
        |        ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk FROM spans),
        |g2 AS (SELECT *, sum(brk) OVER (PARTITION BY id ORDER BY s, e) AS grp FROM m),
        |iv AS (SELECT id, min(s) AS s, max(e) AS e FROM g2 GROUP BY id, grp),
        |seg AS (SELECT id, coalesce(lag(e) OVER (PARTITION BY id ORDER BY s), 1) AS ks,
        |        s AS ke FROM iv),
        |tl AS (SELECT id, max(e) AS ks FROM iv GROUP BY id),
        |pieces AS (
        |  SELECT s.id, s.ks,
        |    substring(doc.text, CAST(s.ks AS INT), CAST(s.ke - s.ks AS INT)) AS p
        |  FROM seg s JOIN documents doc ON doc.doc_id = s.id
        |  UNION ALL
        |  SELECT t.id, t.ks, substring(doc.text, CAST(t.ks AS INT)) AS p
        |  FROM tl t JOIN documents doc ON doc.doc_id = t.id),
        |clean AS (SELECT id, string_agg(p, '' ORDER BY ks) AS ct FROM pieces GROUP BY id),
        |acct AS (SELECT id, CAST(count(*) AS BIGINT) AS n_cut,
        |         CAST(sum(e - s) AS BIGINT) AS removed_chars FROM iv GROUP BY id)
        |SELECT doc.doc_id AS id, coalesce(acct.n_cut, 0) AS n_cut,
        |  coalesce(acct.removed_chars, 0) AS removed_chars,
        |  CAST(length(coalesce(clean.ct, doc.text)) AS BIGINT) AS clean_len,
        |  md5(coalesce(clean.ct, doc.text)) AS clean_md5
        |FROM documents doc
        |LEFT JOIN acct ON acct.id = doc.doc_id
        |LEFT JOIN clean ON clean.id = doc.doc_id
        |ORDER BY id""".stripMargin,

    // the bloom is engine-side pruning only (no false negatives, false
    // positives verified away) — the oracle is the exact join itself
    "q127_bloom_incremental" ->
      """SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id
        |FROM documents b JOIN documents c
        |  ON substring(b.text, 1, 80) = substring(c.text, 1, 80)
        |WHERE b.doc_id % 10 = 3 AND c.doc_id % 10 != 3
        |  AND length(b.text) >= 80 AND length(c.text) >= 80
        |ORDER BY batch_id, corpus_id""".stripMargin,

    // q35's brute-force CTEs and q36's LSH CTEs, composed: recall@5 =
    // |lsh top-5 ∩ brute top-5| / 5 per query
    "q129_ann_recall" -> {
      val planes =
        s"""SELECT p, list_transform(generate_series(0,63), j -> ${duckPlane("p", "j")}) AS c
           |FROM (SELECT unnest(generate_series(0,3)) AS p)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |bs AS (SELECT query_id, e.vec_id AS neighbor_id,
         |  round(${duckCos("qv", "e.v")}, 4) AS cos
         | FROM e CROSS JOIN bq WHERE e.vec_id <> query_id),
         |br AS (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         | FROM bs),
         |btop AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= 5),
         |pl AS ($planes),
         |proj AS (SELECT vec_id, p, list_dot_product(v, c) AS proj FROM e CROSS JOIN pl),
         |bkt AS (SELECT vec_id,
         |  CAST(SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
         | FROM proj GROUP BY 1),
         |ev AS (SELECT e.vec_id, e.v, bkt.bucket FROM e JOIN bkt ON e.vec_id = bkt.vec_id),
         |ls AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  round(${duckCos("q.v", "c.v")}, 4) AS cos
         | FROM ev c JOIN ev q ON c.bucket = q.bucket
         | WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |lr AS (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         | FROM ls),
         |ltop AS (SELECT query_id, neighbor_id FROM lr WHERE rnk <= 5),
         |tot AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM btop GROUP BY 1),
         |hits AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hit
         | FROM btop b JOIN ltop l
         |   ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
         | GROUP BY 1)
         |SELECT tot.query_id AS query_id, tot.n_truth,
         |  CAST(coalesce(hits.n_hit, 0) AS BIGINT) AS n_hit,
         |  round(coalesce(hits.n_hit, 0) * 1.0 / tot.n_truth, 4) AS recall
         |FROM tot LEFT JOIN hits ON tot.query_id = hits.query_id
         |ORDER BY tot.query_id""".stripMargin
    },

    // the oracle is the FULL recompute over the v2 snapshot: matching
    // hashes prove the engine's incremental maintenance (v1 agg +
    // changelog deltas) lands on the identical aggregate
    "q128_incremental_agg" ->
      """WITH base AS (SELECT o_orderkey, o_orderpriority AS g,
        |  CAST(round(o_totalprice*100, 0) AS BIGINT) AS v FROM orders),
        |v2 AS (SELECT g, CASE WHEN o_orderkey % 10 = 7 THEN v + 100 ELSE v END AS v
        |       FROM base WHERE o_orderkey % 10 != 5)
        |SELECT g, CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM v2 GROUP BY g ORDER BY g""".stripMargin,

    "q85_repetition_metrics" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-1),
         |        i -> tk[i] || ' ' || tk[i+1])) AS g FROM t WHERE len(tk) >= 2),
         |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
         |a2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
         |        CAST(MAX(c) AS BIGINT) AS top_2gram_n FROM c2 GROUP BY 1),
         |g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-2),
         |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
         |       FROM t WHERE len(tk) >= 3),
         |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
         |a3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_3grams,
         |        CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_3gram_occ
         |       FROM c3 GROUP BY 1)
         |SELECT t.doc_id,
         | COALESCE(a2.n_2grams, 0) AS n_2grams,
         | COALESCE(a2.top_2gram_n, 0) AS top_2gram_n,
         | COALESCE(a3.n_3grams, 0) AS n_3grams,
         | COALESCE(a3.dup_3gram_occ, 0) AS dup_3gram_occ,
         | round(CASE WHEN COALESCE(a2.n_2grams, 0) > 0
         |   THEN CAST(a2.top_2gram_n AS DOUBLE)/a2.n_2grams ELSE 0.0 END, 4) AS top_2gram_ratio,
         | round(CASE WHEN COALESCE(a3.n_3grams, 0) > 0
         |   THEN CAST(a3.dup_3gram_occ AS DOUBLE)/a3.n_3grams ELSE 0.0 END, 4) AS dup_3gram_ratio
         |FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q86_pii_redact" ->
      s"""WITH w AS (SELECT doc_id, text || ' mail u' || CAST(doc_id AS VARCHAR)
         |  || '@h' || CAST(doc_id % 100 AS VARCHAR) || '.example.com'
         |  || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         |  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |  || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |  || '.' || CAST((doc_id*7) % 256 AS VARCHAR) AS text FROM documents),
         |e AS (SELECT doc_id, text,
         |  regexp_replace(text, '${Curation.EmailPattern}', '<EMAIL>', 'g') AS t1 FROM w),
         |p AS (SELECT doc_id, text, t1,
         |  regexp_replace(t1, '${Curation.PhonePattern}', '<PHONE>', 'g') AS t2 FROM e)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '${Curation.EmailPattern}')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(t1, '${Curation.PhonePattern}')) AS BIGINT) AS n_phones,
         | CAST(len(regexp_extract_all(t2, '${Curation.Ipv4Pattern}')) AS BIGINT) AS n_ips,
         | md5(regexp_replace(t2, '${Curation.Ipv4Pattern}', '<IP>', 'g')) AS red_hash
         |FROM p ORDER BY doc_id""".stripMargin,

    // chunk geometry (nc, the [s:e] slice) mirrors Chunking.numChunks /
    // chunkTokens: one chunk starts every 12 tokens while any token is
    // uncovered; DuckDB list slicing is 1-based inclusive and clamps
    "q87_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |n AS (SELECT doc_id, tk,
         |  CASE WHEN len(tk) <= 16 THEN 1
         |       ELSE 1 + CAST(ceil((len(tk)-16)/12.0) AS INT) END AS nc FROM t),
         |c AS (SELECT doc_id, tk, unnest(generate_series(1, nc)) AS i FROM n),
         |s AS (SELECT doc_id, CAST(i-1 AS BIGINT) AS chunk_idx,
         |  array_to_string(tk[(i-1)*12+1 : (i-1)*12+16], ' ') AS chunk FROM c)
         |SELECT doc_id AS id, chunk_idx,
         | CAST(CASE WHEN length(trim(chunk)) = 0 THEN 0
         |   ELSE len(string_split_regex(trim(chunk), '\\s+')) END AS BIGINT) AS n_tokens,
         | md5(chunk) AS chunk_hash
         |FROM s ORDER BY id, chunk_idx""".stripMargin,

    "q88_seq_packing" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
         | FROM documents),
         |o AS (SELECT doc_id, n_tokens,
         |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
         | FROM t)
         |SELECT doc_id, n_tokens, CAST(tok_offset AS BIGINT) AS tok_offset,
         | CAST(tok_offset // 256 AS BIGINT) AS start_pack,
         | CAST(CASE WHEN n_tokens > 0 THEN (tok_offset + n_tokens - 1) // 256
         |      ELSE tok_offset // 256 END AS BIGINT) AS end_pack,
         | CAST(tok_offset % 256 AS BIGINT) AS pack_offset
         |FROM o ORDER BY doc_id""".stripMargin,

    "q89_boilerplate_ratio" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |g AS (SELECT doc_id AS id, unnest(
         |  CASE WHEN len(tk) < 3 THEN [${duckHash("array_to_string(tk, ' ')", 15)}]
         |       ELSE list_transform(generate_series(1, len(tk)-2),
         |         i -> ${duckHash("array_to_string(tk[i:i+2], ' ')", 15)}) END) AS g
         | FROM t),
         |occ AS (SELECT id, g, COUNT(*) AS occ FROM g GROUP BY 1, 2),
         |freq AS (SELECT *, COUNT(*) OVER (PARTITION BY g) AS doc_freq FROM occ)
         |SELECT id, CAST(SUM(occ) AS BIGINT) AS n_grams,
         | CAST(SUM(CASE WHEN doc_freq >= 5 THEN occ ELSE 0 END) AS BIGINT) AS n_boiler,
         | round(CAST(SUM(CASE WHEN doc_freq >= 5 THEN occ ELSE 0 END) AS DOUBLE)
         |   / CAST(SUM(occ) AS DOUBLE), 4) AS boiler_ratio
         |FROM freq GROUP BY id ORDER BY id""".stripMargin,

    // one ANSI text, two engines (like q61)
    "q90_exists_subquery" -> ExistsSubqueryQuery,
    "q91_scalar_subquery" -> ScalarSubqueryQuery,

    // quantile_cont matches Spark's interpolated exact percentile; the
    // discrete percentile is spelled out as ANSI percentile_disc
    // semantics (least value with cume_dist >= p) so the definition,
    // not an implementation, is what both engines must satisfy
    "q92_percentile" ->
      """WITH cd AS (SELECT l_returnflag, l_quantity,
        |  cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
        | FROM lineitem),
        |disc AS (SELECT l_returnflag, CAST(min(l_quantity) AS BIGINT) AS p90_disc
        | FROM cd WHERE cd >= 0.9 GROUP BY 1)
        |SELECT l.l_returnflag,
        | round(quantile_cont(l.l_quantity, 0.25), 4) AS p25,
        | round(quantile_cont(l.l_quantity, 0.9), 4) AS p90,
        | any_value(d.p90_disc) AS p90_disc
        |FROM lineitem l JOIN disc d USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q93_regexp_extract_all" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-z]*ar[a-z]*')) AS BIGINT) AS n_matches,
        | md5(COALESCE(array_to_string(regexp_extract_all(text, '[a-z]*ar[a-z]*'), ','), '')) AS match_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q95_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($TOKS) AS word FROM documents),
         |c AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
         |t AS (SELECT COUNT(*) AS total FROM tok)
         |SELECT word, cnt, round(CAST(cnt AS DOUBLE)/total, 6) AS freq
         |FROM c, t WHERE cnt*200 > total
         |ORDER BY cnt DESC, word""".stripMargin,

    "q96_nullsafe_join" ->
      """SELECT n.n_nationkey, n.n_name, r.r_name
        |FROM (SELECT n_nationkey, n_name, nullif(n_regionkey, 2) AS rk FROM nation) n
        |LEFT JOIN (SELECT r_name, nullif(r_regionkey, 2) AS rk FROM region) r
        |ON n.rk IS NOT DISTINCT FROM r.rk
        |ORDER BY n.n_nationkey""".stripMargin,

    // the width_bucket DEFINITION spelled out (like percentile_disc):
    // both engines must satisfy the semantics, not share an implementation
    "q97_histogram" ->
      """WITH b AS (SELECT CAST(CASE WHEN c < 0 THEN 0
        |    WHEN c >= 50000000 THEN 21
        |    ELSE c // 2500000 + 1 END AS BIGINT) AS bucket
        | FROM (SELECT CAST(round(o_totalprice*100, 0) AS BIGINT) AS c FROM orders))
        |SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

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

    // events ts floored to µs (date_trunc) on the DuckDB side so the
    // ns extra precision cannot flip >= / tolerance / tie-break
    // comparisons vs Spark's µs reader
    "q99_join_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        | FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT event_id AS err_event_id, user_id,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        | FROM events WHERE event_type = 'error'),
        |j AS (SELECT p.event_id, e.err_event_id,
        |  row_number() OVER (PARTITION BY p.event_id
        |    ORDER BY e.ts ASC, e.err_event_id ASC) AS rn
        | FROM p JOIN e ON e.user_id = p.user_id
        |  AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 86400 SECOND)
        |SELECT event_id, err_event_id FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q100_interval_overlap" ->
      """WITH iv AS (SELECT o_orderkey AS id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s
        | FROM orders WHERE o_totalprice > 450000),
        |p AS (SELECT a.id AS id,
        |  CAST(least(a.s+7, b.s+7) - greatest(a.s, b.s) + 1 AS BIGINT) AS ov
        | FROM iv a JOIN iv b
        |  ON a.id <> b.id AND a.s <= b.s + 7 AND b.s <= a.s + 7)
        |SELECT id, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
        | CAST(SUM(ov) AS BIGINT) AS sum_overlap_days,
        | CAST(MAX(ov) AS BIGINT) AS max_overlap_days
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q94_date_spine" ->
      """WITH spine AS (SELECT unnest(generate_series(
        |   DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY))::DATE AS day),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |   AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        | GROUP BY 1)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        | COALESCE(daily.n_orders, 0) AS n_orders,
        | COALESCE(daily.rev_c, 0) AS rev_c
        |FROM spine LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin,

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

    "q104_dedup_retention" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text,
         |  md5(regexp_replace(lower(trim(text)),'\\s+',' ','g')) AS fp,
         |  $TOKS AS toks FROM documents),
         |s AS (SELECT doc_id, fp, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop FROM t),
         |q AS (SELECT doc_id, fp,
         |  round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3, 4) AS quality
         | FROM s),
         |r AS (SELECT fp, doc_id, CAST(round(quality*10000, 0) AS BIGINT) AS q,
         |  row_number() OVER (PARTITION BY fp ORDER BY CAST(round(quality*10000, 0) AS BIGINT) DESC, doc_id ASC) AS rn,
         |  COUNT(*) OVER (PARTITION BY fp) AS n_copies
         | FROM q)
         |SELECT fp, doc_id AS keep_id, q AS kept_q, n_copies
         |FROM r WHERE rn = 1 ORDER BY fp""".stripMargin
    },

    "q106_supplier_region_rollup" ->
      """WITH sa AS (SELECT r_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(round(s_acctbal*100,0) AS BIGINT)) AS BIGINT) AS sum_supp_acct_c
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey GROUP BY 1),
        |top AS (SELECT r_name, s_name AS top_supplier,
        |  row_number() OVER (PARTITION BY r_name
        |    ORDER BY CAST(round(s_acctbal*100,0) AS BIGINT) DESC, s_name DESC) AS rn
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |ca AS (SELECT r_name,
        |  CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_debt_customers
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey GROUP BY 1)
        |SELECT sa.r_name, sa.n_suppliers, sa.sum_supp_acct_c,
        | top.top_supplier, ca.n_debt_customers
        |FROM sa JOIN top USING (r_name) JOIN ca USING (r_name)
        |WHERE top.rn = 1 ORDER BY r_name""".stripMargin,

    "q107_part_pricing" ->
      """WITH pa AS (SELECT p_size, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(round(p_retailprice*100,0) AS BIGINT)) AS BIGINT) AS sum_retail_c
        | FROM part GROUP BY 1),
        |ch AS (SELECT p.p_size,
        |  CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100, 0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  COUNT(*) AS n_lineitems
        | FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey GROUP BY 1)
        |SELECT CAST(pa.p_size AS BIGINT) AS p_size, pa.n_parts, pa.sum_retail_c,
        | ch.sum_charge_c, ch.n_lineitems
        |FROM pa JOIN ch USING (p_size) ORDER BY p_size""".stripMargin,

    "q108_metadata_audit" ->
      """SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_meta_chars,
        | CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
        | CAST(SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
        | COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // BPE merge learning: 4 unrolled rounds. Each stage derives pair
    // counts from the current spaced-symbol strings, takes the
    // (cnt DESC, pair ASC) top-1 as a 1-row CTE, and rewrites via plain
    // string replace — replace() is left-to-right non-overlapping in
    // BOTH engines, which is exactly BPE's greedy application order.
    "q110_bpe_vocab" -> {
      def pairs(src: String, c: String) =
        s"""$c AS (SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM
           |  (SELECT freq, unnest(list_transform(
           |     generate_series(1, len(string_split(s,' '))-1),
           |     i -> string_split(s,' ')[i] || ' ' || string_split(s,' ')[i+1])) AS p
           |   FROM $src) GROUP BY 1)""".stripMargin
      def top(c: String, t: String) =
        s"$t AS (SELECT pair, cnt FROM $c ORDER BY cnt DESC, pair LIMIT 1)"
      def apply(src: String, t: String, dst: String) =
        s"""$dst AS (SELECT trim(replace(' '||s||' ', ' '||$t.pair||' ',
           |  ' '||replace($t.pair,' ','')||' ')) AS s, freq FROM $src, $t)""".stripMargin
      s"""WITH w0 AS (SELECT w, COUNT(*) AS freq FROM
         |  (SELECT unnest($TOKS) AS w FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY 1),
         |s0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, freq FROM w0),
         |${pairs("s0", "c1")}, ${top("c1", "t1")}, ${apply("s0", "t1", "s1")},
         |${pairs("s1", "c2")}, ${top("c2", "t2")}, ${apply("s1", "t2", "s2")},
         |${pairs("s2", "c3")}, ${top("c3", "t3")}, ${apply("s2", "t3", "s3")},
         |${pairs("s3", "c4")}, ${top("c4", "t4")}
         |SELECT * FROM (
         | SELECT CAST(1 AS BIGINT) AS rank, pair, replace(pair,' ','') AS merged, cnt AS weighted_count FROM t1
         | UNION ALL SELECT 2, pair, replace(pair,' ',''), cnt FROM t2
         | UNION ALL SELECT 3, pair, replace(pair,' ',''), cnt FROM t3
         | UNION ALL SELECT 4, pair, replace(pair,' ',''), cnt FROM t4)
         |ORDER BY rank""".stripMargin
    },

    // q110's unrolled merge rounds with the word column carried through
    // each rewrite CTE; the final symbol table IS the encoding.
    "q111_bpe_encode" -> {
      def pairs(src: String, c: String) =
        s"""$c AS (SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM
           |  (SELECT freq, unnest(list_transform(
           |     generate_series(1, len(string_split(s,' '))-1),
           |     i -> string_split(s,' ')[i] || ' ' || string_split(s,' ')[i+1])) AS p
           |   FROM $src) GROUP BY 1)""".stripMargin
      def top(c: String, t: String) =
        s"$t AS (SELECT pair, cnt FROM $c ORDER BY cnt DESC, pair LIMIT 1)"
      def apply(src: String, t: String, dst: String) =
        s"""$dst AS (SELECT w, trim(replace(' '||s||' ', ' '||$t.pair||' ',
           |  ' '||replace($t.pair,' ','')||' ')) AS s, freq FROM $src, $t)""".stripMargin
      s"""WITH w0 AS (SELECT w, COUNT(*) AS freq FROM
         |  (SELECT unnest($TOKS) AS w FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY 1),
         |s0 AS (SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, freq FROM w0),
         |${pairs("s0", "c1")}, ${top("c1", "t1")}, ${apply("s0", "t1", "s1")},
         |${pairs("s1", "c2")}, ${top("c2", "t2")}, ${apply("s1", "t2", "s2")},
         |${pairs("s2", "c3")}, ${top("c3", "t3")}, ${apply("s2", "t3", "s3")},
         |${pairs("s3", "c4")}, ${top("c4", "t4")}, ${apply("s3", "t4", "s4")}
         |SELECT w, s AS encoded, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(freq AS BIGINT) AS freq
         |FROM s4 WHERE freq >= 3 ORDER BY w""".stripMargin
    },

    // list() over the same ROWS frame + list_reduce seeds with the first
    // element, exactly like the Spark side's null-seeded aggregate fold;
    // all-integer milli-cent state, `//` == `div` for nonnegative
    // operands (see Relational.ewmaTrailing).
    "q112_ewma" ->
      """WITH p AS (SELECT user_id, event_id, ts,
        |  CAST(round(value*100, 0) AS BIGINT) * 1000 AS v_mc FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL),
        |f AS (SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, v_mc,
        |  list(v_mc) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vs
        | FROM p)
        |SELECT user_id, event_id, ts_s, v_mc,
        |  CAST(list_reduce(vs, (acc, x) -> (3*acc + x) // 4) AS BIGINT) AS ewma_mc
        |FROM f ORDER BY user_id, event_id""".stripMargin,

    // q35 with the label-equality constraint in the join predicate.
    "q113_ann_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS ql, v AS qv FROM e WHERE vec_id < 5),
         |s AS (SELECT query_id, e.vec_id AS neighbor_id,
         |  round(${duckCos("qv", "e.v")}, 4) AS cos
         | FROM e JOIN q ON e.label = q.ql AND e.vec_id <> q.query_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         | FROM s)
         |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

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

    // q31's minhash/band CTEs split into new (id%10=0) and corpus sides;
    // the bucket cap applies to the CORPUS posting list, like the Spark
    // plan. mh covers all docs (per-doc signatures are subset-independent).
    "q115_dedup_incremental" -> lshIncrementalOracle,

    // persisted-band-index ingest finds the SAME pairs (signatures are
    // a pure per-doc function of k/bands/rowsPerBand) — same oracle
    "q206_lsh_ingest" -> lshIncrementalOracle,
  ) ++ oracleSqlRest

  /** q115/q206's shared incremental-LSH oracle: batch band keys vs the
    * corpus's capped band postings, estimate from full signatures.
    */
  private lazy val lshIncrementalOracle: String =
      s"""WITH sh AS ($SHINGLES3),
         |h AS (SELECT id, ${duckHash("sh", 7)} AS h FROM sh),
         |mh AS (SELECT id, i AS hash_idx,
         |  min((h*(2*i+1) + i*40503 + 7) % 2147483647) AS min_hash
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS i) GROUP BY 1,2),
         |bk0 AS (SELECT id, hash_idx // 4 AS band,
         |  md5(string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY hash_idx)) AS band_key
         | FROM mh GROUP BY 1,2),
         |bkN AS (SELECT * FROM bk0 WHERE id % 10 = 0),
         |bkC0 AS (SELECT * FROM bk0 WHERE id % 10 <> 0),
         |bsz AS (SELECT band AS b2, band_key AS k2, COUNT(*) AS n FROM bkC0 GROUP BY 1,2),
         |bkC AS (SELECT bkC0.* FROM bkC0 JOIN bsz ON band = b2 AND band_key = k2
         | WHERE n <= 10000),
         |cand AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
         | FROM bkN n JOIN bkC c ON n.band = c.band AND n.band_key = c.band_key),
         |est AS (SELECT cd.new_id, cd.corpus_id,
         |  round(avg(CASE WHEN ma.min_hash = mb.min_hash THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 4) AS est_jaccard
         | FROM cand cd
         |  JOIN mh ma ON ma.id = cd.new_id
         |  JOIN mh mb ON mb.id = cd.corpus_id AND mb.hash_idx = ma.hash_idx
         | GROUP BY 1,2)
         |SELECT new_id, corpus_id, est_jaccard FROM est
         |WHERE est_jaccard >= 0.25 ORDER BY new_id, corpus_id""".stripMargin

  /** q53/q209's shared multi-probe LSH oracle: 4 seeded hyperplanes,
    * bucket per vector, each query probes its own bucket plus bits 0/1
    * flipped, exact cosine top-5 within the probed buckets.
    */
  /** q152/q213's shared integer BM25 oracle: bits idf, milli-scaled
    * saturation, one canonical division order.
    */
  private lazy val bm25LiteOracle: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
       |dl AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(dl) AS BIGINT) AS n_tokens FROM dl),
       |hits AS (SELECT id, w, CAST(COUNT(*) AS BIGINT) AS tf
       | FROM tok WHERE w IN ($terms) GROUP BY 1, 2),
       |dfr AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY 1),
       |idf AS (SELECT w,
       |  CAST(length(bin(st.n_docs // df)) - 1 AS BIGINT) AS idf_bits
       | FROM dfr, st),
       |sc AS (SELECT hits.id, idf.idf_bits, hits.tf, dl.dl,
       |  (st.n_tokens * 1000) // st.n_docs AS avgdl_m
       | FROM hits JOIN idf USING (w) JOIN dl USING (id) CROSS JOIN st),
       |p AS (SELECT id, idf_bits, tf,
       |  (dl * 1000000) // avgdl_m AS dln_m FROM sc),
       |p2 AS (SELECT id, idf_bits, tf,
       |  (1200 * (250 + (750 * dln_m) // 1000)) // 1000 AS k_m FROM p),
       |a AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       |  CAST(SUM(idf_bits * ((tf * 2200 * 1000) // (tf * 1000 + k_m))) AS BIGINT) AS score_milli
       | FROM p2 GROUP BY 1)
       |SELECT id, n_terms_hit, score_milli FROM a
       |ORDER BY score_milli DESC, id LIMIT 20""".stripMargin
  }

  private lazy val lshMultiprobeOracle: String = {
    val planes =
      s"""SELECT p, list_transform(generate_series(0,63), j -> ${duckPlane("p", "j")}) AS c
         |FROM (SELECT unnest(generate_series(0,3)) AS p)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |pl AS ($planes),
       |proj AS (SELECT vec_id, p, list_dot_product(v, c) AS proj FROM e CROSS JOIN pl),
       |bkt AS (SELECT vec_id,
       |  CAST(SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
       | FROM proj GROUP BY 1),
       |ev AS (SELECT e.vec_id, e.v, bkt.bucket FROM e JOIN bkt ON e.vec_id = bkt.vec_id),
       |qb AS (SELECT vec_id, v,
       |  unnest([bucket, xor(bucket, 1::BIGINT), xor(bucket, 2::BIGINT)]) AS bucket
       | FROM ev WHERE vec_id < 5),
       |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  round(${duckCos("q.v", "c.v")}, 4) AS cos
       | FROM ev c JOIN qb q ON c.bucket = q.bucket
       | WHERE c.vec_id <> q.vec_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
       | FROM s)
       |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** q54/q207's shared IVF-kmeans oracle: deterministic seeded k-means
    * (2 Lloyd rounds, 6dp-rounded means/distances), full assignment,
    * nProbe=2 probe, exact cosine top-5 within the probed lists.
    */
  /** q222's oracle: q54's k-means CTEs trained on the CORPUS split
    * (vec_id%10 != 0) — seeds and both Lloyd rounds see corpus vectors
    * only — then ALL vectors assigned to the frozen result, restricted
    * to the lists containing a batch vector.
    */
  private lazy val ivfUpsertOracle: String = {
    def iter(prev: String, a: String, c: String) =
      s"""$a AS (SELECT sid, v, cid FROM (
         |  SELECT ec.vec_id AS sid, ec.v, $prev.cid,
         |   row_number() OVER (PARTITION BY ec.vec_id
         |     ORDER BY round(ec.vv - 2.0*list_dot_product(ec.v, $prev.cv)
         |       + list_dot_product($prev.cv, $prev.cv), 6), $prev.cid) AS rn
         |  FROM ec CROSS JOIN $prev) t WHERE rn = 1),
         |$c AS (SELECT cid, list(m ORDER BY pos) AS cv FROM (
         |  SELECT cid, pos, round(avg(x), 6) AS m FROM (
         |   SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM $a) u
         |  GROUP BY 1, 2) g GROUP BY 1)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv FROM embeddings),
       |ec AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
       |seed AS (SELECT CAST(row_number() OVER (ORDER BY h, sid) AS BIGINT) AS cid, v AS cv
       | FROM (SELECT vec_id AS sid, v,
       |   ${duckHash("concat('ivf_', CAST(vec_id AS VARCHAR))", 15)} AS h
       |  FROM ec ORDER BY h, sid LIMIT 8) t),
       |${iter("seed", "a1", "c1")},
       |${iter("c1", "a2", "c2")},
       |ad AS (SELECT e.vec_id, c2.cid,
       |  round(e.vv - 2.0*list_dot_product(e.v, c2.cv)
       |    + list_dot_product(c2.cv, c2.cv), 6) AS d
       | FROM e CROSS JOIN c2),
       |asgn AS (SELECT vec_id, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad)
       | WHERE rn = 1),
       |touched AS (SELECT DISTINCT cid FROM asgn WHERE vec_id % 10 = 0)
       |SELECT CAST(asgn.cid AS BIGINT) AS cid,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id) AS ids
       |FROM asgn JOIN touched USING (cid)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private lazy val ivfKmeansOracle: String = {
    val dist = "round(vv - 2.0*list_dot_product(v, cv) + list_dot_product(cv, cv), 6)"
    def iter(prev: String, a: String, c: String) =
      s"""$a AS (SELECT sid, v, cid FROM (
         |  SELECT e.vec_id AS sid, e.v, $prev.cid,
         |   row_number() OVER (PARTITION BY e.vec_id
         |     ORDER BY round(e.vv - 2.0*list_dot_product(e.v, $prev.cv)
         |       + list_dot_product($prev.cv, $prev.cv), 6), $prev.cid) AS rn
         |  FROM e CROSS JOIN $prev) t WHERE rn = 1),
         |$c AS (SELECT cid, list(m ORDER BY pos) AS cv FROM (
         |  SELECT cid, pos, round(avg(x), 6) AS m FROM (
         |   SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM $a) u
         |  GROUP BY 1, 2) g GROUP BY 1)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv FROM embeddings),
       |seed AS (SELECT CAST(row_number() OVER (ORDER BY h, sid) AS BIGINT) AS cid, v AS cv
       | FROM (SELECT vec_id AS sid, v,
       |   ${duckHash("concat('ivf_', CAST(vec_id AS VARCHAR))", 15)} AS h
       |  FROM e ORDER BY h, sid LIMIT 8) t),
       |${iter("seed", "a1", "c1")},
       |${iter("c1", "a2", "c2")},
       |ad AS (SELECT e.vec_id AS neighbor_id, e.v, c2.cid, $dist AS d
       | FROM e CROSS JOIN c2),
       |asgn AS (SELECT neighbor_id, v, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY d, cid) AS rn FROM ad)
       | WHERE rn = 1),
       |pd AS (SELECT e.vec_id AS query_id, e.v AS qv, c2.cid, $dist AS d
       | FROM e CROSS JOIN c2 WHERE e.vec_id < 5),
       |probes AS (SELECT query_id, qv, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS rn FROM pd)
       | WHERE rn <= 2),
       |s AS (SELECT query_id, neighbor_id, round(${duckCos("qv", "asgn.v")}, 4) AS cos
       | FROM probes JOIN asgn USING (cid) WHERE query_id <> neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
       | FROM s)
       |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** The oracle map's tail (split only so [[lshIncrementalOracle]] can
    * sit between the two literals without a forward reference).
    */
  private lazy val oracleSqlRest: Map[String, String] = Map(

    // q30's common-shingle CTEs with the asymmetric containment ratios.
    "q116_dedup_containment" ->
      s"""WITH sh AS ($SHINGLES3),
         |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY 1),
         |df AS (SELECT sh AS s2, COUNT(*) AS d FROM sh GROUP BY 1),
         |kept AS (SELECT sh.* FROM sh JOIN df ON sh = s2 WHERE d <= 10000),
         |hs AS (SELECT id, ${duckHash("sh", 15)} AS h FROM kept),
         |common AS (
         | SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
         | FROM hs a JOIN hs b ON a.h = b.h AND a.id < b.id GROUP BY 1,2)
         |SELECT id_a, id_b, c AS n_common,
         | round(CAST(c AS DOUBLE)/na.n, 4) AS c_ab,
         | round(CAST(c AS DOUBLE)/nb.n, 4) AS c_ba
         |FROM common JOIN sizes na ON na.id = id_a JOIN sizes nb ON nb.id = id_b
         |WHERE greatest(round(CAST(c AS DOUBLE)/na.n, 4),
         |               round(CAST(c AS DOUBLE)/nb.n, 4)) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    // The aHash recomputed analytically from mediaWithDupImages' cell
    // formula (cell-constant gray, so no PNG decode is needed): per-cell
    // integer sums/counts, threshold by cross-multiplication, candidates
    // by 3-chunk pigeonhole over the ordered bit string, exact per-cell
    // Hamming on candidates — recall is exact for Hamming<=2, matching
    // the Spark side's banding by the same pigeonhole argument.
    "q117_image_phash_dedup" ->
      """WITH dim AS (SELECT doc_id AS id, (doc_id % 16) + 8 AS w,
        |  (doc_id % 12) + 8 AS h, doc_id // 10 AS gid
        | FROM documents WHERE doc_id % 2 = 0),
        |xs AS (SELECT id, unnest(generate_series(0, w-1)) AS x FROM dim),
        |ys AS (SELECT id, unnest(generate_series(0, h-1)) AS y FROM dim),
        |px AS (SELECT d.id, (x*8)//d.w AS cx, (y*8)//d.h AS cy,
        |  CASE WHEN ((CAST(concat('0x', substr(md5(CAST(d.gid AS VARCHAR)),1,15)) AS BIGINT)
        |              >> ((((y*8)//d.h)*8 + (x*8)//d.w) % 60)) & 1) = 1
        |       THEN 220 ELSE 30 END AS v
        | FROM dim d JOIN xs ON xs.id = d.id JOIN ys ON ys.id = d.id),
        |cell AS (SELECT id, cy*8 + cx AS k, SUM(v) AS cs, COUNT(*) AS cn
        | FROM px GROUP BY 1, 2),
        |tot AS (SELECT id, SUM(v) AS ts, COUNT(*) AS tn FROM px GROUP BY 1),
        |bits AS (SELECT cell.id, k,
        |  CASE WHEN cs*tn > ts*cn THEN '1' ELSE '0' END AS b
        | FROM cell JOIN tot ON cell.id = tot.id),
        |bs AS (SELECT id, string_agg(b, '' ORDER BY k) AS s FROM bits GROUP BY 1),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
        | FROM bs a JOIN bs b ON a.id < b.id AND (
        |   substr(a.s, 1, 22) = substr(b.s, 1, 22) OR
        |   substr(a.s, 23, 21) = substr(b.s, 23, 21) OR
        |   substr(a.s, 44, 21) = substr(b.s, 44, 21))),
        |ham AS (SELECT id_a, id_b, CAST(list_sum(list_transform(
        |   generate_series(1, 64),
        |   i -> CASE WHEN substr(sa, i, 1) <> substr(sb, i, 1) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        | FROM cand)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // The audio fingerprint recomputed analytically from the
    // AudioCodec.dup* formulas (window-constant amplitude and exact
    // 64-sample-multiple durations => bit k reduces to amp_k*64 >
    // sum(amp); no WAV ever decoded). Candidates via the same 3-chunk
    // pigeonhole over the ordered bit string as q117, exact per-bit
    // Hamming on candidates.
    "q132_audio_fingerprint_dedup" ->
      """WITH dim AS (SELECT doc_id AS id, doc_id // 10 AS gid,
        |  ((doc_id % 10) * 11) % 64 AS fw
        | FROM documents WHERE doc_id % 2 = 1),
        |hsh AS (SELECT id, fw,
        |  CAST(concat('0x', substr(md5(CAST(gid AS VARCHAR)),1,15)) AS BIGINT) AS hp
        | FROM dim),
        |amp AS (SELECT id, k,
        |  CASE WHEN (((hp >> (k % 60)) & 1) = 1) != (k = fw)
        |       THEN 240 ELSE 10 END AS a
        | FROM hsh, LATERAL (SELECT unnest(generate_series(0, 63)) AS k) t),
        |tot AS (SELECT id, SUM(a) AS ta FROM amp GROUP BY 1),
        |bits AS (SELECT amp.id, k,
        |  CASE WHEN a*64 > ta THEN '1' ELSE '0' END AS b
        | FROM amp JOIN tot ON amp.id = tot.id),
        |bs AS (SELECT id, string_agg(b, '' ORDER BY k) AS s FROM bits GROUP BY 1),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
        | FROM bs a JOIN bs b ON a.id < b.id AND (
        |   substr(a.s, 1, 22) = substr(b.s, 1, 22) OR
        |   substr(a.s, 23, 21) = substr(b.s, 23, 21) OR
        |   substr(a.s, 44, 21) = substr(b.s, 44, 21))),
        |ham AS (SELECT id_a, id_b, CAST(list_sum(list_transform(
        |   generate_series(1, 64),
        |   i -> CASE WHEN substr(sa, i, 1) <> substr(sb, i, 1) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        | FROM cand)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // The video fingerprint recomputed analytically from the
    // VideoCodec.dup* formulas (uniform-gray window-constant frames and
    // exact 64-frame-multiple durations => frame dims and counts cancel
    // and bit k reduces to gray_k*64 > sum(gray); no container ever
    // parsed). 'v' prefix decorrelates the group pattern from q132's.
    // Candidates via the same 3-chunk pigeonhole as q117/q132.
    "q134_video_fingerprint_dedup" -> videoFpDedupOracle,

    // every-2nd-frame decode sees one frame per 2-wide constant window
    // => identical fingerprint, identical dedup pairs: same oracle
    "q204_video_fp_dedup_sampled" -> videoFpDedupOracle,

    // q118's analytic per-frame oracle restricted to the sampled (even)
    // container frames — frame_idx keeps the original index
    "q205_video_frames_sampled" ->
      """WITH v AS (SELECT doc_id AS id, (doc_id % 12) + 8 AS w,
        |  (doc_id % 10) + 8 AS h, (doc_id % 4) + 2 AS nf
        | FROM documents WHERE doc_id % 2 = 1),
        |f AS (SELECT id, w, h,
        |  unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS fi FROM v),
        |px AS (SELECT id, w, h, fi, id*1000 + fi AS seed, x, y FROM f
        | CROSS JOIN (SELECT unnest(generate_series(0, 18)) AS x)
        | CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS y)
        | WHERE x < w AND y < h AND fi % 2 = 0)
        |SELECT id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
        | CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        | CAST(SUM((x*7 + y*11 + seed*3) % 256) AS BIGINT) AS sum_r,
        | CAST(SUM((x*13 + y*5 + seed*7) % 256) AS BIGINT) AS sum_g,
        | CAST(SUM((x*3 + y*17 + seed*11) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,

    // Same integer-scaled association score as the engine: DuckDB's
    // `//` and Spark's `div` both floor for positive Longs, so the
    // PMI ranking and the score values are engine-exact
    "q135_pmi_collocations" ->
      s"""WITH tt AS (SELECT $TOKS AS t FROM documents),
         |uc AS (SELECT w, COUNT(*) AS cnt
         |  FROM (SELECT unnest(t) AS w FROM tt) GROUP BY 1),
         |bc AS (SELECT gram, COUNT(*) AS cnt_ab FROM (
         |  SELECT unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
         |    ELSE list_transform(generate_series(1, len(t)-1),
         |      i -> array_to_string(t[i:i+1], ' ')) END) AS gram FROM tt) g
         | GROUP BY 1 HAVING COUNT(*) >= 5),
         |sp AS (SELECT string_split(gram, ' ')[1] AS w1,
         |  string_split(gram, ' ')[2] AS w2, cnt_ab FROM bc),
         |j AS (SELECT sp.w1, sp.w2, sp.cnt_ab, a.cnt AS cnt_a, b.cnt AS cnt_b
         |  FROM sp JOIN uc a ON sp.w1 = a.w JOIN uc b ON sp.w2 = b.w)
         |SELECT w1, w2, cnt_ab,
         | cnt_ab * 1000000 // (cnt_a * cnt_b) AS score
         |FROM j ORDER BY score DESC, cnt_ab DESC, w1, w2 LIMIT 50""".stripMargin,

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

    // Analytic twin of VideoCodec: frame f of odd doc_id draws the
    // ImageCodec pattern at seed id*1000 + f over w = (id%12)+8 (max
    // 19), h = (id%10)+8 (max 17) — PNG frames are lossless, so the
    // oracle derives every frame's pixel sums from the formula alone.
    "q118_video_decode" ->
      """WITH v AS (SELECT doc_id AS id, (doc_id % 12) + 8 AS w,
        |  (doc_id % 10) + 8 AS h, (doc_id % 4) + 2 AS nf
        | FROM documents WHERE doc_id % 2 = 1),
        |f AS (SELECT id, w, h,
        |  unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS fi FROM v),
        |px AS (SELECT id, w, h, fi, id*1000 + fi AS seed, x, y FROM f
        | CROSS JOIN (SELECT unnest(generate_series(0, 18)) AS x)
        | CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS y)
        | WHERE x < w AND y < h)
        |SELECT id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
        | CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        | CAST(SUM((x*7 + y*11 + seed*3) % 256) AS BIGINT) AS sum_r,
        | CAST(SUM((x*13 + y*5 + seed*7) % 256) AS BIGINT) AS sum_g,
        | CAST(SUM((x*3 + y*17 + seed*11) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,

    "q109_locf_gapfill" ->
      """WITH spine AS (SELECT unnest(generate_series(
        |   DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY))::DATE AS day),
        |keys AS (SELECT DISTINCT o_orderpriority FROM orders),
        |daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
        |  CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |   AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        | GROUP BY 1, 2),
        |grid AS (SELECT k.o_orderpriority, s.day, d.rev_c
        | FROM keys k CROSS JOIN spine s
        | LEFT JOIN daily d ON d.o_orderpriority = k.o_orderpriority AND d.day = s.day)
        |SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day,
        | COALESCE(last_value(rev_c IGNORE NULLS) OVER (
        |   PARTITION BY o_orderpriority ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS rev_locf_c,
        | rev_c IS NOT NULL AS is_observed
        |FROM grid ORDER BY o_orderpriority, day""".stripMargin,

    // q63/q84's simhash edge CTEs (validated by those oracles), then 3
    // PageRank iterations UNROLLED with DuckDB's integral `//` mirroring
    // Spark's `div` — scaled-long arithmetic is the only way iterative
    // float-free ranks hash-match across engines
    "q105_pagerank_dupgraph" ->
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |e AS (SELECT id_a AS u, id_b AS v FROM p UNION ALL SELECT id_b, id_a FROM p),
         |deg AS (SELECT u AS id, COUNT(*) AS d FROM e GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |r0 AS (SELECT id, d, CAST(1000000000 AS BIGINT) // nn.n AS r FROM deg, nn),
         |s1 AS (SELECT e.v AS id, CAST(SUM(r0.r // r0.d) AS BIGINT) AS s FROM e JOIN r0 ON e.u = r0.id GROUP BY 1),
         |r1 AS (SELECT deg.id, deg.d,
         |  (15 * (CAST(1000000000 AS BIGINT) // nn.n)) // 100 + (85 * COALESCE(s1.s, 0)) // 100 AS r
         | FROM deg LEFT JOIN s1 USING (id), nn),
         |s2 AS (SELECT e.v AS id, CAST(SUM(r1.r // r1.d) AS BIGINT) AS s FROM e JOIN r1 ON e.u = r1.id GROUP BY 1),
         |r2 AS (SELECT deg.id, deg.d,
         |  (15 * (CAST(1000000000 AS BIGINT) // nn.n)) // 100 + (85 * COALESCE(s2.s, 0)) // 100 AS r
         | FROM deg LEFT JOIN s2 USING (id), nn),
         |s3 AS (SELECT e.v AS id, CAST(SUM(r2.r // r2.d) AS BIGINT) AS s FROM e JOIN r2 ON e.u = r2.id GROUP BY 1),
         |r3 AS (SELECT deg.id, deg.d,
         |  (15 * (CAST(1000000000 AS BIGINT) // nn.n)) // 100 + (85 * COALESCE(s3.s, 0)) // 100 AS r
         | FROM deg LEFT JOIN s3 USING (id), nn)
         |SELECT id AS doc_id, r AS rank_scaled, d AS degree
         |FROM r3 ORDER BY doc_id""".stripMargin,

    // same oracle as q51: the histogram formulation must reproduce the
    // buffered exact percentile bit-for-bit
    "q101_histogram_percentile" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(CAST(round(o_totalprice*100,0) AS BIGINT), 0.5), 2) AS median_c,
        | round(quantile_cont(CAST(round(o_totalprice*100,0) AS BIGINT), 0.25), 2) AS q1_c,
        | round(quantile_cont(CAST(round(o_totalprice*100,0) AS BIGINT), 0.75), 2) AS q3_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // The oracle recomputes the KMV sketch itself (distinct salted
    // hashes -> k smallest via row_number) and the (k-1)·2^60/h_k
    // estimator in HUGEINT — the estimate hash-compares exactly, unlike
    // q39's engine-private HLL state
    "q137_kmv_distinct" -> kmvWholeCorpusOracle,

    // q168's merged half-sketches must equal the WHOLE-corpus sketch
    // bit-for-bit — mergeability IS the claim, so the oracle is q137's
    // whole-corpus SQL verbatim
    "q168_kmv_merge" -> kmvWholeCorpusOracle,

    // the sketch cells are a pure function of the corpus: row r's hash
    // is bits [15r, 15r+15) of ONE 60-bit md5 hash (Sketches.cmsBuild
    // scaladoc), so the oracle rebuilds the identical d x w cell table
    // and takes the same min over rows per probe word
    "q138_cms_heavy" -> cmsWholeCorpusOracle,

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

    // the same global max-abs scale and floor(v*127/m) IEEE expression,
    // and an exact integer dot product — no rounding epsilon anywhere
    "q140_int8_ann" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |st AS (SELECT MAX(abs(x)) AS m FROM (SELECT unnest(v) AS x FROM e)),
        |qe AS (SELECT vec_id, list_transform(v, x ->
        |  CASE WHEN st.m <= 0 THEN 0
        |    ELSE CAST(floor(x * 127.0 / st.m) AS BIGINT) END) AS qv
        | FROM e, st),
        |q AS (SELECT vec_id AS query_id, qv AS qq FROM qe WHERE vec_id < 5),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id,
        |  CAST(list_dot_product(qq::DOUBLE[], c.qv::DOUBLE[]) AS BIGINT) AS qdot
        | FROM qe c CROSS JOIN q WHERE c.vec_id <> query_id),
        |r AS (SELECT query_id, neighbor_id, qdot,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY qdot DESC, neighbor_id) AS BIGINT) AS rnk FROM s)
        |SELECT query_id, neighbor_id, qdot, rnk FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

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

    // train-half LM counts + the same integer-bits stupid-backoff CASE;
    // DuckDB's zip-unnest pairs toks[1:n-1] with toks[2:n] positionally
    "q142_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id AS id,
         |  ${duckHash("concat('bglm_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 < 800000 AS is_train,
         |  $TOKS AS toks FROM documents),
         |p AS (SELECT id, is_train,
         |  unnest(toks[1:len(toks)-1]) AS w1, unnest(toks[2:len(toks)]) AS w2
         | FROM t WHERE len(toks) >= 2),
         |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
         | FROM (SELECT unnest(toks) AS w FROM t WHERE is_train) GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM uni),
         |bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_bi
         | FROM p WHERE is_train GROUP BY 1, 2),
         |ev AS (SELECT p.id,
         |  CASE WHEN bi.cnt_bi IS NOT NULL THEN length(bin(u1.cnt // bi.cnt_bi)) - 1
         |    ELSE 3 + length(bin(tot.n // (COALESCE(u2.cnt, 0) + 1))) - 1 END AS cost
         | FROM p LEFT JOIN bi USING (w1, w2)
         | LEFT JOIN uni u1 ON p.w1 = u1.w
         | LEFT JOIN uni u2 ON p.w2 = u2.w
         | CROSS JOIN tot
         | WHERE NOT p.is_train)
         |SELECT id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         | CAST(SUM(cost) AS BIGINT) AS total_bits,
         | CAST((CAST(SUM(cost) AS BIGINT) * 1000) // COUNT(*) AS BIGINT) AS bits_per_1k
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,

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

    // the oracle rebuilds both KMV sketches (k smallest distinct salted
    // hashes), takes the k smallest of their union and counts common
    // membership — the same integers the Spark UDF computes
    "q144_kmv_jaccard" ->
      s"""WITH h AS (SELECT DISTINCT o_orderstatus AS g,
         |  ${duckHash("concat('kj_', CAST(o_custkey AS VARCHAR))", 15)} AS h FROM orders),
         |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
         |sk AS (SELECT g, list(h ORDER BY h) AS buf FROM r WHERE rn <= $KmvK GROUP BY 1),
         |p AS (SELECT a.g AS g_a, b.g AS g_b, a.buf AS ba, b.buf AS bb
         | FROM sk a JOIN sk b ON a.g < b.g),
         |m AS (SELECT g_a, g_b, ba, bb,
         |  list_sort(list_distinct(list_concat(ba, bb)))[1:$KmvK] AS mu FROM p),
         |c AS (SELECT g_a, g_b,
         |  CAST(len(list_filter(mu, x -> list_contains(ba, x) AND list_contains(bb, x))) AS BIGINT) AS n_common,
         |  CAST(len(mu) AS BIGINT) AS m_size FROM m)
         |SELECT g_a, g_b, n_common, m_size,
         | (n_common * 1000000) // m_size AS jaccard_ppm
         |FROM c ORDER BY g_a, g_b""".stripMargin,

    // row-rank trimming is value-equivalent to the engine's histogram
    // contribution formula: ties contribute interchangeably to the sum
    "q145_trimmed_mean" ->
      """WITH x AS (SELECT o_orderstatus,
        |  CAST(round(o_totalprice*100, 0) AS BIGINT) AS v FROM orders),
        |r AS (SELECT o_orderstatus, v,
        |  row_number() OVER (PARTITION BY o_orderstatus ORDER BY v) AS rn,
        |  COUNT(*) OVER (PARTITION BY o_orderstatus) AS n FROM x),
        |t AS (SELECT o_orderstatus, v, n, rn,
        |  (n * 100000) // 1000000 AS lo,
        |  n - (n * 100000) // 1000000 AS hi FROM r)
        |SELECT o_orderstatus, CAST(MAX(n) AS BIGINT) AS n_rows,
        | CAST(COUNT(*) AS BIGINT) AS n_kept,
        | CAST(SUM(v) AS BIGINT) AS sum_c,
        | CAST((CAST(SUM(v) AS BIGINT) * 1000) // COUNT(*) AS BIGINT) AS mean_milli_c
        |FROM t WHERE rn > lo AND rn <= hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q120's integer surprisal feeding rank-derived tercile thresholds:
    // the value at rank r is well-defined under ties, so row_number's
    // arbitrary tie order cannot change t1/t2
    "q146_perplexity_buckets" ->
      s"""WITH toks AS (SELECT doc_id, unnest($TOKS) AS w FROM documents),
         |occ AS (SELECT doc_id, w, COUNT(*) AS occ FROM toks GROUP BY 1, 2),
         |vocab AS (SELECT w, CAST(SUM(occ) AS BIGINT) AS cnt FROM occ GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab),
         |s AS (SELECT occ.doc_id AS id,
         |  CAST((CAST(SUM(occ.occ * (length(bin(tot.n // vocab.cnt)) - 1)) AS BIGINT) * 1000)
         |    // CAST(SUM(occ.occ) AS BIGINT) AS BIGINT) AS bits_per_1k
         | FROM occ JOIN vocab USING (w) CROSS JOIN tot GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
         |r AS (SELECT bits_per_1k, row_number() OVER (ORDER BY bits_per_1k) AS rn FROM s),
         |t AS (SELECT
         |  MIN(CASE WHEN rn >= (nn.n + 2) // 3 THEN bits_per_1k END) AS t1,
         |  MIN(CASE WHEN rn >= (2 * nn.n + 2) // 3 THEN bits_per_1k END) AS t2
         | FROM r, nn),
         |b AS (SELECT d.source AS src,
         |  CASE WHEN s.bits_per_1k <= t.t1 THEN 'head'
         |       WHEN s.bits_per_1k <= t.t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  s.bits_per_1k
         | FROM s JOIN documents d ON s.id = d.doc_id CROSS JOIN t)
         |SELECT src, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST((CAST(SUM(bits_per_1k) AS BIGINT) * 1000) // COUNT(*) AS BIGINT) AS mean_bits_milli
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // round(avg, 6) centroid (the q74 meanPool convention) + the q35
    // cosine form; the lowest-50 cut is (cos, id)-total-ordered
    "q147_centroid_outliers" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |st AS (SELECT i, round(avg(x), 6) AS m FROM
         |  (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e) GROUP BY i),
         |c AS (SELECT list(m ORDER BY i) AS cv FROM st),
         |s AS (SELECT vec_id, round(${duckCos("v", "cv")}, 4) AS cos_centroid
         | FROM e, c)
         |SELECT vec_id, cos_centroid FROM s
         |ORDER BY cos_centroid, vec_id LIMIT 50""".stripMargin,

    // exact df over the distinct (token, doc) pairs; the capped list is
    // the 10 smallest ids — list_sort + slice reproduces the engine's
    // row_number <= cap + sort_array exactly, rendered as a comma-joined
    // string (scalar cell) to match the engine's array_join
    "q148_inverted_index" ->
      s"""WITH p AS (SELECT DISTINCT id, w FROM
         |  (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents))
         |SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
         | array_to_string(list_sort(list(id))[1:10], ',') AS doc_ids
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle joins the exact gram STRINGS (the engine's xxhash64
    // keys are internal — a collision there can only undercount one
    // gram, ~2e-10; the string join is collision-free by construction)
    "q149_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id AS id,
         |  ${duckHash("concat('novel_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 < 800000 AS is_train,
         |  $TOKS AS toks FROM documents),
         |h AS (SELECT id, is_train,
         |  unnest(CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |    ELSE list_transform(generate_series(1, len(toks) - 7),
         |      i -> array_to_string(toks[i:i+7], ' ')) END) AS g FROM t),
         |tr AS (SELECT DISTINCT g FROM h WHERE is_train),
         |ev AS (SELECT h.id, CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END AS unseen
         | FROM h LEFT JOIN tr USING (g) WHERE NOT h.is_train)
         |SELECT id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         | CAST(SUM(unseen) AS BIGINT) AS n_unseen,
         | CAST((CAST(SUM(unseen) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same per-(group, value) weight histogram + 2*cum >= total rule
    "q150_weighted_median" ->
      """WITH x AS (SELECT l_returnflag,
        |  CAST(round(l_extendedprice*100, 0) AS BIGINT) AS v,
        |  CAST(round(l_quantity, 0) AS BIGINT) AS w FROM lineitem),
        |h AS (SELECT l_returnflag, v, CAST(SUM(w) AS BIGINT) AS wv
        | FROM x GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v, wv,
        |  CAST(SUM(wv) OVER (PARTITION BY l_returnflag ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(SUM(wv) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        | FROM h)
        |SELECT l_returnflag, MAX(tot) AS w_total, MIN(v) AS wmedian
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // rank-sum Gini over the (count, multiplicity) histogram: within a
    // tie block the rank set is fixed, so row_number's arbitrary tie
    // order cannot move SUM(rn*c)
    "q151_token_gini" ->
      s"""WITH t AS (SELECT source AS src, unnest($TOKS) AS w FROM documents),
         |cc AS (SELECT src, w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
         |r AS (SELECT src, c,
         |  CAST(row_number() OVER (PARTITION BY src ORDER BY c) AS BIGINT) AS rn
         | FROM cc),
         |a AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_vocab,
         |  CAST(SUM(rn * c) AS BIGINT) AS ranksum
         | FROM r GROUP BY 1)
         |SELECT src, n_tokens, n_vocab,
         | ((2 * ranksum - (n_vocab + 1) * n_tokens) * 1000000)
         |   // (n_vocab * n_tokens) AS gini_ppm
         |FROM a ORDER BY src""".stripMargin,

    // the same integer BM25: bits idf, milli-scaled saturation, one
    // canonical division order
    "q152_bm25_topk" -> bm25LiteOracle,

    // persisted-inverted-index probe scores the SAME docs (the split is
    // definitional: bm25LiteTopK == bm25ProbeTopK over bm25Index, and
    // Long tfs / dls parquet-round-trip losslessly) — same oracle
    "q213_bm25_ingest" -> bm25LiteOracle,

    // the same two stages: rounded prefix-dot candidate cut, exact
    // full-width cosine rerank
    "q153_prefix_rerank_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (embedding::DOUBLE[])[1:16] AS p FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv, p AS qp FROM e WHERE vec_id < 5),
         |s1 AS (SELECT query_id, e.vec_id AS neighbor_id, qv, e.v AS cv,
         |  round(list_dot_product(qp, e.p), 4) AS pdot
         | FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
         |cand AS (SELECT * FROM (SELECT s1.*,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY pdot DESC, neighbor_id) AS crank FROM s1)
         | WHERE crank <= 50),
         |s2 AS (SELECT query_id, neighbor_id,
         |  round(${duckCos("qv", "cv")}, 4) AS cos FROM cand),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk FROM s2)
         |SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    // per-column KMV blocks over the canonicalized source, unioned —
    // the same estimator as q137 in HUGEINT
    "q154_table_profile" -> {
      val cols = Seq("event_id", "event_type", "props", "user_id", "value_cents")
      val blocks = cols.map { c =>
        s"""SELECT '$c' AS "column",
           | (SELECT CAST(COUNT(*) AS BIGINT) FROM src) AS n_rows,
           | (SELECT CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM src) AS n_null,
           | (SELECT CASE WHEN CAST(COUNT(*) AS BIGINT) < $KmvK THEN CAST(COUNT(*) AS BIGINT)
           |   ELSE CAST((CAST(${KmvK - 1} AS HUGEINT) * ${Sketches.HashDomain})
           |     // GREATEST(MAX(h), 1) AS BIGINT) END
           |  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM
           |    (SELECT DISTINCT ${duckHash(s"concat('prof_', CAST($c AS VARCHAR))", 15)} AS h
           |     FROM src WHERE $c IS NOT NULL))
           |  WHERE rn <= $KmvK) AS est_distinct""".stripMargin
      }
      s"""WITH src AS (SELECT event_id, event_type, props, user_id,
         |  CAST(round(value*100, 0) AS BIGINT) AS value_cents FROM events)
         |""".stripMargin + blocks.mkString("\nUNION ALL\n") +
        "\nORDER BY \"column\""
    },

    // the same sufficient statistics in HUGEINT and the same Cramer
    // rule through the GENERATED 24-term determinant expansion;
    // HUGEINT holds det magnitudes up to ~sf0.1 corpus sums (bound in
    // the linearFitStats scaladoc)
    "q155_linreg_train" -> {
      def h(c: String) = s"CAST($c AS HUGEINT)"
      val m = Array(
        Array(h("n"), h("s1"), h("s2"), h("s3")),
        Array(h("s1"), h("s11"), h("s12"), h("s13")),
        Array(h("s2"), h("s12"), h("s22"), h("s23")),
        Array(h("s3"), h("s13"), h("s23"), h("s33")))
      val b = Array(h("sy"), h("s1y"), h("s2y"), h("s3y"))
      val names = Seq("intercept", "w_ntok", "w_nstop", "w_nalpha")
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      val weightRows = names.zipWithIndex.map { case (name, j) =>
        val mj = m.map(_.clone())
        (0 to 3).foreach(i => mj(i)(j) = b(i))
        s"""SELECT '$name' AS feature,
           | CAST(((${det4Sql(mj)}) * 1000000) // (${det4Sql(m)}) AS BIGINT) AS weight_ppm
           |FROM st""".stripMargin
      }
      s"""WITH f AS (SELECT
         |  CAST(len($TOKS) AS BIGINT) AS x1,
         |  CAST(len(list_filter($TOKS, t -> t IN ($sw))) AS BIGINT) AS x2,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS x3,
         |  CAST(length(text) AS BIGINT) AS y FROM documents
         | WHERE text IS NOT NULL),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |  CAST(SUM(x3) AS BIGINT) AS s3,
         |  CAST(SUM(x1*x1) AS BIGINT) AS s11, CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |  CAST(SUM(x1*x3) AS BIGINT) AS s13,
         |  CAST(SUM(x2*x2) AS BIGINT) AS s22, CAST(SUM(x2*x3) AS BIGINT) AS s23,
         |  CAST(SUM(x3*x3) AS BIGINT) AS s33,
         |  CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |  CAST(SUM(x2*y) AS BIGINT) AS s2y, CAST(SUM(x3*y) AS BIGINT) AS s3y
         | FROM f)
         |""".stripMargin + weightRows.mkString("\nUNION ALL\n") +
        "\nORDER BY feature"
    },

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

    // replays the exact integer trajectory: quantize once, then one
    // (misclassify -> per-dim delta -> new weights) CTE pair per epoch;
    // integer products stay far below 2^53 so list_dot_product's double
    // accumulation is exact
    "q158_perceptron_train" -> {
      def iter(prevW: String, e: Int) =
        s"""m$e AS (SELECT q.y, q.xq,
           |  CASE WHEN q.y * list_dot_product(q.xq::DOUBLE[], $prevW.w::DOUBLE[]) <= 0
           |   THEN 1 ELSE 0 END AS wrong FROM q, $prevW),
           |d$e AS (SELECT pos, CAST(SUM(CASE WHEN wrong = 1 THEN y * x ELSE 0 END) AS BIGINT) AS dv
           | FROM (SELECT y, wrong, unnest(xq) AS x, generate_subscripts(xq, 1) AS pos FROM m$e) u
           | GROUP BY pos),
           |w$e AS (SELECT list(we.wv + COALESCE(d$e.dv, 0) ORDER BY we.pos) AS w
           | FROM (SELECT unnest(w) AS wv, generate_subscripts(w, 1) AS pos FROM $prevW) we
           | LEFT JOIN d$e USING (pos)),
           |s$e AS (SELECT CAST($e AS BIGINT) AS epoch,
           |  (SELECT CAST(SUM(wrong) AS BIGINT) FROM m$e) AS n_wrong,
           |  (SELECT CAST(SUM(abs(wv)) AS BIGINT)
           |    FROM (SELECT unnest(w) AS wv FROM w$e) x) AS w_l1)""".stripMargin
      val iters = (1 to PerceptronEpochs)
        .map(e => iter(if (e == 1) "w0" else s"w${e - 1}", e))
      val sel = (1 to PerceptronEpochs)
        .map(e => s"SELECT epoch, n_wrong, w_l1 FROM s$e")
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS v,
         |  CASE WHEN label <= $PerceptronPosMax THEN 1 ELSE -1 END AS y
         | FROM embeddings WHERE embedding IS NOT NULL),
         |st AS (SELECT MAX(abs(x)) AS m FROM (SELECT unnest(v) AS x FROM e)),
         |q AS (SELECT y, list_append(list_transform(v, x ->
         |   CASE WHEN st.m <= 0 THEN 0 ELSE CAST(floor(x * 127.0 / st.m) AS BIGINT) END),
         |   127) AS xq FROM e, st),
         |dim AS (SELECT len(xq) AS d FROM q LIMIT 1),
         |w0 AS (SELECT list_transform(generate_series(1, dim.d), i -> CAST(0 AS BIGINT)) AS w
         | FROM dim),
         |${iters.mkString(",\n")}
         |${sel.mkString("\nUNION ALL\n")}
         |ORDER BY epoch""".stripMargin
    },

    // MERGE contract: the merged table IS the new snapshot, so the
    // oracle derives v2 directly from q123's deterministic rules —
    // independent of the diff+apply path entirely
    "q159_merge_upsert" ->
      """SELECT o_orderkey,
        | CAST(CASE WHEN o_orderkey % 10 = 7
        |   THEN round(o_totalprice*100,0) + 100
        |   ELSE round(o_totalprice*100,0) END AS BIGINT) AS total_c
        |FROM orders WHERE o_orderkey % 10 <> 5
        |ORDER BY o_orderkey""".stripMargin,

    // same two-window collapse; previd (not prev) detects the first
    // row so a NULL attribute never fakes a change point
    "q160_scd2_history" ->
      """WITH c AS (SELECT user_id, event_type, ts, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |  lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS previd
        | FROM events),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM c
        | WHERE previd IS NULL OR prev IS DISTINCT FROM event_type),
        |h AS (SELECT user_id, event_type, ts,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt FROM ch)
        |SELECT user_id, event_type,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        | strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
        | vt IS NULL AS is_current
        |FROM h ORDER BY user_id, valid_from, event_type""".stripMargin,

    // q105's simhash-16 edge CTEs + a depth-guarded recursive CTE; the
    // UNION dedups (id, hops) pairs and MIN collapses path lengths, so
    // the recursion is the textbook bounded BFS
    "q161_bfs_hops" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |e AS (SELECT id_a AS u, id_b AS v FROM p UNION ALL SELECT id_b, id_a FROM p),
         |seeds AS (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id % 50 = 0),
         |bfs(id, hops) AS (
         |  SELECT id, 0 FROM seeds
         |  UNION
         |  SELECT e.v, bfs.hops + 1 FROM bfs JOIN e ON e.u = bfs.id
         |  WHERE bfs.hops < $BfsMaxHops)
         |SELECT id AS doc_id, CAST(MIN(hops) AS BIGINT) AS hops
         |FROM bfs GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical md5 coin, then quantile_cont with q101's rounding
    "q162_hashsample_quantile" ->
      s"""WITH s AS (SELECT o_orderstatus,
         |  CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c FROM orders
         | WHERE ${duckHash("concat('qsamp_', CAST(o_orderkey AS VARCHAR))", 15)} % $QsampOneIn = 0)
         |SELECT o_orderstatus,
         | round(quantile_cont(price_c, 0.5), 2) AS est_median_c,
         | round(quantile_cont(price_c, 0.9), 2) AS est_p90_c
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // farthest-first replay: round i carries dmin forward as
    // least(prev, dist-to-new-center) — min is associative, so it
    // equals the engine UDF's fresh min over all chosen centers
    "q163_kcenter_coreset" -> {
      def dist(src: String, ctr: String) =
        s"round($src.vv - 2.0*list_dot_product($src.v, $ctr.v) + $ctr.vv, 6)"
      val rounds = (2 to KCenterK).map { i =>
        val (prevD, prevK) = (s"d${i - 1}", s"k$i")
        val prevCol = if (i == 2) "dmin" else "dmin_c"
        val carry = s"least(d${i - 1}.$prevCol, ${dist(s"d${i - 1}", s"k$i")})"
        s"""k$i AS (SELECT vec_id, v, vv, dmin${if (i == 2) "" else "_c"} AS dsel
           | FROM d${i - 1} ORDER BY dmin${if (i == 2) "" else "_c"} DESC, vec_id LIMIT 1),
           |d$i AS (SELECT ${prevD}.vec_id, ${prevD}.v, ${prevD}.vv,
           |  $carry AS dmin_c FROM $prevD, $prevK)""".stripMargin
      }
      val sel = Seq("SELECT CAST(1 AS BIGINT) AS rank, vec_id AS id, 0.0 AS d2_sel FROM k1") ++
        (2 to KCenterK).map(i =>
          s"SELECT CAST($i AS BIGINT), vec_id, dsel FROM k$i")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv
         | FROM embeddings WHERE embedding IS NOT NULL),
         |k1 AS (SELECT vec_id, v, vv FROM e
         | ORDER BY ${duckHash("concat('kc_', CAST(vec_id AS VARCHAR))", 15)}, vec_id LIMIT 1),
         |d1 AS (SELECT e.vec_id, e.v, e.vv, ${dist("e", "k1")} AS dmin FROM e, k1),
         |${rounds.mkString(",\n")}
         |${sel.mkString("\nUNION ALL\n")}
         |ORDER BY rank""".stripMargin
    },

    // q134's fixture CTEs (md5-bit window grays), then cuts = adjacent
    // window level changes; frame index of window-k's first frame is
    // k * (nf/64); a cut-less video reports first_cut -1
    "q165_video_scene_cuts" ->
      """WITH dim AS (SELECT doc_id AS id, doc_id // 10 AS gid,
        |  ((doc_id % 10) * 11) % 64 AS fw,
        |  64*((doc_id % 2)+1) AS nf
        | FROM documents WHERE doc_id % 2 = 1),
        |hsh AS (SELECT id, fw, nf,
        |  CAST(concat('0x', substr(md5(concat('v', CAST(gid AS VARCHAR))),1,15)) AS BIGINT) AS hp
        | FROM dim),
        |lum AS (SELECT id, nf, k,
        |  CASE WHEN (((hp >> (k % 60)) & 1) = 1) != (k = fw)
        |       THEN 220 ELSE 30 END AS a
        | FROM hsh, LATERAL (SELECT unnest(generate_series(0, 63)) AS k) t),
        |d AS (SELECT cur.id, cur.nf, cur.k, cur.a, prv.a AS pa
        | FROM lum cur JOIN lum prv ON cur.id = prv.id AND prv.k = cur.k - 1),
        |c AS (SELECT id, nf,
        |  CAST(COUNT(CASE WHEN a <> pa THEN 1 END) AS BIGINT) AS n_cuts,
        |  MIN(CASE WHEN a <> pa THEN k END) AS fck
        | FROM d GROUP BY 1, 2)
        |SELECT id AS media_id, CAST(nf AS BIGINT) AS n_frames, n_cuts,
        | CAST(COALESCE(fck * (nf // 64), -1) AS BIGINT) AS first_cut
        |FROM c ORDER BY media_id""".stripMargin,

    // positional adjacency over unnest-with-subscripts; DuckDB arrays
    // are 1-based where Spark's posexplode is 0-based, so first_pos =
    // p0 (SQL) = pos+1 (engine) line up at 1-based
    "q166_phrase_match" -> {
      val conds = PhraseQ166.zipWithIndex
        .map { case (w, i) => s"toks[p0+$i] = '$w'" }.mkString(" AND ")
      s"""WITH t AS (SELECT doc_id AS id, $TOKS AS toks FROM documents),
         |p AS (SELECT id, p0 FROM t, LATERAL (SELECT
         |   unnest(generate_series(1, GREATEST(len(toks)-${PhraseQ166.size - 1}, 0))) AS p0) s
         | WHERE $conds)
         |SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
         | CAST(MIN(p0) AS BIGINT) AS first_pos
         |FROM p GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // unrolled greedy MMR: pick i's score subtracts the max rounded
    // sim against the accumulated sel_{i-1} set; integer 1e-4 units
    // end to end (CAST of the scaled double rounds to nearest, which
    // recovers the exact integer the engine's BigDecimal path yields)
    "q167_mmr_rerank" -> {
      def simM4(a: String, b: String) =
        s"CAST(round(${duckCos(a, b)}, 4) * 10000 AS BIGINT)"
      // every sel_i is referenced twice by round i+1 (max-sim subquery
      // + NOT IN); MATERIALIZED stops DuckDB's default CTE inlining
      // from exponentially re-expanding the chain across rounds
      val rounds = (2 to MmrK).map { i =>
        s"""r$i AS MATERIALIZED (SELECT c.id, c.v, c.rel_m4,
           |  7*c.rel_m4 - 3*(SELECT MAX(${simM4("c.v", "s.v")})
           |    FROM sel${i - 1} s) AS score_m4
           | FROM cand c WHERE c.id NOT IN (SELECT id FROM sel${i - 1})),
           |p$i AS MATERIALIZED (SELECT * FROM r$i ORDER BY score_m4 DESC, id LIMIT 1),
           |sel$i AS MATERIALIZED (SELECT id, v FROM sel${i - 1} UNION ALL SELECT id, v FROM p$i)"""
          .stripMargin
      }
      val sel = Seq(s"SELECT CAST(1 AS BIGINT) AS rank, id AS vec_id, rel_m4, score_m4 FROM p1") ++
        (2 to MmrK).map(i => s"SELECT CAST($i AS BIGINT), id, rel_m4, score_m4 FROM p$i")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         | WHERE embedding IS NOT NULL),
         |q AS (SELECT v FROM e WHERE vec_id = 0),
         |rel AS (SELECT e.vec_id AS id, e.v, ${simM4("e.v", "q.v")} AS rel_m4
         | FROM e, q WHERE e.vec_id <> 0),
         |cand AS MATERIALIZED (SELECT id, v, rel_m4 FROM rel ORDER BY rel_m4 DESC, id LIMIT $MmrCandC),
         |p1 AS MATERIALIZED (SELECT id, v, rel_m4, CAST(7*rel_m4 AS BIGINT) AS score_m4
         | FROM cand ORDER BY rel_m4 DESC, id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT id, v FROM p1),
         |${rounds.mkString(",\n")}
         |${sel.mkString("\nUNION ALL\n")}
         |ORDER BY rank""".stripMargin
    },

    // quantile_cont boundaries (bit-equal to histogramPercentiles per
    // the q101 parity) + the same three broadcast comparisons
    "q169_equidepth_buckets" ->
      """WITH o AS (SELECT CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c FROM orders),
        |b AS (SELECT quantile_cont(price_c, 0.25) AS b1,
        |  quantile_cont(price_c, 0.5) AS b2,
        |  quantile_cont(price_c, 0.75) AS b3 FROM o)
        |SELECT CAST(1 + CAST(price_c > b.b1 AS INT) + CAST(price_c > b.b2 AS INT)
        |   + CAST(price_c > b.b3 AS INT) AS BIGINT) AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n, MIN(price_c) AS min_c,
        | MAX(price_c) AS max_c, CAST(SUM(price_c) AS BIGINT) AS sum_c
        |FROM o, b GROUP BY 1 ORDER BY 1""".stripMargin,

    // fixed expectation literals; leading digit via the string cast of
    // a positive BIGINT, identical on both engines
    "q170_benford_audit" -> {
      val vals = BenfordPpm.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
      s"""WITH c AS (SELECT CAST(round(l_extendedprice*100,0) AS BIGINT) AS c
         | FROM lineitem WHERE round(l_extendedprice*100,0) > 0),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
         |e AS (SELECT * FROM (VALUES $vals) AS t(digit, exp_ppm)),
         |d AS (SELECT CAST(substr(CAST(c AS VARCHAR),1,1) AS BIGINT) AS digit,
         |  COUNT(*) AS n_obs FROM c GROUP BY 1)
         |SELECT d.digit, CAST(d.n_obs AS BIGINT) AS n_obs,
         | CAST(d.n_obs*1000000 // n.n AS BIGINT) AS obs_ppm,
         | CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
         | CAST(d.n_obs*1000000 // n.n - e.exp_ppm AS BIGINT) AS dev_ppm
         |FROM d JOIN e ON d.digit = e.digit, n ORDER BY d.digit""".stripMargin
    },

    // rank-1 row per source over the (source, lang) count table —
    // same (cnt DESC, lang ASC) tie order as the engine's min(struct)
    "q164_group_mode" ->
      """WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
        | FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, lang, cnt,
        |  row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rn,
        |  SUM(cnt) OVER (PARTITION BY source) AS n_docs FROM c)
        |SELECT source, lang AS mode_lang, cnt AS n_mode,
        | CAST(n_docs AS BIGINT) AS n_docs
        |FROM r WHERE rn = 1 ORDER BY source""".stripMargin,

    // the same two ranked lists (cosine / distinct-token Jaccard) and
    // the same integer 1e6//(60+rank) fusion
    "q171_rrf_fusion" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $RrfQueryMax),
         |sc AS (SELECT query_id, e.vec_id AS neighbor_id,
         |  round(${duckCos("qv", "e.v")}, 4) AS cos
         | FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
         |sem AS (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM sc),
         |tok AS (SELECT DISTINCT doc_id AS id, unnest(t) AS w
         | FROM (SELECT doc_id, $TOKS AS t FROM documents)),
         |sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS nt FROM tok GROUP BY 1),
         |qt AS (SELECT id AS query_id, w FROM tok WHERE id < $RrfQueryMax),
         |itr AS (SELECT qt.query_id, tok.id, CAST(COUNT(*) AS BIGINT) AS inter
         | FROM tok JOIN qt USING (w) WHERE tok.id <> qt.query_id GROUP BY 1, 2),
         |jac AS (SELECT itr.query_id, itr.id AS neighbor_id,
         |  (inter * 1000000) // (sz.nt + qs.nt - inter) AS jac_ppm
         | FROM itr JOIN sz ON itr.id = sz.id
         | JOIN sz qs ON itr.query_id = qs.id),
         |lex AS (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY jac_ppm DESC, neighbor_id) AS rank
         | FROM jac),
         |u AS (SELECT query_id, neighbor_id, rank FROM sem WHERE rank <= $RrfListK
         | UNION ALL
         | SELECT query_id, neighbor_id, rank FROM lex WHERE rank <= $RrfListK),
         |f AS (SELECT query_id, neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
         |  CAST(SUM(1000000 // ($RrfDamp + rank)) AS BIGINT) AS rrf_ppm
         | FROM u GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, n_lists, rrf_ppm,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_ppm DESC, neighbor_id) AS BIGINT) AS rnk FROM f)
         |SELECT query_id, neighbor_id, n_lists, rrf_ppm, rnk FROM r
         |WHERE rnk <= $RrfTopK ORDER BY query_id, rnk""".stripMargin,

    // same five integer rules; the LEFT JOIN keeps zero-token docs as
    // rows that fail the word-count rule
    "q172_gopher_rules" -> {
      val stops = GopherStop.map(w => s"'$w'").mkString(", ")
      s"""WITH tok AS (SELECT doc_id AS id, unnest(t) AS w
         | FROM (SELECT doc_id, $TOKS AS t FROM documents)),
         |pd AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(length(w)) AS BIGINT) AS sl,
         |  CAST(MAX(length(w)) AS BIGINT) AS mx,
         |  CAST(COUNT(DISTINCT w) AS BIGINT) AS nd,
         |  CAST(COUNT(DISTINCT CASE WHEN w IN ($stops) THEN w END) AS BIGINT) AS stp
         | FROM tok GROUP BY 1),
         |fl AS (SELECT d.source AS src,
         |  CASE WHEN COALESCE(n, 0) < 25 OR COALESCE(n, 0) > 100 THEN 1 ELSE 0 END AS f_words,
         |  CASE WHEN n IS NULL OR (sl*1000)//n < 4200 OR (sl*1000)//n > 4900 THEN 1 ELSE 0 END AS f_mwl,
         |  CASE WHEN COALESCE(mx, 0) > 10 THEN 1 ELSE 0 END AS f_longword,
         |  CASE WHEN n IS NULL OR (nd*1000)//n < 350 THEN 1 ELSE 0 END AS f_unique,
         |  CASE WHEN COALESCE(stp, 0) < 2 THEN 1 ELSE 0 END AS f_stop
         | FROM documents d LEFT JOIN pd ON d.doc_id = pd.id),
         |a AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(f_words) AS BIGINT) AS f_words,
         |  CAST(SUM(f_mwl) AS BIGINT) AS f_mwl,
         |  CAST(SUM(f_longword) AS BIGINT) AS f_longword,
         |  CAST(SUM(f_unique) AS BIGINT) AS f_unique,
         |  CAST(SUM(f_stop) AS BIGINT) AS f_stop,
         |  CAST(SUM(CASE WHEN f_words + f_mwl + f_longword + f_unique + f_stop = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         | FROM fl GROUP BY 1)
         |SELECT src, n_docs, f_words, f_mwl, f_longword, f_unique, f_stop,
         | n_pass, CAST((n_pass * 1000000) // n_docs AS BIGINT) AS pass_ppm
         |FROM a ORDER BY src""".stripMargin
    },

    // same md5 split, same floor-log2 add-one likelihood bits, same
    // argmin-with-class-tiebreak
    "q173_nb_confusion" ->
      s"""WITH t AS (SELECT doc_id AS id, lang AS actual,
         |  ${duckHash("concat('nb_', CAST(doc_id AS VARCHAR))", 15)} % 1000000 < 800000 AS is_train,
         |  $TOKS AS toks FROM documents),
         |cnt AS (SELECT actual AS cls, w, CAST(COUNT(*) AS BIGINT) AS cnt
         | FROM (SELECT actual, unnest(toks) AS w FROM t WHERE is_train) GROUP BY 1, 2),
         |voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM cnt),
         |totc AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tot_c FROM cnt GROUP BY 1),
         |nd AS (SELECT actual AS cls, CAST(COUNT(*) AS BIGINT) AS nd_c
         | FROM t WHERE is_train GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_cls,
         |  CAST(SUM(nd_c) AS BIGINT) AS n_train FROM nd),
         |cl AS (SELECT cls, tot_c, v,
         |  length(bin((n_train + k_cls) // (nd_c + 1))) - 1 AS prior_bits
         | FROM totc JOIN nd USING (cls) CROSS JOIN voc CROSS JOIN st),
         |ev AS (SELECT id, actual, w, CAST(COUNT(*) AS BIGINT) AS n_w
         | FROM (SELECT id, actual, unnest(toks) AS w FROM t WHERE NOT is_train)
         | GROUP BY 1, 2, 3),
         |sc AS (SELECT ev.id, ev.actual, cl.cls,
         |  MAX(cl.prior_bits) + SUM(ev.n_w *
         |    (length(bin((cl.tot_c + cl.v) // (COALESCE(cnt.cnt, 0) + 1))) - 1)) AS cost
         | FROM ev CROSS JOIN cl
         | LEFT JOIN cnt ON cnt.cls = cl.cls AND cnt.w = ev.w
         | GROUP BY 1, 2, 3),
         |pr AS (SELECT id, actual, cls,
         |  row_number() OVER (PARTITION BY id ORDER BY cost, cls) AS rn FROM sc)
         |SELECT actual, cls AS predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM pr WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q161's simhash dup graph with md5-derived weights; the bounded
    // recursive CTE enumerates every <=4-edge path and takes min cost
    "q174_sssp_cheapest" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |pw AS (SELECT id_a, id_b,
         |  1 + ${duckHash("concat('sp_', CAST(id_a AS VARCHAR), '_', CAST(id_b AS VARCHAR))", 15)} % 9 AS w
         | FROM p),
         |e AS (SELECT id_a AS u, id_b AS v, w FROM pw
         | UNION ALL SELECT id_b, id_a, w FROM pw),
         |seeds AS (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id % 50 = 0),
         |sp(id, dist, hops) AS (
         |  SELECT id, CAST(0 AS BIGINT), 0 FROM seeds
         |  UNION
         |  SELECT e.v, sp.dist + e.w, sp.hops + 1 FROM sp JOIN e ON e.u = sp.id
         |  WHERE sp.hops < $BfsMaxHops)
         |SELECT id AS doc_id, CAST(MIN(dist) AS BIGINT) AS dist
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    // same Monday week truncation, integer day-div-7 offsets, ppm ratio
    "q175_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS w
        | FROM events),
        |c AS (SELECT u, MIN(w) AS cw FROM wk GROUP BY 1),
        |sz AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM c GROUP BY 1),
        |a AS (SELECT c.cw, datediff('day', c.cw, wk.w) // 7 AS offset_w,
        |  CAST(COUNT(*) AS BIGINT) AS n_active
        | FROM wk JOIN c USING (u) GROUP BY 1, 2)
        |SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week,
        | CAST(offset_w AS BIGINT) AS offset_w, n_active, n_cohort,
        | CAST(n_active * 1000000 // n_cohort AS BIGINT) AS retention_ppm
        |FROM a JOIN sz USING (cw) ORDER BY 1, 2""".stripMargin,

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

    // identical integer moment sums; the Pearson ratio is the same IEEE
    // double expression on both engines
    "q177_autocorr_daily" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS v
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT event_type, v AS x,
        |  lead(v) OVER (PARTITION BY event_type ORDER BY day) AS y FROM d),
        |a AS (SELECT event_type AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
        |  CAST(SUM(y*y) AS BIGINT) AS syy
        | FROM p WHERE y IS NOT NULL GROUP BY 1)
        |SELECT grp, n AS n_pairs,
        | round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |  THEN CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
        |  ELSE 0.0 END, 6) AS corr6
        |FROM a ORDER BY grp""".stripMargin,

    // the whole-corpus probe verbatim — the merged half-sketches must
    // reproduce it bit-for-bit
    "q178_cms_merge" -> cmsWholeCorpusOracle,

    // q105's graph with the teleport restricted to the q161 seed set;
    // three unrolled generated rounds
    "q179_ppr_dupgraph" -> {
      val rounds = (1 to 3).map { i =>
        s"""s$i AS (SELECT e.v AS id, CAST(SUM(r${i - 1}.r // r${i - 1}.d) AS BIGINT) AS s
           | FROM e JOIN r${i - 1} ON e.u = r${i - 1}.id GROUP BY 1),
           |r$i AS (SELECT nodes.id, nodes.d, nodes.is_seed,
           |  (CASE WHEN nodes.is_seed
           |    THEN (15 * (CAST(1000000000 AS BIGINT) // ns.n)) // 100 ELSE 0 END)
           |   + (85 * COALESCE(s$i.s, 0)) // 100 AS r
           | FROM nodes LEFT JOIN s$i USING (id), ns)""".stripMargin
      }.mkString(",\n")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |e AS (SELECT id_a AS u, id_b AS v FROM p UNION ALL SELECT id_b, id_a FROM p),
         |deg AS (SELECT u AS id, COUNT(*) AS d FROM e GROUP BY 1),
         |sd AS (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id % 50 = 0),
         |nodes AS (SELECT deg.id, deg.d, (sd.id IS NOT NULL) AS is_seed
         | FROM deg LEFT JOIN sd ON deg.id = sd.id),
         |ns AS (SELECT COUNT(*) AS n FROM nodes WHERE is_seed),
         |r0 AS (SELECT id, d, is_seed,
         |  CASE WHEN is_seed THEN CAST(1000000000 AS BIGINT) // ns.n
         |   ELSE CAST(0 AS BIGINT) END AS r
         | FROM nodes, ns),
         |$rounds
         |SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_scaled, d AS degree
         |FROM r3 ORDER BY doc_id""".stripMargin
    },

    // same pick-then-tolerance semantics: the single last touch is
    // chosen first, and dropped (not replaced) if outside the window
    "q180_attribution" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        | WHERE event_type = 'purchase'),
        |t AS (SELECT event_id AS t_id, user_id, ts AS t_ts,
        |  event_type AS channel FROM events WHERE event_type <> 'purchase'),
        |m AS (SELECT p.event_id, t.channel, t.t_ts, p.ts,
        |  row_number() OVER (PARTITION BY p.event_id
        |    ORDER BY t.t_ts DESC, t.t_id DESC) AS rn
        | FROM p JOIN t ON t.user_id = p.user_id AND t.t_ts <= p.ts),
        |a AS (SELECT event_id, channel FROM m WHERE rn = 1
        |  AND abs(epoch_us(t_ts) - epoch_us(ts)) <= CAST(86400 AS BIGINT) * 1000000),
        |c AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases
        | FROM a GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_purchases) AS BIGINT) AS n_total FROM c)
        |SELECT channel, n_purchases,
        | CAST(n_purchases * 1000000 // n_total AS BIGINT) AS share_ppm
        |FROM c, tot ORDER BY channel""".stripMargin,

    // same per-user lag pairs and exact row-normalized ppm
    "q181_markov_transitions" ->
      """WITH l AS (SELECT event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |tr AS (SELECT prev AS from_type, event_type AS to_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        | FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.n,
        | CAST(tr.n * 1000000 // tot.n_from AS BIGINT) AS p_ppm
        |FROM tr JOIN tot USING (from_type)
        |ORDER BY 1, 2""".stripMargin,

    // the brute-force quadratic join — the engine's prefix filter must
    // reproduce it EXACTLY (prefix filtering has no false negatives)
    "q182_ppjoin" ->
      s"""WITH sh AS ($SHINGLES3),
         |ss AS (SELECT id, list_sort(list(sh)) AS sset FROM sh GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(len(list_intersect(a.sset, b.sset)) AS BIGINT) AS inter,
         |  CAST(len(a.sset) AS BIGINT) AS na, CAST(len(b.sset) AS BIGINT) AS nb
         | FROM ss a JOIN ss b ON a.id < b.id)
         |SELECT id_a, id_b, inter,
         | CAST(inter * 1000000 // (na + nb - inter) AS BIGINT) AS jac_ppm
         |FROM p WHERE inter * 1000000 // (na + nb - inter) >= $PpJoinTPpm
         |ORDER BY id_a, id_b""".stripMargin,

    // same sweep: island flag from the running max end, island id from
    // the running flag sum
    "q183_interval_union" ->
      s"""WITH b AS (SELECT user_id AS k, epoch_us(ts) AS s,
         |  epoch_us(ts) + CAST(${IntervalSessionSec} AS BIGINT) * 1000000 AS e
         | FROM events),
         |f AS (SELECT k, s, e,
         |  CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |    OR s > max(e) OVER (PARTITION BY k ORDER BY s, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |   THEN 1 ELSE 0 END AS ni FROM b),
         |i AS (SELECT k, s, e, SUM(ni) OVER (PARTITION BY k ORDER BY s, e
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM f),
         |g AS (SELECT k, island, MIN(s) AS i_s, MAX(e) AS i_e
         | FROM i GROUP BY 1, 2)
         |SELECT k AS user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
         | CAST(SUM(i_e - i_s) // 1000000 AS BIGINT) AS covered_s
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // peel rounds unrolled to the engine's asserted bound: extra
    // rounds past the fixpoint are no-ops, so equality holds exactly
    // when the engine's loop really converged. MATERIALIZED: each
    // round references the previous edge set three times — default
    // inlining re-expands the chain exponentially (the q167 lesson)
    "q184_kcore" -> {
      val rounds = (1 to KCoreMaxRounds).map { i =>
        s"""d$i AS MATERIALIZED (SELECT u, COUNT(*) AS c FROM e${i - 1} GROUP BY 1),
           |k$i AS MATERIALIZED (SELECT u FROM d$i WHERE c >= $KCoreK),
           |e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
           |  JOIN k$i a ON e.u = a.u JOIN k$i b ON e.v = b.u)""".stripMargin
      }.mkString(",\n")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |ch AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         | FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         | WHERE a.doc_id % 8 < 7),
         |pe AS (SELECT id_a, id_b FROM p UNION SELECT id_a, id_b FROM ch),
         |e0 AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pe UNION SELECT id_b, id_a FROM pe),
         |$rounds
         |SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM e$KCoreMaxRounds GROUP BY 1 ORDER BY 1""".stripMargin
    },

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

    // same prefix-sum statistic; numerator squared before the floor
    // division, so Spark div and DuckDB // agree
    "q186_changepoint" ->
      s"""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
         |  CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS x
         | FROM events GROUP BY 1, 2),
         |w AS (SELECT user_id, day, x,
         |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS t,
         |  SUM(x) OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
         |  CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         |  SUM(x) OVER (PARTITION BY user_id) AS s
         | FROM daily),
         |sc AS (SELECT user_id, day, n, t,
         |  ((n * st - t * s) * (n * st - t * s)) // (t * (n - t)) AS score
         | FROM w WHERE n >= $ChangepointMinDays AND t < n),
         |r AS (SELECT user_id, day, n, score,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY score DESC, t) AS rn FROM sc)
         |SELECT user_id, n AS n_days, strftime(day, '%Y-%m-%d') AS cut_day,
         | CAST(score AS BIGINT) AS score
         |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin,

    // brute-force eps-join over the POSITION histogram (identically
    // placed points share a neighborhood, so multiplicity sums are the
    // exact DBSCAN counts — and the closure runs over positions, which
    // the value domain bounds) + exact recursive transitive closure
    // over core-core position edges (q84 pattern); border label = MIN
    // adjacent core label, same as the engine
    "q187_dbscan_rfm" ->
      s"""WITH RECURSIVE p AS (SELECT o_custkey AS id,
         |  CAST(count(*) * 25 AS BIGINT) AS x,
         |  CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) // 1000000 AS BIGINT) AS y
         | FROM orders GROUP BY 1),
         |pos AS (SELECT x, y, COUNT(*) AS m, MIN(id) AS pid FROM p GROUP BY 1, 2),
         |nb AS (SELECT a.pid pa, b.pid pb, b.m mb FROM pos a JOIN pos b
         | ON (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= ${DbscanEps * DbscanEps}),
         |cnt AS (SELECT pa, SUM(mb) c FROM nb GROUP BY 1),
         |core AS (SELECT pa AS cid FROM cnt WHERE c >= $DbscanMinPts),
         |ce AS (SELECT nb.pa u, nb.pb v FROM nb
         |  JOIN core ca ON nb.pa = ca.cid JOIN core cb ON nb.pb = cb.cid
         |  WHERE nb.pa <> nb.pb),
         |reach AS (SELECT u AS node, u AS label FROM ce
         | UNION SELECT ce.u, r.label FROM ce JOIN reach r ON ce.v = r.node),
         |lab AS (SELECT node, MIN(label) AS lbl FROM reach GROUP BY 1),
         |corelab AS (SELECT core.cid, COALESCE(lab.lbl, core.cid) AS lbl
         | FROM core LEFT JOIN lab ON core.cid = lab.node),
         |borderlab AS (SELECT nb.pa AS pid, MIN(cl.lbl) AS lbl FROM nb
         |  JOIN corelab cl ON nb.pb = cl.cid
         |  WHERE nb.pa NOT IN (SELECT cid FROM core) GROUP BY 1),
         |verdict AS (SELECT cid AS pid, 'core' AS role, lbl FROM corelab
         | UNION ALL SELECT pid, 'border', lbl FROM borderlab)
         |SELECT p.id AS cust_id, COALESCE(v.role, 'noise') AS role,
         | CAST(COALESCE(v.lbl, -1) AS BIGINT) AS label
         |FROM p JOIN pos ON p.x = pos.x AND p.y = pos.y
         | LEFT JOIN verdict v ON pos.pid = v.pid
         |ORDER BY cust_id""".stripMargin,

    // same windowed edges, weighted PageRank unrolled per iteration
    // (the q105 oracle shape with swt in place of degree)
    "q188_textrank_keywords" -> {
      val base = "CAST(1000000000 AS BIGINT) // nn.n"
      val iterCtes = (1 to TextRankIters).map { i =>
        s"""s$i AS (SELECT e.v AS id,
           |  CAST(SUM((r${i - 1}.r * e.w) // r${i - 1}.swt) AS BIGINT) AS s
           | FROM e JOIN r${i - 1} ON e.u = r${i - 1}.id GROUP BY 1),
           |r$i AS (SELECT sw.id, sw.swt,
           |  (15 * ($base)) // 100 + (85 * COALESCE(s$i.s, 0)) // 100 AS r
           | FROM sw LEFT JOIN s$i USING (id), nn)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id AS id, $TOKS AS toks FROM documents),
         |adj AS (SELECT toks[p] AS a, toks[p+o] AS b
         | FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS p) pp,
         |      LATERAL (SELECT unnest([1, 2]) AS o) oo
         | WHERE p + o <= len(toks) AND toks[p] <> toks[p+o]),
         |eh AS (SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
         |  CAST(COUNT(*) AS BIGINT) AS w
         | FROM adj GROUP BY 1, 2 HAVING COUNT(*) >= $TextRankMinCount),
         |e AS (SELECT u, v, w FROM eh UNION ALL SELECT v, u, w FROM eh),
         |sw AS (SELECT u AS id, SUM(w) AS swt FROM e GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM sw),
         |r0 AS (SELECT id, swt, $base AS r FROM sw, nn),
         |$iterCtes
         |SELECT id AS word, CAST(r AS BIGINT) AS rank_i FROM r$TextRankIters
         |ORDER BY r DESC, id LIMIT $TextRankTopK""".stripMargin
    },

    // silent window k <=> the q132 amplitude formula bit is 0 (amp 10
    // vs threshold 100); runs via the k - row_number grouping, no WAV
    // decoded oracle-side
    "q189_audio_silence" ->
      """WITH dim AS (SELECT doc_id AS id, doc_id // 10 AS gid,
        |  ((doc_id % 10) * 11) % 64 AS fw
        | FROM documents WHERE doc_id % 2 = 1),
        |hsh AS (SELECT id, fw,
        |  CAST(concat('0x', substr(md5(CAST(gid AS VARCHAR)),1,15)) AS BIGINT) AS hp
        | FROM dim),
        |amp AS (SELECT id, k,
        |  CASE WHEN (((hp >> (k % 60)) & 1) = 1) != (k = fw)
        |       THEN 240 ELSE 10 END AS a
        | FROM hsh, LATERAL (SELECT unnest(generate_series(0, 63)) AS k) t),
        |sil AS (SELECT id, k FROM amp WHERE a = 10),
        |g AS (SELECT id, k,
        |  k - row_number() OVER (PARTITION BY id ORDER BY k) AS grp FROM sil),
        |seg0 AS (SELECT id, grp, MIN(k) AS start_win, MAX(k) AS end_win,
        |  COUNT(*) AS n_win FROM g GROUP BY 1, 2),
        |seg AS (SELECT id,
        |  row_number() OVER (PARTITION BY id ORDER BY start_win) - 1 AS seg,
        |  start_win, end_win, n_win FROM seg0)
        |SELECT id AS media_id, CAST(seg AS BIGINT) AS seg,
        | CAST(start_win AS BIGINT) AS start_win,
        | CAST(end_win AS BIGINT) AS end_win, CAST(n_win AS BIGINT) AS n_win
        |FROM seg ORDER BY media_id, seg""".stripMargin,

    // pairwise slopes brute force; // floors like the engine's
    // (dy - pmod) div spelling; lower median via the q150 rule
    "q190_theilsen_trend" ->
      """WITH daily AS (SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
        |  CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS y
        | FROM lineitem GROUP BY 1, 2),
        |d2 AS (SELECT l_returnflag,
        |  CAST(day - DATE '1970-01-01' AS BIGINT) AS x, y FROM daily),
        |pr AS (SELECT a.l_returnflag AS g,
        |  ((b.y - a.y) * 1000) // (b.x - a.x) AS s
        | FROM d2 a JOIN d2 b ON a.l_returnflag = b.l_returnflag AND a.x < b.x),
        |h AS (SELECT g, s, CAST(COUNT(*) AS BIGINT) AS wv FROM pr GROUP BY 1, 2),
        |c AS (SELECT g, s, wv,
        |  SUM(wv) OVER (PARTITION BY g ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  SUM(wv) OVER (PARTITION BY g) AS tot FROM h)
        |SELECT g AS l_returnflag, CAST(MAX(tot) AS BIGINT) AS n_pairs,
        | CAST(MIN(s) AS BIGINT) AS slope_milli
        |FROM c WHERE cum * 2 >= tot GROUP BY 1 ORDER BY 1""".stripMargin,

    // q121's brute-force levenshtein pairs restricted to the nation
    // block, exact recursive closure, singleton self-label
    "q191_entity_resolution" -> erFullRecomputeOracle,

    // the incremental path must equal the FULL recompute — same oracle
    "q201_er_incremental" -> erFullRecomputeOracle,

    // persisted-labels ingest must equal the FULL recompute too
    "q203_er_ingest" -> erFullRecomputeOracle,

    // q165's analytic window-gray oracle at sampled positions: pair j
    // compares original frames (j-1)*2 and j*2, i.e. windows
    // idx // (nf//64); first_cut = j*2 of the first differing pair
    "q202_video_scenes_sampled" ->
      """WITH dim AS (SELECT doc_id AS id, doc_id // 10 AS gid,
        |  ((doc_id % 10) * 11) % 64 AS fw,
        |  64*((doc_id % 2)+1) AS nf
        | FROM documents WHERE doc_id % 2 = 1),
        |hsh AS (SELECT id, fw, nf,
        |  CAST(concat('0x', substr(md5(concat('v', CAST(gid AS VARCHAR))),1,15)) AS BIGINT) AS hp
        | FROM dim),
        |lum AS (SELECT id, nf, k,
        |  CASE WHEN (((hp >> (k % 60)) & 1) = 1) != (k = fw)
        |       THEN 220 ELSE 30 END AS a
        | FROM hsh, LATERAL (SELECT unnest(generate_series(0, 63)) AS k) t),
        |sp AS (SELECT l.id, l.nf, j.j,
        |  (j.j*2) // (l.nf // 64) AS kc, ((j.j-1)*2) // (l.nf // 64) AS kp
        | FROM (SELECT DISTINCT id, nf FROM lum) l,
        |  LATERAL (SELECT unnest(generate_series(1, (l.nf+1)//2 - 1)) AS j) j),
        |d AS (SELECT sp.id, sp.nf, sp.j, cur.a, prv.a AS pa
        | FROM sp JOIN lum cur ON cur.id = sp.id AND cur.k = sp.kc
        |  JOIN lum prv ON prv.id = sp.id AND prv.k = sp.kp),
        |c AS (SELECT id, nf,
        |  CAST(COUNT(CASE WHEN a <> pa THEN 1 END) AS BIGINT) AS n_cuts,
        |  MIN(CASE WHEN a <> pa THEN j*2 END) AS fck
        | FROM d GROUP BY 1, 2)
        |SELECT id AS media_id, CAST((nf+1)//2 AS BIGINT) AS n_sampled, n_cuts,
        | CAST(COALESCE(fck, -1) AS BIGINT) AS first_cut
        |FROM c ORDER BY media_id""".stripMargin,

    // the full PQ replay: one shared seed-id list (q54's md5 seeding),
    // per subspace 2 Lloyd rounds + encode + query LUT, then the
    // asymmetric distance as an EXPLICIT left-to-right addition chain
    // (a SUM aggregate would be order-free and could differ in the
    // last bit). MATERIALIZED: every subspace chain re-references its
    // predecessors through the joins.
    "q192_pq_ann" -> {
      val sub = 64 / PqM
      def dist(x: String, p: String) =
        s"""round(list_dot_product($x.v, $x.v) - 2.0*list_dot_product($x.v, $p.cv)
           | + list_dot_product($p.cv, $p.cv), 6)""".stripMargin
      def iter(ej: String, prev: String, a: String, c: String) =
        s"""$a AS MATERIALIZED (SELECT sid, v, cid FROM (
           |  SELECT x.vec_id AS sid, x.v, $prev.cid,
           |   row_number() OVER (PARTITION BY x.vec_id
           |     ORDER BY ${dist("x", prev)}, $prev.cid) AS rn
           |  FROM $ej x CROSS JOIN $prev) t WHERE rn = 1),
           |$c AS MATERIALIZED (SELECT cid, list(m ORDER BY pos) AS cv FROM (
           |  SELECT cid, pos, round(avg(xx), 6) AS m FROM (
           |   SELECT cid, unnest(v) AS xx, generate_subscripts(v, 1) AS pos FROM $a) u
           |  GROUP BY 1, 2) g GROUP BY 1)""".stripMargin
      val chains = (0 until PqM).map { j =>
        val (a, b) = (j * sub + 1, j * sub + sub)
        s"""e$j AS MATERIALIZED (SELECT vec_id, v[$a:$b] AS v FROM e),
           |seed$j AS MATERIALIZED (SELECT s.cid, x.v AS cv
           | FROM seedids s JOIN e$j x ON x.vec_id = s.sid),
           |${iter(s"e$j", s"seed$j", s"a1_$j", s"c1_$j")},
           |${iter(s"e$j", s"c1_$j", s"a2_$j", s"c2_$j")},
           |enc$j AS MATERIALIZED (SELECT sid AS vec_id, cid AS c FROM (
           |  SELECT x.vec_id AS sid, c2_$j.cid,
           |   row_number() OVER (PARTITION BY x.vec_id
           |     ORDER BY ${dist("x", s"c2_$j")}, c2_$j.cid) AS rn
           |  FROM e$j x CROSS JOIN c2_$j) t WHERE rn = 1),
           |lut$j AS MATERIALIZED (SELECT q.vec_id AS qid, c.cid, ${dist("q", "c")} AS d
           | FROM (SELECT vec_id, v FROM e$j WHERE vec_id < $PqQueryMax) q
           | CROSS JOIN c2_$j c)""".stripMargin
      }.mkString(",\n")
      val encJoins = (0 until PqM)
        .map(j => s"JOIN enc$j ON enc$j.vec_id = x.vec_id").mkString(" ")
      val lutJoins = (0 until PqM).map { j =>
        if (j == 0) s"JOIN lut0 l0 ON l0.cid = enc0.c"
        else s"JOIN lut$j l$j ON l$j.qid = l0.qid AND l$j.cid = enc$j.c"
      }.mkString(" ")
      val addChain = (0 until PqM).map(j => s"l$j.d").mkString(" + ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seedids AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY h, sid) AS BIGINT) AS cid, sid
         | FROM (SELECT vec_id AS sid,
         |   ${duckHash("concat('ivf_', CAST(vec_id AS VARCHAR))", 15)} AS h
         |  FROM e ORDER BY h, sid LIMIT $PqCodes) t),
         |$chains,
         |ad AS (SELECT l0.qid AS query_id, x.vec_id AS neighbor_id,
         |  round($addChain, 6) AS adist
         | FROM e x $encJoins $lutJoins
         | WHERE l0.qid <> x.vec_id),
         |r AS (SELECT query_id, neighbor_id, adist,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS BIGINT) AS rnk FROM ad)
         |SELECT query_id, neighbor_id, adist, rnk FROM r WHERE rnk <= $PqK
         |ORDER BY query_id, rnk""".stripMargin
    },

    // the rank the engine computes distributed, as one oracle window;
    // (name, id) sort pair keeps the rank total
    "q193_snm_dedup" ->
      s"""WITH r AS (SELECT c_custkey AS id, c_name AS nm,
         |  row_number() OVER (ORDER BY c_name, c_custkey) AS pos FROM customer)
         |SELECT a.id AS id_a, b.id AS id_b,
         | CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         |FROM r a JOIN r b ON b.pos > a.pos AND b.pos <= a.pos + ${SnmWindow - 1}
         |WHERE levenshtein(a.nm, b.nm) <= 1
         |ORDER BY id_a, id_b""".stripMargin,

    // both sketches rebuilt cellwise, inner product per row, min over
    // rows; exact side is the key-count product sum
    "q194_cms_joinsize" ->
      s"""WITH rr AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS r),
         |ta AS (SELECT CAST(user_id AS VARCHAR) AS w, COUNT(*) AS cnt
         | FROM events GROUP BY 1),
         |cellsa AS (SELECT r,
         |  (${duckHash(s"concat('$JoinSizeSalt', w)", 15)} >> (15 * r)) % $CmsWidth AS c,
         |  SUM(cnt) AS cnt
         | FROM ta CROSS JOIN rr GROUP BY 1, 2),
         |tb AS (SELECT CAST(o_custkey AS VARCHAR) AS w, COUNT(*) AS cnt
         | FROM orders GROUP BY 1),
         |cellsb AS (SELECT r,
         |  (${duckHash(s"concat('$JoinSizeSalt', w)", 15)} >> (15 * r)) % $CmsWidth AS c,
         |  SUM(cnt) AS cnt
         | FROM tb CROSS JOIN rr GROUP BY 1, 2),
         |ip AS (SELECT COALESCE(a.r, b.r) AS r,
         |  SUM(COALESCE(a.cnt, 0) * COALESCE(b.cnt, 0)) AS ip
         | FROM cellsa a FULL OUTER JOIN cellsb b
         |   ON a.r = b.r AND a.c = b.c GROUP BY 1),
         |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM ip),
         |ex AS (SELECT CAST(COALESCE(SUM(x.cnt * y.cnt), 0) AS BIGINT) AS exact_join_size
         | FROM ta x JOIN tb y USING (w))
         |SELECT est_join_size, exact_join_size,
         | CASE WHEN exact_join_size = 0 THEN NULL
         |  ELSE CAST(est_join_size * 1000000 // exact_join_size AS BIGINT)
         | END AS over_ppm
         |FROM est, ex""".stripMargin,

    // same lead-window anchors + generate_series fill; // truncates
    // like div (q190's verification)
    "q195_gapfill_interp" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |  CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS v
        | FROM events GROUP BY 1, 2),
        |d2 AS (SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS x, v
        | FROM daily),
        |wn AS (SELECT user_id, x, v,
        |  lead(x) OVER (PARTITION BY user_id ORDER BY x) AS nx,
        |  lead(v) OVER (PARTITION BY user_id ORDER BY x) AS nv
        | FROM d2),
        |fill AS (SELECT user_id, xi AS x,
        |  v + ((nv - v) * (xi - x)) // (nx - x) AS v, 'interp' AS kind
        | FROM wn, LATERAL (SELECT unnest(generate_series(x + 1, nx - 1)) AS xi) t
        | WHERE nx IS NOT NULL AND nx > x + 1)
        |SELECT user_id, x AS day_num, CAST(v AS BIGINT) AS v_c, kind FROM (
        | SELECT user_id, x, v, 'obs' AS kind FROM d2
        | UNION ALL SELECT user_id, x, v, kind FROM fill)
        |ORDER BY user_id, day_num""".stripMargin,

    // q140's symmetric quantization, then the per-vector position
    // self-join brute force (the engine never builds per-row outer
    // products — its plan folds into partition-local accumulators)
    "q196_gram_matrix" ->
      """WITH st AS (SELECT MAX(abs(x)) AS m FROM
        |  (SELECT unnest(embedding::DOUBLE[]) AS x FROM embeddings)),
        |q AS (SELECT vec_id, CAST(pos - 1 AS BIGINT) AS i,
        |  CASE WHEN st.m <= 0 THEN 0
        |       ELSE CAST(floor(x * 127.0 / st.m) AS BIGINT) END AS qv
        | FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
        |    generate_subscripts(embedding::DOUBLE[], 1) AS pos
        |   FROM embeddings), st)
        |SELECT a.i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS s
        |FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q191's closure CTEs + field-wise survivorship: arg_min name,
    // max balance, majority segment with (count desc, segment) ties
    "q197_golden_record" ->
      """WITH RECURSIVE pr AS (SELECT a.c_custkey ia, b.c_custkey ib
        | FROM customer a JOIN customer b
        | ON a.c_custkey < b.c_custkey AND a.c_nationkey = b.c_nationkey
        | WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |e AS (SELECT ia u, ib v FROM pr UNION ALL SELECT ib, ia FROM pr),
        |reach AS (SELECT u AS node, u AS label FROM e
        | UNION SELECT e.u, r.label FROM e JOIN reach r ON e.v = r.node),
        |lab AS (SELECT node, MIN(label) lbl FROM reach GROUP BY 1),
        |fl AS (SELECT c_custkey AS cust_id,
        |  CAST(COALESCE(lab.lbl, c_custkey) AS BIGINT) AS label, c_name,
        |  CAST(round(c_acctbal*100, 0) AS BIGINT) AS bal_c, c_mktsegment
        | FROM customer LEFT JOIN lab ON customer.c_custkey = lab.node),
        |agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  arg_min(c_name, cust_id) AS rep_name,
        |  CAST(MAX(bal_c) AS BIGINT) AS max_bal_c
        | FROM fl GROUP BY 1),
        |sm AS (SELECT label, c_mktsegment, COUNT(*) AS cnt
        | FROM fl GROUP BY 1, 2),
        |md AS (SELECT label, c_mktsegment AS top_segment FROM (
        |  SELECT *, row_number() OVER (PARTITION BY label
        |    ORDER BY cnt DESC, c_mktsegment) AS rn FROM sm) t WHERE rn = 1)
        |SELECT a.label, a.n_members, a.rep_name, a.max_bal_c, md.top_segment
        |FROM agg a JOIN md USING (label) ORDER BY a.label""".stripMargin,

    // each window's sketch recomputed FROM SCRATCH (distinct hashes in
    // the window, k smallest, q137's estimator) — the engine's per-day
    // merge must reproduce it exactly
    "q198_kmv_window_rollup" ->
      s"""WITH h AS (SELECT DISTINCT
         |  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         |  ${duckHash("concat('kmvw_', CAST(user_id AS VARCHAR))", 15)} AS h
         | FROM events),
         |days AS (SELECT DISTINCT day FROM h),
         |wm AS (SELECT d.day AS wday, h.h FROM days d
         |  JOIN h ON h.day BETWEEN d.day - 6 AND d.day),
         |dh AS (SELECT DISTINCT wday, h FROM wm),
         |r AS (SELECT wday, h,
         |  row_number() OVER (PARTITION BY wday ORDER BY h) AS rn FROM dh),
         |b AS (SELECT wday, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  MAX(h) AS kth_min FROM r WHERE rn <= $KmvK GROUP BY 1)
         |SELECT wday AS day_num, n_kept, kth_min,
         | CASE WHEN n_kept < $KmvK THEN n_kept
         |  ELSE CAST((CAST(${KmvK - 1} AS HUGEINT) * ${Sketches.HashDomain})
         |    // GREATEST(kth_min, 1) AS BIGINT) END AS est_distinct
         |FROM b ORDER BY 1""".stripMargin,

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

    // the full contract row: sketch estimate + exact discrete quantile
    // (shared integer rank rule) + the two structural-guarantee booleans
    "q223_logbucket_quantiles" ->
      s"""$logBucketOracleCore
         |SELECT e.grp, e.q_ppm, e.n_total, e.est, x.exact,
         |  CAST(e.est <= x.exact AS BIGINT) AS le_exact,
         |  CAST(x.exact < e.est + e.width AS BIGINT) AS lt_ub
         |FROM est e JOIN exact x ON e.grp = x.grp AND e.q_ppm = x.q_ppm
         |ORDER BY e.grp, e.q_ppm""".stripMargin,

    // merged half-sketches must reproduce the WHOLE-corpus sketch's
    // quantile rows exactly (the sketch is linear) — est side of q223
    "q224_logbucket_merge" ->
      s"""$logBucketOracleCore
         |SELECT grp, q_ppm, n_total, est FROM est
         |ORDER BY grp, q_ppm""".stripMargin,

    // the plain join IS the oracle: the salted rewrite must be a
    // result identity
    "q225_skew_safe_join" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS nation_key,
        | CAST(COUNT(*) AS BIGINT) AS n_li,
        | CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   AS sum_price_c
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // occurrence counts replayed POSITIONALLY: substr at every start
    // position (overlapping matches counted, like the automaton)
    "q226_blocklist_screen" -> {
      val pl = BlockPatterns.map(p => s"'$p'").mkString(", ")
      s"""WITH pats AS (SELECT unnest([$pl]) AS pat),
         |occ AS (SELECT d.doc_id AS id, p.pat, COUNT(*) AS cnt
         | FROM documents d, pats p, LATERAL (SELECT unnest(generate_series(1,
         |   greatest(length(d.text) - length(p.pat) + 1, 0))) AS i) t
         | WHERE substr(d.text, CAST(t.i AS INT), length(p.pat)) = p.pat
         | GROUP BY 1, 2)
         |SELECT pat, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(cnt) AS BIGINT) AS total_occ
         |FROM occ GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // one left join + conditional count per constraint; NULL FKs are
    // not orphans
    "q227_ref_integrity" ->
      s"""WITH snap AS (SELECT o_orderkey AS pk FROM orders
         |  WHERE o_orderdate < TIMESTAMP '$RefIntCutoff'),
         |a1 AS (SELECT 'customer.nation' AS fk_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_child,
         |  CAST(SUM(CASE WHEN c_nationkey IS NOT NULL
         |    AND n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
         | FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey),
         |a2 AS (SELECT 'lineitem.order_snapshot' AS fk_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_child,
         |  CAST(SUM(CASE WHEN l_orderkey IS NOT NULL
         |    AND s.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
         | FROM lineitem l LEFT JOIN snap s ON l.l_orderkey = s.pk),
         |a3 AS (SELECT 'orders.customer' AS fk_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_child,
         |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL
         |    AND c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
         | FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
         |SELECT fk_name, n_child, n_orphan,
         |  CAST((n_orphan * 1000000) // n_child AS BIGINT) AS orphan_ppm
         |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2
         |  UNION ALL SELECT * FROM a3)
         |ORDER BY fk_name""".stripMargin,

    // the two leads share one per-user window; full deterministic tie
    // order at the top-20 cut
    "q228_event_paths" ->
      """WITH s AS (SELECT user_id, event_type AS t1,
        |  lead(event_type, 1) OVER w AS t2,
        |  lead(event_type, 2) OVER w AS t3
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
        | FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT t1, t2, t3, n FROM g
        |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,

    // exact integer milli-quantized centroids (floor on the double —
    // q140's canonicalization); truncating // matches engine div
    "q229_embedding_drift" ->
      """WITH m AS (SELECT CAST(label AS BIGINT) AS label, pos,
        |  CAST(floor(x * 1000) AS BIGINT) AS m FROM (
        |   SELECT label, unnest(embedding::DOUBLE[]) AS x,
        |     generate_subscripts(embedding, 1) AS pos FROM embeddings) u),
        |ls AS (SELECT label, pos, SUM(m) AS s,
        |  CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY 1, 2),
        |nl AS (SELECT label, MAX(n) AS n_vecs FROM ls GROUP BY 1),
        |gs AS (SELECT pos, SUM(s) AS gsum, SUM(n) AS gn FROM ls GROUP BY 1),
        |cl AS (SELECT label, pos, s // n AS c FROM ls),
        |cg AS (SELECT pos, gsum // gn AS c FROM gs),
        |dt AS (SELECT label, CAST(SUM(cl.c * cg.c) AS BIGINT) AS dot,
        |  CAST(SUM(cl.c * cl.c) AS HUGEINT) AS ss
        | FROM cl JOIN cg USING (pos) GROUP BY 1),
        |gg AS (SELECT CAST(SUM(c * c) AS HUGEINT) AS gg FROM cg)
        |SELECT label, n_vecs, dot,
        | CAST(CASE WHEN ss = 0 OR gg = 0 THEN 0
        |   WHEN dot >= 0
        |     THEN (CAST(dot AS HUGEINT) * dot * 1000000) // (ss * gg)
        |   ELSE -((CAST(dot AS HUGEINT) * dot * 1000000) // (ss * gg))
        |  END AS BIGINT) AS cos2_ppm
        |FROM dt CROSS JOIN gg JOIN nl USING (label)
        |ORDER BY label""".stripMargin,

    // q192's 8 subspace k-means chains + the q54/q207 coarse chain,
    // composed: candidates restricted to the probed lists, ADC as the
    // fixed-order addition chain
    "q230_ann_ivfpq" -> {
      val sub = 64 / PqM
      def dist(x: String, p: String) =
        s"""round(list_dot_product($x.v, $x.v) - 2.0*list_dot_product($x.v, $p.cv)
           | + list_dot_product($p.cv, $p.cv), 6)""".stripMargin
      def iter(ej: String, prev: String, a: String, c: String) =
        s"""$a AS MATERIALIZED (SELECT sid, v, cid FROM (
           |  SELECT x.vec_id AS sid, x.v, $prev.cid,
           |   row_number() OVER (PARTITION BY x.vec_id
           |     ORDER BY ${dist("x", prev)}, $prev.cid) AS rn
           |  FROM $ej x CROSS JOIN $prev) t WHERE rn = 1),
           |$c AS MATERIALIZED (SELECT cid, list(m ORDER BY pos) AS cv FROM (
           |  SELECT cid, pos, round(avg(xx), 6) AS m FROM (
           |   SELECT cid, unnest(v) AS xx, generate_subscripts(v, 1) AS pos FROM $a) u
           |  GROUP BY 1, 2) g GROUP BY 1)""".stripMargin
      val chains = (0 until PqM).map { j =>
        val (a, b) = (j * sub + 1, j * sub + sub)
        s"""e$j AS MATERIALIZED (SELECT vec_id, v[$a:$b] AS v FROM e),
           |seed$j AS MATERIALIZED (SELECT s.cid, x.v AS cv
           | FROM seedids s JOIN e$j x ON x.vec_id = s.sid),
           |${iter(s"e$j", s"seed$j", s"a1_$j", s"c1_$j")},
           |${iter(s"e$j", s"c1_$j", s"a2_$j", s"c2_$j")},
           |enc$j AS MATERIALIZED (SELECT sid AS vec_id, cid AS c FROM (
           |  SELECT x.vec_id AS sid, c2_$j.cid,
           |   row_number() OVER (PARTITION BY x.vec_id
           |     ORDER BY ${dist("x", s"c2_$j")}, c2_$j.cid) AS rn
           |  FROM e$j x CROSS JOIN c2_$j) t WHERE rn = 1),
           |lut$j AS MATERIALIZED (SELECT q.vec_id AS qid, c.cid, ${dist("q", "c")} AS d
           | FROM (SELECT vec_id, v FROM e$j WHERE vec_id < $PqQueryMax) q
           | CROSS JOIN c2_$j c)""".stripMargin
      }.mkString(",\n")
      val encJoins = (0 until PqM)
        .map(j => s"JOIN enc$j ON enc$j.vec_id = cand.neighbor_id").mkString(" ")
      val lutJoins = (0 until PqM)
        .map(j => s"JOIN lut$j l$j ON l$j.qid = cand.query_id AND l$j.cid = enc$j.c")
        .mkString(" ")
      val addChain = (0 until PqM).map(j => s"l$j.d").mkString(" + ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seedids AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY h, sid) AS BIGINT) AS cid, sid
         | FROM (SELECT vec_id AS sid,
         |   ${duckHash("concat('ivf_', CAST(vec_id AS VARCHAR))", 15)} AS h
         |  FROM e ORDER BY h, sid LIMIT $PqCodes) t),
         |$chains,
         |cseed AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY h, sid) AS BIGINT) AS cid, v AS cv
         | FROM (SELECT vec_id AS sid, v,
         |   ${duckHash("concat('ivf_', CAST(vec_id AS VARCHAR))", 15)} AS h
         |  FROM e ORDER BY h, sid LIMIT 8) t),
         |${iter("e", "cseed", "ca1", "cc1")},
         |${iter("e", "cc1", "ca2", "cc2")},
         |casgn AS MATERIALIZED (SELECT sid AS neighbor_id, cid FROM (
         |  SELECT x.vec_id AS sid, cc2.cid,
         |   row_number() OVER (PARTITION BY x.vec_id
         |     ORDER BY ${dist("x", "cc2")}, cc2.cid) AS rn
         |  FROM e x CROSS JOIN cc2) t WHERE rn = 1),
         |probes AS (SELECT query_id, cid FROM (
         |  SELECT x.vec_id AS query_id, cc2.cid,
         |   row_number() OVER (PARTITION BY x.vec_id
         |     ORDER BY ${dist("x", "cc2")}, cc2.cid) AS rn
         |  FROM e x CROSS JOIN cc2 WHERE x.vec_id < $PqQueryMax) t WHERE rn <= 2),
         |cand AS (SELECT probes.query_id, casgn.neighbor_id
         | FROM probes JOIN casgn USING (cid)
         | WHERE probes.query_id <> casgn.neighbor_id),
         |ad AS (SELECT cand.query_id, cand.neighbor_id,
         |  round($addChain, 6) AS adist
         | FROM cand $encJoins $lutJoins),
         |r AS (SELECT query_id, neighbor_id, adist,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS BIGINT) AS rnk FROM ad)
         |SELECT query_id, neighbor_id, adist, rnk FROM r WHERE rnk <= $PqK
         |ORDER BY query_id, rnk""".stripMargin
    },

    // the q98 bit-interleave fragment, value-domain bins, literal
    // predicate table, min/max disjointness per (file, predicate)
    "q231_skipping_audit" -> {
      val z = (0 until 10).flatMap(b => Seq(
        s"(((x >> $b) & 1) << ${2 * b})", s"(((y >> $b) & 1) << ${2 * b + 1})"))
        .mkString(" | ")
      s"""WITH t AS (SELECT CAST(o_custkey % 1024 AS BIGINT) AS x,
         |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS y
         | FROM orders),
         |z AS (SELECT x, y, CAST($z AS BIGINT) AS zv FROM t),
         |lb AS (SELECT 'zorder' AS layout, zv // 16384 AS bin, x, y FROM z
         | UNION ALL SELECT 'xsort', x // 16, x, y FROM z),
         |files AS (SELECT layout, bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MIN(x) AS min_x, MAX(x) AS max_x,
         |  MIN(y) AS min_y, MAX(y) AS max_y
         | FROM lb GROUP BY 1, 2),
         |preds AS (SELECT * FROM (VALUES ('x_40_59', 40, 59, 0, 1023),
         |  ('y_100_149', 0, 1023, 100, 149),
         |  ('xy_small', 40, 59, 100, 149)) p(pred, xlo, xhi, ylo, yhi)),
         |sk AS (SELECT layout, pred, n_rows,
         |  (max_x < xlo OR min_x > xhi OR max_y < ylo OR min_y > yhi) AS skip
         | FROM files CROSS JOIN preds)
         |SELECT layout, pred, CAST(COUNT(*) AS BIGINT) AS n_files,
         | CAST(SUM(CASE WHEN skip THEN 1 ELSE 0 END) AS BIGINT) AS n_skip,
         | CAST(SUM(CASE WHEN skip THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
         | CAST((SUM(CASE WHEN skip THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS skip_ppm
         |FROM sk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // the register table and integer estimator recomputed in full; the
    // exact count and its error ride the row
    "q232_hll_distinct" ->
      s"""$hllOracleCore,
         |ex AS (SELECT event_type,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
         | FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         |SELECT f.event_type, n_present, s_scaled, est_hll, exact_distinct,
         | CAST((abs(est_hll - exact_distinct) * 1000000) // exact_distinct
         |   AS BIGINT) AS err_ppm
         |FROM fin f JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin,

    // merged half-registers must reproduce the whole-corpus registers
    // (MAX distributes over union) — est side of q232
    "q233_hll_merge" ->
      s"""$hllOracleCore
         |SELECT event_type, n_present, s_scaled, est_hll FROM fin
         |ORDER BY event_type""".stripMargin,

    // q105's simhash edge CTEs + three unrolled synchronous vote
    // rounds (count DESC, label ASC tie rule = the engine's struct-max)
    "q234_lpa_communities" -> {
      def round(prev: String, out: String) =
        s"""v$out AS (SELECT e.u, $prev.lbl, COUNT(*) AS c
           | FROM e JOIN $prev ON e.v = $prev.id GROUP BY 1, 2),
           |$out AS (SELECT u AS id, lbl FROM (
           |  SELECT u, lbl, row_number() OVER (PARTITION BY u
           |    ORDER BY c DESC, lbl) AS rn FROM v$out) t WHERE rn = 1)""".stripMargin
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |e AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM p
         | UNION ALL SELECT id_b, id_a FROM p),
         |l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM e),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")}
         |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
         | CAST(MIN(id) AS BIGINT) AS min_id
         |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // every trailing window recomputed FROM SCRATCH (values re-binned
    // per window) — the engine's per-day cell merge must reproduce it
    "q235_quantile_rollup" -> {
      val s = LbSubBits
      val w = 1L << s
      val idx = s"""CAST(length(bin(v)) - 1 AS BIGINT) * $w
        + (v >> GREATEST(length(bin(v)) - 1 - $s, 0))
        - (CAST(1 AS BIGINT) << ((length(bin(v)) - 1)
            - GREATEST(length(bin(v)) - 1 - $s, 0)))"""
      val e = s"CAST(kb // $w AS INT)"
      s"""WITH v AS (SELECT
         |  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         |  CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |days AS (SELECT DISTINCT day FROM v),
         |wm AS (SELECT d.day AS wday, v.v FROM days d
         |  JOIN v ON v.day BETWEEN d.day - 6 AND d.day),
         |cells AS (SELECT wday, $idx AS k, COUNT(*) AS cnt
         | FROM wm GROUP BY 1, 2),
         |n AS (SELECT wday, CAST(SUM(cnt) AS BIGINT) AS n_total
         | FROM cells GROUP BY 1),
         |q AS (SELECT CAST(unnest([500000, 990000]) AS BIGINT) AS q_ppm),
         |r AS (SELECT wday, n_total, q_ppm,
         |  GREATEST((n_total * q_ppm + 999999) // 1000000, 1) AS rnk
         | FROM n CROSS JOIN q),
         |cum AS (SELECT wday, k,
         |  SUM(cnt) OVER (PARTITION BY wday ORDER BY k) AS c FROM cells),
         |sel AS (SELECT r.wday, q_ppm, n_total,
         |  MIN(CASE WHEN c >= rnk THEN k END) AS kb
         | FROM r JOIN cum ON r.wday = cum.wday GROUP BY 1, 2, 3)
         |SELECT wday, q_ppm, n_total,
         | CAST(((kb % $w) + (CAST(1 AS BIGINT)
         |    << ($e - GREATEST($e - $s, 0)))) << GREATEST($e - $s, 0)
         |  AS BIGINT) AS est
         |FROM sel ORDER BY wday, q_ppm""".stripMargin
    },

    // the ring replayed with one window; self-pairs (off ≡ 0 mod N)
    // excluded on both sides
    "q236_negative_pairs" ->
      s"""WITH h AS (SELECT doc_id AS id,
         |  ${duckHash("concat('neg_', CAST(doc_id AS VARCHAR))", 15)} AS h
         | FROM documents),
         |r AS (SELECT id,
         |  CAST(row_number() OVER (ORDER BY h, id) - 1 AS BIGINT) AS pos
         | FROM h),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
         |p AS (SELECT r.id AS id_a, CAST(o.off AS BIGINT) AS off,
         |  (r.pos + o.off) % nn.n AS pos
         | FROM r CROSS JOIN (VALUES (1), (37), (1001)) o(off) CROSS JOIN nn)
         |SELECT p.id_a, b.id AS id_b, p.off
         |FROM p JOIN r b USING (pos) WHERE p.id_a <> b.id
         |ORDER BY id_a, off""".stripMargin,

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

    // q117's analytic aHash chain with the sides SPLIT: batch (id%10=0)
    // vs corpus, candidates via the same 3-chunk pigeonhole
    "q238_image_fp_ingest" ->
      """WITH dim AS (SELECT doc_id AS id, (doc_id % 16) + 8 AS w,
        |  (doc_id % 12) + 8 AS h, doc_id // 10 AS gid
        | FROM documents WHERE doc_id % 2 = 0),
        |xs AS (SELECT id, unnest(generate_series(0, w-1)) AS x FROM dim),
        |ys AS (SELECT id, unnest(generate_series(0, h-1)) AS y FROM dim),
        |px AS (SELECT d.id, (x*8)//d.w AS cx, (y*8)//d.h AS cy,
        |  CASE WHEN ((CAST(concat('0x', substr(md5(CAST(d.gid AS VARCHAR)),1,15)) AS BIGINT)
        |              >> ((((y*8)//d.h)*8 + (x*8)//d.w) % 60)) & 1) = 1
        |       THEN 220 ELSE 30 END AS v
        | FROM dim d JOIN xs ON xs.id = d.id JOIN ys ON ys.id = d.id),
        |cell AS (SELECT id, cy*8 + cx AS k, SUM(v) AS cs, COUNT(*) AS cn
        | FROM px GROUP BY 1, 2),
        |tot AS (SELECT id, SUM(v) AS ts, COUNT(*) AS tn FROM px GROUP BY 1),
        |bits AS (SELECT cell.id, k,
        |  CASE WHEN cs*tn > ts*cn THEN '1' ELSE '0' END AS b
        | FROM cell JOIN tot ON cell.id = tot.id),
        |bs AS (SELECT id, string_agg(b, '' ORDER BY k) AS s FROM bits GROUP BY 1),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
        | FROM bs a JOIN bs b ON a.id % 10 = 0 AND b.id % 10 <> 0 AND (
        |   substr(a.s, 1, 22) = substr(b.s, 1, 22) OR
        |   substr(a.s, 23, 21) = substr(b.s, 23, 21) OR
        |   substr(a.s, 44, 21) = substr(b.s, 44, 21))),
        |ham AS (SELECT id_a, id_b, CAST(list_sum(list_transform(
        |   generate_series(1, 64),
        |   i -> CASE WHEN substr(sa, i, 1) <> substr(sb, i, 1) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        | FROM cand)
        |SELECT id_a AS new_id, id_b AS corpus_id, hamming
        |FROM ham WHERE hamming <= 2
        |ORDER BY new_id, corpus_id""".stripMargin,

    // state at t == the latest non-purchase event <= t (no same-(user,
    // ts) collisions at any SF, verified, so the raw-event replay
    // equals the SCD2-interval lookup); unmatched purchases -> 'none'
    "q239_pit_lookup" ->
      """WITH np AS (SELECT user_id,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
        |  event_id, event_type
        | FROM events WHERE event_type <> 'purchase'),
        |p AS (SELECT user_id, event_id,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
        |  CAST(round(value * 100) AS BIGINT) AS value_c
        | FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.event_id, np.event_type,
        |  row_number() OVER (PARTITION BY p.event_id
        |    ORDER BY np.ts DESC, np.event_id DESC) AS rn
        | FROM p JOIN np ON np.user_id = p.user_id AND np.ts <= p.ts),
        |st AS (SELECT event_id, event_type AS state FROM j WHERE rn = 1),
        |allp AS (SELECT p.event_id, p.value_c,
        |  COALESCE(st.state, 'none') AS state
        | FROM p LEFT JOIN st USING (event_id))
        |SELECT state, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        | CAST(SUM(value_c) AS BIGINT) AS sum_value_c
        |FROM allp GROUP BY 1 ORDER BY 1""".stripMargin,

    // ground truth = brute-force exact Jaccard >= 0.5 over the SAME
    // md5-bottom-N sample; candidates = the q105 simhash replay;
    // metrics as exact integer ppm
    "q240_dedup_eval" ->
      s"""WITH sd AS (SELECT doc_id, text FROM (
         |  SELECT doc_id, text, row_number() OVER (ORDER BY
         |   ${duckHash("concat('deval_', CAST(doc_id AS VARCHAR))", 15)}, doc_id) AS rn
         |  FROM documents) WHERE rn <= $DedupEvalSampleN),
         |t0 AS (SELECT doc_id, $TOKS AS t FROM sd),
         |sh AS (SELECT DISTINCT doc_id AS id, unnest(
         |  CASE WHEN len(t) < 3 THEN [array_to_string(t,' ')]
         |       ELSE list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2],' ')) END) AS sh
         | FROM t0),
         |ss AS (SELECT id, list_sort(list(sh)) AS sset FROM sh GROUP BY 1),
         |tp AS (SELECT id_a, id_b FROM (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |   CAST(len(list_intersect(a.sset, b.sset)) AS BIGINT) AS inter,
         |   CAST(len(a.sset) AS BIGINT) AS na, CAST(len(b.sset) AS BIGINT) AS nb
         |  FROM ss a JOIN ss b ON a.id < b.id) t
         | WHERE inter * 1000000 // (na + nb - inter) >= $DedupEvalTPpm),
         |w2 AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM sd),
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
         |hit AS (SELECT cp.id_a, cp.id_b FROM cp JOIN tp USING (id_a, id_b)),
         |c AS (SELECT (SELECT COUNT(*) FROM tp) AS n_truth,
         |  (SELECT COUNT(*) FROM cp) AS n_cand,
         |  (SELECT COUNT(*) FROM hit) AS n_hit)
         |SELECT CAST(n_truth AS BIGINT) AS n_truth,
         | CAST(n_cand AS BIGINT) AS n_cand,
         | CAST(n_hit AS BIGINT) AS n_hit,
         | CAST(CASE WHEN n_cand > 0 THEN n_hit * 1000000 // n_cand
         |   ELSE 0 END AS BIGINT) AS precision_ppm,
         | CAST(CASE WHEN n_truth > 0 THEN n_hit * 1000000 // n_truth
         |   ELSE 0 END AS BIGINT) AS recall_ppm
         |FROM c""".stripMargin,

    // greedy-earliest per stage is lossless (any witness subsequence
    // has a pointwise-earlier greedy witness), so sequential min-aggs
    // replay the funnel exactly
    "q241_funnel" -> {
      val (st1, st2, st3, st4) =
        (FunnelStages(0), FunnelStages(1), FunnelStages(2), FunnelStages(3))
      s"""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
         |  WHERE event_type = '$st1' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
         |  WHERE e.event_type = '$st2' GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
         |  WHERE e.event_type = '$st3' GROUP BY 1),
         |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |  JOIN s3 ON s3.user_id = e.user_id AND e.ts > s3.t
         |  WHERE e.event_type = '$st4' GROUP BY 1),
         |c AS (SELECT (SELECT count(*) FROM s1) AS n1,
         |  (SELECT count(*) FROM s2) AS n2,
         |  (SELECT count(*) FROM s3) AS n3,
         |  (SELECT count(*) FROM s4) AS n4)
         |SELECT * FROM (
         | SELECT CAST(1 AS INTEGER) AS stage_idx, '$st1' AS stage,
         |  CAST(n1 AS BIGINT) AS n_users, CAST(1000000 AS BIGINT) AS conv_ppm FROM c
         | UNION ALL SELECT CAST(2 AS INTEGER), '$st2', CAST(n2 AS BIGINT),
         |  CAST(CASE WHEN n1 > 0 THEN n2 * 1000000 // n1 ELSE 0 END AS BIGINT) FROM c
         | UNION ALL SELECT CAST(3 AS INTEGER), '$st3', CAST(n3 AS BIGINT),
         |  CAST(CASE WHEN n2 > 0 THEN n3 * 1000000 // n2 ELSE 0 END AS BIGINT) FROM c
         | UNION ALL SELECT CAST(4 AS INTEGER), '$st4', CAST(n4 AS BIGINT),
         |  CAST(CASE WHEN n3 > 0 THEN n4 * 1000000 // n3 ELSE 0 END AS BIGINT) FROM c)
         |ORDER BY stage_idx""".stripMargin
    },

    // standing-sketch merge == whole-corpus recompute (MAX distributes
    // over union, q233) — so the oracle IS the full rebuild, est side
    // of q232
    "q242_hll_ingest" ->
      s"""$hllOracleCore
         |SELECT event_type, n_present, s_scaled, est_hll FROM fin
         |ORDER BY event_type""".stripMargin,

    // the multiset fingerprint recomputed in full: same md5 row/bucket
    // hashes, same (count, bit_xor, modular sum) triple
    "q243_table_fingerprint" -> {
      val rh = duckHash("concat('fpr_', concat_ws('|', " +
        "CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), " +
        "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), " +
        "l_returnflag))", 15)
      val bh = duckHash("concat('fpb_', CAST(l_orderkey AS VARCHAR))", 15)
      s"""WITH r AS (SELECT $bh % 16 AS bucket, $rh AS h FROM lineitem)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         | CAST(bit_xor(h) AS BIGINT) AS xor_h,
         | CAST(SUM(h % ${Relational.FingerprintSumMod}) AS BIGINT) AS sum_mod
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // flag buckets whose fingerprint triple differs, then classify
    // changes inside flagged buckets only — the oracle replays both
    // the flagging and the drill-down
    "q244_merkle_diff" -> {
      val bh = duckHash("concat('mdb_', CAST(o_orderkey AS VARCHAR))", 15)
      def rh(tc: String) = duckHash(
        s"concat('mdr_', concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST($tc AS VARCHAR)))", 15)
      s"""WITH base AS (SELECT o_orderkey,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
         |  o_orderkey % 1000 AS m, $bh % 64 AS bucket
         | FROM orders),
         |v1 AS (SELECT o_orderkey, total_c, bucket FROM base WHERE m <> 3),
         |v2 AS (SELECT o_orderkey,
         |  CASE WHEN m = 7 THEN total_c + 100 ELSE total_c END AS total_c,
         |  bucket FROM base WHERE m <> 5),
         |f1 AS (SELECT bucket, COUNT(*) AS n, bit_xor(${rh("total_c")}) AS x,
         |  SUM(${rh("total_c")} % ${Relational.FingerprintSumMod}) AS s
         | FROM v1 GROUP BY 1),
         |f2 AS (SELECT bucket, COUNT(*) AS n, bit_xor(${rh("total_c")}) AS x,
         |  SUM(${rh("total_c")} % ${Relational.FingerprintSumMod}) AS s
         | FROM v2 GROUP BY 1),
         |flagged AS (SELECT COALESCE(f1.bucket, f2.bucket) AS bucket
         | FROM f1 FULL OUTER JOIN f2 ON f1.bucket = f2.bucket
         | WHERE f1.n IS DISTINCT FROM f2.n OR f1.x IS DISTINCT FROM f2.x
         |  OR f1.s IS DISTINCT FROM f2.s),
         |d AS (SELECT COALESCE(a.bucket, b.bucket) AS bucket,
         |  CASE WHEN a.o_orderkey IS NULL THEN 'insert'
         |   WHEN b.o_orderkey IS NULL THEN 'delete'
         |   WHEN a.total_c <> b.total_c THEN 'update'
         |   ELSE 'unchanged' END AS ct
         | FROM (SELECT v1.* FROM v1 JOIN flagged USING (bucket)) a
         | FULL OUTER JOIN (SELECT v2.* FROM v2 JOIN flagged USING (bucket)) b
         |  ON a.bucket = b.bucket AND a.o_orderkey = b.o_orderkey)
         |SELECT bucket,
         | CAST(SUM(CASE WHEN ct = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
         | CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
         | CAST(SUM(CASE WHEN ct = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_update
         |FROM d WHERE ct <> 'unchanged' GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // same shingle-df table, same (freq DESC, tok ASC) ranking, same
    // anchor self-join — integer ratios, no float log on either side
    "q245_zipf_anchors" ->
      s"""WITH w AS (SELECT sh AS tok FROM ($SHINGLES3)),
         |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM w GROUP BY 1),
         |rk AS (SELECT tok, freq,
         |  CAST(row_number() OVER (ORDER BY freq DESC, tok ASC) AS BIGINT) AS rank
         | FROM f),
         |top AS (SELECT * FROM rk WHERE rank <= 512)
         |SELECT a.rank, a.tok, a.freq, b.freq AS freq2,
         | CAST(a.freq * 1000000 // b.freq AS BIGINT) AS ratio_ppm
         |FROM top a JOIN top b ON b.rank = a.rank * 2
         |WHERE a.rank IN (1,2,4,8,16,32,64,128,256)
         |ORDER BY a.rank""".stripMargin,

    // same daily-close argmax, same per-user day grid, same LOCF
    // (IGNORE NULLS running last) — the engine's window replayed
    "q246_gap_fill" ->
      """WITH e AS (SELECT user_id,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
        |  event_id, CAST(round(value * 100) AS BIGINT) AS value_c,
        |  CAST(ts AS DATE) AS day FROM events),
        |cl AS (SELECT user_id, day, value_c FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, day
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
        |sp AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM cl GROUP BY 1),
        |grid AS (SELECT user_id,
        |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM sp),
        |j AS (SELECT g.user_id, g.day, cl.value_c
        | FROM grid g LEFT JOIN cl ON cl.user_id = g.user_id AND cl.day = g.day),
        |f AS (SELECT user_id, day,
        |  last_value(value_c IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        | FROM j)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_users,
        | CAST(SUM(filled) AS BIGINT) AS sum_value_c
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // lower medians at rank ceil(n/2) — exact integers, no
    // interpolation to disagree on; 3xMAD rule replayed verbatim
    "q247_daily_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT total_c AS med FROM (
        |  SELECT total_c, row_number() OVER (ORDER BY total_c) AS rn,
        |   COUNT(*) OVER () AS n FROM daily) WHERE rn = (n + 1) // 2),
        |md AS (SELECT dev AS mad FROM (
        |  SELECT dev, row_number() OVER (ORDER BY dev) AS rn,
        |   COUNT(*) OVER () AS n
        |  FROM (SELECT abs(total_c - (SELECT med FROM m)) AS dev FROM daily))
        | WHERE rn = (n + 1) // 2)
        |SELECT strftime(day, '%Y-%m-%d') AS day, total_c,
        | CAST((SELECT med FROM m) AS BIGINT) AS med_c,
        | CAST((SELECT mad FROM md) AS BIGINT) AS mad_c,
        | CAST(abs(total_c - (SELECT med FROM m)) AS BIGINT) AS dev_c,
        | CAST(CASE WHEN abs(total_c - (SELECT med FROM m))
        |   > 3 * (SELECT mad FROM md) THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM daily ORDER BY 1""".stripMargin,

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

    // same first-signup cohort, same distinct activity days, same
    // day-offset counts in exact ppm
    "q249_retention_cohorts" ->
      """WITH co AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        | FROM events WHERE event_type = 'signup' GROUP BY 1),
        |ac AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
        | FROM co GROUP BY 1),
        |m AS (SELECT co.cohort_day,
        |  CAST(datediff('day', co.cohort_day, ac.day) AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_active
        | FROM co JOIN ac ON ac.user_id = co.user_id
        | WHERE ac.day >= co.cohort_day GROUP BY 1, 2)
        |SELECT strftime(m.cohort_day, '%Y-%m-%d') AS cohort_day, k,
        | n_active, n_cohort,
        | CAST(n_active * 1000000 // n_cohort AS BIGINT) AS retained_ppm
        |FROM m JOIN sz ON sz.cohort_day = m.cohort_day
        |ORDER BY 1, 2""".stripMargin,

    // same island key (day_number - row_number), same two rollups
    "q250_activity_streaks" ->
      """WITH ac AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (SELECT user_id,
        |  datediff('day', DATE '1990-01-01', day)
        |    - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
        | FROM ac),
        |runs AS (SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS len
        | FROM isl GROUP BY 1, 2),
        |pi AS (SELECT len, CAST(COUNT(*) AS BIGINT) AS n_islands
        | FROM runs GROUP BY 1),
        |pu AS (SELECT len, CAST(COUNT(*) AS BIGINT) AS n_users_max FROM (
        |  SELECT user_id, MAX(len) AS len FROM runs GROUP BY 1) GROUP BY 1)
        |SELECT COALESCE(pi.len, pu.len) AS streak_len,
        | COALESCE(n_islands, 0) AS n_islands,
        | COALESCE(n_users_max, 0) AS n_users_max
        |FROM pi FULL OUTER JOIN pu ON pi.len = pu.len
        |ORDER BY 1""".stripMargin,

    // replay on RAW per-event intervals (durations are additive over
    // the collapse); interval count = state-change flags
    "q251_time_in_state" ->
      """WITH np AS (SELECT user_id,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
        |  event_id, event_type FROM events WHERE event_type <> 'purchase'),
        |r AS (SELECT event_type, ts,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM np),
        |mx AS (SELECT MAX(ts) AS h FROM np),
        |dur AS (SELECT event_type,
        |  epoch_us(COALESCE(nxt, (SELECT h FROM mx))) - epoch_us(ts) AS d_us,
        |  CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END AS st
        | FROM r),
        |agg AS (SELECT event_type AS state, CAST(SUM(st) AS BIGINT) AS n_intervals,
        |  CAST(SUM(d_us) AS BIGINT) AS total_us FROM dur GROUP BY 1),
        |t AS (SELECT CAST(SUM(total_us) AS BIGINT) AS g FROM agg)
        |SELECT state, n_intervals, total_us,
        | CAST(total_us // ((SELECT g FROM t) // 1000000) AS BIGINT) AS share_ppm
        |FROM agg ORDER BY 1""".stripMargin,

    // same QI tuple, same +1-band offset so // == div on negatives
    "q252_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |  (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bal_band,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM customer GROUP BY 1, 2, 3),
        |ks AS (SELECT unnest([2, 5, 10]) AS k)
        |SELECT CAST(k AS BIGINT) AS k,
        | CAST(COUNT(*) AS BIGINT) AS n_groups,
        | CAST(SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
        | CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
        | CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) * 1000000 // SUM(n)
        |   AS BIGINT) AS risky_ppm
        |FROM g CROSS JOIN ks GROUP BY 1 ORDER BY 1""".stripMargin,

    // same daily counts, same integer week-shift decay, same tie order
    "q253_decayed_leaderboard" ->
      """WITH dc AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |h AS (SELECT MAX(day) AS hd FROM dc)
        |SELECT user_id,
        | CAST(SUM(c >> LEAST(datediff('day', day, (SELECT hd FROM h)) // 7, 63))
        |   AS BIGINT) AS score,
        | CAST(SUM(c) AS BIGINT) AS n_events
        |FROM dc GROUP BY 1
        |ORDER BY score DESC, user_id ASC LIMIT 20""".stripMargin,

    // same shingle first-seen table, same doubling-prefix counts
    "q254_heaps_anchors" -> {
      val anchors = (5 to 12).map(1L << _)
      val sums = anchors.map(n =>
        s"CAST(SUM(CASE WHEN first_id < $n THEN 1 ELSE 0 END) AS BIGINT) AS v$n")
        .mkString(", ")
      val rows = anchors.tail.map { n =>
        s"""SELECT CAST($n AS BIGINT) AS prefix_docs, v${n / 2} AS vocab_half,
           | v$n AS vocab,
           | CAST(CASE WHEN v${n / 2} > 0 THEN v$n * 1000000 // v${n / 2}
           |   ELSE 0 END AS BIGINT) AS growth_ppm FROM s""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH f AS (SELECT sh, MIN(id) AS first_id FROM ($SHINGLES3) GROUP BY 1),
         |s AS (SELECT $sums FROM f)
         |SELECT * FROM ($rows)
         |ORDER BY prefix_docs""".stripMargin
    },

    // same lead gap, same bit_length bucket (floor-log2 + 1, 0 for
    // zero gaps) — integer bit arithmetic on both sides
    "q255_interarrival_hist" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, event_id
        | FROM events),
        |r AS (SELECT event_type,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
        | FROM e),
        |g AS (SELECT event_type, gap_us // 1000000 AS gap_s FROM r
        | WHERE gap_us IS NOT NULL)
        |SELECT event_type,
        | CAST(CASE WHEN gap_s <= 0 THEN 0 ELSE length(bin(gap_s)) END
        |   AS BIGINT) AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the direct long form — pivot∘unpivot must be its identity
    "q256_unpivot_roundtrip" ->
      """SELECT o_orderpriority, o_orderstatus,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // full reachable-set closure per stage (greedy-earliest is wrong
    // under deadlines), replayed as distinct band joins
    "q257_windowed_funnel" -> {
      val sts = FunnelStages
      s"""WITH e AS (SELECT user_id AS u,
         |  epoch_us(CAST(date_trunc('microseconds', ts) AS TIMESTAMP)) AS t,
         |  event_type AS tp FROM events),
         |c1 AS (SELECT DISTINCT u, t FROM e WHERE tp = '${sts(0)}'),
         |c2 AS (SELECT DISTINCT e.u, e.t FROM e JOIN c1
         |  ON c1.u = e.u AND e.t > c1.t AND e.t <= c1.t + $FunnelWindowUs
         | WHERE e.tp = '${sts(1)}'),
         |c3 AS (SELECT DISTINCT e.u, e.t FROM e JOIN c2
         |  ON c2.u = e.u AND e.t > c2.t AND e.t <= c2.t + $FunnelWindowUs
         | WHERE e.tp = '${sts(2)}'),
         |c4 AS (SELECT DISTINCT e.u, e.t FROM e JOIN c3
         |  ON c3.u = e.u AND e.t > c3.t AND e.t <= c3.t + $FunnelWindowUs
         | WHERE e.tp = '${sts(3)}'),
         |n AS (SELECT (SELECT COUNT(DISTINCT u) FROM c1) AS n1,
         |  (SELECT COUNT(DISTINCT u) FROM c2) AS n2,
         |  (SELECT COUNT(DISTINCT u) FROM c3) AS n3,
         |  (SELECT COUNT(DISTINCT u) FROM c4) AS n4)
         |SELECT * FROM (
         | SELECT CAST(1 AS INTEGER) AS stage_idx, '${sts(0)}' AS stage,
         |  CAST(n1 AS BIGINT) AS n_users, CAST(1000000 AS BIGINT) AS conv_ppm FROM n
         | UNION ALL SELECT CAST(2 AS INTEGER), '${sts(1)}', CAST(n2 AS BIGINT),
         |  CAST(CASE WHEN n1 > 0 THEN n2 * 1000000 // n1 ELSE 0 END AS BIGINT) FROM n
         | UNION ALL SELECT CAST(3 AS INTEGER), '${sts(2)}', CAST(n3 AS BIGINT),
         |  CAST(CASE WHEN n2 > 0 THEN n3 * 1000000 // n2 ELSE 0 END AS BIGINT) FROM n
         | UNION ALL SELECT CAST(4 AS INTEGER), '${sts(3)}', CAST(n4 AS BIGINT),
         |  CAST(CASE WHEN n3 > 0 THEN n4 * 1000000 // n3 ELSE 0 END AS BIGINT) FROM n)
         |ORDER BY stage_idx""".stripMargin
    },

    // same md5 arm coin, same per-user conversion/revenue rollup
    "q258_ab_readout" -> {
      val coin = duckHash("concat('ab_', CAST(user_id AS VARCHAR))", 15)
      s"""WITH u AS (SELECT user_id,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         |  SUM(CASE WHEN event_type = 'purchase'
         |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS value_c
         | FROM events GROUP BY 1),
         |a AS (SELECT CASE WHEN $coin % 2 = 0 THEN 'control'
         |   ELSE 'treatment' END AS arm, converted, value_c FROM u)
         |SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(SUM(converted) AS BIGINT) AS n_converted,
         | CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
         | CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS conv_ppm
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q40's quality replay cut into deciles on the exact 4-decimal
    // value; dup membership from q33's 16-bit simhash replay
    "q259_quality_dup_lift" -> {
      val sw = StopWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
         |s AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN ($sw))) AS BIGINT) AS n_stop FROM t),
         |q AS (SELECT doc_id,
         |  round(least(CAST(n_tokens AS DOUBLE)/50.0, 1.0)*0.4
         |   + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END)*4.0, 1.0)*0.3
         |   + (CASE WHEN length(text) > 0
         |      THEN CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)/length(text)
         |      ELSE 0.0 END)*0.3, 4) AS quality
         | FROM s),
         |dec AS (SELECT doc_id,
         |  least(CAST(round(quality * 10000) AS BIGINT) // 1000, 9) AS decile
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

    // same durations/censoring, same risk-set suffix sums, same
    // per-step integer floor product via a recursive CTE
    "q260_kaplan_meier" ->
      """WITH RECURSIVE su AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS s_day
        | FROM events WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS p_day
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |h AS (SELECT MAX(CAST(ts AS DATE)) AS hd FROM events),
        |dur AS (SELECT
        |  CASE WHEN pu.p_day IS NOT NULL AND pu.p_day >= su.s_day
        |   THEN datediff('day', su.s_day, pu.p_day)
        |   ELSE datediff('day', su.s_day, (SELECT hd FROM h)) END AS t,
        |  CASE WHEN pu.p_day IS NOT NULL AND pu.p_day >= su.s_day
        |   THEN 1 ELSE 0 END AS is_event
        | FROM su LEFT JOIN pu USING (user_id)),
        |bd AS (SELECT t, CAST(SUM(is_event) AS BIGINT) AS d,
        |  CAST(SUM(1 - is_event) AS BIGINT) AS c FROM dur GROUP BY 1),
        |ord AS (SELECT t, d, c, row_number() OVER (ORDER BY t) AS rn,
        |  (SELECT SUM(d + c) FROM bd)
        |   - COALESCE(SUM(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        | FROM bd),
        |km AS (
        | SELECT rn, t, n_risk, d, c,
        |  CASE WHEN d > 0 AND n_risk > 0
        |   THEN 1000000 * (n_risk - d) // n_risk ELSE 1000000 END AS surv
        | FROM ord WHERE rn = 1
        | UNION ALL
        | SELECT o.rn, o.t, o.n_risk, o.d, o.c,
        |  CASE WHEN o.d > 0 AND o.n_risk > 0
        |   THEN km.surv * (o.n_risk - o.d) // o.n_risk ELSE km.surv END
        | FROM ord o JOIN km ON o.rn = km.rn + 1)
        |SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
        | d AS n_events, c AS n_censored, CAST(surv AS BIGINT) AS surv_ppm
        |FROM km ORDER BY 1""".stripMargin,

    // same daily totals, same lag-7 join, same floor APE, same lower
    // median
    "q261_seasonal_baseline" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |sc AS (SELECT a.day, a.total_c, p.total_c AS pred_c,
        |  CAST(abs(a.total_c - p.total_c) * 1000000 // a.total_c AS BIGINT) AS ape_ppm
        | FROM daily a JOIN daily p ON p.day = a.day - INTERVAL 7 DAY),
        |m AS (SELECT ape_ppm AS med FROM (
        |  SELECT ape_ppm, row_number() OVER (ORDER BY ape_ppm) AS rn,
        |   COUNT(*) OVER () AS n FROM sc) WHERE rn = (n + 1) // 2)
        |SELECT strftime(day, '%Y-%m-%d') AS day, total_c, pred_c, ape_ppm,
        | CAST((SELECT med FROM m) AS BIGINT) AS median_ape_ppm
        |FROM sc ORDER BY 1""".stripMargin,

    // same cents first digit, same hard-coded Benford ppm constants
    "q262_benford_audit" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
        | FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
        |g AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |  CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM v),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757)) AS b(digit, benford_ppm))
        |SELECT g.digit, g.n,
        | CAST(g.n * 1000000 // (SELECT total FROM t) AS BIGINT) AS observed_ppm,
        | CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        | CAST(abs(g.n * 1000000 // (SELECT total FROM t) - e.benford_ppm)
        |   AS BIGINT) AS abs_diff_ppm
        |FROM g JOIN e ON e.digit = g.digit
        |ORDER BY 1""".stripMargin,

    // q63's min-label propagation chain, rolled to the size histogram
    "q263_cluster_size_hist" -> {
      val iters = 4
      val prop = (1 to iters).map { k =>
        s"""l$k AS (SELECT node, MIN(label) AS label FROM (
           | SELECT node, label FROM l${k - 1}
           | UNION ALL
           | SELECT e.u AS node, l.label FROM edges e JOIN l${k - 1} l ON e.v = l.node) t
           | GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH w AS (SELECT doc_id AS id, unnest($TOKS) AS w FROM documents),
         |h AS (SELECT id, ${duckHash("w", 15)} AS h FROM w),
         |bits AS (SELECT id, bit,
         |  SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
         | FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b GROUP BY 1,2),
         |sh AS (SELECT id,
         |  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         | FROM bits GROUP BY 1),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         | FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.id < b.id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM p
         | UNION ALL SELECT id_b AS u, id_a AS v FROM p),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges),
         |$prop,
         |sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS size
         | FROM l$iters GROUP BY 1)
         |SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         | CAST(size * COUNT(*) AS BIGINT) AS n_docs
         |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )
}
