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

/** Multimodal query registry — binary media decode, fingerprints, scenes/silence, sampled twins.
  * Split verbatim from SparkEntry (round 12): every entry is the
  * original closure/SQL, unchanged; SparkEntry concatenates the
  * family maps back into the driver contract.
  */
private[graft] object QueriesMultimodal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- multimodal plumbing (decode is a deterministic stub; see
    //     graft.multimodal.Multimodal) ---

    "q38_multimodal_features" -> ((s, d) => {
      Multimodal.mediaFeatures(s, documents(s, d))
        .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_mean"))
        .orderBy("media_id")
    }),

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

    "q189_audio_silence" -> ((s, d) =>
      // VAD-lite: silence segmentation over REAL WAV decode — map-only,
      // per-file run merge inside the stage, blob never shuffles; the
      // oracle derives silent windows from the fixture amplitude
      // formula, no WAV decoded (Multimodal.audioSilenceSegments
      // scaladoc).
      Multimodal.audioSilenceSegments(mediaFixture(s, d, "audio_dup")(
          Multimodal.mediaWithDupAudio(s, documents(s, d)))).toDF()
        .orderBy("media_id", "seg")),

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
  )

  val oracleSql: Map[String, String] = Map(

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
  )
}
