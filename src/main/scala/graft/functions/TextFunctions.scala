package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (SURVEY.md §2b): tokenization, quality scoring, language-ID heuristic,
  * fingerprinting. Scalar work that fits codegen'd built-in
  * `org.apache.spark.sql.functions` stays expression-based; per-document
  * LOOPS (stats, language scoring, hashing) are deliberately tight Scala
  * UDFs, because Spark's higher-order array functions are interpreted
  * (no codegen) and measured 5-10x slower. Every function keeps values
  * reproducible in the DuckDB oracle SQL regardless of form.
  *
  * These generalize the reference's two text jobs (letter frequency =
  * usr_functions.c:19-109 at char granularity; whole-word search =
  * usr_functions.c:119-238) to document-level statistics.
  */
object TextFunctions {

  /** Whitespace tokenizer. Empty/blank text => empty array (not [""]). */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Token count (whitespace words). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs are charged
    * ceil(len/4) subwords (~4 chars per BPE token on English text), every
    * other non-space char is one token. Deterministic, oracle-friendly.
    */
  def subwordCount(text: Column): Column = {
    val runs = filter(split(text, "[^0-9A-Za-z]+"), x => length(x) > 0)
    val alnumTokens = aggregate(
      runs, lit(0L), (acc, x) => acc + ceil(length(x) / lit(4.0)).cast("long"))
    val other = length(regexp_replace(text, "[0-9A-Za-z\\s]", ""))
    (alnumTokens + other).as("subwords")
  }

  /** Small fixed English stopword list (public, conventional). */
  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "that", "for", "on", "with", "as")

  /** Count of stopword tokens. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(StopWords)))

  /** Quality score in [0,1]: blends length saturation, stopword ratio and
    * alpha ratio — the standard cheap heuristics (length/punct/stopword)
    * used in public web-scale pipelines (C4/Gopher-style rules). Rounded
    * to 4 decimals via floor(x·10⁴ + 0.5)/10⁴ — half-up ON THE BINARY
    * VALUE, which both engines compute bit-identically. Spark's round()
    * is BigDecimal half-up on the double's SHORTEST DECIMAL STRING,
    * which disagrees with a binary-value rounder exactly when the
    * double sits just under a .00005 boundary whose shortest rendering
    * crosses it — a real sf1 document hit that edge (round-12 sf1 spot
    * drive, q104 kept_q off by one), so the boundary rule is now the
    * engine-neutral one everywhere quality is computed.
    */
  def qualityScore(text: Column): Column = qualityScoreFrom(text, tokens(text))

  /** [[qualityScore]] over a pre-projected token array, so a caller that
    * also needs token/stopword counts tokenizes each document ONCE (the
    * optimizer keeps the shared projection; inlining would re-run the
    * split regex per consumer).
    */
  def qualityScoreFrom(text: Column, toks: Column): Column =
    qualityScoreFromCounts(text, size(toks),
      size(filter(toks, t => t.isInCollection(StopWords))))

  /** [[qualityScore]] from pre-computed integer token/stopword counts
    * (e.g. [[textStats]] output). All double math and the final round
    * stay in this expression, so cross-engine rounding semantics are
    * identical no matter how the counts were produced.
    */
  def qualityScoreFromCounts(text: Column, nTokens: Column, nStop: Column): Column = {
    val nTok = nTokens.cast("double")
    val lengthSat = least(nTok / lit(50.0), lit(1.0))
    val swRatio = when(nTokens > 0, nStop.cast("double") / nTok).otherwise(lit(0.0))
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val alphaRatio = when(length(text) > 0, alpha / length(text).cast("double")).otherwise(lit(0.0))
    floor((lengthSat * 0.4 + least(swRatio * lit(4.0), lit(1.0)) * 0.3
      + alphaRatio * 0.3) * 10000.0 + lit(0.5)).cast("double") / 10000.0
  }

  /** One-pass integer stats struct `(n_tokens, n_subwords, n_stop)` —
    * same values as [[tokenCount]]/[[subwordCount]]/[[stopwordCount]],
    * fused into a single UDF because each of those is an interpreted
    * higher-order pass per document. Only integer math lives in the UDF;
    * anything float-sensitive (quality) stays expression-side.
    */
  def textStats(text: Column, toks: Column): Column = {
    val stopSet = StopWords.toSet
    def isRegexSpace(c: Char): Boolean = // Java regex \s, as split("\\s+") uses
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    def isAlnum(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    val f = udf { (s: String, tk: Seq[String]) =>
      val nTokens = if (tk == null) 0L else tk.size.toLong
      val nStop = if (tk == null) 0L else tk.count(stopSet.contains).toLong
      var sub = 0L
      if (s != null) {
        var run = 0; var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (isAlnum(c)) run += 1
          else {
            if (run > 0) { sub += (run + 3) / 4; run = 0 }
            if (!isRegexSpace(c)) sub += 1
          }
          i += 1
        }
        if (run > 0) sub += (run + 3) / 4
      }
      (nTokens, sub, nStop)
    }
    f(text, toks)
  }

  /** N-gram language-ID heuristic: score text against per-language marker
    * token sets (deterministic, replicable in SQL). Returns the language
    * with the highest marker-hit count, 'und' when no markers hit.
    * Marker sets are tiny on purpose — this is the n-gram-heuristic shape
    * (profile intersection), not a trained model.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "y", "es", "las"),
  )

  /** Greatest-score language; ties broken by language-code order (en < de
    * < fr < es evaluation order => first max wins via strict >). One UDF
    * pass over the tokens — the per-language filter() chain ran nBits
    * interpreted passes (HigherOrderFunctions never enter codegen).
    */
  def langId(text: Column): Column = langIdFrom(tokens(text))

  /** [[langId]] over a pre-projected token array, so a caller that also
    * needs token counts / quality tokenizes each document ONCE.
    */
  def langIdFrom(toks: Column): Column = {
    val markerSets = LangMarkers.map { case (l, m) => (l, m.toSet) }
    val f = udf { ts: Seq[String] =>
      if (ts == null) "und"
      else {
        var bestLang = ""; var bestScore = -1
        markerSets.foreach { case (lang, set) =>
          val s = ts.count(set.contains)
          if (s > bestScore) { bestLang = lang; bestScore = s }
        }
        if (bestScore > 0) bestLang else "und"
      }
    }
    f(toks)
  }

  /** Per-document repetition statistics — the Gopher-style repetition
    * quality signals (Rae et al. 2021, "Scaling Language Models", App. A
    * repetition filters) over token n-grams, as one integer-count struct
    * `(n_2grams, top_2gram_count, n_3grams, dup_3gram_occ)` where
    * `top_2gram_count` is the occurrence count of the most frequent
    * 2-gram and `dup_3gram_occ` counts occurrences of 3-grams appearing
    * more than once. Ratios (fraction of the doc inside repeated grams)
    * are computed expression-side from these counts so float rounding
    * stays in one engine-neutral place.
    *
    * Documents are independent => this is map-only at any corpus scale:
    * zero shuffle, and the per-doc loop is a tight UDF (the higher-order
    * function form would run 4 interpreted passes per document).
    */
  def repetitionStats(toks: Column): Column = {
    val f = udf { tk: Seq[String] =>
      if (tk == null || tk.isEmpty) (0L, 0L, 0L, 0L)
      else {
        def gramCounts(n: Int): collection.mutable.HashMap[String, Long] = {
          val m = new collection.mutable.HashMap[String, Long]()
          var i = 0
          while (i + n <= tk.size) {
            val g = tk.slice(i, i + n).mkString(" ")
            m.update(g, m.getOrElse(g, 0L) + 1L)
            i += 1
          }
          m
        }
        val g2 = gramCounts(2)
        val g3 = gramCounts(3)
        val n2 = g2.valuesIterator.sum
        val top2 = if (g2.isEmpty) 0L else g2.valuesIterator.max
        val n3 = g3.valuesIterator.sum
        val dup3 = g3.valuesIterator.filter(_ > 1L).sum
        (n2, top2, n3, dup3)
      }
    }
    f(toks)
  }

  /** Content fingerprint: md5 of whitespace-normalized lower-cased text.
    * Identical in DuckDB (`md5(...)`), so exact-dedup is oracle-checkable.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit stable token hash from the md5 hex digest (first 16 hex chars
    * => unsigned-ish long via conv). Same value is computable in DuckDB,
    * which is what makes MinHash/SimHash oracle-checkable — unlike
    * xxhash64 whose implementation DuckDB lacks.
    */
  def tokenHash64(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** JVM twin of [[tokenHash64]] for UDF hot paths — bit-identical value
    * (MD5 over UTF-8 is the same everywhere; first 15 hex chars = 60 bits
    * fit a Long exactly).
    */
  def tokenHash64Jvm(s: String): Long = {
    // first 15 hex chars = first 7.5 bytes = 60 bits, read numerically
    val d = md5Jvm(s)
    var v = 0L; var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** JVM twin of [[tokenHash32]] (first 7 md5 hex chars = 28 bits). */
  def tokenHash32Jvm(s: String): Long = {
    val d = md5Jvm(s)
    (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12)
      | ((d(2) & 0xffL) << 4) | ((d(3) >> 4) & 0xfL))
  }

  /** Jaro-Winkler similarity, the DuckDB-compatible variant — verified
    * bit-identical (0/16 000 random pairs differ by > 1e-12) against
    * DuckDB's `jaro_winkler_similarity` so the oracle can use the
    * native function: matching window max(|a|,|b|)∕2 − 1, greedy
    * left-to-right matching, transpositions TRUNCATED to an integer
    * (mismatched∕2 floored — the detail that distinguishes this family
    * from the half-transposition textbook form), Winkler prefix boost
    * (≤ 4 chars, 0.1 scale) only when jaro > 0.7, and the canonical
    * IEEE op order (m∕|a| + m∕|b| + (m−t)∕m)∕3. Either side empty → 0.
    */
  def jaroWinklerJvm(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatches between the two matched-char streams
    var t = 0
    var (a, b) = (0, 0)
    var k = 0
    while (k < m) {
      while (!m1(a)) a += 1
      while (!m2(b)) b += 1
      if (s1.charAt(a) != s2.charAt(b)) t += 1
      a += 1; b += 1; k += 1
    }
    t /= 2 // truncated, not half — the DuckDB family
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      while (l < math.min(4, math.min(l1, l2)) &&
             s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column form of [[jaroWinklerJvm]], rounded to 6 places (the
    * engine-neutral rounding both sides share). NULL on either side
    * propagates to NULL — matching DuckDB's native
    * jaro_winkler_similarity, so a q291-style oracle stays exact on
    * nullable columns too (ADVICE r12: the old 0.0-on-null silently
    * diverged from the oracle's null semantics).
    */
  def jaroWinkler6(a: Column, b: Column): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) None else Some(jaroWinklerJvm(x, y))
    }
    round(f(a, b), 6)
  }

  // MessageDigest.getInstance costs more than the digest on short tokens
  private val Md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Jvm(s: String): Array[Byte] =
    Md5Digest.get().digest(s.getBytes("UTF-8"))

  /** Deterministic Poisson-surrogate bootstrap weights for resamples
    * 0..n−1 of one keyed row: weight = {0,1,1,2} (E=1, Var=½) from the
    * low 2 bits of hex char (b mod 32) of md5("<prefix><id>_<b div
    * 32>") — 32 coins per digest, so a row pays ⌈n∕32⌉ md5s in ONE
    * tight JVM pass (the measured 5-10× over interpreted higher-order
    * array expressions, SURVEY §perf). The hex-string definition is
    * the contract: an engine-independent oracle replays it with
    * md5()/substr()/% only. A NULL id propagates to NULL (boxed-Long
    * UDF; ADVICE r12: the primitive form coerced null ids to 0L, so
    * all null-id rows silently shared the id-0 weight vector —
    * identical resamples, a biased bootstrap).
    */
  def bootstrapWeights(idCol: Column, n: Int,
                       prefix: String = "bs_"): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val f = udf { (boxed: java.lang.Long) =>
      if (boxed == null) None
      else {
        val id = boxed.longValue()
        val out = new Array[Long](n)
        var k = 0
        while (k * 32 < n) {
          val d = md5Jvm(s"$prefix${id}_$k")
          var j = 0
          while (j < 32 && k * 32 + j < n) {
            val nib = if (j % 2 == 0) (d(j / 2) >> 4) & 0xf else d(j / 2) & 0xf
            out(k * 32 + j) = (nib % 4) match {
              case 0 => 0L
              case 3 => 2L
              case _ => 1L
            }
            j += 1
          }
          k += 1
        }
        Some(out)
      }
    }
    f(idCol)
  }

  /** Deterministic ±1 sign flips for permutation resamples 0..n−1 of
    * one keyed row — [[bootstrapWeights]]'s sibling for sign-flip
    * (paired) permutation tests: sign b = +1 when hex char (b mod 32)
    * of md5("<prefix><id>_<b div 32>") has even nibble value, −1
    * otherwise (exactly P(+1)=½ per coin: 8 even hex digits of 16).
    * Same one-digest-per-32-coins economics, same engine-independent
    * hex-string contract (an oracle replays it with md5/substr and a
    * hex-digit parity table), same boxed-Long null propagation.
    */
  def signFlips(idCol: Column, n: Int, prefix: String = "sf_"): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val f = udf { (boxed: java.lang.Long) =>
      if (boxed == null) None
      else {
        val id = boxed.longValue()
        val out = new Array[Long](n)
        var k = 0
        while (k * 32 < n) {
          val d = md5Jvm(s"$prefix${id}_$k")
          var j = 0
          while (j < 32 && k * 32 + j < n) {
            val nib = if (j % 2 == 0) (d(j / 2) >> 4) & 0xf else d(j / 2) & 0xf
            out(k * 32 + j) = if (nib % 2 == 0) 1L else -1L
            j += 1
          }
          k += 1
        }
        Some(out)
      }
    }
    f(idCol)
  }

  /** 28-bit stable token hash (first 7 md5 hex chars). Small enough that
    * affine permutations (a*h+b) never overflow 63 bits — the JVM wraps
    * silently on Long overflow but DuckDB raises, so oracle-checkable
    * MinHash must stay inside the safe range.
    */
  def tokenHash32(t: Column): Column =
    conv(substring(md5(t), 1, 7), 16, 10).cast("long")

  /** Windowed co-occurrence pairs for TextRank-style graphs, MAP-SIDE:
    * one tight JVM pass over a doc's token array emits every
    * (min, max)-normalized unordered pair at position offsets
    * 1..maxOffset with distinct words — no posexplode + full-corpus
    * window exchange (the lead() form shuffled every token; this form's
    * only shuffle is the downstream edge-count agg — measured 8.3 s →
    * linear at sf1 for q188).
    */
  def cooccurPairsUdf(maxOffset: Int) =
    org.apache.spark.sql.functions.udf { toks: Seq[String] =>
      if (toks == null) Seq.empty[(String, String)]
      else {
        val n = toks.size
        val out = Seq.newBuilder[(String, String)]
        var i = 0
        while (i < n) {
          var o = 1
          while (o <= maxOffset && i + o < n) {
            val a = toks(i); val b = toks(i + o)
            if (a != b) out += (if (a < b) (a, b) else (b, a))
            o += 1
          }
          i += 1
        }
        out.result()
      }
    }

  /** Rolling polynomial hash (Rabin-Karp shape) of the full string:
    * h = sum(c_i * B^(n-1-i)) mod M with B=257, M=2^31-1 — ONE tight
    * JVM loop per document. The original higher-order
    * `aggregate(split(text, ''), ...)` form is NOT codegen'd
    * (HigherOrderFunction has no doGenCode — the same measured trade
    * as q125's gram loop, SURVEY §2c) and allocates a single-char
    * String per input character; per-char interpreted evaluation was
    * the suite's worst second-decade grower (sf1 4.6 s → sf10 85.4 s,
    * 18.5×, GC-bound). This is the document-fingerprinting rolling
    * hash; for windowed shingle hashes see Dedup.
    *
    * Chars are UTF-16 code units (charAt), matching ascii()/DuckDB
    * ascii codepoints exactly on BMP text (the whole corpus). M stays
    * at 31 bits so acc*257+c never exceeds 2^63 (the JVM would wrap
    * silently, DuckDB would raise — in-range keeps it
    * oracle-checkable). NULL text yields NULL, as the HOF form's null
    * array did.
    */
  def rollingHash(text: Column): Column = {
    val M = 2147483647L // 2^31-1
    val h = udf { s: String =>
      if (s == null) Option.empty[Long]
      else {
        var acc = 0L
        var i = 0
        while (i < s.length) {
          acc = (acc * 257L + s.charAt(i).toLong) % M
          i += 1
        }
        Some(acc)
      }
    }
    h(text)
  }
}
