package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication family for the LLM-data-pipeline surface (SURVEY.md §2b):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design notes (these run on ~100 TB corpora, not just the sf
  * fixtures):
  *  - NOTHING here is a cross join. Every candidate-generation step is a
  *    hash-partitioned equi-join on a derived key (fingerprint, LSH band,
  *    shared shingle, LSH bucket), so the shuffle volume is O(data), and
  *    skewed keys are handled by AQE's skew-join splitting.
  *  - All hashes are md5-derived (tokenHash64) => deterministic across
  *    engines, which makes every variant DuckDB-oracle-checkable.
  *  - Pair enumeration dedupes with `a.id < b.id` inside the join
  *    condition, halving the candidate space before the shuffle.
  *
  * The reference has no dedup operators (SURVEY.md §2a covers its entire
  * 876-LoC surface); these generalize its scan→agg shape
  * (usr_functions.c:19-109) to similarity keys.
  */
object Dedup {

  /** Exact dedup: keep the lowest doc id per normalized-content
    * fingerprint. One shuffle on the 128-bit fingerprint; partial
    * (map-side) min makes the exchange carry one row per distinct doc per
    * partition.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of a text column (distinct). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    array_distinct(
      when(n < k, array(array_join(toks, " ")))
        .otherwise(
          transform(sequence(lit(0), n - k), i =>
            array_join(slice(toks, i + 1, lit(k)), " "))))
  }

  /** Candidate pairs sharing >= 1 shingle, with exact Jaccard similarity
    * over distinct k-shingles. The inverted-index self-equi-join on the
    * shingle key IS the scale plan: shuffle is proportional to the posting
    * lists, never |docs|^2. `minJaccard` filters after an exact
    * common-count aggregation.
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b,
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: `numHashes` permutations h_i(x) = (a_i*x + b_i)
    * mod p over shingle hashes, min per permutation. Returned as one row
    * per (id, hash_idx, min_hash).
    *
    * The whole signature is computed PER ROW with higher-order functions
    * (array_min over a transformed hash array) — zero shuffle, instead of
    * the naive explode(shingles) x explode(numHashes) plan that pushes
    * |docs|*|shingles|*numHashes rows through an exchange. At 100 TB the
    * signature stage is embarrassingly parallel map work; only the
    * numHashes rows per doc leave the stage.
    */
  def minHashes(docs: DataFrame, idCol: String, textCol: String,
                k: Int, numHashes: Int): DataFrame = {
    // 28-bit shingle hashes + small affine coefficients keep (a*h+b) far
    // below 2^63: the JVM would silently wrap but DuckDB raises on BIGINT
    // overflow, so oracle parity requires staying in range.
    val P = 2147483647L // 2^31-1, Mersenne prime
    val entries = (0 until numHashes).map { i =>
      struct(lit(i).as("hash_idx"),
        array_min(transform(col("hs"),
          h => pmod(h * lit(2L * i + 1) + lit(i * 40503L + 7L), lit(P)))).as("hv"))
    }
    docs
      .select(col(idCol).as("id"),
        transform(shingles(col(textCol), k), s => tokenHash32(s)).as("hs"))
      .select(col("id"), explode(array(entries: _*)).as("p"))
      .select(col("id"), col("p.hash_idx").as("hash_idx"), col("p.hv").as("min_hash"))
  }

  /** MinHash + LSH banding: signatures are split into `bands` bands of
    * `rowsPerBand` hashes; docs agreeing on ALL hashes of any band become
    * candidate pairs (single equi-join on the band fingerprint), then
    * candidates are verified with the estimated Jaccard =
    * fraction of agreeing min-hashes. Pure equi-joins throughout: at
    * 100 TB the band fingerprint is the only shuffle key and band buckets
    * are small by construction (tune bands/rows for the target threshold
    * s ~ (1/bands)^(1/rowsPerBand)).
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int, bands: Int, rowsPerBand: Int,
                 minEstJaccard: Double): DataFrame = {
    val numHashes = bands * rowsPerBand
    val mh = minHashes(docs, idCol, textCol, k, numHashes)
      .withColumn("band", floor(col("hash_idx") / rowsPerBand))

    // band fingerprint = md5 of the ordered min-hashes in the band
    val bandKeys = mh
      .groupBy("id", "band")
      .agg(md5(concat_ws(",",
        array_sort(collect_list(struct(col("hash_idx"), col("min_hash"))))
          .getField("min_hash").cast("array<string>"))).as("band_key"))

    val a = bandKeys.as("a"); val b = bandKeys.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // verify candidates with estimated Jaccard over the full signature
    val sigA = mh.select(col("id").as("id_a"), col("hash_idx"), col("min_hash").as("mh_a"))
    val sigB = mh.select(col("id").as("id_b"), col("hash_idx"), col("min_hash").as("mh_b"))
    candidates
      .join(sigA, "id_a")
      .join(sigB, Seq("id_b", "hash_idx"))
      .groupBy("id_a", "id_b")
      .agg(round(avg(when(col("mh_a") === col("mh_b"), 1.0).otherwise(0.0)), 4)
        .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash per document: tokens hashed to 61-bit values, each bit
    * position votes +1/-1 weighted by token frequency, sign of the vote
    * sets the bit. Computed relationally (explode bit positions) so the
    * identical arithmetic runs in the oracle; the per-(doc,bit) partial
    * aggregation keeps the shuffle at 64 rows per doc per partition.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String, nBits: Int = 16): DataFrame = {
    // Entire hash computed per row with higher-order folds over the token
    // hash array — no explode, no shuffle (the naive relational form
    // exchanges |tokens|*nBits rows). Bit b's vote is a fold over token
    // hashes; the literal shift counts keep everything codegen-friendly.
    val sim = (0 until nBits).map { b =>
      val vote = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when(pmod(shiftright(h, b), lit(2)) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    docs
      .select(col(idCol).as("id"),
        transform(tokens(col(textCol)), t => tokenHash64(t)).as("hs"))
      .select(col("id"), sim.as("simhash"))
  }

  /** SimHash near-dup: exact-equal simhash buckets (the degenerate
    * Hamming-0 case, one equi-join). For Hamming<=d at scale, band the
    * bits into d+1 chunks and equi-join per chunk (pigeonhole) — same
    * join shape, d+1 keys.
    */
  def simHashDup(docs: DataFrame, idCol: String, textCol: String, nBits: Int = 16): DataFrame = {
    val shs = simHash(docs, idCol, textCol, nBits)
    val a = shs.as("a"); val b = shs.as("b")
    a.join(b, col("a.simhash") === col("b.simhash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.simhash").as("simhash"))
  }

  /** Embedding near-dup: LSH-bucketed cosine. Vectors are bucketed by
    * random-hyperplane signature (equi-join key); exact cosine verifies
    * within buckets. nBits trades recall for bucket size — at 100 TB the
    * bucket join replaces the O(n^2) cross join entirely.
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       nBits: Int, minCosine: Double): DataFrame = {
    // Norms are computed once per VECTOR before the join, not once per
    // candidate pair (the norm product is bit-identical either way).
    val bucketed = emb.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshBucket(col(vecCol), nBits).as("bucket"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    val nprod = col("a.nrm") * col("b.nrm")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(when(nprod > 0,
          VectorFunctions.dot(col("a.v"), col("b.v")) / nprod).otherwise(lit(0.0)), 4).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
