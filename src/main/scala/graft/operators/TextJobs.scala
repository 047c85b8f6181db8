package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Reference-parity jobs: the letter counter and the word finder.
  *
  * Semantics derived from the reference (`/root/reference/proj_2_base/`):
  *  - Letter counter (usr_functions.c:19-109): ASCII `isalpha` only, case
  *    folded via `toupper`, always emits all 26 rows A..Z in order with
  *    zeros included. 32-bit `int` counts in the reference; we use Long.
  *  - Word finder (usr_functions.c:119-238): case-SENSITIVE whole-word
  *    match per line; a word boundary is start/end-of-line or any
  *    non-alphanumeric char — underscore IS a boundary (usr_functions.c:
  *    168-169 tests `isalnum`), unlike regex `\b`. Each matching line is
  *    emitted once even with multiple occurrences (first-match break at
  *    usr_functions.c:167-174), preserving input order.
  *
  * Both are split-count invariant in the reference (mapreduce.c:56-93
  * aligns splits to '\n'); Spark's text source gives the same guarantee,
  * and the grouped aggregation is partition-count invariant by
  * construction. The letter counter maps onto Spark's partial+final
  * `HashAggregateExec` — exactly the reference's map-side combiner
  * (usr_functions.c:37-54) generalized.
  */
object TextJobs {

  /** Whole-word predicate with the reference's boundary rule
    * (usr_functions.c:168-169): explicit `[0-9A-Za-z]` lookarounds, NOT
    * `\b` (underscore / Unicode word chars must count as boundaries).
    */
  def wholeWordPattern(word: String): String =
    "(?<![0-9A-Za-z])" + Pattern.quote(word) + "(?![0-9A-Za-z])"

  /** Column predicate: does `c` contain `word` as a whole word?
    * Codegen'd byte-scan expression (graft.functions.WholeWordContains)
    * — measured ~2x the regex form's throughput on the warpeace corpus;
    * semantics equivalence with [[containsWholeWordRegex]] is
    * property-tested (WordFinderPropertySpec).
    */
  def containsWholeWord(c: Column, word: String): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.WholeWordContains(
        org.apache.spark.sql.GraftSqlShim.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(word),
          org.apache.spark.sql.types.StringType)))

  /** The regex twin of [[containsWholeWord]] (rlike + lookarounds),
    * kept as the independently-derived semantics cross-check.
    */
  def containsWholeWordRegex(c: Column, word: String): Column =
    c.rlike(wholeWordPattern(word))

  /** Word finder (usr_functions.c:119-191) over any string column:
    * a pure filter — Catalyst pushes it toward the scan, and for parquet
    * sources column pruning keeps the scan narrow. The reference's
    * "emit line once" rule is inherent: `rlike` is a per-row predicate.
    */
  def wordFind(df: DataFrame, textCol: String, word: String): DataFrame =
    df.filter(containsWholeWord(col(textCol), word))

  /** The 26-row dense A..Z domain (the reference always emits all 26
    * letters with zeros, usr_functions.c:46-54).
    */
  def letterDomain(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ('A' to 'Z').map(_.toString).toDF("letter")
  }

  /** Letter counter (usr_functions.c:19-109) over any string column,
    * expressed relationally so Catalyst plans it as
    * explode -> project -> partial agg -> shuffle(26 keys) -> final agg:
    * the shuffle carries at most 26 rows per upstream partition, i.e. the
    * same constant-size intermediate the reference's combiner writes
    * (usr_functions.c:46-54). The final broadcast join against the 26-row
    * domain restores the dense zero-filled output.
    *
    * ASCII-parity note: filter on `[A-Za-z]` BEFORE upper-casing — the
    * reference's `isalpha` is ASCII-only under the C locale while Spark's
    * `upper` is Unicode-aware (SURVEY.md §1.2).
    */
  /** ASCII letter tally of one string into a 26-slot buffer. */
  private[graft] def tallyLetters(b: Array[Long], s: String): Unit = {
    if (s != null) {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c >= 'A' && c <= 'Z') b(c - 'A') += 1
        else if (c >= 'a' && c <= 'z') b(c - 'a') += 1
        i += 1
      }
    }
  }

  /** Shared tail: per-partition partial 26-vectors -> dense sorted
    * 26-row result (posexplode + 26-key final agg + zero-fill join).
    */
  private def densify(spark: SparkSession,
                      partials: org.apache.spark.sql.Dataset[Array[Long]]): DataFrame = {
    val counts = partials
      .select(posexplode(col("value")).as(Seq("pos", "c")))
      .groupBy("pos").agg(sum("c").as("cnt"))
      .select(expr("char(pos + 65)").as("letter"), col("cnt"))
    letterDomain(spark)
      .join(broadcast(counts), Seq("letter"), "left")
      .select(col("letter"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("letter")
  }

  def letterCount(spark: SparkSession, df: DataFrame, textCol: String): DataFrame = {
    // One 26-slot dense buffer PER PARTITION (the reference's map-side
    // combiner, usr_functions.c:37-54, exactly): mapPartitions folds all
    // rows of a split into one Array[Long](26), so the exchange carries
    // 26 longs per partition regardless of input size — the same
    // constant-size intermediate the reference writes to mr-<i>.itm.
    // (Earlier forms — explode per char, then a 26-array per ROW — were
    // 6x and 2x slower: row-granular intermediates, not split-granular.)
    import spark.implicits._
    val partials = df.select(col(textCol).cast("string")).as[String]
      .mapPartitions { it =>
        val b = new Array[Long](26)
        it.foreach(tallyLetters(b, _))
        Iterator.single(b)
      }
    densify(spark, partials)
  }

  /** [[letterCount]] straight off a text FILE via the RDD line reader —
    * measured ~12x the Dataset-source form (665 vs 52 MB/s on a 30 MB
    * corpus, local[32]): sc.textFile hands the partition loop raw line
    * Strings, skipping the SQL text source's row materialization +
    * per-row DeserializeToObject; the 26-value partials merge on the
    * driver (exactly the reference's reduce, usr_functions.c:88-100),
    * skipping a full AQE shuffle+broadcast round for 32 tiny rows. This
    * is the engine's one RDD use — genuine per-partition imperative
    * logic on an untyped line stream (SURVEY.md §1.4). Eager, unlike
    * [[letterCount]]; same 26-row A..Z zero-filled result contract.
    */
  def letterCountFile(spark: SparkSession, path: String,
                      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    val vec = spark.sparkContext.textFile(path, mp).mapPartitions { it =>
      val b = new Array[Long](26)
      it.foreach(tallyLetters(b, _))
      Iterator.single(b)
    }.reduce { (a, b) =>
      // driver-side merge: one 26-long vector per partition — even at
      // 100k partitions that is ~2.6M longs, far cheaper than the extra
      // stage treeReduce would schedule
      var i = 0; while (i < 26) { a(i) += b(i); i += 1 }; a
    }
    ('A' to 'Z').zip(vec).map { case (l, n) => (l.toString, n) }
      .toDF("letter", "cnt")
  }

  /** Typed-Aggregator variant of the letter counter: a literal 26-slot
    * dense buffer, the exact shape of the reference's
    * `int letter_counts[26]` perfect-hash combiner (usr_functions.c:37-44,
    * sum at 88-100). Covers the engine's UDAF surface (mapreduce.h:18-19
    * pluggable map/reduce); used in tests to cross-check the relational
    * plan. Buffer is constant-size => map-side partial aggregation ships
    * 26 longs per partition regardless of input size.
    */
  object LetterCountAgg extends Aggregator[String, Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](26)
    def reduce(b: Array[Long], line: String): Array[Long] = {
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c >= 'A' && c <= 'Z') b(c - 'A') += 1
        else if (c >= 'a' && c <= 'z') b(c - 'a') += 1
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 26) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    // Kryo, not javaSerialization: the buffer crosses the partial/final
    // agg boundary once per partition; Java serialization of a 26-long
    // array carries class-descriptor overhead per record.
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Letter counter via the typed aggregator; same output contract as
    * [[letterCount]] (26 rows, A..Z, zeros included).
    */
  def letterCountTyped(spark: SparkSession, df: DataFrame, textCol: String): DataFrame = {
    import spark.implicits._
    val vec: Seq[Long] = df
      .select(col(textCol).cast("string"))
      .as[String]
      .select(LetterCountAgg.toColumn)
      .head()
    ('A' to 'Z').zip(vec).map { case (l, n) => (l.toString, n) }.toDF("letter", "cnt")
  }

  /** Result sink with the reference's contract (mapreduce.c:153-157: ONE
    * text file, rows in order): coalesce(1) keeps the sort order into a
    * single part file. Returns the part-file path. Single-file output is
    * a parity artifact, not a scale pattern — at warehouse scale drop the
    * coalesce and let the sink write one file per partition.
    */
  def writeSingleTextFile(df: DataFrame, line: Column, outDir: String): String = {
    df.select(line.cast("string").as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(outDir)
    val part = new java.io.File(outDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".txt"))
    require(part.length == 1, s"expected exactly one part file in $outDir")
    part.head.getPath
  }

  /** The counter's "%c %d\n" result-line format (usr_functions.c:48). */
  def counterResultLine(letter: Column, cnt: Column): Column =
    concat(letter, lit(" "), cnt.cast("string"))
}
