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

  /** Column predicate: does `c` contain `word` as a whole word? */
  def containsWholeWord(c: Column, word: String): Column =
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
  def letterCount(spark: SparkSession, df: DataFrame, textCol: String): DataFrame = {
    // Per-row 26-slot count vector (the reference's dense combiner buffer,
    // usr_functions.c:37-44, as a tight loop) then posexplode + 26-key
    // hash agg. The earlier explode(split(text, "")) form shuffled one
    // row per CHARACTER through a per-char regex — ~6x slower.
    val counts26 = udf { s: String =>
      val b = new Array[Long](26)
      if (s != null) {
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c >= 'A' && c <= 'Z') b(c - 'A') += 1
          else if (c >= 'a' && c <= 'z') b(c - 'a') += 1
          i += 1
        }
      }
      b
    }
    val counts = df
      .select(posexplode(counts26(col(textCol))).as(Seq("pos", "c")))
      .groupBy("pos").agg(sum("c").as("cnt"))
      .select(expr("char(pos + 65)").as("letter"), col("cnt"))
    letterDomain(spark)
      .join(broadcast(counts), Seq("letter"), "left")
      .select(col("letter"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("letter")
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
    def bufferEncoder = org.apache.spark.sql.Encoders.javaSerialization[Array[Long]]
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
