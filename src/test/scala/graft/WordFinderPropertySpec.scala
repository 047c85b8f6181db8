package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextJobs

/** Property test of the whole-word matcher against a direct Scala model
  * of the reference's boundary rule (usr_functions.c:155-186): match
  * start at line start or after non-alnum, AND followed by non-alnum or
  * line end; alnum = [0-9A-Za-z] (underscore IS a boundary, unlike
  * regex \b). Lines are ScalaCheck-generated from adversarial fragments
  * (affixed words, underscores, case flips, punctuation) with a fixed
  * seed, evaluated in ONE Spark job for speed.
  */
class WordFinderPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = "spark"

  private def isAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** Direct transliteration of the reference's per-line scan. */
  private def refMatch(line: String, w: String): Boolean = {
    var idx = line.indexOf(w)
    while (idx >= 0) {
      val okL = idx == 0 || !isAlnum(line.charAt(idx - 1))
      val okR = idx + w.length >= line.length || !isAlnum(line.charAt(idx + w.length))
      if (okL && okR) return true
      idx = line.indexOf(w, idx + 1)
    }
    false
  }

  test("wordFind agrees with the reference boundary model on 2000 generated lines") {
    val frag = Gen.oneOf(
      W, s"${W}x", s"x$W", s"${W}_", s"_$W", s"$W ", s" $W", W.toUpperCase,
      s"${W}1", s"1$W", s"$W.$W", s"($W)", s"$W-lit", s"$W$W", "sp", "ark",
      "Spark", s"${W}e", "word", "", " ", "_", "--", "12", "\t")
    val lineGen: Gen[String] = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, frag))
      .map(_.mkString)
    val params = Gen.Parameters.default
    val lines = Iterator.iterate(rng.Seed(42L))(_.next).take(2000)
      .map(s => lineGen.pureApply(params, s)).toVector
    assert(lines.nonEmpty)
    val expected = lines.filter(refMatch(_, W)).groupBy(identity)
      .view.mapValues(_.size).toMap
    val got = TextJobs.wordFind(lines.toDF("value"), "value", W)
      .as[String].collect().toVector.groupBy(identity)
      .view.mapValues(_.size).toMap
    assert(got == expected)
  }

  test("codegen byte-scan matcher equals the regex form, incl. unicode neighbors") {
    // the byte-level matcher (WholeWordContains) and the rlike lookaround
    // form must agree everywhere: multibyte chars are boundaries in BOTH
    // (regex: outside [0-9A-Za-z]; bytes: >= 0x80), and a needle can
    // never match mid-codepoint (UTF-8 self-synchronization)
    val lines = Vector(
      "héllo spark wörd", "日本spark語", "spark", " spark ", "sparké",
      "éspark", "_spark_", "1spark", "spark2", "SPARK", "sp ark",
      "aspark sparkb spark", "", "   ", "spark.spark", "ärk spark ärk",
      "é日spark語", "x" * 1000 + " spark", "spark" * 3)
    val df = lines.toDF("value")
    val fast = df.filter(TextJobs.containsWholeWord(col("value"), "spark"))
      .as[String].collect().toVector
    val regex = df.filter(TextJobs.containsWholeWordRegex(col("value"), "spark"))
      .as[String].collect().toVector
    assert(fast == regex)
    // model agreement on the generated corpus too
    assert(lines.filter(refMatch(_, "spark")) == fast)
    // SQL registration path
    org.apache.spark.sql.GraftSqlShim.registerFunction(spark, "graft_word_match",
      exprs => graft.functions.WholeWordContains(exprs.head, exprs(1)))
    df.createOrReplaceTempView("ww_lines")
    val viaSql = spark.sql(
      "SELECT value FROM ww_lines WHERE graft_word_match(value, 'spark')")
      .as[String].collect().toVector
    assert(viaSql == fast)
    // empty word matches nothing (doc'd divergence from the empty regex)
    assert(df.filter(TextJobs.containsWholeWord(col("value"), "")).count() == 0)
  }
}
