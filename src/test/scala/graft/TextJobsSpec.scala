package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextJobs

/** Reference-parity tests: golden vectors measured from the compiled
  * reference (FIXTURES.md, 2026-08-12) plus the boundary/invariance
  * properties from SURVEY.md §2a.
  */
class TextJobsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val alice30 = "/root/reference/proj_2_base/input-alice30.txt"

  /** Golden letter counts for input-alice30.txt (FIXTURES.md §A). */
  val aliceGolden: Map[String, Long] = Map(
    "A" -> 8791, "B" -> 1475, "C" -> 2399, "D" -> 4931, "E" -> 13574,
    "F" -> 2001, "G" -> 2531, "H" -> 7374, "I" -> 7514, "J" -> 146,
    "K" -> 1158, "L" -> 4716, "M" -> 2107, "N" -> 7016, "O" -> 8146,
    "P" -> 1524, "Q" -> 209, "R" -> 5437, "S" -> 6500, "T" -> 10689,
    "U" -> 3468, "V" -> 846, "W" -> 2675, "X" -> 148, "Y" -> 2264, "Z" -> 78)

  test("letter counter matches reference golden vector on alice30") {
    val got = TextJobs.letterCount(spark, spark.read.text(alice30), "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == aliceGolden)
  }

  test("file-path (RDD-scan) letter counter matches the golden vector too") {
    val got = TextJobs.letterCountFile(spark, alice30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == aliceGolden)
  }

  test("letter counter always emits 26 rows A..Z in order, zeros included") {
    val df = Seq("bcd").toDF("t")
    val rows = TextJobs.letterCount(spark, df, "t").collect()
    assert(rows.length == 26)
    assert(rows.map(_.getString(0)).toSeq == ('A' to 'Z').map(_.toString))
    assert(rows.count(_.getLong(1) == 0) == 23)
  }

  test("letter counter is ASCII-only and case-folding (reference isalpha/toupper)") {
    val df = Seq("aA1! zZ café").toDF("t") // é must NOT count (ASCII isalpha)
    val got = TextJobs.letterCount(spark, df, "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("A") == 3 && got("Z") == 2 && got("C") == 1 && got("F") == 1)
    assert(got("E") == 0) // the only 'e' is é, which ASCII isalpha rejects
    assert(got.values.sum == 7)
  }

  test("letter counter is split-count invariant (SURVEY §2a invariant 1)") {
    val base = spark.read.text(alice30)
    val one = TextJobs.letterCount(spark, base.repartition(1), "value").collect().toSeq
    for (n <- Seq(3, 7, 16)) {
      val got = TextJobs.letterCount(spark, base.repartition(n), "value").collect().toSeq
      assert(got == one, s"mismatch at $n partitions")
    }
  }

  test("typed 26-slot Aggregator equals the relational plan (UDAF surface)") {
    val df = spark.read.text(alice30)
    val typed = TextJobs.letterCountTyped(spark, df, "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == aliceGolden)
  }

  test("word finder matches reference count: 392 'Alice' lines in alice30") {
    assert(TextJobs.wordFind(spark.read.text(alice30), "value", "Alice").count() == 392)
  }

  test("word finder is case-sensitive: 'alice' finds nothing in alice30") {
    assert(TextJobs.wordFind(spark.read.text(alice30), "value", "alice").count() == 0)
  }

  test("word finder boundary semantics (usr_functions.c:168-169)") {
    val lines = Seq(
      "word word here",   // match, emitted once
      "word_suffix",      // match: underscore IS a boundary (not regex \b!)
      "subword",          // no match
      "word!",            // match: punctuation boundary
      "3word",            // no match: digit is alnum
      "WORD",             // no match: case-sensitive
      "word")             // match: whole line
    val got = TextJobs.wordFind(lines.toDF("value"), "value", "word")
      .as[String].collect().toSet
    assert(got == Set("word word here", "word_suffix", "word!", "word"))
  }

  test("word finder preserves one-emit-per-line (no dup on multi-occurrence)") {
    val df = Seq("w w w").toDF("value")
    assert(TextJobs.wordFind(df, "value", "w").count() == 1)
  }

  test("single-file text result sink matches the reference mr.rst contract") {
    val out = "/tmp/graft-test-mr-rst"
    val counts = TextJobs.letterCount(spark, spark.read.text(alice30), "value")
    val path = TextJobs.writeSingleTextFile(counts,
      TextJobs.counterResultLine(col("letter"), col("cnt")), out)
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.size == 26)                       // all 26 rows, one file
    assert(lines.head == s"A ${aliceGolden("A")}") // "%c %d" format, A..Z order
    assert(lines.last == s"Z ${aliceGolden("Z")}")
    assert(lines.map(_.split(" ")(0)) == ('A' to 'Z').map(_.toString))
  }

  val moon10 = "/root/reference/proj_2_base/input-moon10.txt"

  /** Golden letter counts for input-moon10.txt (FIXTURES.md §A, measured
    * from the compiled reference).
    */
  val moonGolden: Map[String, Long] = Map(
    "A" -> 32630, "B" -> 7444, "C" -> 13776, "D" -> 16744, "E" -> 55968,
    "F" -> 10032, "G" -> 6947, "H" -> 25884, "I" -> 30940, "J" -> 940,
    "K" -> 2036, "L" -> 17721, "M" -> 10213, "N" -> 29622, "O" -> 31985,
    "P" -> 8570, "Q" -> 581, "R" -> 25461, "S" -> 26567, "T" -> 42192,
    "U" -> 11895, "V" -> 4129, "W" -> 8550, "X" -> 1031, "Y" -> 6522,
    "Z" -> 270)

  test("letter counter matches reference golden vector on moon10 (548 KB)") {
    val got = TextJobs.letterCount(spark, spark.read.text(moon10), "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == moonGolden)
    val viaFile = TextJobs.letterCountFile(spark, moon10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFile == moonGolden)
  }

  /** warpeace (4.4 MB) ships only inside proj_2_base.zip
    * (.MISSING_LARGE_BLOBS) — extract it to /tmp as a fixture step.
    */
  lazy val warpeace: String = {
    val out = new java.io.File("/tmp/graft-test-warpeace.txt")
    if (!out.exists() || out.length() != 4434670L) {
      val zf = new java.util.zip.ZipFile("/root/reference/proj_2_base.zip")
      try {
        val entry = zf.getEntry("proj_2_base/input-warpeace.txt")
        val in = zf.getInputStream(entry)
        java.nio.file.Files.copy(in, out.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        in.close()
      } finally zf.close()
    }
    out.getPath
  }

  test("warpeace (4.4 MB): counter matches an independent naive fold; finder matches grep semantics") {
    // independent golden: a plain single-threaded JVM fold over the raw
    // bytes, exactly the reference's isalpha/toupper rule
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(warpeace))
    val expected = new Array[Long](26)
    bytes.foreach { b =>
      val c = b.toInt & 0xff
      if (c >= 'A' && c <= 'Z') expected(c - 'A') += 1
      else if (c >= 'a' && c <= 'z') expected(c - 'a') += 1
    }
    val golden = ('A' to 'Z').map(_.toString).zip(expected).toMap
    val got = TextJobs.letterCount(spark, spark.read.text(warpeace), "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == golden)
    val viaFile = TextJobs.letterCountFile(spark, warpeace)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFile == golden)
    // finder golden: independent line scan with the reference's
    // non-alnum-boundary rule (underscore IS a boundary)
    val lines = new String(bytes, "UTF-8").split("\n", -1)
    val re = java.util.regex.Pattern.compile("(?<![A-Za-z0-9])Pierre(?![A-Za-z0-9])")
    val expectedFinds = lines.count(l => re.matcher(l).find())
    val found = TextJobs.wordFind(spark.read.text(warpeace), "value", "Pierre").count()
    assert(found == expectedFinds && found > 0)
    // split invariance holds at 4.4 MB too
    val base = spark.read.text(warpeace)
    assert(TextJobs.wordFind(base.repartition(16), "value", "Pierre").count() == found)
  }

  test("csv, json and orc sources round-trip the parquet schema and values") {
    val base = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val tmp = "/tmp/graft-test-sources"
    base.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    base.write.mode("overwrite").json(s"$tmp/json")
    base.write.mode("overwrite").orc(s"$tmp/orc")
    val viaCsv = spark.read.option("header", "true").schema(base.schema).csv(s"$tmp/csv")
    val viaJson = spark.read.schema(base.schema).json(s"$tmp/json")
    val viaOrc = spark.read.orc(s"$tmp/orc")
    assert(viaCsv.count() == base.count() && viaJson.count() == base.count())
    assert(viaCsv.except(base).isEmpty && base.except(viaCsv).isEmpty)
    assert(viaJson.except(base).isEmpty && base.except(viaJson).isEmpty)
    // ORC is columnar + typed: schema survives without an explicit cast,
    // and predicate pushdown reaches the scan like parquet
    assert(viaOrc.schema == base.schema)
    assert(viaOrc.except(base).isEmpty && base.except(viaOrc).isEmpty)
    val plan = viaOrc.filter(col("o_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(o_orderkey,1)"),
      plan.take(600))
  }

  test("avro source round-trips schema and values (timestamps and arrays too)") {
    import graft.sources.AvroIO
    val tmp = "/tmp/graft-test-avro"
    // lineitem slice: long/int/double/string/timestamp columns
    val li = spark.read.parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
      .limit(2000)
    AvroIO.write(li, s"$tmp/lineitem")
    val liBack = AvroIO.read(spark, s"$tmp/lineitem")
    assert(liBack.schema.map(f => (f.name, f.dataType)) ==
      li.schema.map(f => (f.name, f.dataType)))
    assert(liBack.count() == li.count())
    assert(liBack.except(li).isEmpty && li.except(liBack).isEmpty)
    // embeddings: array<float> column
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .limit(200)
    AvroIO.write(emb, s"$tmp/emb")
    val embBack = AvroIO.read(spark, s"$tmp/emb")
    assert(embBack.schema.map(f => (f.name, f.dataType)) ==
      emb.schema.map(f => (f.name, f.dataType)))
    assert(embBack.except(emb).isEmpty && emb.except(embBack).isEmpty)
    // read parallelism is per container file (one task per part file)
    assert(embBack.rdd.getNumPartitions ==
      new java.io.File(s"$tmp/emb").listFiles.count(_.getName.endsWith(".avro")))
  }

  test("json source captures malformed records instead of failing (PERMISSIVE)") {
    import org.apache.spark.sql.types._
    val tmp = "/tmp/graft-test-corrupt.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp),
      """{"k": 1, "v": "ok"}
        |not json at all
        |{"k": 3, "v": "fine"}
        |{"k": "wrong type", "v": 4}""".stripMargin)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).json(tmp).cache()
    try {
      assert(df.count() == 4) // nothing dropped, nothing thrown
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(df.filter(col("k") === 1 && col("v") === "ok").count() == 1)
    } finally df.unpersist(): Unit
  }

  test("word finder is split-count invariant") {
    val base = spark.read.text(alice30)
    val one = TextJobs.wordFind(base.repartition(1), "value", "Alice").count()
    for (n <- Seq(4, 16)) {
      assert(TextJobs.wordFind(base.repartition(n), "value", "Alice").count() == one)
    }
  }
}
