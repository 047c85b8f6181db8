package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("KMV: fewer than k distinct keys -> exact count, buffer is the set") {
    val df = (1 to 40).map(i => ("g", i.toLong)).toDF("grp", "key")
    val got = Sketches.kmvDistinct(df, "grp", col("key"), k = 64,
      saltPrefix = "t_").collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_kept") == 40L)
    assert(got(0).getAs[Long]("est_distinct") == 40L)
  }

  test("KMV: estimator lands within rsd bounds of the true cardinality") {
    // 5000 distinct keys, k=64 -> rsd ~ 1/sqrt(62) ~ 12.7%; assert 4 rsd
    val df = (1 to 5000).map(i => ("g", i.toLong)).toDF("grp", "key")
    val got = Sketches.kmvDistinct(df, "grp", col("key"), k = 64,
      saltPrefix = "t_").collect()
    val est = got(0).getAs[Long]("est_distinct")
    assert(got(0).getAs[Long]("n_kept") == 64L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51, s"est=$est")
  }

  test("KMV: duplicates do not move the estimate (set semantics)") {
    val once = (1 to 300).map(i => ("g", i.toLong))
    val dup = once ++ once ++ once
    val a = Sketches.kmvDistinct(once.toDF("grp", "key"), "grp", col("key"),
      k = 64, saltPrefix = "t_").collect()(0)
    val b = Sketches.kmvDistinct(dup.toDF("grp", "key"), "grp", col("key"),
      k = 64, saltPrefix = "t_").collect()(0)
    assert(a.getAs[Long]("est_distinct") == b.getAs[Long]("est_distinct"))
    assert(a.getAs[Long]("kth_min") == b.getAs[Long]("kth_min"))
  }

  test("KMV: merge across many partitions equals single-partition result") {
    val df1 = (1 to 2000).map(i => ("g", (i % 700).toLong)).toDF("grp", "key")
    val a = Sketches.kmvDistinct(df1.repartition(16), "grp", col("key"),
      k = 32, saltPrefix = "t_").collect()(0)
    val b = Sketches.kmvDistinct(df1.coalesce(1), "grp", col("key"),
      k = 32, saltPrefix = "t_").collect()(0)
    assert(a.getAs[Long]("kth_min") == b.getAs[Long]("kth_min"))
    assert(a.getAs[Long]("est_distinct") == b.getAs[Long]("est_distinct"))
  }

  test("count-min: estimates are >= exact counts (one-sided error)") {
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, s"alpha beta gamma ${if (i % 2 == 0) "delta" else "epsilon"} alpha"))
      .toDF("doc_id", "text")
    val cells = Sketches.cmsBuild(docs, "text", d = 4, w = 256, saltPrefix = "t")
    val probes = Seq("alpha", "beta", "delta", "epsilon", "missing")
    val est = Sketches.cmsProbe(spark, cells, probes, d = 4, w = 256,
      saltPrefix = "t").collect().map(r =>
        r.getAs[String]("word") -> r.getAs[Long]("est_count")).toMap
    val exact = Map("alpha" -> 100L, "beta" -> 50L, "delta" -> 25L,
      "epsilon" -> 25L, "missing" -> 0L)
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w: est ${est(w)} < exact $c")
    }
    // with 5 distinct tokens in 256 columns, collisions are unlikely:
    // the point estimates should be exact here
    assert(est("alpha") == 100L && est("beta") == 50L)
  }

  test("KMV Jaccard: exact when k covers the union") {
    // |A|=30, |B|=30, |A∩B|=20, |A∪B|=40 <= k=64 -> jaccard exactly 0.5
    val rows = ((1 to 30).map(i => ("a", i.toLong)) ++
      (11 to 40).map(i => ("b", i.toLong))).toDF("grp", "key")
    val got = Sketches.kmvJaccard(rows, "grp", col("key"), k = 64,
      saltPrefix = "t_").collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("m_size") == 40L)
    assert(got(0).getAs[Long]("n_common") == 20L)
    assert(got(0).getAs[Long]("jaccard_ppm") == 500000L)
  }

  test("KMV Jaccard: estimator tracks true overlap on large sets") {
    // true jaccard = 2000/6000 = 1/3; k=256 -> s.e. ~ sqrt(J(1-J)/k) ~ 3%
    val rows = ((1 to 4000).map(i => ("a", i.toLong)) ++
      (2001 to 6000).map(i => ("b", i.toLong))).toDF("grp", "key")
    val j = Sketches.kmvJaccard(rows, "grp", col("key"), k = 256,
      saltPrefix = "t_").collect()(0).getAs[Long]("jaccard_ppm")
    assert(math.abs(j - 333333L) < 120000L, s"jaccard_ppm=$j")
  }

  test("table profile: one-pass nulls + distinct estimates per column") {
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 10L), (3L, None, 20L),
      (4L, Some("a"), 20L), (5L, None, 30L)
    ).toDF("id", "cat", "grp")
    val got = Sketches.profileTable(df, Seq(
        "id" -> col("id"), "cat" -> col("cat"), "grp" -> col("grp")),
        k = 64, saltPrefix = "t_")
      .collect().map(r => r.getAs[String]("column") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("est_distinct")))).toMap
    // under k distinct everywhere -> estimates are exact; nulls are
    // counted but never hashed into the sketch
    assert(got("id") == ((5L, 0L, 5L)))
    assert(got("cat") == ((5L, 2L, 2L)))
    assert(got("grp") == ((5L, 0L, 3L)))
  }

  test("count-min: cell table is bounded by d*w regardless of corpus size") {
    val docs = Seq.tabulate(200)(i => (i.toLong,
      (1 to 20).map(j => s"w${(i * 7 + j) % 500}").mkString(" "))).toDF("doc_id", "text")
    val cells = Sketches.cmsBuild(docs, "text", d = 4, w = 64, saltPrefix = "t")
    assert(cells.count() <= 4L * 64L)
  }

  test("KMV merge of any partition equals the whole-corpus sketch bit-for-bit") {
    import org.apache.spark.sql.functions._
    val rows = Seq.tabulate(900)(i =>
      (s"g${i % 3}", (i * 17 % 211).toLong)).toDF("g", "key")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val whole = shape(Sketches.kmvDistinct(rows, "g", col("key"), k = 16,
      saltPrefix = "m_"))
    // arbitrary 2-way split by a hash coin
    val coin = pmod(col("key") * 2654435761L, lit(2L))
    def sk(m: Int) = Sketches.kmvSketches(rows.filter(coin === m), "g",
      col("key"), k = 16, saltPrefix = "m_")
    assert(shape(Sketches.kmvMergeEstimate(sk(0), sk(1), "g", 16)) == whole)
    // idempotence: merging a sketch with itself changes nothing
    assert(shape(Sketches.kmvMergeEstimate(
      Sketches.kmvSketches(rows, "g", col("key"), 16, "m_"),
      Sketches.kmvSketches(rows, "g", col("key"), 16, "m_"), "g", 16)) == whole)
    // a group present on only one side survives the full-outer merge
    val onlyA = Sketches.kmvSketches(
      Seq(("solo", 1L), ("solo", 2L)).toDF("g", "key"), "g", col("key"), 16, "m_")
    val empty = Sketches.kmvSketches(rows.filter(lit(false)), "g", col("key"), 16, "m_")
    val m = shape(Sketches.kmvMergeEstimate(onlyA, empty, "g", 16))
    assert(m.contains("solo") && m("solo")._1 == 2L && m("solo")._3 == 2L)
  }

  test("count-min merge of halves equals the whole-corpus sketch cellwise") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, s"tok${i % 17} tok${i % 5} shared tok${i % 17}"))
      .toDF("doc_id", "text")
    def build(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsBuild(df, "text", d = 4, w = 64, saltPrefix = "t")
    val whole = build(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.cmsMerge(Seq(
        build(docs.filter(col("doc_id") % 2 === 0)),
        build(docs.filter(col("doc_id") % 2 === 1))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "CMS linearity: merge must equal whole corpus")
    // merging a single sketch is the identity
    val solo = Sketches.cmsMerge(Seq(build(docs))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(solo == whole)
  }

  test("kmvWindowRollup: small windows are exact; unobserved days skip") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // days 1,2,3,5 with overlapping users: trailing-2 windows
    val ev = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L),
      (5L, 10L), (5L, 10L)).toDF("day_num", "user_id")
    val got = Sketches.kmvWindowRollup(ev, "day_num", col("user_id"),
        k = 64, windowDays = 2, saltPrefix = "t_")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // under k distinct => n_kept IS the exact windowed distinct count
    assert(got(1L) == ((2L, 2L)))  // {10,11}
    assert(got(2L) == ((3L, 3L)))  // {10,11,12}
    assert(got(3L) == ((3L, 3L)))  // {11,12,13}
    assert(got(5L) == ((1L, 1L)))  // day 4 unobserved: {10} only
    assert(got.size == 4)
  }

  test("Misra-Gries: summary bounded at k-1 counters on any input") {
    import org.apache.spark.sql.{functions => F, Encoders}
    // 500 distinct items, uniform — nothing is heavy; summary must stay
    // bounded regardless
    val df = spark.range(5000)
      .select(F.concat(F.lit("w"), (F.col("id") % 500)).as("w"))
      .repartition(8)
    val mg = F.udaf(new Sketches.MgAgg(9), Encoders.STRING)
    val m = df.agg(mg(F.col("w"))).collect()(0).getMap[String, Long](0)
    assert(m.size <= 9, s"summary grew to ${m.size}")
  }

  test("Misra-Gries: heavy hitters retained, never overcounted, within n/k") {
    import org.apache.spark.sql.{functions => F}
    // zipf-ish skew: "hot" 4000x, "warm" 900x, 100 cold items 31x each;
    // n = 8000, k = 10 => threshold 800: heavy = {hot, warm}
    val rows = Seq.fill(4000)("hot") ++ Seq.fill(900)("warm") ++
      (0 until 100).flatMap(i => Seq.fill(31)(s"cold_$i"))
    val df = rows.toDF("w").repartition(16) // exercise the PODS merge rule
    val got = Sketches.mgHeavyHitters(df, F.col("w"), k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(got.keySet == Set("hot", "warm"), s"heavy set: ${got.keySet}")
    assert(got.values.forall(_ == ((true, true, true))), s"contract: $got")
  }

  test("Misra-Gries: contract holds across partitionings (merge-tree independence)") {
    import org.apache.spark.sql.{functions => F}
    val rows = Seq.fill(600)("a") ++ Seq.fill(350)("b") ++
      (0 until 50).flatMap(i => Seq.fill(7)(s"x$i"))
    for (p <- Seq(1, 3, 13)) {
      val got = Sketches.mgHeavyHitters(rows.toDF("w").repartition(p),
        F.col("w"), k = 8).collect()
      assert(got.map(_.getString(0)).toSet == Set("a", "b"))
      assert(got.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)),
        s"p=$p: ${got.mkString(", ")}")
    }
  }

  test("log-bucket: index is monotone, small values exact, decode brackets v") {
    // driver-side twin of the SQL bit arithmetic, for an exhaustive check
    def idx(v: Long, s: Int): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val sh = math.max(e - s, 0)
      e.toLong * (1L << s) + (v >> sh) - (1L << (e - sh))
    }
    def lower(k: Long, s: Int): Long = {
      val e = (k >> s).toInt; val sh = math.max(e - s, 0)
      ((k & ((1L << s) - 1)) + (1L << (e - sh))) << sh
    }
    def width(k: Long, s: Int): Long = 1L << math.max((k >> s).toInt - s, 0)
    val s = 5
    val vs = (1L to 4096L) ++ Seq(1L << 40, (1L << 40) + 12345, (1L << 62) + 999)
    vs.sliding(2).foreach {
      case Seq(a, b) => assert(idx(a, s) <= idx(b, s), s"monotone at $a,$b")
      case _ =>
    }
    vs.foreach { v =>
      val k = idx(v, s)
      assert(lower(k, s) <= v && v < lower(k, s) + width(k, s), s"bracket $v")
      if (v < 32) assert(lower(k, s) == v, s"small-exact $v")
    }
    // the SQL expression agrees with the driver twin
    val df = spark.range(1, 3000).select((col("id") * col("id") + 7).as("__v"))
    val got = df.withColumn("k",
        expr(Sketches.logBucketIdxSql("__v", s))).collect()
    got.foreach(r => assert(r.getLong(1) == idx(r.getLong(0), s),
      s"sql-vs-driver at ${r.getLong(0)}"))
  }

  test("log-bucket: est <= exact < est + width at every quantile; bounded state") {
    val rows = (1 to 5000).map(i => ("g", (i.toLong * i * 31 + 11) % 900001 + 1))
    val df = rows.toDF("grp", "v")
    val cells = Sketches.logBucketCells(df, "grp", col("v"), 5)
    assert(cells.count() <= 64L * 32, "state bound")
    val qs = Seq(10000L, 250000L, 500000L, 900000L, 990000L, 1000000L)
    val est = Sketches.logBucketQuantiles(cells, qs, 5)
    val exact = Sketches.exactDiscQuantiles(df, "grp", col("v"), qs)
    val j = est.join(exact.select("grp", "q_ppm", "exact"), Seq("grp", "q_ppm"))
      .collect()
    assert(j.length == qs.length)
    j.foreach { r =>
      val (e, x, w) = (r.getAs[Long]("est"), r.getAs[Long]("exact"),
        r.getAs[Long]("width"))
      assert(e <= x && x < e + w, s"contract at ${r.getAs[Long]("q_ppm")}")
      assert((x - e).toDouble / x < 1.0 / 32, "relative error bound")
    }
  }

  test("HLL: estimate lands within rsd bounds; registers bounded at 64") {
    val df = (1 to 5000).map(i => ("g", i.toLong)).toDF("grp", "key")
    val regs = Sketches.hllRegisters(df, "grp", col("key"), "t_")
    assert(regs.count() <= Sketches.HllBuckets)
    val est = Sketches.hllEstimate(regs).collect()(0).getAs[Long]("est_hll")
    // rsd = 1.04/sqrt(64) = 13%; assert 4 rsd
    assert(math.abs(est - 5000.0) / 5000.0 < 0.52, s"est=$est")
  }

  test("HLL: merge of halves equals whole bit-for-bit; merge is idempotent") {
    val rows = (1 to 3000).map(i => (s"g${i % 2}", i.toLong))
    val df = rows.toDF("grp", "key")
    val coin = pmod(col("key") * 2654435761L, lit(2L))
    def half(m: Int) =
      Sketches.hllRegisters(df.filter(coin === m), "grp", col("key"), "t_")
    val merged = Sketches.hllMerge(Seq(half(0), half(1)))
    val whole = Sketches.hllRegisters(df, "grp", col("key"), "t_")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // idempotence: re-merging a sketch with itself is a no-op
    val self = Sketches.hllMerge(Seq(whole, whole))
    assert(self.exceptAll(whole).isEmpty && whole.exceptAll(self).isEmpty)
    // duplicates never move a register (set semantics)
    val dup = Sketches.hllRegisters(
      (rows ++ rows).toDF("grp", "key"), "grp", col("key"), "t_")
    assert(dup.exceptAll(whole).isEmpty && whole.exceptAll(dup).isEmpty)
  }

  test("log-bucket: merged half-sketches equal the whole sketch bit-for-bit") {
    val rows = (1 to 4000).map(i => (s"g${i % 3}", (i.toLong * 7919) % 65536 + 1))
    val df = rows.toDF("grp", "v")
    val coin = pmod(col("v") * 2654435761L, lit(2L))
    val merged = Sketches.logBucketMerge(Seq(
      Sketches.logBucketCells(df.filter(coin === 0), "grp", col("v"), 5),
      Sketches.logBucketCells(df.filter(coin === 1), "grp", col("v"), 5)))
    val whole = Sketches.logBucketCells(df, "grp", col("v"), 5)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // and a rank selection over either yields identical quantile rows
    val a = Sketches.logBucketQuantiles(merged, Seq(500000L), 5).collect().toSet
    val b = Sketches.logBucketQuantiles(whole, Seq(500000L), 5).collect().toSet
    assert(a == b)
  }
}
