package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, Relational}

/** Brute-force driver models for the round-12 statistics operators
  * (the AlignStatsPropertySpec pattern): CUSUM's prefix-min identity
  * vs the literal max(0, ·) recursion, Spearman's two-stage histogram
  * ranks vs row_number over (value, id), Wilcoxon's 2×-integer
  * tie-averaged rank sums vs an O(n log n) driver model, two-sample
  * KS vs the literal max-over-values ECDF gap, Adamic-Adar's capped
  * posting fan-out vs the O(n²) shared-feature definition, and
  * per-group OLS vs the closed-form driver fit. Every compared
  * quantity is an exact integer, so equality is exact.
  */
class StatsFoldPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cusumAlerts: prefix-min identity equals the max(0,.) recursion") {
    val rnd = new scala.util.Random(279)
    for (trial <- 1 to 25) {
      val n = 1 + rnd.nextInt(40)
      // nonnegative series (the operator's stated contract)
      val xs = Seq.fill(n)(rnd.nextInt(1000).toLong)
      val series = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      val got = Relational.cusumAlerts(series.toDF("ord", "x"), "ord", "x")
        .orderBy("ord").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      val target = xs.sum / n
      val slack = target / 20
      var s = 0L
      val want = xs.zipWithIndex.map { case (x, i) =>
        s = math.max(0L, s + x - target - slack)
        (i.toLong, x, s, s > target * 4)
      }
      assert(got.toSeq == want, s"trial $trial")
    }
  }

  test("spearmanRho: histogram ranks equal row_number over (value, id)") {
    val rnd = new scala.util.Random(280)
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(60)
      // small value domains force heavy ties through the id tiebreak
      val rows = (0 until n).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      val got = Relational.spearmanRho(rows.toDF("id", "x", "y"),
          "id", "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      def ranks(key: ((Long, Long, Long)) => Long): Map[Long, Long] =
        rows.sortBy(r => (key(r), r._1)).zipWithIndex
          .map { case (r, i) => r._1 -> (i + 1).toLong }.toMap
      val (rx, ry) = (ranks(_._2), ranks(_._3))
      val sumd2 = rows.map(r => { val d = rx(r._1) - ry(r._1); d * d }).sum
      // small-n branch: numerator-scaled exact ppm (ADVICE r12)
      val den = math.max(n.toLong * (n.toLong * n - 1), 1L)
      val want = (n.toLong, sumd2, 1000000L - (6 * sumd2 * 1000000L) / den)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("wilcoxonSignedRank: 2x rank sums equal the driver tie-average model") {
    val rnd = new scala.util.Random(283)
    for (trial <- 1 to 25) {
      val n = 1 + rnd.nextInt(60)
      // small magnitude domain forces tie groups; zeros exercise the drop
      val ds = Seq.fill(n)((rnd.nextInt(11) - 5).toLong)
      val got = Relational.wilcoxonSignedRank(ds.toDF("d"), "d")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .head
      val nz = ds.filter(_ != 0L)
      // 2x average rank per |d|: ranks [a, a+t-1] -> 2*avg = 2a + t - 1
      val byMag = nz.map(math.abs).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val mags = byMag.keys.toSeq.sorted
      val rank2 = {
        var cum = 0L
        mags.map { m =>
          val t = byMag(m); val r = 2 * cum + t + 1; cum += t; m -> r
        }.toMap
      }
      val w2p = nz.filter(_ > 0).map(d => rank2(math.abs(d))).sum
      val w2m = nz.filter(_ < 0).map(d => rank2(math.abs(d))).sum
      // small-mass branch: numerator-scaled exact ppm (ADVICE r12)
      val share = (w2p * 1000000L) / math.max(w2p + w2m, 1L)
      val want = (nz.size.toLong, w2p, w2m, share)
      assert(got == want, s"trial $trial: got $got want $want")
      // total doubled rank mass is n(n+1) by construction
      assert(w2p + w2m == nz.size.toLong * (nz.size + 1))
    }
  }

  test("ksTwoSample: histogram windows equal the literal ECDF gap max") {
    val rnd = new scala.util.Random(281)
    for (trial <- 1 to 25) {
      val na = 1 + rnd.nextInt(40)
      val nb = 1 + rnd.nextInt(40)
      val as = Seq.fill(na)(rnd.nextInt(15).toLong)
      val bs = Seq.fill(nb)(rnd.nextInt(15).toLong)
      val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("arm", "v")
      val got = Relational.ksTwoSample(df, "arm", "v", "a", "b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .head
      val vs = (as ++ bs).distinct.sorted
      val gaps = vs.map { v =>
        val da = as.count(_ <= v).toLong * 1000000L / na
        val db = bs.count(_ <= v).toLong * 1000000L / nb
        (math.abs(da - db), v)
      }
      val best = gaps.maxBy { case (d, v) => (d, -v) }
      val want = (na.toLong, nb.toLong, best._1, best._2)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("adamicAdarTopK: posting fan-out equals the O(n^2) shared-feature model") {
    val rnd = new scala.util.Random(282)
    for (trial <- 1 to 20) {
      val nL = 3 + rnd.nextInt(10)
      val nF = 2 + rnd.nextInt(8)
      val inc = (for {
        l <- 0 until nL; f <- 0 until nF
        if rnd.nextInt(3) == 0
      } yield (l.toLong, f.toLong)).distinct
      if (inc.nonEmpty) {
        val maxDeg = 2 + rnd.nextInt(6)
        val got = GraphOps.adamicAdarTopK(inc.toDF("l", "f"), "l", "f",
            maxDeg = maxDeg, topK = 1000)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        val deg = inc.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
        val want = (for {
          (a, b) <- inc.map(_._1).distinct.combinations(2).map(s =>
            (s.min, s.max)).toSeq
          shared = inc.filter(e => deg(e._2) >= 2 && deg(e._2) <= maxDeg)
            .groupBy(_._2).filter { case (_, es) =>
              es.exists(_._1 == a) && es.exists(_._1 == b) }.keys.toSeq
          if shared.nonEmpty
        } yield (a, b, shared.size.toLong,
          shared.map(f => 1000000L / bitlen(deg(f))).sum))
          .sortBy { case (a, b, _, s) => (-s, a, b) }
        assert(got.toSeq == want, s"trial $trial: got ${got.toSeq} want $want")
      }
    }
  }

  test("isotonicFitPpm: minimax identity equals the literal weighted-PAV fold") {
    val rnd = new scala.util.Random(290)
    for (trial <- 1 to 30) {
      val nB = 1 + rnd.nextInt(10)
      val bands = (0 until nB).map { b =>
        val n = 1L + rnd.nextInt(50)
        (b.toLong, rnd.nextInt(n.toInt + 1).toLong, n)
      }
      val got = Relational.isotonicFitPpm(bands.toDF("b", "s", "n"),
          "b", "s", "n")
        .orderBy("b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // literal weighted PAV: pool adjacent blocks while the previous
      // block's exact average exceeds the current's; fit = the block's
      // pooled average, floored to ppm like the operator
      val blocks = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      for ((_, s, n) <- bands) {
        var (cs, cn, cb) = (s, n, 1)
        while (blocks.nonEmpty &&
               blocks.last._1 * cn >= cs * blocks.last._2) {
          val (ps, pn, pb) = blocks.remove(blocks.size - 1)
          cs += ps; cn += pn; cb += pb
        }
        blocks += ((cs, cn, cb))
      }
      val fits = blocks.flatMap { case (s, n, cb) =>
        Seq.fill(cb)((s * 1000000L) / n) }.toSeq
      val want = bands.zip(fits).map { case ((b, s, n), f) =>
        (b, n, s, (s * 1000000L) / n, f) }
      assert(got.toSeq == want, s"trial $trial: got ${got.toSeq} want $want")
      // monotone by construction
      assert(got.map(_._5).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)))
    }
  }

  test("jaroWinklerJvm: canonical values, bounds, identity, symmetry") {
    import graft.functions.TextFunctions.jaroWinklerJvm
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the canonical record-linkage triple, values DuckDB's native
    // function returns (the variant this UDF replicates)
    assert(r6(jaroWinklerJvm("martha", "marhta")) == 0.961111)
    assert(r6(jaroWinklerJvm("dwayne", "duane")) == 0.84)
    assert(r6(jaroWinklerJvm("dixon", "dicksonx")) == 0.813333)
    assert(jaroWinklerJvm("", "abc") == 0.0)
    assert(jaroWinklerJvm("abc", "") == 0.0)
    val rnd = new scala.util.Random(291)
    for (_ <- 1 to 500) {
      def str() = (0 until rnd.nextInt(10)).map(_ =>
        ('a' + rnd.nextInt(5)).toChar).mkString
      val (a, b) = (str(), str())
      val v = jaroWinklerJvm(a, b)
      assert(v >= 0.0 && v <= 1.0, s"($a,$b) -> $v")
      assert(v == jaroWinklerJvm(b, a), s"asymmetric on ($a,$b)")
      if (a.nonEmpty) assert(jaroWinklerJvm(a, a) == 1.0)
    }
  }

  test("groupOlsTrend: moment fold equals the closed-form driver fit") {
    val rnd = new scala.util.Random(285)
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(30)
      val pts = (0 until n).map(i =>
        ("g", i.toLong, (rnd.nextInt(2001) - 1000).toLong))
      val got = Relational.groupOlsTrend(pts.toDF("g", "x", "y"),
          "g", "x", "y")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).head
      val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope = num / den // JVM / truncates like Spark div
      val want = ("g", n.toLong, num, den, slope, (sy - slope * sx) / n)
      assert(got == want, s"trial $trial: got $got want $want")
      // truncated-slope residual sum stays within n*|den| of zero at
      // the optimum's neighborhood: sanity that slope is the argmin
      // to integer resolution
      val sse = (s: Long) => pts.map(p =>
        { val e = p._3 - s * p._2 - (sy - s * sx) / n; e * e }).sum
      assert(sse(slope) <= math.min(sse(slope - 2), sse(slope + 2)),
        s"trial $trial: slope not a local optimum")
    }
  }

  /** Independent sign replay from the hex-string contract (never
    * through TextFunctions — that would be circular).
    */
  private def modelSign(prefix: String, id: Long, r: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$prefix${id}_${r / 32}".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if ("0123456789abcdef".indexOf(hex.charAt(r % 32)) % 2 == 0) 1L else -1L
  }

  test("permutationTestPpm equals the driver sign-replay fold") {
    val rnd = new scala.util.Random(296)
    for (trial <- 1 to 8) {
      val n = 3 + rnd.nextInt(40)
      val rows = (0 until n).map(i =>
        (if (i % 2 == 0) "a" else "b", 1000L + i,
          (rnd.nextInt(21) - 10).toLong))
      val got = Relational.permutationTestPpm(
          rows.toDF("grp", "id", "d"), "grp", "id", "d", r = 64,
          prefix = "spec_")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val sObs = rs.map(_._3).sum
        val ge = (0 until 64).count { r =>
          math.abs(rs.map(t => modelSign("spec_", t._2, r) * t._3).sum) >=
            math.abs(sObs)
        }
        g -> (rs.size.toLong, sObs, (1L + ge) * 1000000L / 65L)
      }
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("bhStepUp equals the literal step-up rule at every alpha") {
    val rnd = new scala.util.Random(297)
    for (trial <- 1 to 20) {
      val m = 1 + rnd.nextInt(30)
      val ps = (0 until m).map(i => (s"h$i", rnd.nextInt(1000001).toLong))
      val alphas = Seq(10000L, 50000L, 100000L, 500000L)
      val got = Relational.bhStepUp(ps.toDF("key", "p"), "key", "p", alphas)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      val sorted = ps.sortBy(t => (t._2, t._1))
      for (a <- alphas) {
        val ks = (1 to m).filter(k => sorted(k - 1)._2 * m <= k.toLong * a)
        val kstar = if (ks.isEmpty) 0 else ks.max
        sorted.zipWithIndex.foreach { case ((key, p), i) =>
          val want = (p, (i + 1).toLong, i + 1 <= kstar)
          assert(got((a, key)) == want,
            s"trial $trial alpha=$a key=$key: got ${got((a, key))} want $want")
        }
      }
    }
  }

  test("benfordDeviation equals the constant-table driver fold") {
    val benford = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
      8L -> 51153L, 9L -> 45757L)
    assert(benford.values.sum == 1000000L) // masses are an exact ppm split
    val rnd = new scala.util.Random(298)
    for (trial <- 1 to 10) {
      val n = 5 + rnd.nextInt(60)
      // skewed magnitudes so several digits go missing per group
      val rows = (0 until n).map(i =>
        (s"g${i % 2}", 1L + rnd.nextInt(2000)))
      val got = Relational.benfordDeviation(
          rows.toDF("grp", "v"), "grp", col("v"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val nG = rs.size.toLong
        val cnt = rs.groupBy(_._2.toString.head.asDigit.toLong)
          .view.mapValues(_.size.toLong).toMap
        val devs = (1L to 9L).map { d =>
          d -> math.abs(cnt.getOrElse(d, 0L) * 1000000L / nG - benford(d))
        }
        val worst = devs.minBy { case (d, dev) => (-dev, d) }
        g -> (nG, devs.map(_._2).sum / 2, worst._1, worst._2)
      }
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("mannKendall equals the O(n^2) driver fold, including negatives") {
    val rnd = new scala.util.Random(300)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(50)
      val xs = (0 until n).map(i => (f"d$i%03d", (rnd.nextInt(9) - 4).toLong))
      val got = Relational.mannKendall(xs.toDF("ord", "x"), "ord", "x")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      val pairs = for (i <- 0 until n; j <- i + 1 until n) yield
        java.lang.Long.signum(xs(j)._2 - xs(i)._2).toLong
      val s = pairs.sum
      val want = (n.toLong, s, s * 1000000L / pairs.size) // JVM / truncates
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("mcnemarPpm equals the discordant-pair driver fold") {
    val rnd = new scala.util.Random(301)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val rows = Seq.fill(n)((rnd.nextBoolean(), rnd.nextBoolean()))
      val got = Relational.mcnemarPpm(rows.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).head
      val b = rows.count(t => t._1 && !t._2).toLong
      val c = rows.count(t => !t._1 && t._2).toLong
      val want = (n.toLong, b, c,
        (b - c) * (b - c) * 1000000L / math.max(b + c, 1L))
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("cohensKappaPpm equals the margin-product driver fold, incl. negative kappa") {
    val rnd = new scala.util.Random(302)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(80)
      val k = 1 + rnd.nextInt(4) // incl. the single-label degenerate case
      val rows = Seq.fill(n)((s"l${rnd.nextInt(k)}", s"l${rnd.nextInt(k)}"))
      val got = Relational.cohensKappaPpm(rows.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      val agree = rows.count(t => t._1 == t._2).toLong
      val ra = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val cb = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // iterator, NOT ra.keys.map: a Set.map would dedupe equal products
      val pe = ra.iterator.map { case (l, r) => r * cb.getOrElse(l, 0L) }.sum
      val nn = n.toLong * n
      val kap = if (nn == pe) 0L
        else (n * agree - pe) * 1000000L / (nn - pe) // JVM / truncates
      assert(got == (n.toLong, agree, kap),
        s"trial $trial: got $got want ${(n.toLong, agree, kap)}")
    }
  }

  test("signFlips: null id propagates; coins are exactly +-1 and replayable") {
    val df = Seq(Some(42L), None).toDF("id")
      .select(col("id"), graft.functions.TextFunctions
        .signFlips(col("id"), 40, "spec_").as("s"))
      .collect()
    val live = df.find(!_.isNullAt(0)).get.getSeq[Long](1)
    assert(live.length == 40 && live.forall(v => v == 1L || v == -1L))
    assert(live.zipWithIndex.forall { case (v, r) =>
      v == modelSign("spec_", 42L, r) })
    assert(df.find(_.isNullAt(0)).get.isNullAt(1), "null id must yield null")
  }
}
