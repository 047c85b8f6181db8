package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Curation, GraphOps, Relational}

/** Brute-force driver models for the round-12 operators (the
  * q190/q199/InlineFoldPropertySpec pattern): degree assortativity's
  * moment fold, Kendall tau-b's histogram pair mass vs the O(n²)
  * definition, unigram-drift's folded missing-mass TVD, and mutual-NN
  * alignment vs literal double-direction argmax — each checked against
  * an independent straight-line model on small seeded-random inputs.
  * Integer quantities compare exactly; the single-double statistics
  * replicate the operator's exact IEEE op order (int→double, sqrt,
  * divide, HALF_UP round), so equality is still exact.
  */
class AlignStatsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("degreeAssortativity: moments equal the driver Pearson model on random graphs") {
    val rnd = new scala.util.Random(267)
    for (trial <- 1 to 25) {
      val nV = 4 + rnd.nextInt(20)
      val pairs = (for {
        a <- 0 until nV; b <- (a + 1) until nV
        if rnd.nextInt(4) == 0
      } yield (a.toLong, b.toLong)).distinct
      if (pairs.nonEmpty) {
        val got = GraphOps.degreeAssortativity(
            pairs.toDF("id_a", "id_b"), "id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).head
        val e = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        val deg = e.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
        val (n, sx, sy, sxy, sxx, syy) = e.foldLeft((0L, 0L, 0L, 0L, 0L, 0L)) {
          case ((n, sx, sy, sxy, sxx, syy), (u, v)) =>
            val (du, dv) = (deg(u), deg(v))
            (n + 1, sx + du, sy + dv, sxy + du * dv,
              sxx + du * du, syy + dv * dv)
        }
        val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
        val want =
          if (vx > 0 && vy > 0)
            round6((n * sxy - sx * sy).toDouble /
              (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
          else 0.0
        assert(got == ((n, want)), s"trial $trial: got $got want ($n, $want)")
        assert(got._2 >= -1.0 && got._2 <= 1.0)
      }
    }
  }

  test("kendallTauBands: histogram pair mass equals the O(n^2) definition") {
    val rnd = new scala.util.Random(271)
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(60)
      val rows = Seq.fill(n)((rnd.nextInt(6).toLong, rnd.nextInt(5).toLong))
      val got = Relational.kendallTauBands(rows.toDF("xb", "yb"), "xb", "yb")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .head
      var (c, dsc) = (0L, 0L)
      for (i <- 0 until n; j <- (i + 1) until n) {
        val s = (rows(i)._1 - rows(j)._1) * (rows(i)._2 - rows(j)._2)
        if (s > 0) c += 1 else if (s < 0) dsc += 1
      }
      val n0 = n.toLong * (n - 1) / 2
      val tx = rows.groupBy(_._1).values.map(g =>
        g.size.toLong * (g.size - 1) / 2).sum
      val ty = rows.groupBy(_._2).values.map(g =>
        g.size.toLong * (g.size - 1) / 2).sum
      val tau =
        if (n0 - tx > 0 && n0 - ty > 0)
          round6((c - dsc).toDouble /
            (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)))
        else 0.0
      assert(got == ((n.toLong, c, dsc, tau)),
        s"trial $trial: got $got want (${n.toLong}, $c, $dsc, $tau)")
    }
  }

  test("unigramDrift: folded missing mass equals the full-vocab TVD model") {
    val rnd = new scala.util.Random(269)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 25) {
      val toks = Seq.fill(20 + rnd.nextInt(200))(
        (s"g${rnd.nextInt(3)}", words(rnd.nextInt(words.size))))
      val got = Curation.unigramDrift(toks.toDF("g", "w"), "g", "w")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val nTot = toks.size.toLong
      val nW = toks.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
      val q = nW.map { case (w, c) => w -> c * 1000000L / nTot }
      val want = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, ts) =>
        val nG = ts.size.toLong
        val nGw = ts.groupBy(_._2).map { case (w, x) => w -> x.size.toLong }
        // the model sums over the FULL vocab — absent words contribute
        // their whole corpus mass q (p = 0 there)
        val tvd = q.map { case (w, qw) =>
          val p = nGw.get(w).map(_ * 1000000L / nG).getOrElse(0L)
          math.abs(p - qw)
        }.sum / 2
        (g, nG, nGw.size.toLong, tvd)
      }
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("mutualTop1: pairs equal the double-argmax model on random vectors") {
    val rnd = new scala.util.Random(272)
    def vec(): Seq[Float] = Seq.fill(4)((rnd.nextInt(21) - 10).toFloat)
    def cos4(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      val nrm = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      val c = if (nrm > 0) dot(a, b) / nrm else 0.0
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (trial <- 1 to 15) {
      val batch = (0 until 3 + rnd.nextInt(4)).map(i => (1000L + i, vec()))
      val corpus = (0 until 10 + rnd.nextInt(20)).map(i => (i.toLong, vec()))
      val got = Ann.mutualTop1(
          batch.toDF("vec_id", "embedding"),
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val fwd = batch.map { case (aId, av) =>
        val (bId, c) = corpus.map { case (bId, bv) => (bId, cos4(av, bv)) }
          .minBy { case (bId, c) => (-c, bId) }
        (aId, bId, c)
      }
      val want = fwd.filter { case (aId, bId, _) =>
        val bv = corpus.find(_._1 == bId).get._2
        val bestA = batch.map { case (x, xv) => (x, cos4(bv, xv)) }
          .minBy { case (x, c) => (-c, x) }._1
        bestA == aId
      }.sortBy(_._1)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }
}
