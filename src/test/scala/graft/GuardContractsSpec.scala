package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Curation, Relational}

/** Machine-checked guard and regression contracts (VERDICT r12 #5/#9):
  * every documented domain bound that used to live only in scaladoc now
  * has a spec proving the runtime guard FIRES past the bound and stays
  * silent inside it, plus the two r11 advisory fixes that previously
  * had no regression spec (the acCache LRU bound, the ivfPq
  * error-message contract) and the q288 single-scan plan shape.
  */
class GuardContractsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Full throwable-chain text: raise_error surfaces as a
    * SparkRuntimeException (sometimes wrapped per-task), so contracts
    * match on the message anywhere in the chain.
    */
  private def chainText(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.result()
  }

  test("spearmanRho: distinct-value guard fires past maxDistinct, silent inside it") {
    val rows = (0 until 50).map(i => (i.toLong, i.toLong, (i * 7 % 50).toLong))
    val df = rows.toDF("id", "x", "y")
    // 50 distinct x values > bound 10 -> the bounded-domain guard raises
    val ex = intercept[Exception] {
      Relational.spearmanRho(df, "id", "x", "y", maxDistinct = 10L).collect()
    }
    assert(chainText(ex).contains("distinct"), chainText(ex))
    assert(chainText(ex).contains("band first"), chainText(ex))
    // inside the bound: identical to the default-bound result
    val tight = Relational.spearmanRho(df, "id", "x", "y", maxDistinct = 50L)
      .collect().head
    val default = Relational.spearmanRho(df, "id", "x", "y").collect().head
    assert(tight == default)
  }

  test("spearmanRho: n-bound guard fires past 1.6e6 rows (documented Long bound)") {
    // 1,600,001 rows; tiny value domains keep the histogram windows
    // cheap — only the n > 1.6e6 count matters to the guard
    val big = spark.range(1600001L)
      .select(col("id"), (col("id") % 1000L).as("x"), (col("id") % 7L).as("y"))
    val ex = intercept[Exception] {
      Relational.spearmanRho(big, "id", "x", "y").collect()
    }
    assert(chainText(ex).contains("1.6e6"), chainText(ex))
    // one row under the bound: completes (value is the banded identity's
    // concern, the guard's contract is only fire/no-fire)
    val ok = Relational.spearmanRho(big.limit(1600000), "id", "x", "y")
      .collect().head
    assert(ok.getLong(0) == 1600000L)
  }

  test("ksTwoSample: distinct-value guard fires past maxDistinct, silent inside it") {
    val rows = (0 until 40).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 20).toLong))
    val df = rows.toDF("arm", "v")
    val ex = intercept[Exception] {
      Relational.ksTwoSample(df, "arm", "v", "a", "b", maxDistinct = 5L).collect()
    }
    assert(chainText(ex).contains("quantize"), chainText(ex))
    val tight = Relational.ksTwoSample(df, "arm", "v", "a", "b",
      maxDistinct = 20L).collect().head
    val default = Relational.ksTwoSample(df, "arm", "v", "a", "b")
      .collect().head
    assert(tight == default)
  }

  test("fanoPpm: exact on a hand series; moment guard fires past n*sum(x^2) bound") {
    // hand model: xs = (2, 4, 6) -> n=3, sum=12, sxx=56,
    // fano_ppm = ((3*56 - 144) * 1e6) div (3*12) = 24e6 div 36
    val got = Relational.fanoPpm(
        Seq(("g", 2L), ("g", 4L), ("g", 6L)).toDF("grp", "x"), "grp", "x")
      .collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ("g", 3L, 12L, 24000000L / 36L))
    // one 4e6-count point: 1 * (4e6)^2 = 1.6e13 > 9e12 -> raises with
    // the coarsen remedy named
    val ex = intercept[Exception] {
      Relational.fanoPpm(Seq(("g", 4000000L)).toDF("grp", "x"), "grp", "x")
        .collect()
    }
    assert(chainText(ex).contains("coarsen"), chainText(ex))
  }

  test("fanoPpm: all-NULL group keeps the NULL-result contract, no spurious raise (ADVICE r14)") {
    // a group whose x values are ALL NULL has a vacuously-NULL moment
    // sum — the overflow guard must not misread that as wrap (the old
    // product-form guard returned NULL fano_ppm for it); a normal
    // group alongside still computes
    val df = Seq(("dead", None: Option[Long]), ("dead", None),
      ("live", Some(2L)), ("live", Some(4L)), ("live", Some(6L)))
      .toDF("grp", "x")
    val got = Relational.fanoPpm(df, "grp", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("dead").isNullAt(3), "all-NULL group must yield NULL fano_ppm")
    assert(got("dead").getLong(1) == 2L)
    assert(got("live").getLong(3) == 24000000L / 36L)
  }

  test("fanoPpm: guard survives Long wrap of sum(x^2) (ADVICE r13)") {
    // x = 3.5e9: x*x = 1.225e19 overflows Long — ANSI would throw a
    // remedy-less ARITHMETIC_OVERFLOW and legacy mode would wrap
    // NEGATIVE and silently bypass the old product-form guard
    // (n*sxx > M); the try_multiply/try_sum NULL path must raise the
    // remedy-bearing guard error in both modes
    val ex = intercept[Exception] {
      Relational.fanoPpm(
        Seq(("g", 3500000000L), ("g", 1L)).toDF("grp", "x"), "grp", "x")
        .collect()
    }
    assert(chainText(ex).contains("coarsen"), chainText(ex))
  }

  test("mannKendall: C(n,2) pair bound fires past maxPts, silent inside it") {
    val df = (0 until 100).map(i => (i.toLong, (i * 13 % 41).toLong))
      .toDF("d", "v")
    val ex = intercept[Exception] {
      Relational.mannKendall(df, "d", "v", maxPts = 99L).collect()
    }
    assert(chainText(ex).contains("coarsen the series"), chainText(ex))
    assert(chainText(ex).contains("100"), chainText(ex))
    // inside the bound: identical to the default-bound result
    val tight = Relational.mannKendall(df, "d", "v", maxPts = 100L)
      .collect().head
    val default = Relational.mannKendall(df, "d", "v").collect().head
    assert(tight == default)
  }

  test("boundedSelfJoinSide: q291's name-pair guard fires past the bound") {
    val names = (0 until 30).map(i => Tuple1(s"name_$i")).toDF("name_a")
    val ex = intercept[Exception] {
      Relational.boundedSelfJoinSide(names, "name_a", 29L,
          "q291 jaro-winkler scoring", "pre-block the names")
        .collect()
    }
    assert(chainText(ex).contains("pre-block"), chainText(ex))
    // inside the bound: values pass through untouched
    val ok = Relational.boundedSelfJoinSide(names, "name_a", 30L,
        "q291 jaro-winkler scoring", "pre-block the names")
      .collect().map(_.getString(0)).toSet
    assert(ok == (0 until 30).map(i => s"name_$i").toSet)
  }

  test("blocklistScreen automaton cache stays LRU-bounded across many pattern sets") {
    val docs = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    // 12 distinct pattern sets: more than the 8-slot cap; each screen
    // still answers correctly while the cache evicts in access order
    for (i <- 0 until 12) {
      val hits = Curation.blocklistScreen(docs, "doc_id", "text",
          Seq(s"zz$i", "bb")).collect()
      assert(hits.map(r => (r.getString(1), r.getLong(2))).toSet ==
        Set(("bb", 1L)), s"set $i")
    }
    assert(Curation.acCacheSize <= 8,
      s"acCache grew past its LRU cap: ${Curation.acCacheSize}")
  }

  test("ivfPqTopKProbe: mismatched codes fail loudly with the contract message") {
    val e = engine.Tables.embeddings(spark, SparkTestSession.sfDir)
    val queries = e.filter(col("vec_id") < 2)
    val (m, codes, nLists) = (8, 4, 2)
    val cents = Ann.kmeansCentroids(e, "vec_id", "embedding", nLists, iters = 1)
    val books = Ann.pqCodebooks(e, "vec_id", "embedding", m, codes)
    val coded = Ann.ivfListAssignments(e, "vec_id", "embedding", cents)
      .select(col("cid"), col("neighbor_id").cast("long").as("neighbor_id"))
      .join(Ann.pqEncodeWith(e, "vec_id", "embedding", books, m),
        Seq("neighbor_id"))
    // (a) wrong code id: shift every code past the codebook domain
    val badIds = coded.withColumn("codes",
      transform(col("codes"), c => c + lit(1000L)))
    val exIds = intercept[Exception] {
      Ann.ivfPqTopKProbe(queries, cents, badIds, books,
        "vec_id", "embedding", k = 3, nProbe = nLists, m = m).collect()
    }
    assert(chainText(exIds).contains("codes do not match"), chainText(exIds))
    // (b) wrong arity: drop a subspace from every coded row
    val badArity = coded.withColumn("codes",
      slice(col("codes"), 1, m - 1))
    val exArity = intercept[Exception] {
      Ann.ivfPqTopKProbe(queries, cents, badArity, books,
        "vec_id", "embedding", k = 3, nProbe = nLists, m = m).collect()
    }
    assert(chainText(exArity).contains("codes do not match"), chainText(exArity))
  }

  test("q288 FD audit reads lineitem exactly once (shared-scan contract)") {
    val df = SparkEntry.queries("q288_fd_audit")(spark, SparkTestSession.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 1, s"expected 1 lineitem scan, found $liScans:\n" +
      plan.take(4000))
    // and the audit itself still answers: a real key has 0 violations
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("o_orderkey->o_orderpriority") == 0L)
    assert(rows.size == 3)
  }
}
