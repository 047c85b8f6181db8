package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Indexing

/** Round-15 BM25 standing-index maintenance (VERDICT r14 #1): the
  * q219/q221 upsert/tombstone doctrine applied to the retrieval index.
  * merge == rebuild and delete == rebuild are proven BIT-EXACT per
  * frame (postings, doclen, stats) against `bm25Index` recomputed over
  * the post-maintenance corpus, and the probe over the maintained
  * triple reproduces the inline scorer over that corpus.
  */
class Bm25MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Buckets = 8

  // a small corpus with repeated terms (tf > 1), a shared vocabulary,
  // and a zero-token doc (id 9: no postings, no dl row — the domain
  // edge bm25Index documents)
  private def corpus: DataFrame = (Seq(
    (1L, "spark window hash join spark"),
    (2L, "hash hash hash filter"),
    (3L, "window scan merge"),
    (4L, "spark filter filter"),
    (5L, "merge join window window hash"),
    (6L, "scan scan scan scan"),
    (7L, "spark spark spark window"),
    (8L, "join"),
    (9L, "   ")) ++
    (20L to 39L).map(i => (i, s"common filler w${i % 5} spark")))
    .toDF("doc_id", "text")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def assertTripleEqual(got: (DataFrame, DataFrame, DataFrame),
                                want: (DataFrame, DataFrame, DataFrame),
                                tag: String): Unit = {
    assert(rows(got._1) == rows(want._1), s"$tag postings")
    assert(rows(got._2) == rows(want._2), s"$tag doclen")
    assert(rows(got._3) == rows(want._3), s"$tag stats")
  }

  test("bm25IndexUpsert == bm25Index rebuild, bit-exact per frame") {
    val standing = Indexing.bm25Index(corpus, "doc_id", "text", Buckets)
    // the batch exercises every upsert path: new id (50), replaced id
    // with edited text (2: tf changes, dl changes), replaced id
    // re-ingested EMPTY (5: leaves the doclen/stats domain), new id
    // with empty text (51: never enters), and a replaced zero-token
    // doc gaining tokens (9: enters the domain)
    val batch = Seq(
      (50L, "brand new spark document hash"),
      (2L, "hash once now"),
      (5L, ""),
      (51L, "  "),
      (9L, "revived window")).toDF("doc_id", "text")
    val got = Indexing.bm25IndexUpsert(standing._1, standing._2,
      standing._3, batch, "doc_id", "text", Buckets)
    val batchIds = Set(50L, 2L, 5L, 51L, 9L)
    val after = corpus.filter(!col("doc_id").isin(batchIds.toSeq: _*))
      .unionByName(batch)
    val want = Indexing.bm25Index(after, "doc_id", "text", Buckets)
    assertTripleEqual(got, want, "upsert")
    // probing the maintained triple == the inline scorer over the
    // post-upsert corpus (the q303 contract, end to end)
    val probe = Indexing.bm25ProbeTopK(got._1, got._2, got._3,
      Seq("spark", "hash"), Buckets, k = 10)
    val inline = Indexing.bm25LiteTopK(after, "doc_id", "text",
      Seq("spark", "hash"), k = 10)
    assert(probe.collect().map(_.toSeq).toSeq ==
      inline.collect().map(_.toSeq).toSeq, "probe-after-upsert")
  }

  test("bm25IndexUpsert: append-only batch (no replaced ids) folds cleanly") {
    val standing = Indexing.bm25Index(corpus, "doc_id", "text", Buckets)
    val batch = Seq((60L, "fresh join scan"), (61L, "fresh fresh"))
      .toDF("doc_id", "text")
    val got = Indexing.bm25IndexUpsert(standing._1, standing._2,
      standing._3, batch, "doc_id", "text", Buckets)
    val want = Indexing.bm25Index(corpus.unionByName(batch),
      "doc_id", "text", Buckets)
    assertTripleEqual(got, want, "append-only")
  }

  test("bm25IndexDelete == bm25Index rebuild over corpus MINUS deleted") {
    val standing = Indexing.bm25Index(corpus, "doc_id", "text", Buckets)
    // tombstones include a never-indexed id (999: no-op) and the
    // zero-token doc (9: also a no-op — it has no rows to remove)
    val deleted = Seq(2L, 6L, 20L, 999L, 9L).toDF("doc_id")
    val got = Indexing.bm25IndexDelete(standing._1, standing._2,
      standing._3, deleted)
    val after = corpus.filter(!col("doc_id").isin(2L, 6L, 20L, 999L, 9L))
    val want = Indexing.bm25Index(after, "doc_id", "text", Buckets)
    assertTripleEqual(got, want, "delete")
    val probe = Indexing.bm25ProbeTopK(got._1, got._2, got._3,
      Seq("spark", "hash"), Buckets, k = 10)
    val inline = Indexing.bm25LiteTopK(after, "doc_id", "text",
      Seq("spark", "hash"), k = 10)
    assert(probe.collect().map(_.toSeq).toSeq ==
      inline.collect().map(_.toSeq).toSeq, "probe-after-delete")
  }

  test("probe-through-upsert keeps the term filter pushed to the postings scan (scale contract)") {
    // the 100 TB contract behind q303: composing UPSERT + PROBE must
    // not cost the probe its scan pruning — the probed terms' In(w)
    // filter has to reach the PARQUET postings scan THROUGH the
    // upsert's anti-join/union, or maintenance would turn every probe
    // into a full-index scan. (Verified in the live plan by
    // ExplainAudit r15; this pins it as a red test.)
    val standing = Indexing.bm25Index(corpus, "doc_id", "text", Buckets)
    val dir = java.nio.file.Files.createTempDirectory("bm25-push").toString
    standing._1.write.mode("overwrite").partitionBy("wb").parquet(s"$dir/p")
    standing._2.write.mode("overwrite").parquet(s"$dir/d")
    standing._3.write.mode("overwrite").parquet(s"$dir/s")
    val batch = Seq((80L, "spark anew")).toDF("doc_id", "text")
    val (p2, d2, s2) = Indexing.bm25IndexUpsert(
      spark.read.parquet(s"$dir/p").withColumn("wb", col("wb").cast("long")),
      spark.read.parquet(s"$dir/d"), spark.read.parquet(s"$dir/s"),
      batch, "doc_id", "text", Buckets)
    val probe = Indexing.bm25ProbeTopK(p2, d2, s2,
      Seq("spark", "hash"), Buckets, k = 5)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLines = plan.linesIterator
      .filter(l => l.contains(s"$dir/p") && l.contains("PushedFilters"))
      .toSeq
    assert(scanLines.nonEmpty, s"no postings parquet scan found:\n${plan.take(4000)}")
    assert(scanLines.exists(_.matches(".*In\\(w, \\[.*(spark|hash).*\\]\\).*")),
      s"term filter not pushed to the postings scan:\n${scanLines.mkString("\n")}")
    assert(probe.collect().nonEmpty)
  }

  test("maintained index parquet round-trips and still probes exactly") {
    // the standing index lives in parquet between batches — prove the
    // maintained frames survive the wb-partitioned write/read cycle
    // the fixture uses (Long tf/dl are lossless; wb partition-column
    // inference comes back INT and is re-cast, the q213 contract)
    val standing = Indexing.bm25Index(corpus, "doc_id", "text", Buckets)
    val batch = Seq((70L, "spark hash window")).toDF("doc_id", "text")
    val (p2, d2, s2) = Indexing.bm25IndexUpsert(standing._1, standing._2,
      standing._3, batch, "doc_id", "text", Buckets)
    val dir = java.nio.file.Files.createTempDirectory("bm25-maint").toString
    p2.write.mode("overwrite").partitionBy("wb").parquet(s"$dir/p")
    d2.write.mode("overwrite").parquet(s"$dir/d")
    s2.write.mode("overwrite").parquet(s"$dir/s")
    val probe = Indexing.bm25ProbeTopK(
      spark.read.parquet(s"$dir/p").withColumn("wb", col("wb").cast("long")),
      spark.read.parquet(s"$dir/d"), spark.read.parquet(s"$dir/s"),
      Seq("spark", "hash"), Buckets, k = 10)
    val inline = Indexing.bm25LiteTopK(corpus.unionByName(batch),
      "doc_id", "text", Seq("spark", "hash"), k = 10)
    assert(probe.collect().map(_.toSeq).toSeq ==
      inline.collect().map(_.toSeq).toSeq)
  }
}
