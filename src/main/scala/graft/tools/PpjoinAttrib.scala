package graft.tools

import org.apache.spark.sql.SparkSession

/** q182 growth attribution (VERDICT r11 #1 — the q100 playbook):
  * measure each PPJoin pipeline stage's volume per SF so the
  * SCALING_gate watch row (11.0×/decade at sf10) is ATTRIBUTED, not
  * guessed. Columns: docs, raw shingle rows, prefix postings (the
  * self-join side), hottest posting list, candidate pairs surviving
  * prefix+size filters, truth pairs (J ≥ 0.7).
  *
  * Reading the sweep: the sf10 fixture is built from K=100
  * cipher-relabelled copies of sf0.1 (tools/make_sf1.py) — within-copy
  * pair structure is bit-preserved, cross-copy TRUTH pairs are
  * impossible (no 3-shingle set overlaps 70% across ciphers), so truth
  * pairs scale exactly linearly BY CONSTRUCTION. If measured time
  * grows faster than candidates, the cost is exchange/verify physics
  * on linearly-growing volume; if candidates grow super-linearly, the
  * 3-gram vocabulary (≤ 27³) is saturating and cross-copy prefix
  * collisions dominate — the salt-the-hot-postings fix applies.
  *
  * Usage: PpjoinAttrib <sfDir> [<sfDir> ...]
  */
object PpjoinAttrib {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PpjoinAttrib <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"sfDir"}%-22s ${"docs"}%10s ${"sh_rows"}%12s ${"prefix"}%12s ${"max_plen"}%9s ${"cand_raw"}%12s ${"cand_pos"}%12s ${"truth"}%10s ${"sec"}%8s")
    args.foreach { d =>
      val docs = graft.engine.Tables.documents(spark, d)
      val t0 = System.nanoTime()
      val row = graft.operators.Dedup
        .ppJoinStats(docs, "doc_id", "text", tPpm = 700000L)
        .selectExpr("n_docs", "n_shingle_rows", "n_prefix", "max_plen",
          "n_cand_raw", "n_cand_pairs", "n_truth_pairs")
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$d%-22s ${row.getLong(0)}%10d ${row.getLong(1)}%12d ${row.getLong(2)}%12d ${row.getLong(3)}%9d ${row.getLong(4)}%12d ${row.getLong(5)}%12d ${row.getLong(6)}%10d $sec%8.1f")
    }
    spark.stop()
  }
}
