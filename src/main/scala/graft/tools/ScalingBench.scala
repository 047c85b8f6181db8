package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling evidence: times representative queries at every testdata
  * scale factor and prints the growth ratio against the data growth.
  * lineitem-backed queries scale 6k→60k→600k rows (100×); documents/
  * embeddings-backed ones 500→500→5000 (10×, sf0.001 and sf0.01 share
  * the same corpus size). Caveat: at these sizes a fixed per-query
  * overhead (~0.2-0.4 s of planning/codegen/scheduling on local[32])
  * dominates the small end, so measured growth UNDERSTATES asymptotic
  * growth; the point is the top end — time growing far slower than
  * data is what a shuffle-bounded plan should show.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()

    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val queries = Seq(
      "q01_agg_pricing", "q04_join_multiway", "q08_window_analytic",
      "q60_window_range_frame",
      "q29_dedup_exact", "q30_dedup_ngram_jaccard", "q31_dedup_minhash_lsh",
      "q52_dedup_simhash_hamming", "q63_dedup_clusters", "q75_winnow_overlap",
      "q35_ann_bruteforce", "q54_ann_ivf_kmeans")
    println(f"${"query"}%-28s ${sfs.mkString("  ")}   t(sf0.1)/t(sf0.001)")
    queries.foreach { name =>
      val times = sfs.map { sf =>
        val fn = graft.SparkEntry.queries(name)
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, s"/root/testdata/$sf").write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      println(f"$name%-28s ${times.map(t => f"$t%6.2f").mkString("  ")}   ${times.last / times.head}%5.1fx")
    }
    spark.stop()
  }
}
