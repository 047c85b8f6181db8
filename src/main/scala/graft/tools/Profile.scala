package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.operators.{Ann, Dedup}

/** Throwaway stage profiler (not part of the library surface): times the
  * building blocks of the heaviest bench queries so a regression can be
  * attributed to a stage, not guessed at. Round 2 shapes: posting-list
  * candidate generation (Dedup), k-means centroid build (Ann).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    documents(spark, d).count()

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = documents(spark, d)
    // q30 stages
    t("q30 shingle+explode") {
      noop(docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("shs"))
        .select(col("id"), explode(col("shs")).as("sh")))
    }
    t("q30 full") {
      noop(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.05).orderBy("id_a", "id_b"))
    }
    // q31 stages
    t("q31 signature-only") {
      noop(Dedup.minHashSignature(docs, "doc_id", "text", 3, 16))
    }
    t("q31 full") {
      noop(Dedup.minHashLsh(docs, "doc_id", "text", 3, 4, 4, 0.25).orderBy("id_a", "id_b"))
    }
    // q52 stages
    t("q52 simhash-only") { noop(Dedup.simHash(docs, "doc_id", "text", 32)) }
    t("q52 full") {
      noop(Dedup.simHashNearDup(docs, "doc_id", "text", 32, 2).orderBy("id_a", "id_b"))
    }
    // q63 stages
    t("q63 pairs-only") { noop(Dedup.simHashDup(docs, "doc_id", "text", 16)) }
    t("q63 full") {
      noop(Dedup.dupClusters(
        Dedup.simHashDup(docs, "doc_id", "text", 16), "id_a", "id_b", 4).orderBy("node"))
    }
    // q52 banding physics: fixed 32-bit simhash buckets grow ~n²/2^bandBits,
    // so candidate pairs go quadratic at 10x the corpus; wider hashes are
    // the documented remedy — these two lines measure it at the current sf
    t("q52 simhash32-ham2") {
      noop(Dedup.simHashNearDup(docs, "doc_id", "text", 32, 2).orderBy("id_a", "id_b"))
    }
    t("q52 simhash60-ham2") {
      noop(Dedup.simHashNearDup(docs, "doc_id", "text", 60, 2).orderBy("id_a", "id_b"))
    }
    // q54 stages
    val e = embeddings(spark, d)
    t("q54 centroid-build") {
      Ann.kmeansCentroids(e, "vec_id", "embedding", 8, 2).collect(): Unit
    }
    t("q54 full") {
      noop(Ann.ivfTopKKmeans(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
        5, 8, 2, 2))
    }
    spark.stop()
  }
}
