package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.multimodal.Multimodal

/** Scratch stage profiler for q132 (audio fingerprint dedup). */
object ProfileQ132 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    documents(spark, d).count()

    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name min=${times.min}%.3f runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    val docs = documents(spark, d)
    t("media-gen")(Multimodal.mediaWithDupAudio(spark, docs)
      .write.format("noop").mode("overwrite").save())
    t("fingerprints") {
      Multimodal.audioFingerprints(Multimodal.mediaWithDupAudio(spark, docs))
        .write.format("noop").mode("overwrite").save()
    }
    t("hamming-pairs") {
      graft.operators.Dedup.hammingNearDup(
          Multimodal.audioFingerprints(Multimodal.mediaWithDupAudio(spark, docs)).toDF(),
          "media_id", "fhash", nBits = 64, maxHamming = 2)
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = graft.operators.Dedup.hammingNearDup(
        Multimodal.audioFingerprints(Multimodal.mediaWithDupAudio(spark, docs)).toDF(),
        "media_id", "fhash", nBits = 64, maxHamming = 2)
    println(s"PROFILE n_pairs=${pairs.count()}")
    spark.stop()
  }
}
