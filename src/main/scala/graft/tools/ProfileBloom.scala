package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Scratch profiler for q125's duplicateKeyBloom prune: times the bloom
  * build, the pruned-vs-unpruned gram volume, and the full query.
  */
object ProfileBloom {
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

    val L = 40
    val docs = documents(spark, d)
    val gramUdf = udf { s: String =>
      if (s == null || s.length < L) Array.empty[(Long, String)]
      else Array.tabulate(s.length - L + 1)(i => ((i + 1).toLong, s.substring(i, i + L)))
    }
    val grams = docs
      .select(col("doc_id").cast("long").as("id"),
        explode(gramUdf(col("text"))).as("pg"))
      .select(col("id"), col("pg._1").as("pos"), col("pg._2").as("g"))

    t("gram-gen-count")(grams.selectExpr("count(1)").collect())
    var bloom: Array[Byte] = null
    t("bloom-build") {
      bloom = graft.operators.Dedup.duplicateKeyBloom(grams.select(xxhash64(col("g")).as("h")))
    }
    println(s"PROFILE bloom-bytes=${bloom.length}")
    locally {
      import org.apache.spark.sql.GraftSqlShim
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatLit}
      val pruned = grams.filter(GraftSqlShim.column(BloomFilterMightContain(
        CatLit.create(bloom, org.apache.spark.sql.types.BinaryType),
        GraftSqlShim.expression(xxhash64(col("g"))))))
      t("pruned-count")(pruned.selectExpr("count(1)").collect())
    }
    for (hash <- Seq(false, true); bloom <- Seq(false, true)) {
      t(s"spans hash=$hash bloom=$bloom") {
        graft.operators.Dedup.exactSubstringSpans(docs, "doc_id", "text",
            minLen = 40, hashGrams = hash, bloomPrune = bloom)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
