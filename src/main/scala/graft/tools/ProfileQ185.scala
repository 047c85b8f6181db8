package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: where do q185's seconds go at sf1? */
object ProfileQ185 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val li = graft.engine.Tables.lineitem(spark, d)
    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run $i: ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
      }
    }
    t("scan") { li.select("l_orderkey", "l_partkey").groupBy().count().collect()(0).getLong(0) }
    val sets = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .groupBy("b").agg(sort_array(collect_set(col("i"))).as("items"))
    t("sets") { sets.groupBy().count().collect()(0).getLong(0) }
    val pairs = sets
      .select(col("items"), explode(col("items")).as("i"))
      .select(col("i"), explode(col("items")).as("i2"))
      .filter(col("i") =!= col("i2"))
      .groupBy(col("i").as("item"), col("i2").as("rec_item"))
      .agg(count(lit(1)).as("n_both"))
    t("pairs") { pairs.groupBy().count().collect()(0).getLong(0) }
    val full = graft.SparkEntry.queries("q185_cooccur_recs")
    t("full") { full(spark, d).count() }
    spark.stop()
  }
}
