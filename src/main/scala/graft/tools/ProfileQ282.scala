package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** A/B profile for q282's pair fan-out (the 13.9×/decade sweep flag):
  * posting-list double-explode vs plain co-partitioned self-join on
  * the feature key, measured on the derived sf1/sf10 fixtures. The
  * pair VOLUME is exactly linear (8.7M/87.2M/872M at sf0.1/1/10,
  * measured via the degree histogram), so whichever form keeps
  * wall-clock ~linear is the right physical shape.
  */
object ProfileQ282 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def inc(d: String) = graft.engine.Tables.lineitem(spark, d)
      .select(col("l_suppkey").cast("long").as("l"), col("l_partkey").as("f"))
      .distinct()

    def explodeForm(d: String): DataFrame = {
      val posting = inc(d).groupBy("f")
        .agg(sort_array(collect_set(col("l"))).as("ls"),
          count(lit(1)).cast("long").as("deg"))
        .filter(col("deg").between(2L, 64L))
        .withColumn("w_ppm", expr("1000000 div length(bin(deg))"))
      posting
        .select(col("w_ppm"), explode(col("ls")).as("a"), col("ls"))
        .select(col("w_ppm"), col("a"), explode(col("ls")).as("b"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).cast("long").as("n_shared"),
          sum("w_ppm").cast("long").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("a").asc, col("b").asc)
        .limit(20)
    }

    def joinForm(d: String): DataFrame = {
      val i = inc(d)
      val el = i.groupBy("f").agg(count(lit(1)).cast("long").as("deg"))
        .filter(col("deg").between(2L, 64L))
        .withColumn("w_ppm", expr("1000000 div length(bin(deg))"))
        .select(col("f"), col("w_ppm"))
      el.join(i.select(col("f"), col("l").as("a")), Seq("f"))
        .join(i.select(col("f"), col("l").as("b")), Seq("f"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).cast("long").as("n_shared"),
          sum("w_ppm").cast("long").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("a").asc, col("b").asc)
        .limit(20)
    }

    def postingOnly(d: String): DataFrame = inc(d).groupBy("f")
      .agg(sort_array(collect_set(col("l"))).as("ls"),
        count(lit(1)).cast("long").as("deg"))
      .filter(col("deg").between(2L, 64L))
      .select(count(lit(1)).as("n"))

    def pairCountOnly(d: String): DataFrame = {
      val posting = inc(d).groupBy("f")
        .agg(sort_array(collect_set(col("l"))).as("ls"),
          count(lit(1)).cast("long").as("deg"))
        .filter(col("deg").between(2L, 64L))
      posting
        .select(explode(col("ls")).as("a"), col("ls"))
        .select(col("a"), explode(col("ls")).as("b"))
        .filter(col("a") < col("b"))
        .select(count(lit(1)).as("n")) // generate cost, no (a,b) agg
    }

    def repartAbForm(parts: Int)(d: String): DataFrame = {
      val posting = inc(d).groupBy("f")
        .agg(sort_array(collect_set(col("l"))).as("ls"),
          count(lit(1)).cast("long").as("deg"))
        .filter(col("deg").between(2L, 64L))
        .withColumn("w_ppm", expr("1000000 div length(bin(deg))"))
      posting
        .select(col("w_ppm"), explode(col("ls")).as("a"), col("ls"))
        .select(col("w_ppm"), col("a"), explode(col("ls")).as("b"))
        .filter(col("a") < col("b"))
        .repartition(parts, col("a"), col("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).cast("long").as("n_shared"),
          sum("w_ppm").cast("long").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("a").asc, col("b").asc)
        .limit(20)
    }

    def operatorForm(d: String): DataFrame =
      GraphOps.adamicAdarTopK(inc(d).toDF("l_suppkey", "l_partkey")
        .select(col("l_suppkey"), col("l_partkey")),
        "l_suppkey", "l_partkey", maxDeg = 64, topK = 20)

    for (d <- Seq("/tmp/graft-sf10")) {
      for ((name, fn) <- Seq("repart64" -> repartAbForm(64) _,
          "operator" -> operatorForm _)) {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(d).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$d%-22s $name%-8s best ${ts.min}%7.2f s  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
