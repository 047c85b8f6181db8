package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Scratch profiler for the q44 regression (VERDICT r05 #1). */
object ProfileQ44 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()
    lineitem(spark, d).count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name min=${times.min}%.3f runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    val li = lineitem(spark, d)
    // equivalence check: round(x) vs floor(x+0.5) over the real data
    val diff = li.select((sqrt(col("l_quantity")) * 10000).as("x"))
      .filter(round(col("x")).cast("long") =!= floor(col("x") + 0.5).cast("long"))
      .count()
    println(s"PROFILE round-vs-floorhalf diffs=$diff")
    t("floorhalf-variant-cold")(noop(li.groupBy("l_returnflag").agg(
      sum(floor(sqrt(col("l_quantity")) * 10000 + 0.5).cast("long")).as("sum_sqrt_q"),
      sum((col("l_quantity") * col("l_quantity")).cast("long")).as("sum_sq_q"),
      sum(floor(col("l_extendedprice")).cast("long")).as("sum_floor_p"),
      sum(ceil(col("l_discount") * 100).cast("long")).as("sum_ceil_d"),
      sum(abs(col("l_quantity") - 25.0).cast("long")).as("sum_absdev"),
      sum(pmod(col("l_orderkey"), lit(7L))).as("sum_mod7"))
      .orderBy("l_returnflag")))
    t("full-q44")(noop(SparkEntryRef.q44(spark, d)))
    t("count-only")(noop(li.groupBy("l_returnflag").count()))
    t("sqrt-round-only")(noop(li.groupBy("l_returnflag").agg(
      sum(round(sqrt(col("l_quantity")) * 10000).cast("long")).as("a"))))
    t("sqrt-no-round")(noop(li.groupBy("l_returnflag").agg(
      sum((sqrt(col("l_quantity")) * 10000).cast("long")).as("a"))))
    t("sq-only")(noop(li.groupBy("l_returnflag").agg(
      sum((col("l_quantity") * col("l_quantity")).cast("long")).as("a"))))
    t("floor-only")(noop(li.groupBy("l_returnflag").agg(
      sum(floor(col("l_extendedprice")).cast("long")).as("a"))))
    t("ceil-only")(noop(li.groupBy("l_returnflag").agg(
      sum(ceil(col("l_discount") * 100).cast("long")).as("a"))))
    t("abs-only")(noop(li.groupBy("l_returnflag").agg(
      sum(abs(col("l_quantity") - 25.0).cast("long")).as("a"))))
    t("pmod-only")(noop(li.groupBy("l_returnflag").agg(
      sum(pmod(col("l_orderkey"), lit(7L))).as("a"))))
    t("full-q44-again")(noop(SparkEntryRef.q44(spark, d)))
    spark.stop()
  }

  object SparkEntryRef {
    def q44(s: SparkSession, d: String) = graft.SparkEntry.queries("q44_math_fns")(s, d)
  }
}
