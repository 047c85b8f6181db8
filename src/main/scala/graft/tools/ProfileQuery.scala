package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic single-query profiler: best-of-N timings for any
  * `SparkEntry.queries` entries, noop-sink, warm session.
  *
  *   sbt "runMain graft.tools.ProfileQuery q114_quality_classifier[,q30_...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_RUNS (default 3).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(sys.error("usage: ProfileQuery <name[,name...]>"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
