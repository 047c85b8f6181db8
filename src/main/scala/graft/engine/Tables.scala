package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (/root/repo/TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and
  * sf0.1 (bench) — and, unchanged, against a 100 TB warehouse path: every
  * reader is a plain parquet scan, so Catalyst's column pruning and filter
  * pushdown reach the file source (`PushedFilters` / `ReadSchema` in
  * `.explain`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** The events table carries parquet TIMESTAMP(NANOS) — Spark has no
    * nanosecond timestamp type and rejects the file outright
    * (PARQUET_TYPE_ILLEGAL). Read nanos as Long (legacy conf, set ONCE in
    * the session builder — a reader must not mutate shared session conf
    * as a cross-query side effect) and floor to microseconds; DuckDB
    * keeps full ns, but every query emits second-granularity strings /
    * comparisons, where floor(ns)==floor(µs).
    */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption(NanosConf).contains("true"),
      s"""set .config("$NanosConf", "true") in the SparkSession builder to read the ns-timestamp events table""")
    import org.apache.spark.sql.functions._
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Every table, keyed by name (events through its ns-safe reader). */
  def all(s: SparkSession, d: String): Seq[(String, DataFrame)] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").map(n => n -> table(s, d, n)) :+
      ("events" -> events(s, d))
}
