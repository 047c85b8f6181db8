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

  /** The events reader is SCHEMA-ADAPTIVE because the driver has shipped
    * this table in two physical forms across rounds:
    *
    *  - parquet TIMESTAMP(NANOS): Spark has no nanosecond timestamp type
    *    and rejects the file outright (PARQUET_TYPE_ILLEGAL) unless the
    *    legacy nanosAsLong conf (set ONCE in the session builder — a
    *    reader must not mutate shared session conf as a cross-query side
    *    effect) reads nanos as Long; we then floor to microseconds.
    *    DuckDB keeps full ns, but every query emits second-granularity
    *    strings / comparisons, where floor(ns)==floor(µs).
    *  - parquet timestamp[us] (isAdjustedToUTC=false), which Spark reads
    *    as TIMESTAMP_NTZ: cast to the session-zone TIMESTAMP so every
    *    downstream consumer (window(), watermarks, java.sql.Timestamp
    *    encoders in the streaming twins) sees the type this codebase was
    *    written against. The cast preserves the wall clock, and DuckDB
    *    reads the identical wall clock, so oracle comparisons hold in
    *    any session zone.
    */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Every table, keyed by name (events through its ns-safe reader). */
  def all(s: SparkSession, d: String): Seq[(String, DataFrame)] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").map(n => n -> table(s, d, n)) :+
      ("events" -> events(s, d))
}
