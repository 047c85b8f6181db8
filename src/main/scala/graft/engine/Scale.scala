package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns the planner cannot always supply on its own
  * (SURVEY.md §2b scale notes): key-salting for skewed joins, bucketed
  * co-located joins, and partition-pruned layouts. Each helper is plain
  * DataFrame composition — testable at sf fixtures, unchanged at 100 TB.
  */
object Scale {

  /** Cluster-durability switch for every iterative operator in the
    * library (star CC, BFS/SSSP, k-core, PageRank, k-means, BPE merge
    * rounds, ...): `spark.graft.checkpointDir` unset (the default, and
    * the local[32] test mode) → `localCheckpoint(eager)`, whose blocks
    * live on executors — fastest, but lost WITH an executor, so an
    * executor failure at 1000-node scale kills the whole iterative job.
    * Set `spark.graft.checkpointDir` to an HDFS/S3 path and every loop
    * switches to reliable `checkpoint()` into that directory: lineage
    * is truncated identically (same plan shape, same results — asserted
    * by CheckpointEquivalenceSpec), but materialized blocks survive
    * executor loss and the job resumes instead of recomputing from
    * round 0. The sparkContext checkpoint dir is set lazily from the
    * conf on first use.
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // Remember the EXACT conf value last applied (per application):
        // setCheckpointDir appends a UUID subdir so the configured dir
        // can't be compared to getCheckpointDir directly, and a
        // substring containment check would skip re-pointing when the
        // new dir is a substring of the old path (ADVICE r08, e.g.
        // /data/ckpt after /data/ckpt2). Re-pointing when the conf
        // changes keeps long-lived sessions (tests, notebooks) honest.
        val key = (sc.applicationId, dir)
        if (!appliedCheckpointDir.get().contains(key)) synchronized {
          if (!appliedCheckpointDir.get().contains(key)) {
            sc.setCheckpointDir(dir)
            appliedCheckpointDir.set(Some(key))
            // Reliable checkpoints are NOT removed by Spark's cleaner
            // unless the context was started with
            // spark.cleaner.referenceTracking.cleanCheckpoints=true (a
            // context-creation conf this library cannot retrofit), so a
            // long iterative job otherwise grows durable storage by one
            // rdd-* dir per round (ADVICE r08). Surface that loudly —
            // round N-1's files cannot be deleted eagerly here because
            // loop-invariant frames (e.g. q191's blocked-edge frame)
            // are legitimately re-read by every later round.
            if (!sc.getConf.getBoolean(
                "spark.cleaner.referenceTracking.cleanCheckpoints", false))
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"$CheckpointDirConf is set but " +
                  "spark.cleaner.referenceTracking.cleanCheckpoints is not: " +
                  "superseded round checkpoints under " + dir + " will only " +
                  "be removed at application end, not as rounds are GC'd — " +
                  "set it at spark-submit time for long jobs")
            // End-of-job floor either way: delete the UUID subdir this
            // application created once the application ends (nothing
            // can reference its checkpoints after that). At most ONE
            // listener per created UUID dir — sessions alternating
            // between two configured dirs re-point on every call, and
            // an unguarded add would accumulate listeners for the
            // application's lifetime (ADVICE r9).
            sc.getCheckpointDir.foreach { created =>
              if (cleanupRegistered.add(created))
                sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
                  override def onApplicationEnd(
                      e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
                    try {
                      val p = new org.apache.hadoop.fs.Path(created)
                      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
                    } catch { case _: Throwable => () } // best-effort
                })
            }
          }
        }
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }
  }

  /** (applicationId, configured dir) last routed through
    * setCheckpointDir — exact equality, not containment (ADVICE r08).
    */
  private val appliedCheckpointDir =
    new java.util.concurrent.atomic.AtomicReference[Option[(String, String)]](None)

  /** Created UUID checkpoint dirs that already have an end-of-app
    * cleanup listener — one listener per dir, ever (ADVICE r9).
    */
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** Postfix form of [[materialize]] so iterative loops read as
    * pipelines: `edges.materialized`.
    */
  implicit class MaterializeOps(private val df: DataFrame) {
    def materialized: DataFrame = materialize(df)
  }

  /** Skew-safe equi-join: salt the big (skewed) side into `saltFactor`
    * sub-keys and replicate the small side once per salt, turning one
    * hot key's partition into `saltFactor` even slices. Use when a key's
    * row count exceeds what one task should hold AND AQE's skew-join
    * splitting is not applicable (e.g. the skewed side is the OUTPUT of
    * an exchange-free stage). Inner joins only.
    *
    * At 100 TB: saltFactor multiplies only the SMALL side's shuffle
    * volume (`|small| * saltFactor` rows), while the big side's hot keys
    * spread across `saltFactor` tasks — the classic trade.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
                     smallKey: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    // dataframe-qualified refs: with same-named key columns (the common
    // equi-join case) bare col(...) would be AMBIGUOUS_REFERENCE
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
        salted(bigKey) === replicated(smallKey))
      .drop("__salt")
  }

  /** Two-phase aggregation under heavy key skew: pre-aggregate on
    * (key, salt), then finish on key. Spark's partial aggregation
    * already combines map-side, but when ONE key dominates the final
    * exchange, the middle phase spreads it over `saltFactor` reducers.
    * `aggs` must be decomposable (sum/count/min/max style).
    */
  def saltedSumAgg(df: DataFrame, key: String, valueCol: String,
                   saltFactor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Write `df` bucketed+sorted on `key` as a managed table: two tables
    * bucketed the same way join with ZERO exchanges (co-located,
    * SURVEY.md §2b "bucketing for co-located joins"). The warehouse dir
    * is the session's `spark.sql.warehouse.dir`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets managed tables across JVMs but their
    // warehouse directories persist — clear both or overwrite fails with
    // LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Write `df` hive-partitioned by `partCol` — scans filtered on
    * `partCol` prune to matching directories (PartitionFilters in the
    * plan), the parquet analog of the reference's byte-range split
    * planning (mapreduce.c:56-93) done at the LAYOUT level.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Z-value (Morton code) of two non-negative integer columns: the low
    * `bits` bits of x and y, bit-interleaved (x at even positions, y at
    * odd). Pure codegen'd bit arithmetic — 2*bits shift/and/or terms,
    * no UDF.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Multi-dimensional data clustering for scan locality: range-partition
    * + sort on the interleaved [[zValue2]] of two filter dimensions, so
    * every output partition (and the parquet files written from it)
    * covers a NARROW range of BOTH dimensions — min/max stats then prune
    * files for predicates on either column, where a single-column sort
    * gives locality on one dimension only. This is the layout-level
    * analog of the reference's byte-range split planning
    * (mapreduce.c:56-93): decide at write time what a task will have to
    * read. Caller writes the result with `.write.parquet(...)`.
    */
  def zOrderLayout(df: DataFrame, xCol: String, yCol: String,
                   bits: Int, numPartitions: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Count the shuffle exchanges in a plan (test/audit helper).
    * ShuffleExchangeExec renders as the bare word "Exchange"; the \b
    * boundaries exclude "BroadcastExchange".
    */
  def exchangeCount(df: DataFrame): Int =
    """\bExchange\b""".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
}
