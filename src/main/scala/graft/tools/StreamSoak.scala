package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming SOAK: a minutes-long run of the EventStreams tumbling
  * aggregation over a continuously-fed file source, with a restart
  * induced every `SOAK_RESTART_SECONDS` (kill the query mid-flight,
  * start a new one on the same checkpoint) while the feeder keeps
  * writing — the failure pattern a production ingest actually sees.
  * At the end a sentinel event pushes the watermark past every real
  * window, the stream drains, and the sink is compared ROW FOR ROW
  * against the batch twin over everything the feeder wrote: any lost
  * batch (at-most-once bug) or re-emitted window (at-least-once bug)
  * fails the equality. State size is sampled every progress tick and
  * its maximum asserted against the watermark-horizon bound, so
  * sustained state growth — the thing the semantic specs cannot see —
  * is measured, not assumed.
  *
  * Event time is SYNTHETIC (each feeder batch advances one minute), so
  * the run is deterministic in structure regardless of wall-clock
  * scheduling; restarts land wherever they land, which is the point.
  *
  * Prints one JSON line: {"events":N,"windows":W,"restarts":R,
  * "max_state_rows":S,"result":"PASS"|"FAIL"} — the round artifact.
  * Env: SOAK_SECONDS (default 180), SOAK_RESTART_SECONDS (default 20),
  * SOAK_BATCH_EVENTS (default 2000).
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val soakSeconds = sys.env.getOrElse("SOAK_SECONDS", "180").toInt
    val restartSeconds = sys.env.getOrElse("SOAK_RESTART_SECONDS", "20").toInt
    val batchEvents = sys.env.getOrElse("SOAK_BATCH_EVENTS", "2000").toInt

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.streaming.fileSource.log.compactInterval", 10)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = "/tmp/graft-soak"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(root))
    val src = s"$root/src"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

    // feeder: batch i carries `batchEvents` events inside minute i —
    // deterministic event-time, 5 event types, values derived from ids
    @volatile var feeding = true
    @volatile var batches = 0
    def writeBatch(i: Int): Unit = {
      val rows = (0 until batchEvents).map { j =>
        val id = i.toLong * batchEvents + j
        (id, new java.sql.Timestamp(base + i * 60000L + (j % 60) * 1000L),
          id % 100, s"t${id % 5}", (id % 7).toDouble, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val feeder = new Thread(() => {
      var i = 0
      while (feeding) {
        writeBatch(i); i += 1; batches = i
        Thread.sleep(200)
      }
    })
    feeder.setDaemon(true)

    def startQuery() = EventStreams.tumblingCounts(
        EventStreams.readEventStream(spark, src), "10 minutes", "5 minutes")
      .writeStream.outputMode("append").format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt).start()

    var restarts = 0
    var maxStateRows = 0L
    def sampleState(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        maxStateRows = math.max(maxStateRows, p.stateOperators.head.numRowsTotal)
    }

    feeder.start()
    val deadline = System.nanoTime() + soakSeconds * 1000000000L
    while (System.nanoTime() < deadline) {
      val q = startQuery()
      val stop = math.min(deadline,
        System.nanoTime() + restartSeconds * 1000000000L)
      while (System.nanoTime() < stop && q.isActive) {
        Thread.sleep(1000); sampleState(q)
      }
      sampleState(q)
      q.stop() // induced failure: mid-flight, feeder still writing
      restarts += 1
    }
    feeding = false
    feeder.join(5000)

    // sentinel pushes the watermark past every real window, then drain
    val lastMinute = batches // first unused minute index
    Seq((Long.MaxValue, new java.sql.Timestamp(base + (lastMinute + 120) * 60000L),
        0L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(src)
    val qf = startQuery()
    qf.processAllAvailable()
    sampleState(qf)
    qf.stop()

    // batch twin over EVERYTHING written (sentinel's own still-open
    // window excluded): identical grouping expression, exact equality
    val all = spark.read.parquet(src).filter(col("event_type") =!= "sentinel")
    val expect = all
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = spark.read.parquet(sink).filter(col("event_type") =!= "sentinel")
      .select(col("window_start"), col("event_type"), col("n"), col("total_value"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    val events = all.count()
    // state bound: <= (horizon/window + 2 open windows) x 5 types, with
    // headroom for the provider's internal rows — growth would blow
    // far past this within one soak
    val stateBound = 200L
    val pass = got == expect && maxStateRows <= stateBound
    if (!pass) {
      val missing = expect -- got
      val extra = got -- expect
      System.err.println(s"SOAK missing=${missing.take(5)} extra=${extra.take(5)} " +
        s"maxState=$maxStateRows")
    }
    println(s"""{"events":$events,"windows":${expect.size},"restarts":$restarts,""" +
      s""""max_state_rows":$maxStateRows,"result":"${if (pass) "PASS" else "FAIL"}"}""")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
