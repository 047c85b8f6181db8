package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up outside the timed loop: session/codegen/scan init otherwise
    // lands entirely on whichever query happens to run first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()
    graft.engine.Tables.all(spark, sfDir).foreach { case (_, df) => df.count() }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // noop sink materializes every output column; count() would let
      // Catalyst prune projection-only queries down to a row count.
      // Best of 3 runs: the first pays one-shot codegen + JIT (measured
      // ~2-5s on plans with distinct-agg/join codegen) and a second run
      // can still catch JIT/GC tails — r03 recorded q31 at 3.6s when its
      // steady state is 1.2s because BOTH of 2 runs were cold/noisy.
      // A failure is RECORDED, never swallowed: a query that throws
      // instantly would otherwise report a fast fake time and a
      // regression could masquerade as a speedup.
      var err: Option[String] = None
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":" + Verify.jsonString(e)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Reference-parity throughput, recorded so the speed claim is
    // regression-guarded (VERDICT r02 #6): letter counter + word finder
    // MB/s on a warpeace-derived ~133 MB corpus (large enough to
    // amortize startup; the reference's same-job ceiling is ~95 MB/s,
    // BASELINE.md). Failure degrades to an empty object, never kills
    // the query bench.
    val thr = try {
      val corpus = throughputCorpus()
      val bytes = new java.io.File(corpus).length().toDouble
      def best(f: => Unit): Double =
        (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val lc = best {
        assert(graft.operators.TextJobs.letterCountFile(spark, corpus, 64)
          .collect().length == 26)
      }
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${4 << 20}")
      val wf = best {
        graft.operators.TextJobs.wordFind(spark.read.text(corpus), "value", "the").count()
      }
      f"""{"letter_count":${bytes / lc / 1e6}%.0f,"word_find":${bytes / wf / 1e6}%.0f,"corpus_mb":${bytes / 1e6}%.0f}"""
    } catch { case e: Throwable =>
      s"""{"err":${Verify.jsonString(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")}}"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"throughput_mb_s":$thr,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }

  /** ~133 MB deterministic text corpus: the reference's own
    * input-warpeace.txt (4.4 MB, extracted from the read-only zip)
    * replicated 30x. Cached across runs by exact size.
    */
  private def throughputCorpus(): String = {
    val warpeace = new java.io.File("/tmp/graft-bench-warpeace.txt")
    if (!warpeace.exists() || warpeace.length() != 4434670L) {
      val zf = new java.util.zip.ZipFile("/root/reference/proj_2_base.zip")
      try {
        val in = zf.getInputStream(zf.getEntry("proj_2_base/input-warpeace.txt"))
        java.nio.file.Files.copy(in, warpeace.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        in.close()
      } finally zf.close()
    }
    val big = new java.io.File("/tmp/graft-bench-corpus.txt")
    val copies = 30
    if (!big.exists() || big.length() != warpeace.length() * copies) {
      val out = new java.io.FileOutputStream(big)
      try {
        val bytes = java.nio.file.Files.readAllBytes(warpeace.toPath)
        (1 to copies).foreach(_ => out.write(bytes))
      } finally out.close()
    }
    big.getPath
  }
}
