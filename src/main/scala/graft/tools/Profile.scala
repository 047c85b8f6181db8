package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Throwaway stage profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    documents(spark, d).count()

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = documents(spark, d)
    val docSh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("shs"))
    t("tokens-only") {
      docs.select(tokens(col("text")).as("t")).write.format("noop").mode("overwrite").save()
    }
    t("shingles") { docSh.write.format("noop").mode("overwrite").save() }

    // variant 2: element_at + concat_ws, no slice/array_join
    val k = 3
    def shinglesV2(text: org.apache.spark.sql.Column) = {
      val toks = tokens(text)
      val n = size(toks)
      array_distinct(
        when(n < k, array(array_join(toks, " ")))
          .otherwise(transform(sequence(lit(0), n - k), i =>
            concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
    }
    t("shingles-v2") {
      docs.select(shinglesV2(col("text")).as("shs")).write.format("noop").mode("overwrite").save()
    }

    // variant 3: plain Scala UDF over the token array
    val shingleUdf = udf { (toks: Seq[String]) =>
      if (toks.size < k) Array(toks.mkString(" "))
      else Array.tabulate(toks.size - k + 1)(i => toks.slice(i, i + k).mkString(" ")).distinct
    }
    t("shingles-v3-udf") {
      docs.select(shingleUdf(tokens(col("text"))).as("shs")).write.format("noop").mode("overwrite").save()
    }
    val sh = docSh.select(col("id"), size(col("shs")).cast("long").as("n_sh"),
      explode(col("shs")).as("sh"))
    t("explode") { sh.write.format("noop").mode("overwrite").save() }
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"), max(col("a.n_sh")).as("n_a"), max(col("b.n_sh")).as("n_b"))
    t("join+group") { common.write.format("noop").mode("overwrite").save() }
    t("full-q30") {
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.05).orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    t("full-q31") {
      Dedup.minHashLsh(docs, "doc_id", "text", 3, 4, 4, 0.25).orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    println(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.05)
      .queryExecution.executedPlan.toString.take(4000))
    val sigOnly = Dedup.minHashSignature(docs, "doc_id", "text", 3, 16)
    t("minhash-sig") { sigOnly.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
