package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Scratch stage profiler for exactSubstringSpans (q125). */
object ProfileQ125 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    documents(spark, d).count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name min=${times.min}%.3f runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    val L = 40
    val docs = documents(spark, d)
    if (sys.env.contains("SPARK_GRAFT_Q125_ONLY")) {
      t("full-q125")(noop(graft.SparkEntry.queries("q125_substring_spans")(spark, d)))
      spark.stop(); return
    }
    val v3Only = sys.env.contains("SPARK_GRAFT_Q125_V3")
    // v1: explode positions, substring after (s carried into every row)
    val gramsV1 = docs
      .select(col("doc_id").cast("long").as("id"), col("text").as("s"))
      .select(col("id"), col("s"),
        explode(expr(s"filter(sequence(1, greatest(length(s) - ${L - 1}, 1)), " +
          s"p -> p <= length(s) - ${L - 1})")).as("pos"))
      .select(col("id"), col("pos").cast("long").as("pos"),
        expr(s"substring(s, pos, $L)").as("g"))
    // v2: build (pos, gram) structs inside one expression, then explode
    val gramsV2 = docs
      .select(col("doc_id").cast("long").as("id"), col("text").as("s"))
      .select(col("id"), explode(expr(
        s"transform(filter(sequence(1, greatest(length(s) - ${L - 1}, 1)), " +
          s"p -> p <= length(s) - ${L - 1}), " +
          s"p -> struct(CAST(p AS BIGINT) AS pos, substring(s, p, $L) AS g))")).as("pg"))
      .select(col("id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    if (!v3Only) {
      t("grams-v1")(noop(gramsV1))
      t("grams-v2")(noop(gramsV2))
      t("grams-v1-count")(gramsV1.groupBy().count().collect(): Unit)
    }
    def eligible(g: org.apache.spark.sql.DataFrame) =
      g.groupBy("g").agg(count(lit(1)).as("__f"))
        .filter(col("__f").between(2, 1000)).select("g")
    if (!v3Only) t("eligible-v2")(noop(eligible(gramsV2)))
    def joinForm(g: org.apache.spark.sql.DataFrame) = {
      val keyed = g.join(eligible(g), "g")
      keyed.select(col("g"), col("id").as("id_a"), col("pos").as("pos_a"))
        .join(keyed.select(col("g"), col("id").as("id_b"), col("pos").as("pos_b")), "g")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "pos_a", "id_b", "pos_b")
    }
    if (!v3Only) {
      t("anchors-join-v1")(noop(joinForm(gramsV1)))
      t("anchors-join-v2")(noop(joinForm(gramsV2)))
    }
    // hash the gram down to a 64-bit key before the join (collision
    // probability ~n^2/2^64; exact verify possible downstream)
    def joinFormHashed(g: org.apache.spark.sql.DataFrame) = {
      val h = g.select(xxhash64(col("g")).as("g"), col("id"), col("pos"))
      joinForm(h)
    }
    if (!v3Only) t("anchors-join-v2-hashed")(noop(joinFormHashed(gramsV2)))
    // v3: single JVM loop UDF emitting (pos, gram) pairs
    val gramUdf = udf { s: String =>
      if (s == null || s.length < L) Array.empty[(Long, String)]
      else Array.tabulate(s.length - L + 1)(i => ((i + 1).toLong, s.substring(i, i + L)))
    }
    val gramsV3 = docs
      .select(col("doc_id").cast("long").as("id"),
        explode(gramUdf(col("text"))).as("pg"))
      .select(col("id"), col("pg._1").as("pos"), col("pg._2").as("g"))
    t("grams-v3-udf")(noop(gramsV3))
    t("grams-v3-count")(gramsV3.groupBy().count().collect(): Unit)
    t("eligible-v3")(noop(eligible(gramsV3)))
    t("anchors-join-v3")(noop(joinForm(gramsV3)))
    t("anchors-join-v3-count")(joinForm(gramsV3).groupBy().count().collect(): Unit)
    t("anchors-join-v3-hashed")(noop(joinFormHashed(gramsV3)))
    def joinFormSHJ(g: org.apache.spark.sql.DataFrame) = {
      val keyed = g.join(eligible(g).hint("shuffle_hash"), "g")
      keyed.select(col("g"), col("id").as("id_a"), col("pos").as("pos_a"))
        .join(keyed.select(col("g"), col("id").as("id_b"), col("pos").as("pos_b"))
          .hint("shuffle_hash"), "g")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "pos_a", "id_b", "pos_b")
    }
    t("anchors-join-v3-shj")(noop(joinFormSHJ(gramsV3)))
    t("anchors-join-v3-shj-hashed")(noop(joinFormSHJ(
      gramsV3.select(xxhash64(col("g")).as("g"), col("id"), col("pos")))))
    t("anchors-join-v3-shj-prepart")(noop(joinFormSHJ(
      gramsV3.repartition(col("g")))))
    def postingForm(g: org.apache.spark.sql.DataFrame) = {
      val posting = g.groupBy("g")
        .agg(sort_array(collect_list(struct(col("id"), col("pos")))).as("lst"))
        .filter(size(col("lst")).between(2, 1000))
      posting
        .select(posexplode(col("lst")).as(Seq("i", "a")), col("lst"))
        .select(col("a"), explode(slice(col("lst"), col("i") + lit(2), size(col("lst")))).as("b"))
        .filter(col("a.id") =!= col("b.id"))
        .select(col("a.id").as("id_a"), col("a.pos").as("pos_a"),
          col("b.id").as("id_b"), col("b.pos").as("pos_b"))
    }
    t("anchors-posting-v3")(noop(postingForm(gramsV3)))
    def spans(anchors: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
      anchors.withColumn("diag", col("pos_a") - col("pos_b"))
        .withColumn("isl", col("pos_a") - row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "isl")
        .agg(min("pos_a").as("start_a"), min("pos_b").as("start_b"),
          (count(lit(1)) + lit(L - 1)).as("span_len"))
        .select("id_a", "id_b", "start_a", "start_b", "span_len")
    }
    t("spans-join-v3")(noop(spans(joinForm(gramsV3))))
    t("spans-posting-v3")(noop(spans(postingForm(gramsV3))))
    t("full-q125")(noop(graft.SparkEntry.queries("q125_substring_spans")(spark, d)))
    spark.stop()
  }
}
