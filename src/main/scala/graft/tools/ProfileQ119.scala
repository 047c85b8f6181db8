package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q119 (SemDeDup) stage breakdown: times the centroid build, the
  * assignment, and the within-cluster pair join separately, and prints
  * the cluster-size distribution — the pair join's true cost is
  * sum(m_c^2), so a skewed k-means (clusters far larger than
  * n/nLists) is quadratically worse than the balanced estimate.
  *
  * History: the sf10 run of this tool (2026-08-13) showed 112 s of
  * 188 s inside the two Lloyd passes and 51 s in the assignment —
  * balanced clusters (max 2732 vs mean 2500), so the cost was the
  * crossJoin+groupBy argmin's n × nLists row volume, not skew. That
  * measurement motivated [[graft.operators.Ann.assignCidUdf]]; this
  * tool now times the replacement path.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf10 sbt "runMain graft.tools.ProfileQ119"
  */
object ProfileQ119 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.engine.Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ann
    import graft.functions.VectorFunctions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val e = graft.engine.Tables.embeddings(spark, d)
    val n = e.count()
    val nLists = graft.QueryShared.semDedupNLists(n)
    println(s"n=$n nLists=$nLists")

    val cents = time("kmeansCentroidsLocal")(
      Ann.kmeansCentroidsLocal(e, "vec_id", "embedding", nLists, 2, 1))
    val assigned = time("assign") {
      val src = e.select(col("vec_id").cast("long").as("vid"),
        col("embedding").as("v"), norm(col("embedding")).as("nrm"))
      val a = src.withColumn("cid",
        Ann.assignCidUdf(src.schema("v").dataType, cents)(col("v")))
        .localCheckpoint(true)
      a.count(); a
    }
    println("cluster sizes (top 10 by m):")
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("m"))
      .orderBy(col("m").desc)
    sizes.show(10, false)
    val stats = sizes.agg(sum(col("m") * col("m")).as("sum_m2"),
      max("m").as("max_m"), count(lit(1)).as("k")).collect()(0)
    println(s"sum(m^2)=${stats.getLong(0)} max_m=${stats.getLong(1)} k=${stats.getLong(2)}")

    time("pair_join") {
      val a = assigned.select(col("cid"), col("vid").as("ia"),
        col("v").as("va"), col("nrm").as("na"))
      val b = assigned.select(col("cid"), col("vid").as("ib"),
        col("v").as("vb"), col("nrm").as("nb"))
      val nprod = col("na") * col("nb")
      val dropped = a.join(b, Seq("cid"))
        .filter(col("ia") > col("ib") &&
          round(when(nprod > 0, dot(col("va"), col("vb")) / nprod)
            .otherwise(lit(0.0)), 4) >= 0.35)
        .select(col("ia").as("vid")).distinct()
      println("dropped=" + dropped.count())
    }
    spark.stop()
  }
}
