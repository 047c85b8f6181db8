ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceimplementationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Let AQE convert a sort-merge join to a shuffled hash join when the
  // build side's LARGEST partition (from real map-output stats) fits the
  // threshold — the runtime version of the static shuffle_hash hints the
  // span/dedup operators used to carry: converts exactly when the
  // non-spillable build is provably bounded, stays spillable sort-merge
  // when it is not (the static hints OOM'd sf10/minLen=15, where 82% of
  // 141M postings were eligible). 16m, not the advisory default 64m: a
  // LongToUnsafeRowMap costs ~2.5x its input bytes (pages + index
  // array), so local[32]'s worst case is 32 concurrent tasks x 16m x
  // ~2.5 = ~1.3 GB — inside an 8 GB heap's execution pool, where a 64m
  // threshold measurably was not (q125 sf10: "Can't acquire 67108864
  // bytes", 59 MB build partitions x 32 tasks). The rule fires only
  // when the threshold >= the advisory partition size; both pinned.
  "-Dspark.sql.adaptive.advisoryPartitionSizeInBytes=16m",
  "-Dspark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=16m",
  // AQE coalescing minPartitionSize stays at its 1m DEFAULT — r15
  // measured both directions: 128k un-starves CPU-dense pair-verify
  // stages at sf0.1 (q121 2.0 → 1.3 s: 4 tasks → 32 on a 4 MB
  // exchange whose pair explosion multiplies CPU per byte), but the
  // SAME floor fragments every iterative loop's small per-round
  // exchanges one decade up (sf1: q184 9.1 → 12.7 s, q84 5.0 → 7.2,
  // q191 17.4 → 21.8 — hundreds of extra 2-3 ms tasks across rounds).
  // A byte knob cannot see CPU density; a value tuned to the sf0.1
  // bench is exactly the local[32]-only win the optimization rules
  // reject, so the default stands and the pair-verify parallelism is
  // left to the posting-family's derived-width repartitions.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
