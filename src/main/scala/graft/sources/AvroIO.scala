package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink built directly on avro-core (the
  * Spark distribution here ships avro/avro-mapred but NOT the
  * spark-avro data source module, so `format("avro")` is unavailable;
  * this fills the interchange gap named in VERDICT r05 #7 with the same
  * public Avro object-container format).
  *
  * Write: one .avro container per partition, written executor-side
  * through the Hadoop FileSystem API (works on any supported
  * filesystem, not just file://). Read: one task per container file —
  * the same per-file parallelism granularity Spark's own avro source
  * uses for many-file layouts; intra-file sync-marker splitting is the
  * scale refinement for few-huge-file layouts and is deliberately not
  * implemented (write-side partitioning already yields many files).
  *
  * Type subset = the warehouse surface: long/int/double/float/string/
  * boolean/binary/timestamp(-micros logical type)/date(-days logical
  * type)/array of the scalar types, all as nullable unions. Anything
  * else fails fast at write time.
  */
object AvroIO {

  /** Spark StructType -> Avro record schema (nullable unions). */
  def avroSchema(st: StructType, name: String = "graft_record"): Schema = {
    def field(dt: DataType): String = dt match {
      case LongType      => "\"long\""
      case IntegerType   => "\"int\""
      case DoubleType    => "\"double\""
      case FloatType     => "\"float\""
      case StringType    => "\"string\""
      case BooleanType   => "\"boolean\""
      case BinaryType    => "\"bytes\""
      case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
      case TimestampNTZType =>
        """{"type":"long","logicalType":"local-timestamp-micros"}"""
      case DateType      => """{"type":"int","logicalType":"date"}"""
      case ArrayType(et, _) => s"""{"type":"array","items":${field(et)}}"""
      case other => throw new IllegalArgumentException(
        s"AvroIO does not map Spark type $other")
    }
    val fields = st.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${field(f.dataType)}],"default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[$fields]}""")
  }

  /** Avro record schema -> Spark StructType (inverse of [[avroSchema]]). */
  def sparkSchema(s: Schema): StructType = {
    def dt(t: Schema): DataType = t.getType match {
      case Schema.Type.UNION =>
        dt(t.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
      case Schema.Type.LONG => logical(t) match {
        case "timestamp-micros"       => TimestampType
        case "local-timestamp-micros" => TimestampNTZType
        case _                        => LongType
      }
      case Schema.Type.INT =>
        if (logical(t) == "date") DateType else IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.STRING  => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES   => BinaryType
      case Schema.Type.ARRAY   => ArrayType(dt(t.getElementType))
      case other => throw new IllegalArgumentException(
        s"AvroIO does not map Avro type $other")
    }
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), dt(f.schema()), nullable = true)))
  }

  private def logical(t: Schema): String =
    Option(t.getLogicalType).map(_.getName).getOrElse(
      Option(t.getProp("logicalType")).getOrElse(""))

  /** df -> `dir/part-NNNNN.avro`, one container per partition.
    *
    * Task commit: each attempt writes its own
    * `.part-NNNNN-attempt-K.avro.tmp` and renames into place only after
    * a successful close, so a retried or speculative attempt can never
    * tear a live reader's file; failed attempts delete their temp. The
    * per-attempt name makes concurrent attempts write disjoint paths;
    * the final delete+rename is last-committer-wins (filesystem rename
    * atomicity), which is safe because every committed attempt carries
    * identical partition contents.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString // Schema is not serializable
    // carry the SESSION Hadoop conf to executors (credentials,
    // defaultFS, ...) instead of a fresh Configuration() that forgets it
    val hconf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    val fs = out.getFileSystem(hconf.value)
    fs.delete(out, true); fs.mkdirs(out)
    val written = df.rdd.mapPartitionsWithIndex { (i, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
      val taskFs = new Path(dir).getFileSystem(hconf.value)
      val finalPath = new Path(dir, f"part-$i%05d.avro")
      val tmpPath = new Path(dir, f".part-$i%05d-attempt-$attempt%d.avro.tmp")
      val os = taskFs.create(tmpPath, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, os)
      var n = 0L
      var ok = false
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          st.fields.zipWithIndex.foreach { case (f, j) =>
            rec.put(f.name, toAvro(row.get(j), f.dataType))
          }
          w.append(rec); n += 1
        }
        ok = true
      } finally {
        w.close() // closes os
        if (ok) {
          taskFs.delete(finalPath, false)
          if (!taskFs.rename(tmpPath, finalPath))
            throw new java.io.IOException(s"commit rename failed: $tmpPath -> $finalPath")
        } else taskFs.delete(tmpPath, false)
      }
      Iterator.single(n)
    }.sum()
    require(written >= 0) // forces the job
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
    case (ldt: java.time.LocalDateTime, TimestampNTZType) =>
      java.lang.Long.valueOf(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
    case (d: java.sql.Date, DateType) =>
      java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      seq.map(x => toAvro(x, et)).asJava
    case (other, _) => other.asInstanceOf[AnyRef]
  }

  /** `dir` of .avro containers -> DataFrame (schema from the first file,
    * one task per file).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val first = {
      val in = fs.open(new Path(files.head))
      val ds = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try ds.getSchema finally ds.close()
    }
    val st = sparkSchema(first)
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext.parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val p = new Path(f)
        val in = p.getFileSystem(hconf.value).open(p)
        val ds = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        // DataFileStream is an eager-close iterator source: drain inside
        // the task (file row counts are partition-sized by construction)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          while (ds.hasNext) {
            val rec = ds.next()
            buf += Row.fromSeq(st.fields.toSeq.map(fld =>
              fromAvro(rec.get(fld.name), fld.dataType)))
          }
        } finally ds.close()
        buf
      }
    spark.createDataFrame(rows, st)
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt); ts
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.toSeq.map(x => fromAvro(x, et))
    case (other, _) => other
  }
}
