package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container I/O (SURVEY §2.1 S2/S4) — the reference's
  * inter-stage format (Snappy Avro, JobExtractTransform.java:67-71).
  * This environment ships avro + avro-mapred but not the spark-avro
  * module, so the container files are bridged through the Hadoop
  * input/output formats and converted row-by-row. Supports the scalar,
  * array<string> and map<string,double> types the reference's five
  * schemas use (SURVEY §1.2); schema JSON travels into task closures
  * as a string (Avro Schema objects are heavyweight to serialize).
  */
object AvroIO {

  /** Spark StructType → Avro record schema JSON (nullable-free, as the
    * reference declares its fields).
    */
  def toAvroSchemaJson(schema: StructType, name: String): String = {
    def field(dt: DataType): String = dt match {
      case StringType => "\"string\""
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case ArrayType(StringType, _) => """{"type":"array","items":"string"}"""
      case ArrayType(DoubleType, _) => """{"type":"array","items":"double"}"""
      case MapType(StringType, DoubleType, _) => """{"type":"map","values":"double"}"""
      case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
    val fields = schema.fields
      .map(f => s"""{"name":"${f.name}","type":${field(f.dataType)}}""")
      .mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  private def toRow(rec: GenericRecord, schema: StructType): Row = {
    val vals = schema.fields.map { f =>
      val v = rec.get(f.name)
      (f.dataType, v) match {
        case (_, null) => null
        case (StringType, x) => x.toString
        case (LongType, x: java.lang.Number) => x.longValue()
        case (IntegerType, x: java.lang.Number) => x.intValue()
        case (DoubleType, x: java.lang.Number) => x.doubleValue()
        case (ArrayType(StringType, _), x: java.util.Collection[_]) =>
          x.asScala.map(_.toString).toSeq
        case (ArrayType(DoubleType, _), x: java.util.Collection[_]) =>
          x.asScala.map(_.asInstanceOf[java.lang.Number].doubleValue()).toSeq
        case (MapType(StringType, DoubleType, _), x: java.util.Map[_, _]) =>
          x.asScala.map { case (k, v) =>
            k.toString -> v.asInstanceOf[java.lang.Number].doubleValue()
          }.toMap
        case (dt, x) =>
          throw new IllegalArgumentException(s"unsupported avro value $x for $dt")
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def toRecord(row: Row, avroSchema: Schema): GenericRecord = {
    val rec = new GenericData.Record(avroSchema)
    avroSchema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      // explicit java conversions: with a wildcard element type the
      // CollectionConverters implicits silently resolve to identity
      val v: AnyRef = row.get(i) match {
        case s: scala.collection.Seq[_] =>
          val l = new java.util.ArrayList[AnyRef](s.size)
          s.foreach(e => l.add(e.asInstanceOf[AnyRef]))
          l
        case m: scala.collection.Map[_, _] =>
          val h = new java.util.HashMap[AnyRef, AnyRef]()
          m.foreach { case (k, mv) =>
            h.put(k.asInstanceOf[AnyRef], mv.asInstanceOf[AnyRef])
          }
          h
        case other => other.asInstanceOf[AnyRef]
      }
      rec.put(f.name(), v)
    }
    rec
  }

  /** Read an Avro container file (or part-file glob) into a DataFrame
    * with the given Spark schema.
    */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val sc = spark.sparkContext
    val rdd = sc.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val rows = rdd.map { case (k, _) => toRow(k.datum(), schema) }
    spark.createDataFrame(rows, schema)
  }

  /** Write a DataFrame as a Snappy Avro container (the reference's sink
    * configuration, JobExtractTransform.java:67-68).
    */
  def writeAvro(df: DataFrame, path: String, recordName: String = "record"): Unit = {
    val schemaJson = toAvroSchemaJson(df.schema, recordName)
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    job.getConfiguration.set("mapreduce.output.fileoutputformat.compress", "true")
    job.getConfiguration.set("avro.output.codec", "snappy")
    val out = new org.apache.hadoop.fs.Path(path)
    out.getFileSystem(job.getConfiguration).delete(out, true)
    df.rdd
      // one Schema.Parser per partition, not per row: schema parsing is a
      // fresh Jackson parse + allocation — per-row it is a massive
      // constant-factor tax on a large write. Only the JSON string
      // travels into the closure (Schema itself is heavyweight to
      // serialize).
      .mapPartitions { rows =>
        val avroSchema = new Schema.Parser().parse(schemaJson)
        rows.map(row => (new AvroKey[GenericRecord](toRecord(row, avroSchema)), NullWritable.get()))
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }
}
