package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange — the remaining row-oriented format a
  * data-engineering estate hands off (Kafka archives, Hive row tables,
  * schema-registry pipelines).
  *
  * The `spark-avro` datasource module is not resolvable in this
  * zero-egress build (only the core `avro` + `avro-mapred` jars ship
  * with Spark), so this is a direct implementation over the public
  * Avro generic API — and it keeps the properties that matter at
  * 100 TB:
  *
  *  - WRITE: one container file per task, streamed through the Hadoop
  *    FileSystem API (works on HDFS/object stores, not just local),
  *    records appended through `DataFileWriter` with the schema mapped
  *    once from the DataFrame's StructType. No driver involvement, no
  *    collect. Task retries overwrite their own part file (same
  *    partition id -> same name), so replays are idempotent.
  *  - READ: `AvroKeyInputFormat` (avro-mapred) via
  *    `newAPIHadoopFile` — container files are BLOCK-SPLITTABLE at
  *    their sync markers, so read parallelism follows bytes, not file
  *    count, exactly like the parquet scan path. Records are converted
  *    to Rows immediately inside the map (the record reader reuses its
  *    datum object; nothing escapes unconverted).
  *
  * Schema subset: the scalar interchange types (long, int, double,
  * float, boolean, string, binary), nullable as union(null, T).
  * Nested/temporal columns should go through parquet/ORC/JSONL — this
  * is the row-interchange path, not the lake format.
  */
object AvroIO {

  /** Map a flat StructType to the Avro record schema JSON. */
  def avroSchemaJson(schema: StructType, recordName: String = "graft_record"): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"AvroIO supports flat scalar columns only, got $other " +
          "(route nested/temporal columns through parquet/ORC/JSONL)")
    }
    val fields = schema.fields.map { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"avro field name must be an identifier, got '${f.name}'")
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }
    s"""{"type": "record", "name": "$recordName",
       |"fields": [${fields.mkString(", ")}]}""".stripMargin
  }

  /** Write `df` as one Avro container file per partition under `path`
    * (cleared first — overwrite semantics, like the other sinks here).
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schemaJson = avroSchemaJson(df.schema)
    val width = df.schema.length
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = TaskContext.getPartitionId()
        val file = new Path(s"$path/part-${"%05d".format(part)}.avro")
        val conf = new org.apache.hadoop.conf.Configuration()
        val out = file.getFileSystem(conf).create(file, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out) // w.close() closes the stream too
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < width) {
              rec.put(i, row.get(i) match {
                case null => null
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case v => v
              })
              i += 1
            }
            w.append(rec)
          }
        } finally w.close()
      }
    }
  }

  /** Read Avro container files under `path` back into a DataFrame with
    * the given (writer-compatible) schema — splittable, schema-first
    * (no inference pass, same rule as [[FileSources]]).
    */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(avroSchemaJson(schema)))
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
    val n = schema.length
    val conv: Array[Any => Any] = schema.fields.map { f =>
      f.dataType match {
        case StringType => (v: Any) => if (v == null) null else v.toString
        case BinaryType => (v: Any) => v match {
          case null => null
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case a: Array[Byte] => a
          case other => throw new IllegalStateException(s"bad bytes value $other")
        }
        case _ => (v: Any) => v
      }
    }
    val rows = rdd.map { case (k, _) =>
      // convert NOW: the record reader reuses the datum across records
      val rec = k.datum()
      val vals = new Array[Any](n)
      var i = 0
      while (i < n) { vals(i) = conv(i)(rec.get(i)); i += 1 }
      Row.fromSeq(vals.toIndexedSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
