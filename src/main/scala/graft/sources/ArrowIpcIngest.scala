package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.Paths

import scala.collection.mutable.ArrayBuffer

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow-IPC (Feather v2) ingest — the reference's canonical event-table
  * format: its measurement directories hold `data.fd` / `measured_data.fd`
  * files written by `pandas.to_feather`
  * (reference `scripts/measurements.py:55-87`), and SURVEY declares
  * Feather→Parquet the canonical swap. This is the one-shot converter
  * that performs that swap: read the IPC file through the Arrow Java
  * reader (already on the Spark classpath), materialize Spark rows,
  * write Parquet — after which every engine query runs on the parquet
  * table as usual.
  *
  * Scope: a DRIVER-SIDE ingest utility for the reference's per-
  * measurement files (thousands of rows each), not a distributed scan —
  * convert many files by running it per file in parallel; each file is
  * independent. Covered types are the ones pandas emits for the
  * reference's tables (ints, floats, strings, bools, timestamps, dates,
  * binary); anything else fails with a clear message rather than
  * guessing.
  */
object ArrowIpcIngest {

  private def sparkType(f: Field): DataType = f.getType match {
    case t: ArrowType.Int => t.getBitWidth match {
      case 64 => LongType
      case 32 => IntegerType
      case 16 => ShortType
      case 8 => ByteType
      case w => throw new IllegalArgumentException(s"unsupported int width $w for ${f.getName}")
    }
    case t: ArrowType.FloatingPoint => t.getPrecision match {
      case FloatingPointPrecision.DOUBLE => DoubleType
      case FloatingPointPrecision.SINGLE => FloatType
      case p => throw new IllegalArgumentException(s"unsupported float precision $p for ${f.getName}")
    }
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Date => DateType
    case t => throw new IllegalArgumentException(
      s"unsupported arrow type $t for column ${f.getName} — extend ArrowIpcIngest.sparkType")
  }

  private def toSpark(v: AnyRef): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case dt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(dt)
    case d: java.time.LocalDate => java.sql.Date.valueOf(d)
    case other => other
  }

  /** Read one Arrow-IPC (Feather v2) file into a DataFrame. */
  def readArrowIpc(spark: SparkSession, path: String): DataFrame = {
    val allocator = new RootAllocator()
    try {
      val channel = FileChannel.open(Paths.get(path))
      val reader = new ArrowFileReader(channel, allocator)
      try {
        val root = reader.getVectorSchemaRoot
        val fields = root.getSchema.getFields
        val schema = StructType(
          (0 until fields.size).map { i =>
            val f = fields.get(i)
            StructField(f.getName, sparkType(f), nullable = true)
          })
        val rows = ArrayBuffer.empty[Row]
        while (reader.loadNextBatch()) {
          val n = root.getRowCount
          var i = 0
          while (i < n) {
            val vals = new Array[Any](fields.size)
            var c = 0
            while (c < fields.size) {
              val vec = root.getVector(c)
              vals(c) = if (vec.isNull(i)) null else toSpark(vec.getObject(i))
              c += 1
            }
            rows += Row.fromSeq(vals.toIndexedSeq)
            i += 1
          }
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq), schema)
      } finally reader.close() // closes the channel too
    } finally allocator.close()
  }

  /** The canonical swap: Feather v2 in, a parquet table out. Returns the
    * row count written.
    */
  def toParquet(spark: SparkSession, src: String, dest: String): Long = {
    val df = readArrowIpc(spark, src)
    df.write.mode("overwrite").parquet(dest)
    df.count()
  }
}
