package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowIpcIngest

class ArrowIpcIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Write a small Feather-v2 (Arrow IPC file) fixture with the Arrow
    * Java API — the same on-disk format `pandas.to_feather` produces for
    * the reference's `.fd` measurement tables.
    */
  private def writeFixture(path: String): Unit = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import scala.jdk.CollectionConverters._

    val allocator = new RootAllocator()
    val schema = new Schema(Seq(
      new Field("n_trigger", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("amplitude", FieldType.nullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null),
      new Field("device", FieldType.nullable(new ArrowType.Utf8()), null),
      new Field("accepted", FieldType.nullable(new ArrowType.Bool()), null)).asJava)
    val root = VectorSchemaRoot.create(schema, allocator)
    val trig = root.getVector("n_trigger").asInstanceOf[BigIntVector]
    val amp = root.getVector("amplitude").asInstanceOf[Float8Vector]
    val dev = root.getVector("device").asInstanceOf[VarCharVector]
    val acc = root.getVector("accepted").asInstanceOf[BitVector]
    val n = 5
    root.setRowCount(n)
    (0 until n).foreach { i =>
      trig.setSafe(i, i.toLong)
      if (i == 3) amp.setNull(i) else amp.setSafe(i, 0.25 * i)
      dev.setSafe(i, s"detector_${i % 2}".getBytes("UTF-8"))
      acc.setSafe(i, if (i % 2 == 0) 1 else 0)
    }
    val out = new java.io.FileOutputStream(path)
    val writer = new ArrowFileWriter(root, null, out.getChannel)
    writer.start(); writer.writeBatch(); writer.end(); writer.close()
    out.close(); root.close(); allocator.close()
  }

  test("a Feather v2 fixture round-trips through ingest into parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fd").toString
    val fd = s"$dir/measured_data.fd"
    writeFixture(fd)

    val df = ArrowIpcIngest.readArrowIpc(spark, fd)
    assert(df.schema.map(f => f.name -> f.dataType.typeName) == Seq(
      "n_trigger" -> "long", "amplitude" -> "double",
      "device" -> "string", "accepted" -> "boolean"))
    val rows = df.orderBy("n_trigger").collect()
    assert(rows.length == 5)
    assert(rows(2).getLong(0) == 2L && rows(2).getDouble(1) == 0.5 &&
      rows(2).getString(2) == "detector_0" && rows(2).getBoolean(3))
    assert(rows(3).isNullAt(1), "arrow null must survive as SQL NULL")

    // the canonical swap: .fd -> parquet, then query as a normal table
    val pq = s"$dir/measured_data.parquet"
    assert(ArrowIpcIngest.toParquet(spark, fd, pq) == 5L)
    val back = spark.read.parquet(pq)
    import org.apache.spark.sql.functions._
    val agg = back.filter(col("accepted"))
      .agg(sum("amplitude").as("s"), count(lit(1)).as("n")).collect()(0)
    assert(agg.getDouble(0) == 0.0 + 0.5 + 1.0 && agg.getLong(1) == 3L)
  }
}
