package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PipelineStage
import graft.sources.TextSources

class PipelineSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PipelineStage: materialize once, skip when done, recompute on force") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_stage").resolve("stage1").toString
    val computes = new AtomicInteger(0)
    def stage() = PipelineStage.materialize(spark, out) {
      computes.incrementAndGet()
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    assert(stage().count() == 2)
    assert(computes.get() == 1)
    assert(stage().count() == 2)
    assert(computes.get() == 1) // memoized — skip
    PipelineStage.materialize(spark, out, force = true) {
      computes.incrementAndGet()
      Seq((1, "a")).toDF("id", "v")
    }
    assert(computes.get() == 2)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("PipelineStage.scratchBase: fails fast on a non-local master without a configured dir") {
    // configured dir always wins, regardless of master
    assert(PipelineStage.scratchBase("spark://host:7077", Some("/shared/scratch")) == "/shared/scratch")
    assert(PipelineStage.scratchBase("local[32]", Some("/shared/scratch")) == "/shared/scratch")
    // local masters may fall back to java.io.tmpdir (one shared filesystem)
    assert(PipelineStage.scratchBase("local[32]", None) == sys.props("java.io.tmpdir"))
    assert(PipelineStage.scratchBase("local", None) == sys.props("java.io.tmpdir"))
    // non-local + unset = silent data loss on read-back → must throw
    for (m <- Seq("spark://host:7077", "yarn", "k8s://https://host:6443")) {
      val e = intercept[IllegalArgumentException](PipelineStage.scratchBase(m, None))
      assert(e.getMessage.contains("spark.graft.scratch.dir"))
    }
  }

  test("key=value txt scan (S6)") {
    val f = Files.createTempDirectory("graft_kv").resolve("result.txt")
    Files.writeString(f, "Inter-pixel distance (m) = 9.81e-05\nthreshold = 50\n# comment line\n")
    val got = TextSources.readKeyValueTxt(spark, f.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("Inter-pixel distance (m)" -> "9.81e-05", "threshold" -> "50"))
  }

  test("manifest scan skips the header (S7)") {
    val f = Files.createTempDirectory("graft_mf").resolve("README.txt")
    Files.writeString(f, "This is a list of submeasurements:\nsub_001\nsub_002\n\n")
    val got = TextSources.readManifest(spark, f.toString, "list of submeasurements")
      .collect().map(_.getString(0)).toSeq
    assert(got.sorted == Seq("sub_001", "sub_002"))
  }

  test("xlsx sheet scan (S4): shared strings, inline strings, numbers, gaps") {
    val dir = Files.createTempDirectory("graft_xlsx")
    val path = dir.resolve("devices.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>device_name</t></si><si><t>Manufacturer</t></si>
        |<si><t>thickness_um</t></si><si><t>devA</t></si><si><t>ACME</t></si></sst>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2" t="s"><v>4</v></c><c r="C2"><v>50</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>devB</t></is></c><c r="C3"><v>75.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = TextSources.readXlsx(spark, path)
    assert(df.columns.toSeq == Seq("device_name", "Manufacturer", "thickness_um"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("devA", "ACME", "50"), ("devB", null, "75.5")))
    // the ingest-once path: straight into the engine's dimension-join shape
    val dim = df.select(col("device_name"), col("Manufacturer"))
    assert(dim.filter(col("Manufacturer").isNull).count() == 1)
  }

  test("xlsx sink round-trips through the xlsx scan (S11 → S4)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlsx_rt")
    val path = dir.resolve("summary.xlsx").toString
    val df = Seq(("devA", "50", "ok & <ready>"), ("devB", "75.5", "pending"))
      .toDF("device_name", "thickness_um", "status")
    TextSources.writeXlsx(df, path)
    val back = TextSources.readXlsx(spark, path)
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }

  test("xlsx sink handles frames wider than 26 columns (AA-style refs)") {
    val dir = Files.createTempDirectory("graft_xlsx_wide")
    val path = dir.resolve("wide.xlsx").toString
    val names = (0 until 30).map(i => s"c$i")
    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
    val row = org.apache.spark.sql.Row.fromSeq(names.map(n => s"v_$n"))
    val df = spark.createDataFrame(java.util.Arrays.asList(row), schema)
    TextSources.writeXlsx(df, path)
    val back = TextSources.readXlsx(spark, path)
    assert(back.columns.toSeq == names)
    assert(back.collect().head.toSeq == names.map(n => s"v_$n"))
  }

  test("run.xml metadata scan (S5)") {
    val f = Files.createTempDirectory("graft_xml").resolve("run.xml")
    Files.writeString(f,
      """<run><runId>42</runId><username>lab</username><rating>5</rating>
        |<dataPath>/data/x</dataPath><timestamp>2022-04-05</timestamp></run>""".stripMargin)
    val row = TextSources.readRunXml(spark, f.toString).collect().head
    assert(row.getString(0) == "42" && row.getString(1) == "lab")
    assert(row.getString(3) == "/data/x")
  }

  test("append-accumulate CSV sink (S12)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_append").resolve("boot").toString
    TextSources.appendCsv(Seq((0, 1.0)).toDF("k_bootstrap", "sigma"), dir)
    TextSources.appendCsv(Seq((1, 1.1)).toDF("k_bootstrap", "sigma"), dir)
    val back = TextSources.readCsv(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k_bootstrap", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("sigma", org.apache.spark.sql.types.DoubleType))))
    assert(back.count() == 2)
  }
}
