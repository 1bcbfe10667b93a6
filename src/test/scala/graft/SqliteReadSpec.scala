package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SqliteRead

/** Drives the hand-rolled SQLite pager against a real sqlite3-written
  * fixture (3001-row table spanning interior B-tree pages, one 9000-char
  * text forcing an overflow-page chain, NULLs, a second table).
  */
class SqliteReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fixture =
    getClass.getResource("/fixtures/measured_data.sqlite").getPath

  test("enumerates tables") {
    assert(SqliteRead.tables(fixture).toSet == Set("measured_data", "iv_curve"))
  }

  test("reads a multi-page table with overflow payloads and NULLs") {
    val df = SqliteRead.readTable(spark, fixture, "measured_data")
    assert(df.columns.toSeq == Seq(
      "n_trigger", "device_name", "Amplitude (V)", "t_50 (s)", "notes"))
    assert(df.schema("n_trigger").dataType.typeName == "long")
    assert(df.schema("Amplitude (V)").dataType.typeName == "double")
    assert(df.count() == 3001)
    // NULL pattern: every 7th row's notes is NULL
    assert(df.filter(col("notes").isNull).count() == math.ceil(3000.0 / 7).toLong)
    // the overflow row survives the page chain intact
    val ov = df.filter(col("n_trigger") === 999999L).collect()
    assert(ov.length == 1)
    assert(ov(0).getString(1) == "detector_overflow")
    assert(ov(0).getString(4) == "x" * 9000)
    // spot-check an ordinary row's full contents
    val r0 = df.filter(col("n_trigger") === 0L).collect()(0)
    assert(r0.getString(1) == "detector_0" && r0.isNullAt(4))
    assert(r0.getDouble(2) <= 0.0 && r0.getDouble(3) >= 0.0)
  }

  test("affinity parsing: a short name that substring-matches an earlier column") {
    // column "a" appears inside "category" earlier in the CREATE TABLE
    // body; the affinity must come from "a"'s own declaration, not from
    // wherever the letter first occurs in the body
    val sql = """CREATE TABLE "t" ("category" TEXT, "a" INTEGER, "b (V)" REAL)"""
    assert(graft.sources.SqliteRead.columnsOf(sql) == Seq("category", "a", "b (V)"))
    assert(graft.sources.SqliteRead.affinitiesOf(sql).map(_.typeName) ==
      Seq("string", "long", "double"))
  }

  test("sqlite table lands as parquet and joins into the engine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite").toString
    val dest = s"$dir/iv_curve.parquet"
    assert(SqliteRead.toParquet(spark, fixture, "iv_curve", dest) == 50L)
    val iv = spark.read.parquet(dest)
    val agg = iv.agg(
      sum(col("Bias current (A)")).as("i_sum"),
      max(col("Bias voltage (V)")).as("v_max")).collect()(0)
    assert(agg.getDouble(1) == 49.0)
    assert(math.abs(agg.getDouble(0) - (0 until 50).map(v => 1e-9 * v * v).sum) < 1e-18)
  }
}
