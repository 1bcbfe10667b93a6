package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.3 #6: the reference's unit-bearing column names — spaces,
  * parens, Δ, °, % — must survive the full round trip (create → transform
  * → parquet → read → backtick select). Column-name parity is part of
  * oracle correctness.
  */
class ColumnNameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unit-bearing names survive parquet round-trip and backtick access") {
    import spark.implicits._
    val names = Seq(
      "Collected charge (V s)", "Δt (s)", "k MAD(Δt) (s)",
      "Temperature (°C)", "Humidity (%RH)", "Bias voltage (V)")
    val df = Seq((1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
      .toDF(names: _*)
      .withColumn("Normalized collected charge",
        col("`Collected charge (V s)`") / col("`Bias voltage (V)`"))
    val out = Files.createTempDirectory("graft_names").resolve("t").toString
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == (names :+ "Normalized collected charge").toSet)
    val r = back.select(col("`Δt (s)`"), col("`k MAD(Δt) (s)`"), col("`Humidity (%RH)`"))
      .collect().head
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0 && r.getDouble(2) == 5.0)
    // selectExpr with backticks (the SQL surface)
    val e = back.selectExpr("`Temperature (°C)` + 1 AS t2").collect().head
    assert(e.getDouble(0) == 5.0)
  }
}
