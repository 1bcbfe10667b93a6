package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** S3 (SQLite/JDBC scan) exercised end-to-end against embedded Derby —
  * the only embeddable JDBC engine on the offline classpath (it ships
  * with Spark for the Hive metastore). Same `spark.read.format("jdbc")`
  * path a SQLite URL would take; only the driver jar differs.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def seedDb(dir: String): String = {
    val url = s"jdbc:derby:$dir/graftdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE waveforms (n_trigger BIGINT NOT NULL, device VARCHAR(16), amplitude DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO waveforms VALUES (?, ?, ?)")
      for (i <- 0 until 100) {
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 2 == 0) "d1" else "d2")
        ins.setDouble(3, i * 0.5)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
    s"jdbc:derby:$dir/graftdb"
  }

  test("loadJdbc reads an embedded DB, plain and partitioned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val url = seedDb(dir)
    val plain = Tables.loadJdbc(spark, url, "waveforms")
    assert(plain.count() == 100)
    assert(plain.columns.map(_.toLowerCase).toSet ==
      Set("n_trigger", "device", "amplitude"))
    // partitioned pull: 4 bounded range scans instead of one serial read
    val part = Tables.loadJdbc(
      spark, url, "waveforms", Some(("n_trigger", 0L, 100L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    val agg = part.groupBy("device").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("d1" -> 50L, "d2" -> 50L))
  }
}
