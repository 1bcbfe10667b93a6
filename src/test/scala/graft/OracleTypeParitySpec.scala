package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** The oracle TYPE-PARITY gate — kills the r9 red-row class at commit
  * time. The driver's hash compare canonicalizes values but is
  * type-sensitive: a DuckDB output column left to widen (integer `SUM()`
  * → HUGEINT/int128) hashes differently from the Spark BIGINT even when
  * every value is equal — r9's only 4 red rows were exactly the 4
  * oracles (of 274) with an uncast sum-derived output. This spec runs
  * `DESCRIBE` on EVERY registered oracle in DuckDB against the real
  * testdata views (tools/oracle_typecheck.py) and fails on any output
  * column outside the proven-portable whitelist (BIGINT/INTEGER/DOUBLE/
  * VARCHAR/BOOLEAN/TIMESTAMP/DATE).
  *
  * Environment contract: DESCRIBE only (no query execution — the gate
  * covers all ~274 oracles in seconds), the builder's python3+duckdb.
  * Where that environment is absent the test CANCELS (does not pass
  * silently green) — the gate is then the driver round itself.
  */
class OracleTypeParitySpec extends AnyFunSuite {

  test("every registered oracle's DuckDB output schema is type-portable") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL",
      "/root/testdata/sf0.001")
    val tool = Paths.get("tools/oracle_typecheck.py")
    assume(Files.exists(Paths.get(sfDir)), s"testdata $sfDir absent")
    assume(Files.exists(tool), "typecheck tool absent")
    val pythonOk =
      try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
      catch { case _: Throwable => false }
    assume(pythonOk, "python3+duckdb unavailable — gate runs driver-side")

    // exactly the bytes Verify hands the driver
    val f = Files.createTempFile("oracle_sql", ".json")
    try {
      Files.writeString(f, Verify.oracleJson)
      val out = new StringBuilder
      val code = Process(Seq("python3", tool.toString, f.toString, sfDir))
        .!(ProcessLogger(l => out.append(l).append('\n')))
      assert(code == 0, s"type-parity gate failed:\n$out")
      // the gate must actually have seen the registry, not an empty map
      assert(out.toString.contains("0 type-unportable"), out.toString)
    } finally Files.deleteIfExists(f)
  }

  test("gate goes red on a planted float-floor day key (the e6 class)") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL",
      "/root/testdata/sf0.001")
    val tool = Paths.get("tools/oracle_typecheck.py")
    assume(Files.exists(Paths.get(sfDir)), s"testdata $sfDir absent")
    assume(Files.exists(tool), "typecheck tool absent")
    val pythonOk =
      try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
      catch { case _: Throwable => false }
    assume(pythonOk, "python3+duckdb unavailable — gate runs driver-side")

    // type-portable output (BIGINT), so ONLY the day-key scan can flag it
    val planted = """{"planted_daykey": "SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d FROM events GROUP BY 1"}"""
    val f = Files.createTempFile("oracle_planted", ".json")
    try {
      Files.writeString(f, planted)
      val out = new StringBuilder
      val code = Process(Seq("python3", tool.toString, f.toString, sfDir))
        .!(ProcessLogger(l => out.append(l).append('\n')))
      assert(code != 0, "gate stayed green on a planted FLOOR(epoch/86400) day key:\n" + out)
      assert(out.toString.contains("planted_daykey"), out.toString)
      assert(out.toString.toLowerCase.contains("day key"), out.toString)
    } finally Files.deleteIfExists(f)
  }
}
