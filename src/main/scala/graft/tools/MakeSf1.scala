package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build the PAIR-COUNT-HONEST sf1 corpus (r13 verdict item 1): 10× the
  * sf0.1 tables with the content-shifted discipline everywhere a clone
  * would inflate true-duplicate work quadratically, and consistent key
  * shifts everywhere a join must stay valid.
  *
  *  - `lineitem`/`orders`/`customer`/`supplier`/`part`: keys shift by
  *    copy·10⁸ consistently across fact↔dim so every join resolves
  *    inside its own copy — join fan-outs and group counts grow ×10,
  *    per-group depth stays the sf0.1 shape (the real scale-up mode);
  *    TPC-H scales exactly these five tables linearly.
  *  - `supplier.s_name` gets a per-copy 3-char repeated tag ("aaa",
  *    "bbb", …): within-copy edit distances are untouched (every name
  *    shifts equally) while cross-copy same-position names sit at
  *    distance 3 > the fuzzy-join's k = 2 — so `j_fuzzy_keys`' TRUE
  *    pair count grows exactly ×10 (a bare clone would add ~45
  *    distance-0 cross-pairs per name: quadratic, the wave-48 artifact).
  *  - `documents`: [[ScaleProbe.scaledDocs]] — fixed-width per-token
  *    copy suffix keeps every copy's shingle/char-window space disjoint,
  *    TRUE dup pairs exactly ×10 (the `tools/DedupTenX` discipline).
  *  - `events`: [[ScaleProbe.scaledEvents]] — user/event ids shift, so
  *    windows get 10× partitions at constant depth.
  *  - `embeddings`: [[ScaleProbe.scaledEmbSign]] — per-copy Rademacher
  *    sign flip preserves within-copy cosines exactly and collapses
  *    cross-copy cosines toward zero: near-dup pair counts stay linear.
  *  - `nation`/`region`: fixed dims, copied as-is (TPC-H scales them
  *    sub-linearly: not at all).
  *
  * Run: sbt "runMain graft.tools.MakeSf1 [outDir]"  (default
  * /tmp/graft_sf1; source from SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object MakeSf1 {

  val Copies = 10
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[sf1] $t rows=${spark.read.parquet(s"$out/$t.parquet").count()}")
    }

    def copies(df: DataFrame)(one: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(i => one(df, i)).reduce(_ unionAll _)

    write(copies(read("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * Shift))
        .withColumn("l_partkey", col("l_partkey") + lit(i * Shift))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * Shift))
    }, "lineitem")

    write(copies(read("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * Shift))
        .withColumn("o_custkey", col("o_custkey") + lit(i * Shift))
    }, "orders")

    write(copies(read("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * Shift))
    }, "customer")

    write(copies(read("supplier")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * Shift))
        // distance-3 tag: cross-copy name pairs leave the k=2 fuzzy band
        .withColumn("s_name",
          concat(col("s_name"), lit(('a' + i).toChar.toString * 3)))
    }, "supplier")

    write(copies(read("part")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * Shift))
    }, "part")

    write(read("nation"), "nation")
    write(read("region"), "region")

    write(ScaleProbe.scaledEvents(read("events"), Copies), "events")
    write(ScaleProbe.scaledDocs(read("documents"), Copies), "documents")
    write(ScaleProbe.scaledEmbSign(read("embeddings"), Copies), "embeddings")

    spark.stop()
  }
}
