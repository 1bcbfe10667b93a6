package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Sequence packing ([[graft.operators.Packing]]): the concat-and-cut
  * oracle tier is hash-checked by the driver (`pack_sequences`); these
  * cases pin what the SQL replay can't see — the greedy tier's
  * sequential-fill invariants and its independence from the upstream
  * partitioning.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private val L = 512

  test("greedyPack: capacity, oversize-singleton, coverage") {
    val p = Packing.greedyPack(docs, "doc_id", "text", seqLen = L, nShards = 8, seed = 11)
      .cache()
    // every doc exactly once
    val nDocs = docs.count()
    assert(p.count() == nDocs)
    assert(p.select("doc_id").distinct().count() == nDocs)
    // multi-doc sequences never exceed L; oversize docs sit alone
    val bad = p.groupBy("shard", "seq_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"),
        max(col("oversize").cast("int")).as("ov"))
      .filter((col("n") > 1 && col("fill") > L) || (col("ov") === 1 && col("n") > 1))
      .count()
    assert(bad == 0L)
    // seq ids are contiguous from 0 within each shard
    val gaps = p.groupBy("shard")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        countDistinct("seq_id").as("n"))
      .filter(col("lo") =!= 0L || col("n") =!= col("hi") + 1)
      .count()
    assert(gaps == 0L)
    p.unpersist()
  }

  test("greedyPack: greedy means no earlier sequence could have held the doc") {
    // within a shard, in doc order, a doc opens a new sequence ONLY if
    // the previous sequence's fill + this doc overflows L
    val p = Packing.greedyPack(docs, "doc_id", "text", seqLen = L, nShards = 8, seed = 11)
    val rows = p.orderBy("shard", "seq_id", "seq_pos")
      .select("shard", "n_tokens", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var fill = 0L; var prev = (-1L, -1L)
    rows.foreach { case (sh, n, seq) =>
      if ((sh, seq) != prev) {
        if (sh == prev._1) assert(fill + n > L, s"doc of $n tokens opened seq $seq with ${L - fill} left")
        prev = (sh, seq); fill = 0L
      }
      fill += n
    }
  }

  test("greedyPack is invariant to the upstream partitioning") {
    val a = Packing.greedyPack(docs, "doc_id", "text", L, 8, 11)
      .collect().map(_.toSeq).toSet
    val b = Packing.greedyPack(docs.repartition(13), "doc_id", "text", L, 8, 11)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("concatCut and greedyPack share the shard/order/token kernel") {
    val c = Packing.concatCut(docs, "doc_id", "text", L, 8, 11)
      .select(col("doc_id"), col("shard").as("cs"), col("n_tokens").as("cn"))
    val g = Packing.greedyPack(docs, "doc_id", "text", L, 8, 11)
    val mism = g.join(c, "doc_id")
      .filter(col("shard") =!= col("cs") || col("n_tokens") =!= col("cn"))
      .count()
    assert(mism == 0L)
  }

  test("concatCut: offsets and spans are arithmetic-consistent") {
    val bad = Packing.concatCut(docs, "doc_id", "text", L, 8, 11)
      .filter(
        col("seq_offset") < 0 || col("seq_offset") >= L ||
          col("seq_last") < col("seq_first") ||
          col("seq_last") - col("seq_first")
            =!= expr(s"(seq_offset + n_tokens - 1) div ${L}L"))
      .count()
    assert(bad == 0L)
  }
}
