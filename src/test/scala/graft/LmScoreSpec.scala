package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("junk text scores higher NLL than fluent corpus text; short docs yield no rows") {
    import spark.implicits._
    val fluent = (0 until 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val junk = Seq((100L, "qzx jvq wkx pzq vvq zzj qqq xjz kvz pqw"))
    val tiny = Seq((200L, "ab")) // < 3 chars: no trigrams, no score row
    val corpus = (fluent ++ junk ++ tiny).toDF("doc_id", "text")
    val scored = LmScore.score(corpus, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scored.contains(200L))
    val fluentAvg = fluent.map(f => scored(f._1)).sum / fluent.size
    assert(scored(100L) > fluentAvg * 1.5,
      s"junk=${scored(100L)} fluentAvg=$fluentAvg")
  }

  test("charTrigrams: positions, lowering, and the sub-3-char guard") {
    import spark.implicits._
    val df = Seq((1L, " AbCd "), (2L, "xy")).toDF("doc_id", "text")
    val tris = LmScore.charTrigrams(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(tris.toSet == Set((1L, "abc"), (1L, "bcd")))
  }
}
