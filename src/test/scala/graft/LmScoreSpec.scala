package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("trainCached memoizes per (corpusKey, params) and matches train() scoring") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the lazy dog sleeps while the quick fox runs"),
      (3L, "quick brown foxes and lazy dogs share the yard"))
      .toDF("doc_id", "text")
    val a = LmScore.trainCached(corpus, "doc_id", "text", corpusKey = "lmspec-corpus")
    val b = LmScore.trainCached(corpus, "doc_id", "text", corpusKey = "lmspec-corpus")
    assert(a eq b, "cache returned a different instance — model was retrained")
    // identical scoring to an uncached training run (determinism)
    val fresh = LmScore.train(corpus, "doc_id", "text")
    val sa = LmScore.scoreWith(a, corpus, "doc_id", "text")
      .collect().map(_.toString).sorted
    val sf = LmScore.scoreWith(fresh, corpus, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(sa.sameElements(sf))
    // a different parameter is a different entry
    val other = LmScore.trainCached(corpus, "doc_id", "text",
      corpusKey = "lmspec-corpus", minCount = 3L)
    assert(!(other eq a))
  }

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

  test("adversarial high-entropy corpus: model stays bounded, scoring stays finite") {
    import spark.implicits._
    // a binary/unicode-noise corpus — the documents a perplexity filter
    // exists to catch. Deterministic per-doc pseudo-random chars over a
    // wide alphabet: distinct trigrams grow with corpus size (here tens
    // of thousands), but almost all are singletons, so the capped model
    // must stay near-empty instead of scaling with corpus entropy.
    val alphabet = ((33 to 126) ++ (0x400 to 0x4ff) ++ (0x4e00 to 0x4eff)).map(_.toChar)
    val noise = (0 until 400).map { d =>
      val rng = new scala.util.Random(d)
      (d.toLong, Array.fill(200)(alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val corpus = noise.toDF("doc_id", "text")
    val uncapped = LmScore.charTrigrams(corpus, "doc_id", "text")
      .select("tri").distinct().count()
    val capped = LmScore.trigramModel(corpus, "doc_id", "text", minCount = 2L)
    assert(uncapped > 50000L, s"fixture not adversarial enough: $uncapped distinct trigrams")
    assert(capped.length < uncapped / 50,
      s"model cap failed: ${capped.length} of $uncapped trigrams survived")
    // scoring against the capped model still returns a finite high NLL
    // for every doc (unseen trigrams hit pure smoothing mass)
    val scored = LmScore.score(corpus, corpus, "doc_id", "text")
      .collect().map(r => r.getDouble(2))
    assert(scored.length == 400 && scored.forall(s => !s.isNaN && !s.isInfinite && s > 0))
  }

  test("charTrigrams: positions, lowering, and the sub-3-char guard") {
    import spark.implicits._
    val df = Seq((1L, " AbCd "), (2L, "xy")).toDF("doc_id", "text")
    val tris = LmScore.charTrigrams(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(tris.toSet == Set((1L, "abc"), (1L, "bcd")))
  }
}
