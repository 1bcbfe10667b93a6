package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** In the operators package deliberately: [[TrainCache]] is
  * private[operators], and its key/bound contract is what keeps the three
  * trainCached sites honest.
  */
class TrainCacheSpec extends AnyFunSuite {

  test("memo returns the same instance for an equal key and distinct instances across kinds") {
    val a = TrainCache.memo("spec-kind-a", Seq("corpus", "id", "vec", 4))(new Object)
    val b = TrainCache.memo("spec-kind-a", Seq("corpus", "id", "vec", 4))(new Object)
    assert(a eq b)
    // the operator kind partitions the key space: same params, other kind
    val c = TrainCache.memo("spec-kind-b", Seq("corpus", "id", "vec", 4))(new Object)
    assert(!(c eq a))
    // any single differing parameter is a distinct entry
    val d = TrainCache.memo("spec-kind-a", Seq("corpus", "id", "vec2", 4))(new Object)
    assert(!(d eq a))
  }

  test("the cache is bounded: past MaxEntries it clears instead of growing without release") {
    val first = TrainCache.memo("spec-bound", Seq(-1))(new Object)
    // flood past the bound with distinct keys
    (0 to TrainCache.MaxEntries + 1).foreach(i => TrainCache.memo("spec-bound", Seq(i))(new Object))
    // the original entry was evicted by the wholesale clear — a fresh
    // instance comes back (train-once degrades to retrain, never OOM)
    val again = TrainCache.memo("spec-bound", Seq(-1))(new Object)
    assert(!(again eq first))
  }
}
