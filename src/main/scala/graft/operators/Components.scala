package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the step between
  * pairwise dedup (minhash/simhash/Jaccard emit PAIRS) and the thing a
  * corpus pipeline actually needs: ONE canonical representative per
  * duplicate CLUSTER (pairs are transitive in practice: A≈B, B≈C ⇒ keep
  * one of {A,B,C}).
  *
  * Algorithm: min-label propagation — every node starts as its own
  * label; each round a node takes the min of its own and its neighbors'
  * labels. Converges in O(graph diameter) rounds; near-dup graphs are
  * unions of near-cliques (diameter 2–4), so a handful of rounds
  * suffices. Each round is one shuffle join (edges × labels) plus one
  * min-aggregate — no driver-side graph state, arbitrarily wide corpora.
  * (For adversarially deep graphs — million-hop chains — the
  * large-star/small-star rewiring of Kiveris et al. gets O(log n)
  * rounds; dup graphs never look like that, so propagation is the
  * right default tier.)
  */
object Components {

  /** Fixed-round propagation as a PURE LAZY plan: `iters` unrolled
    * join+agg stages, no caches, no driver loop — correct whenever
    * `iters` ≥ the dup-graph diameter (document clusters: single
    * digits). Output: (id, component) for every node in `nodes`, where
    * component = min node id reachable through `pairs` (singletons map
    * to themselves).
    */
  /** Symmetric closure of the pair list PLUS a self-loop per node — the
    * self-loops make one propagation round a SINGLE join+agg over
    * `labels` (min over neighbors-including-self). Referencing `labels`
    * once per round keeps the unrolled lazy plan LINEAR in the round
    * count; the naive union(labels, neighbor-mins) form references it
    * twice and the plan tree doubles per round.
    */
  private def symEdges(
      nodes: DataFrame, pairs: DataFrame, id: String, a: String, b: String): DataFrame =
    pairs.select(col(a).as("__src"), col(b).as("__dst"))
      .unionByName(pairs.select(col(b).as("__src"), col(a).as("__dst")))
      .unionByName(nodes.select(col(id).as("__src"), col(id).as("__dst")))
      .distinct()

  private def round(edges: DataFrame, labels: DataFrame, id: String): DataFrame =
    edges
      .join(labels, edges("__dst") === labels(id))
      .groupBy(col("__src").as(id))
      .agg(min("component").as("component"))

  def labelPropagationFixed(
      nodes: DataFrame,
      pairs: DataFrame,
      id: String,
      a: String,
      b: String,
      iters: Int): DataFrame = {
    val edges = symEdges(nodes, pairs, id, a, b)
    var labels = nodes.select(col(id)).distinct()
      .withColumn("component", col(id))
    (1 to iters).foreach(_ => labels = round(edges, labels, id))
    labels
  }

  /** Convergence-checked tier: iterate EAGERLY with per-round persisted
    * labels until the assignment is stationary — labels only decrease
    * under min-propagation, so the per-round label sum is one scalar
    * that detects the fixed point — then return the UNROLLED k-round
    * lazy plan. Every cached frame is unpersisted before return (repo
    * cache contract) and the returned plan recomputes deterministically
    * from source. Numeric ids required; the sum is taken in
    * decimal(38,0) so any 64-bit id space is overflow-safe.
    */
  def labelPropagation(
      nodes: DataFrame,
      pairs: DataFrame,
      id: String,
      a: String,
      b: String,
      maxIters: Int = 20): DataFrame = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = symEdges(nodes, pairs, id, a, b)
    def labelSum(df: DataFrame): BigDecimal =
      BigDecimal(df.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0))
    val needed = Caching.withCachedLevel(level, edges) {
      var cur = nodes.select(col(id)).distinct()
        .withColumn("component", col(id)).persist(level)
      var curSum = labelSum(cur)
      var k = 0
      var converged = false
      try {
        while (k < maxIters && !converged) {
          val next = round(edges, cur, id).persist(level)
          val nextSum = labelSum(next)
          if (nextSum == curSum) { next.unpersist(blocking = false); converged = true }
          else { cur.unpersist(blocking = false); cur = next; curSum = nextSum; k += 1 }
        }
      } finally cur.unpersist(blocking = false)
      k
    }
    labelPropagationFixed(nodes, pairs, id, a, b, math.max(needed, 1))
  }
}
