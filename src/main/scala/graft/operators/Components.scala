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
  * For graphs whose diameter is unknown or adversarial (million-hop
  * chains from overlapping chunking), [[alternatingStar]] — the
  * large-star/small-star rewiring of Kiveris et al. — converges in
  * O(log n) rounds on ANY shape and is the registered default
  * (`dedup_components`, `dedup_components_chain`); the propagation tiers
  * remain for known-shallow near-clique dup graphs where a 2-4-round
  * unrolled lazy plan beats the eager round-trip loop.
  */
object Components {

  /** Symmetric closure of the pair list — the ONLY place the (potentially
    * expensive) pair derivation is referenced, and it ends in a distinct
    * exchange, so every downstream consumer (pair-node set, self-loops,
    * propagation rounds, singleton anti-join) re-reads that one shuffle
    * output via ReuseExchange instead of recomputing the pair plan.
    */
  private def symPairs(pairs: DataFrame, a: String, b: String): DataFrame =
    // pair emitters produce unique strictly-oriented (a < b) pairs, so the
    // two orientations are disjoint and the union needs no distinct — the
    // pair plan's own final exchange is the reuse point
    pairs.select(col(a).as("__src"), col(b).as("__dst"))
      .unionByName(pairs.select(col(b).as("__src"), col(a).as("__dst")))

  /** Nodes that appear in at least one pair — the only nodes whose label
    * can ever differ from their own id. Everything else is a singleton
    * and bypasses propagation entirely, so the per-round shuffles move
    * the DUP-GRAPH (typically a sliver of the corpus), not the corpus:
    * at 100 TB the propagation cost tracks how much duplication exists,
    * not how much data. The symmetric closure contains every pair-node
    * as a `__src`.
    */
  private def pairNodes(sym: DataFrame, id: String): DataFrame =
    sym.select(col("__src").as(id)).distinct()

  /** Closure + a self-loop per pair-node — the self-loops make one
    * propagation round a SINGLE join+agg over `labels` (min over
    * neighbors-including-self). Referencing `labels` once per round
    * keeps the unrolled lazy plan LINEAR in the round count; the naive
    * union(labels, neighbor-mins) form references it twice and the plan
    * tree doubles per round. `sym` has no self-loops (pairs are strict),
    * so the union needs no extra distinct — no extra shuffle.
    */
  private def symEdges(sym: DataFrame, pn: DataFrame, id: String): DataFrame =
    sym.unionByName(pn.select(col(id).as("__src"), col(id).as("__dst")))

  private def round(edges: DataFrame, labels: DataFrame, id: String): DataFrame =
    edges
      .join(labels, edges("__dst") === labels(id))
      .groupBy(col("__src").as(id))
      .agg(min("component").as("component"))

  /** Fixed-round propagation as a PURE LAZY plan: `iters` unrolled
    * join+agg stages over the pair-node subgraph, no caches, no driver
    * loop — correct whenever `iters` ≥ the dup-graph diameter (document
    * clusters: single digits). Singletons join back via one broadcast
    * anti-join with component = id. Output: (id, component) for every
    * node in `nodes`, component = min node id transitively reachable
    * through `pairs`.
    */
  def labelPropagationFixed(
      nodes: DataFrame,
      pairs: DataFrame,
      id: String,
      a: String,
      b: String,
      iters: Int): DataFrame = {
    val sym = symPairs(pairs, a, b)
    val pn = pairNodes(sym, id)
    val edges = symEdges(sym, pn, id)
    var labels = pn.withColumn("component", col(id))
    (1 to iters).foreach(_ => labels = round(edges, labels, id))
    val singletons = nodes.select(col(id)).distinct()
      .join(pn, Seq(id), "left_anti")
      .withColumn("component", col(id))
    labels.unionByName(singletons)
  }

  /** [[labelPropagationFixed]] plus a LOUD under-merge guard: one extra
    * propagation round is appended and every pair-node's label is
    * asserted stationary between round `iters` and `iters`+1 inside the
    * plan itself (`assert_true` — labels only decrease under
    * min-propagation, so round-to-round stability at every node IS the
    * fixed point). A dup graph deeper than `iters` fails the job with a
    * clear message instead of silently returning under-merged
    * components (chain-shaped graphs from overlapping chunking /
    * paragraph pipelines can exceed the near-clique diameter the fixed
    * tier assumes). Cost: one extra join+agg round; the round-`iters`
    * aggregate subtree is shared between the check join and the extra
    * round, so ReuseExchange pays it once.
    */
  def labelPropagationChecked(
      nodes: DataFrame,
      pairs: DataFrame,
      id: String,
      a: String,
      b: String,
      iters: Int): DataFrame = {
    val sym = symPairs(pairs, a, b)
    val pn = pairNodes(sym, id)
    val edges = symEdges(sym, pn, id)
    var labels = pn.withColumn("component", col(id))
    (1 to iters).foreach(_ => labels = round(edges, labels, id))
    val next = round(edges, labels, id)
    val checked = next.as("__n").join(labels.as("__p"), col(s"__n.$id") === col(s"__p.$id"))
      .select(
        col(s"__n.$id").as(id),
        when(
          assert_true(
            col("__n.component") === col("__p.component"),
            lit(s"connected components did not converge within $iters rounds — " +
              "the pair graph is deeper than the fixed-round tier assumes; " +
              "raise iters or use labelPropagation")).isNull,
          col("__n.component")).as("component"))
    val singletons = nodes.select(col(id)).distinct()
      .join(pn, Seq(id), "left_anti")
      .withColumn("component", col(id))
    checked.unionByName(singletons)
  }

  /** Adversarial-depth tier: alternating large-star / small-star edge
    * rewiring (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014 — public algorithm, original implementation).
    * Min-label propagation needs O(diameter) rounds, so a million-hop
    * chain needs a million shuffles; star rewiring halves path lengths
    * each alternation and converges in O(log n) rounds on ANY graph
    * shape. Use it when the pair graph may be chain-shaped (overlapping
    * chunking, paragraph pipelines) or its diameter is simply unknown.
    *
    *  - large-star: every node links its larger neighbors to its
    *    smallest-known neighbor (one groupBy + one join per round);
    *  - small-star: every node links its smaller-or-equal neighbors to
    *    the minimum, collapsing local stars;
    *  - fixed point: the edge set is a union of stars (child → component
    *    root); detected by a (count, Σsrc, Σdst) triple going stationary
    *    (decimal sums — overflow-safe for any 64-bit id space).
    *
    * Output matches [[labelPropagation]]: (id, component = min reachable
    * node id) for every node in `nodes`. Eager (per-round persists, all
    * released); throws if `maxIters` alternations don't converge.
    */
  def alternatingStar(
      nodes: DataFrame,
      pairs: DataFrame,
      id: String,
      a: String,
      b: String,
      maxIters: Int = 30): DataFrame = {
    val spark = nodes.sparkSession
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def canon(df: DataFrame): DataFrame = df
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    // lineage breaker: persist the round's edges as an RDD and restart the
    // LOGICAL plan from it (LogicalRDD). persist() alone keeps the full
    // Catalyst tree, and each alternation references the previous round's
    // plan several times — tree size would grow geometrically and OOM the
    // driver around round ten.
    def brk(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd.persist(level)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    // canonical (u = hi, v = lo) edge list
    var (edges, edgesRdd) = brk(
      canon(pairs.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))))
    def stat(df: DataFrame): (Long, BigDecimal, BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        sum(col("u").cast("decimal(38,0)")),
        sum(col("v").cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0),
        Option(r.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0)),
        Option(r.getDecimal(2)).map(BigDecimal(_)).getOrElse(BigDecimal(0)))
    }
    var cur = stat(edges)
    var k = 0
    var converged = cur._1 == 0L
    try {
      while (k < maxIters && !converged) {
        // LARGE-STAR over both orientations: x's strictly-larger
        // neighbors re-link to x's minimum (incl. x itself). Output is
        // already canonically oriented (u = y > x ≥ m = v) and loop-free,
        // and duplicate edges are harmless to the small-star min
        // aggregates — so NO intermediate canon/distinct shuffle here;
        // the round's single distinct runs once, on the small-star
        // output. (A deep chain pays ~log n rounds of pure fixed stage
        // cost, so one fewer shuffle per round is a 25-30 % wall cut on
        // adversarial graphs.)
        val sym = edges.select(col("u").as("x"), col("v").as("y"))
          .unionByName(edges.select(col("v").as("x"), col("u").as("y")))
        val mins = sym.groupBy("x").agg(least(min(col("y")), col("x")).as("m"))
        val (ls, lsRdd) = brk(
          sym.filter(col("y") > col("x"))
            .join(mins, "x")
            .select(col("y").as("u"), col("m").as("v")))
        // SMALL-STAR on (hi → lo) edges: hi's smaller neighbors (and hi)
        // all re-link to hi's minimum neighbor
        val lmins = ls.groupBy("u").agg(min(col("v")).as("m"))
        val (ss, ssRdd) = brk(canon(
          ls.join(lmins, "u")
            .select(col("v").as("u"), col("m").as("v"))
            .unionByName(ls.select(col("u"), col("v")).join(lmins, "u")
              .select(col("u"), col("m").as("v")))))
        val next = stat(ss)
        lsRdd.unpersist(blocking = false)
        edgesRdd.unpersist(blocking = false)
        edges = ss
        edgesRdd = ssRdd
        converged = next == cur
        cur = next
        k += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"alternating-star components did not converge within $maxIters rounds")
      // fixed point = union of stars: every edge is (child, root)
      val assigned = edges.groupBy(col("u").as(id)).agg(min(col("v")).as("component"))
      val roots = edges.select(col("v").as(id)).distinct()
        .join(assigned.select(col(id)), Seq(id), "left_anti")
        .withColumn("component", col(id))
      val labeled = assigned.unionByName(roots)
      // materialize ONLY the pair-subgraph labels inside the persist
      // bracket — bounded by the dup volume (2·|pairs| at worst), never
      // the corpus — to a scratch parquet, entirely on the executors. At
      // 100 TB with realistic 20-30 % duplication the labels are billions
      // of rows, so a driver collect() here would OOM exactly on the
      // corpora dedup exists for; the scan-backed frame keeps the
      // singleton majority a LAZY anti-join and the returned plan owns no
      // persisted state and no driver-resident rows.
      val labeledDf = graft.pipeline.PipelineStage.scratch(labeled, "components-labels")
      val singletons = nodes.select(col(id).cast("long").as(id)).distinct()
        .join(labeledDf.select(col(id)), Seq(id), "left_anti")
        .withColumn("component", col(id))
      labeledDf.unionByName(singletons)
    } finally edgesRdd.unpersist(blocking = false)
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
    val sym = symPairs(pairs, a, b)
    val pn = pairNodes(sym, id)
    val edges = symEdges(sym, pn, id)
    def labelSum(df: DataFrame): BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0))   // null on an empty (pair-free) graph
        .map(BigDecimal(_)).getOrElse(BigDecimal(0))
    val needed = Caching.withCachedLevel(level, edges) {
      var cur = pn.withColumn("component", col(id)).persist(level)
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
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge within $maxIters rounds — " +
            "the pair graph is adversarially deep; raise maxIters")
      k
    }
    labelPropagationFixed(nodes, pairs, id, a, b, math.max(needed, 1))
  }
}
