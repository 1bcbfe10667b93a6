package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered orientation — the
  * standard scale trick (Cohen 2009 / Suri & Vassilvitskii 2011):
  * orient every undirected edge from its lower-(degree, id) endpoint to
  * the higher one, build wedges by joining oriented edges on their
  * source, and close each wedge against the oriented edge set. The
  * orientation bounds every vertex's out-degree by O(√m) regardless of
  * its real degree, so a celebrity node with 10⁸ neighbors contributes
  * O(m) wedge work instead of O(deg²) — the difference between a plan
  * that finishes at 100 TB and one that materializes a quadratic wedge
  * set. Exact integer counts; each triangle counted exactly once.
  */
object Triangles {

  /** `edges`: undirected (u, v) pairs in ANY orientation, self-loops
    * and duplicates tolerated (normalized away). Returns one row:
    * (n_nodes, n_edges, n_triangles).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: u < v, deduplicated
    val und = edges.select(
      least(col("u").cast("long"), col("v").cast("long")).as("u"),
      greatest(col("u").cast("long"), col("v").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient from lower (degree, id) to higher
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.t").as("a"), col("e2.t").as("b"))
    // the closing edge can be oriented either way between a and b
    val closed = wedges.join(
      oriented.select(
        least(col("s"), col("t")).as("a"), greatest(col("s"), col("t")).as("b")),
      Seq("a", "b"), "left_semi")
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    val nt = closed.agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(broadcast(ne)).crossJoin(broadcast(nt))
  }
}
