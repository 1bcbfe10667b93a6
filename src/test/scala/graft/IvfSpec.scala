package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, Similarity}

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clustered() = {
    import spark.implicits._
    // 4 well-separated direction clusters in 16d
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF training is deterministic and assigns clustered data coherently") {
    val df = clustered()
    val m1 = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L)
    val m2 = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L)
    assert(m1.centroids.flatten.toSeq == m2.centroids.flatten.toSeq)
    val assigned = Ivf.assign(df, "embedding", m1)
    // every CELL should be dominated by one generator cluster (k-means may
    // split a true cluster across cells, but must not blend clusters)
    val cellPurity = assigned
      .groupBy((org.apache.spark.sql.functions.col("vec_id") % 4).as("truth"), assigned("cluster"))
      .count()
      .collect()
      .groupBy(_.getInt(1))
      .map { case (_, rows) => rows.map(_.getLong(2)).max.toDouble / rows.map(_.getLong(2)).sum }
    assert(cellPurity.forall(_ > 0.9), s"cellPurity=$cellPurity")
  }

  test("trainCached memoizes per (corpusKey, params) and matches train() exactly") {
    val df = clustered()
    val a = Ivf.trainCached(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L,
      corpusKey = "ivfspec-corpus")
    val b = Ivf.trainCached(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L,
      corpusKey = "ivfspec-corpus")
    assert(a eq b, "cache returned a different instance — model was retrained")
    val fresh = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L)
    assert(a.centroids.flatten.toSeq == fresh.centroids.flatten.toSeq)
    val other = Ivf.trainCached(df, "vec_id", "embedding", k = 4, iters = 5, seed = 10L,
      corpusKey = "ivfspec-corpus")
    assert(!(other eq a))
  }

  test("trainCached keys on the vector COLUMN — a second column of the same corpus is a distinct entry") {
    import org.apache.spark.sql.functions._
    // same corpusKey, different vec column: must NOT return the model
    // trained on the other column (the r7 code-review defect)
    val df = clustered().withColumn("embedding_b", transform(col("embedding"), x => -x))
    val a = Ivf.trainCached(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L,
      corpusKey = "ivfspec-twocol")
    val b = Ivf.trainCached(df, "vec_id", "embedding_b", k = 4, iters = 5, seed = 9L,
      corpusKey = "ivfspec-twocol")
    assert(!(b eq a), "cache returned the embedding-trained model for embedding_b")
    assert(a.centroids.flatten.toSeq != b.centroids.flatten.toSeq)
  }

  test("trainCodebook on an empty / all-null-vector corpus returns an empty codebook instead of throwing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Ivf.trainCodebook(empty, "vec_id", "embedding", k = 4, iters = 2, seed = 1L).count() == 0L)
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val cb = Ivf.trainCodebook(allNull, "vec_id", "embedding", k = 4, iters = 2, seed = 1L)
    assert(cb.count() == 0L)
    // downstream assignment still degrades gracefully: null clusters
    val assigned = Ivf.assignByJoin(allNull, "vec_id", "embedding", cb)
    assert(assigned.count() == 2L && assigned.filter(assigned("cluster").isNull).count() == 2L)
  }

  test("partitioned IVF layout prunes the scan to the probed cells") {
    import org.apache.spark.sql.functions._
    val df = clustered()
    val model = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/corpus"
    Ivf.writePartitioned(df, "embedding", model, path)
    // query = row 0's raw embedding
    val qv = df.filter(col("vec_id") === 0L).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    val res = Ivf.searchPartitioned(
      spark, path, "vec_id", "embedding", model, qv, nprobe = 2, topK = 10)
    // scan touches exactly nprobe of the k partitions
    val scans = res.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.head.selectedPartitions.partitionCount == 2,
      s"selected=${scans.map(_.selectedPartitions.partitionCount)}")
    // and still recovers the brute-force top-10 as well as the in-memory path
    val got = res.collect().map(_.getLong(0)).toSet
    val brute = Similarity.topK(df, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(brute).size >= 8, s"recall ${got.intersect(brute).size}/10")
  }

  test("batch search matches per-query search for every query") {
    import org.apache.spark.sql.functions._
    val df = clustered()
    val model = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L)
    val queryIds = Seq(0L, 1L, 2L)
    val queries = df.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = Ivf.searchTopKBatch(
      df, "vec_id", "embedding", model, queries, "qid", "qv", nprobe = 2, topK = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(r => (r.getLong(1), r.getDouble(2))).toSet }
    queryIds.foreach { q =>
      val single = Ivf.searchTopK(
        df, "vec_id", "embedding", model, queryId = q, nprobe = 2, topK = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(q) == single, s"query $q: batch ${batch(q)} vs single $single")
    }
  }

  test("IVF top-k with nprobe=2 recovers most of the brute-force top-10") {
    val df = clustered()
    val model = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L)
    val ivf = Ivf.searchTopK(df, "vec_id", "embedding", model, queryId = 0L, nprobe = 2, topK = 10)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.topK(df, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.intersect(brute).size >= 8, s"recall ${ivf.intersect(brute).size}/10")
  }

  test("kernel assignment tier is bit-identical to the expression tier") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0L until 400L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(df, "vec_id", "embedding", k = 8, iters = 2, seed = 5L)
    // expression path (k=8 ≤ ExprAssignMaxK)
    val expr = Ivf.assign(df, "embedding", model)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // kernel path: force it by padding the model ABOVE the expression
    // bound with exact COPIES of centroid 0 — a pad scores identically to
    // centroid 0, so the smaller-id tie-break guarantees a pad can never
    // win; assignments must therefore be exactly the expression tier's
    val padded = Ivf.Model(model.centroids ++
      Array.fill(Ivf.ExprAssignMaxK + 1 - model.k)(model.centroids(0).clone()))
    val kernel = Ivf.assign(df, "embedding", padded)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel.values.forall(_ < model.k), "a padding centroid won a row")
    assert(kernel == expr)
  }

  test("null embeddings get a null cluster in every assignment tier (no NPE)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows: Seq[(Long, Array[Float])] =
      (0L until 50L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat))) :+
        (50L, null.asInstanceOf[Array[Float]])
    val df = rows.toDF("vec_id", "embedding")
    val model = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 2, seed = 3L)
    // expression tier (k ≤ ExprAssignMaxK)
    val exprNull = Ivf.assign(df, "embedding", model)
      .filter(col("vec_id") === 50L).collect().head
    assert(exprNull.isNullAt(exprNull.fieldIndex("cluster")))
    // kernel tier: pad above the expression bound with copies of centroid 0
    val padded = Ivf.Model(model.centroids ++
      Array.fill(Ivf.ExprAssignMaxK + 1 - model.k)(model.centroids(0).clone()))
    val kernelNull = Ivf.assign(df, "embedding", padded)
      .filter(col("vec_id") === 50L).collect().head
    assert(kernelNull.isNullAt(kernelNull.fieldIndex("cluster")))
    // join tier against a codebook built from the same model
    val codebook = model.centroids.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toSeq.toDF("__j", "__c")
    val joinNull = Ivf.assignByJoin(df, "vec_id", "embedding", codebook)
      .filter(col("vec_id") === 50L).collect().head
    assert(joinNull.isNullAt(joinNull.fieldIndex("cluster")))
  }

  test("hash seeding ignores duplicate vectors: seeds are distinct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // 10 distinct directions, each duplicated 40× (a dedup-shaped corpus)
    val dirs = Array.fill(10)(Array.fill(8)(rnd.nextGaussian()))
    val rows = (0 until 400).map(i => (i.toLong, dirs(i % 10).map(_.toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    // normalized frame the seeding consumes (same shape train() feeds it)
    val data = df
      .withColumn("__v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("__v"))
    val seeds = Ivf.hashSeedFrame(data, "vec_id", k = 8, seed = 9L)
      .select("__v").collect().map(_.getSeq[Double](0))
    assert(seeds.length == 8)
    assert(seeds.distinct.length == 8,
      "duplicate vectors seeded duplicate centroids — effective k shrank")
  }

  test("sample-trained quantizer keeps full-trained assignment quality") {
    val df = clustered()
    def purity(m: Ivf.Model): Double = {
      val assigned = Ivf.assign(df, "embedding", m)
      val cells = assigned
        .groupBy((org.apache.spark.sql.functions.col("vec_id") % 4).as("truth"), assigned("cluster"))
        .count().collect()
        .groupBy(_.getInt(1))
        .map { case (_, rows) => rows.map(_.getLong(2)).max.toDouble / rows.map(_.getLong(2)).sum }
      cells.sum / cells.size
    }
    val full = purity(Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L))
    // cap at half the corpus — recall is a property of the sample
    val sampled = purity(Ivf.train(df, "vec_id", "embedding", k = 4, iters = 5, seed = 9L,
      sampleCap = 100L))
    assert(full > 0.9, s"full-trained purity $full")
    assert(sampled >= full - 0.05, s"sample-trained purity $sampled vs full $full")
  }

  test("join-assignment tier is bit-identical to the expression tier") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(df, "vec_id", "embedding", k = 8, iters = 2, seed = 5L)
    val expr = Ivf.assign(df, "embedding", model)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val codebook = model.centroids.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toSeq.toDF("__j", "__c")
    val joined = Ivf.assignByJoin(df, "vec_id", "embedding", codebook)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(joined == expr)
  }

  test("off-driver codebook regime: trainCodebook + assignByJoin finds the planted pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val rows = Seq((0L, base), (1L, near)) ++
      (2L to 400L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    // driverModelMaxK = 0 forces the scratch-codebook + join-assign tier
    // at a spec-sized k (the production trigger is k > 4096)
    val auto = Similarity.clusterNearDupPairsAuto(
      df, "vec_id", "embedding", threshold = 0.9, targetCellSize = 16, iters = 2,
      seed = 1L, driverModelMaxK = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(brute))
    assert(auto.contains((0L, 1L)), "planted near-identical pair missed")
  }

  test("auto-sized SemDeDup above the expression bound: large-k train + kernel assign") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val rows = Seq((0L, base), (1L, near)) ++
      (2L to 600L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    // targetCellSize 8 on 601 rows ⇒ k = 76 > ExprAssignMaxK = 64:
    // exercises hash-seeded init + kernel Lloyd + kernel assignment
    assert(Similarity.autoK(601L, 8) > Ivf.ExprAssignMaxK)
    val auto = Similarity.clusterNearDupPairsAuto(
      df, "vec_id", "embedding", threshold = 0.9, targetCellSize = 8, iters = 2, seed = 1L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(brute))
    assert(auto.contains((0L, 1L)), "planted near-identical pair missed")
    // the cap: autoK never exceeds the flat-model bound
    assert(Similarity.autoK(1L << 40, 512) == (1 << 16))
  }
}
