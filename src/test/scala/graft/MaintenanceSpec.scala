package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("upsert replaces matched keys, keeps the rest, creates when missing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert")
    val path = dir.resolve("docs").toString
    val v1 = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    Maintenance.upsert(spark, path, v1, Seq("doc_id")) // create
    val v2 = Seq((2L, "TWO v2"), (4L, "four")).toDF("doc_id", "text")
    Maintenance.upsert(spark, path, v2, Seq("doc_id")) // merge
    val got = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "one", 2L -> "TWO v2", 3L -> "three", 4L -> "four"))
  }

  test("compact shrinks a many-file dataset without changing its rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
    val path = dir.resolve("events").toString
    (0 until 2000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .repartition(64).write.parquet(path)
    val before = spark.read.parquet(path)
    val sumBefore = before.agg(sum("v")).collect().head.getDouble(0)
    val (nBefore, nAfter) = Maintenance.compact(spark, path, rowsPerFile = 1000)
    assert(nBefore >= 32 && nAfter <= 4, s"files $nBefore -> $nAfter")
    val after = spark.read.parquet(path)
    assert(after.count() == 2000)
    assert(after.agg(sum("v")).collect().head.getDouble(0) == sumBefore)
  }

  test("schema evolution: appended files with new columns merge, old rows null-fill") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old rows null-fill
    assert(rows(2).getDouble(rows(2).fieldIndex("score")) == 9.5)
    // and the default read (no mergeSchema) still works on the latest schema
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("ks2Samp: identical samples give 0, disjoint give 1, shifted in between") {
    import spark.implicits._
    val same = (1 to 100).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "s")
    val ks0 = graft.functions.Stats.ks2Samp(same, "v", col("s"))
      .collect().head.getDouble(0)
    assert(ks0 == 0.0)
    val disjoint = ((1 to 50).map(i => (i.toDouble, true))
      ++ (51 to 100).map(i => (i.toDouble, false))).toDF("v", "s")
    val ks1 = graft.functions.Stats.ks2Samp(disjoint, "v", col("s"))
      .collect().head.getDouble(0)
    assert(ks1 == 1.0)
    val shifted = ((1 to 100).map(i => (i.toDouble, true))
      ++ (26 to 125).map(i => (i.toDouble, false))).toDF("v", "s")
    val ksMid = graft.functions.Stats.ks2Samp(shifted, "v", col("s"))
      .collect().head.getDouble(0)
    assert(math.abs(ksMid - 0.25) < 1e-12, s"ks=$ksMid")
  }

  test("psi: identical slices ~0, disjoint slices large, shifted in between") {
    import spark.implicits._
    val same = (1 to 200).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "s")
    val p0 = graft.functions.Stats.psi(same, "v", col("s")).collect().head.getDouble(0)
    assert(p0 == 0.0, s"psi=$p0")
    val disjoint = ((1 to 100).map(i => (i.toDouble, true))
      ++ (201 to 300).map(i => (i.toDouble, false))).toDF("v", "s")
    val p1 = graft.functions.Stats.psi(disjoint, "v", col("s")).collect().head.getDouble(0)
    val shifted = ((1 to 100).map(i => (i.toDouble, true))
      ++ (31 to 130).map(i => (i.toDouble, false))).toDF("v", "s")
    val pMid = graft.functions.Stats.psi(shifted, "v", col("s")).collect().head.getDouble(0)
    // conventional thresholds: <0.1 stable, >0.25 shifted
    assert(p1 > 2.0, s"disjoint psi=$p1")
    assert(pMid > 0.25 && pMid < p1, s"shifted psi=$pMid vs disjoint $p1")
    // degenerate: constant column (hi == lo) must not divide by zero
    val const = (1 to 50).map(i => (7.0, i % 2 == 0)).toDF("v", "s")
    val pc = graft.functions.Stats.psi(const, "v", col("s")).collect().head.getDouble(0)
    assert(pc == 0.0 || pc.abs < 1e-6, s"constant psi=$pc")
  }

  test("chi2: identical mixes 0, disjoint mixes ~N, null category counted, dof = cats-1") {
    import spark.implicits._
    // identical category mixes in both slices → expectations met exactly
    val same = Seq("a", "b", "b", "c").flatMap(c => Seq((c, true), (c, false)))
      .toDF("c", "s")
    val r0 = graft.functions.Stats.chi2Homogeneity(same, "c", col("s")).collect().head
    assert(r0.getDouble(0) == 0.0 && r0.getLong(1) == 2L, r0.toString)
    // perfectly separated mixes → chi2 = N (the 2x2 extreme)
    val disjoint = (Seq.fill(60)(("a", true)) ++ Seq.fill(40)(("b", false))).toDF("c", "s")
    val r1 = graft.functions.Stats.chi2Homogeneity(disjoint, "c", col("s")).collect().head
    assert(math.abs(r1.getDouble(0) - 100.0) < 1e-9 && r1.getLong(1) == 1L, r1.toString)
    // a null category is a REAL category: a null-rate drift must move the
    // statistic, not vanish (contrast: psi excludes valueless rows)
    val withNulls = (Seq.fill(50)((Option("a"), true)) ++ Seq.fill(50)((Option("a"), false))
      ++ Seq.fill(30)((Option.empty[String], false))).toDF("c", "s")
    val r2 = graft.functions.Stats.chi2Homogeneity(withNulls, "c", col("s")).collect().head
    assert(r2.getDouble(0) > 10.0 && r2.getLong(1) == 1L, r2.toString)
  }

  test("ks2Samp sharded cumulative is bit-equal to the single-window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // adversarial values for the sortable-bits sharding: negatives,
    // zero, subnormal-ish magnitudes, wide exponent spread, ties
    val rng = new scala.util.Random(7)
    val vals = Seq(-1e300, -42.5, -1e-200, 0.0, 1e-200, 0.25, 0.25, 1e300) ++
      (1 to 400).map(_ => math.pow(10, rng.nextInt(200) - 100) *
        (if (rng.nextBoolean()) 1 else -1) * rng.nextDouble())
    // null values ride shard -1 (the window form's ASC NULLS FIRST slot)
    val df = (vals.zipWithIndex
      .map { case (v, i) => (Option(v), i % 3 == 0) } ++
      Seq((Option.empty[Double], true), (Option.empty[Double], false)))
      .toDF("v", "s")
    for (bits <- Seq(1, 4, 12)) {
      val sharded = graft.functions.Stats.ks2Samp(df, "v", col("s"), shardBits = bits)
        .collect().head.getDouble(0)
      val g = df.groupBy(col("v").as("__v")).agg(
        sum(when(col("s"), 1L).otherwise(0L)).as("__c1"),
        sum(when(col("s"), 0L).otherwise(1L)).as("__c2"))
      val wCum = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
      val single = g.withColumn("__r1", sum("__c1").over(wCum))
        .withColumn("__r2", sum("__c2").over(wCum))
        .withColumn("__n1", sum("__c1").over(wAll))
        .withColumn("__n2", sum("__c2").over(wAll))
        .agg(max(abs(
          col("__r1").cast("double") / col("__n1")
            - col("__r2").cast("double") / col("__n2"))))
        .collect().head.getDouble(0)
      assert(sharded == single, s"bits=$bits sharded=$sharded single=$single")
    }
  }

  test("psi excludes null values instead of binning them into bucket 0") {
    import spark.implicits._
    // ADVICE r8: floor((null-lo)/w) is null and greatest()/least() skip
    // nulls, so pre-fix every null row landed in bucket 0 while still
    // counting toward the slice totals — a silently distorted PSI. The
    // contract is now: nulls are excluded everywhere (range, buckets,
    // totals), so nulls must be a no-op.
    val base = ((1 to 100).map(i => (Option(i.toDouble), true))
      ++ (31 to 130).map(i => (Option(i.toDouble), false)))
    val nulled = base ++ Seq.fill(40)((Option.empty[Double], false)) ++
      Seq.fill(15)((Option.empty[Double], true))
    val pBase = graft.functions.Stats.psi(base.toDF("v", "s"), "v", col("s"))
      .collect().head.getDouble(0)
    val pNulled = graft.functions.Stats.psi(nulled.toDF("v", "s"), "v", col("s"))
      .collect().head.getDouble(0)
    assert(pBase == pNulled, s"nulls distorted psi: $pBase vs $pNulled")
  }

  test("singlePartitionKey keeps one partition even when the key column is null") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // ADVICE r8: the inlined `col * lit(0L)` idiom silently split into
    // TWO window partitions (0 and null) when the key was null — here
    // row_number over 8 rows with 3 null keys must still be 1..8.
    val df = (Seq(1L, 2L, 3L, 4L, 5L).map(Option(_))
      ++ Seq.fill(3)(Option.empty[Long])).toDF("k")
    val w = Window
      .partitionBy(graft.plans.ScalarExpressions.singlePartitionKey(col("k")))
      .orderBy(col("k").asc_nulls_first)
    val rns = df.select(row_number().over(w).as("rn"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(rns == (1 to 8), s"split partitions: row_numbers $rns")
  }

  test("sortableBits canonicalizes sign-bit-set NaN above +Infinity") {
    import spark.implicits._
    // ADVICE r8: doubleToRawLongBits mapped a negative-sign NaN (readable
    // from externally written parquet — SPARK-26021 removed unsafe-row
    // NaN normalization) BELOW -Infinity, breaking the documented
    // "NaN maps above +Inf" total order. doubleToLongBits canonicalizes
    // every payload to the one positive quiet-NaN pattern.
    val negNaN = java.lang.Double.longBitsToDouble(0xfff8000000000000L)
    assert(negNaN.isNaN && java.lang.Double.doubleToRawLongBits(negNaN) < 0)
    val bits = Seq(negNaN, Double.NaN, Double.PositiveInfinity).toDF("v")
      .select(graft.plans.ScalarExpressions.sortableBits(col("v")).as("b"))
      .collect().map(_.getLong(0))
    assert(bits(0) == bits(1), s"NaN payloads not canonicalized: ${bits.toSeq}")
    assert(bits(0) > bits(2), s"NaN below +Inf: ${bits.toSeq}")
    // interpreted (non-codegen) path must agree with the codegen'd one
    val interp = graft.plans.DoubleSortableBits(
      org.apache.spark.sql.catalyst.expressions.Literal(negNaN)).eval(null)
    assert(interp == bits(0), s"interpreted $interp vs codegen ${bits(0)}")
  }

  test("sortableBits is monotone over adversarial doubles") {
    import spark.implicits._
    val vs = Seq(
      Double.NegativeInfinity, -1e308, -1.0, -1e-308, -0.0, 0.0,
      1e-308, 1.0, 1e308, Double.PositiveInfinity)
    val bits = vs.toDF("v")
      .select(graft.plans.ScalarExpressions.sortableBits(col("v")).as("b"))
      .collect().map(_.getLong(0))
    // -0.0 and 0.0 are adjacent (bit-distinct) but ordered; all other
    // neighbors are strictly increasing
    assert(bits.sliding(2).forall(p => p(0) <= p(1)), bits.mkString(","))
    assert(bits.distinct.length >= vs.length - 1)
  }

  test("IncrementalAgg: fold is associative/commutative; maintained state ≡ rebuild") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    val rows = (1 to 300).map(i => (s"g${i % 5}", i * 0.25)).toDF("k", "v")
    val Seq(a, b, c) = Seq(0, 1, 2).map(r =>
      rows.filter(abs(hash(col("v"))) % 3 === r))
    val keys = Seq("k")
    def collectState(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.view(df, keys).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
    val pa = IncrementalAgg.partials(a, keys, "v")
    val pb = IncrementalAgg.partials(b, keys, "v")
    val pc = IncrementalAgg.partials(c, keys, "v")
    // ((a ⊎ b) ⊎ c)  ==  (a ⊎ (c ⊎ b))  ==  direct partials of the whole
    val left = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(pa, pb), keys), pc), keys)
    val right = IncrementalAgg.merge(
      Seq(pa, IncrementalAgg.merge(Seq(pc, pb), keys)), keys)
    val direct = IncrementalAgg.partials(rows, keys, "v")
    assert(collectState(left) == collectState(direct))
    assert(collectState(right) == collectState(direct))
  }

  test("IncrementalAgg: retracting every row of a group removes it from the state") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val delA = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val keys = Seq("k")
    val state = IncrementalAgg.merge(Seq(
      IncrementalAgg.partials(base, keys, "v"),
      IncrementalAgg.partials(delA, keys, "v", sign = -1)), keys)
    val got = IncrementalAgg.view(state, keys).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // group a is GONE (zero count never lingers as a 0/0 row); b intact
    assert(got == Set(("b", 1L, 5.0)), got.toString)
  }

  test("IncrementalAgg: mean is SQL AVG on nullable measures (null rows count in n, not in mean)") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    // r12 ADVICE: sum skips NULLs but the old mean divided by the ROW
    // count — AVG over (2, null, 4) must be 3, not 2
    val base = Seq(("a", Some(2.0)), ("a", None), ("a", Some(4.0)),
      ("b", None), ("b", None)).toDF("k", "v")
    val keys = Seq("k")
    val state = IncrementalAgg.merge(
      Seq(IncrementalAgg.partials(base, keys, "v")), keys)
    val got = IncrementalAgg.view(state, keys).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    // a: 3 rows, total 6, AVG 3; b: all-NULL measure -> SUM and AVG both
    // NULL (SQL semantics), rows kept
    assert(got == Set(("a", 3L, Some(6.0), Some(3.0)), ("b", 2L, None, None)),
      got.toString)
    // retracting the null row leaves AVG untouched but drops the row count
    val state2 = IncrementalAgg.merge(Seq(
      state,
      IncrementalAgg.partials(
        Seq(("a", None: Option[Double])).toDF("k", "v"), keys, "v", sign = -1)), keys)
    val a2 = IncrementalAgg.view(state2, keys).filter(col("k") === "a").collect().head
    assert((a2.getLong(1), a2.getDouble(2), a2.getDouble(3)) == ((2L, 6.0, 3.0)), a2.toString)
  }

  test("IncrementalAgg.distinct: instance counts keep multiset semantics under deletes") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    val keys = Seq("k")
    val base = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
    val st0 = IncrementalAgg.distinctMerge(
      Seq(IncrementalAgg.distinctPartials(base, keys, "v")), keys)
    def nd(st: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.distinctView(st, keys).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nd(st0) == Map("a" -> 2L, "b" -> 1L))
    // delete ONE of the two copies of (a, 1): value 1 must stay distinct
    val st1 = IncrementalAgg.distinctMerge(Seq(
      st0, IncrementalAgg.distinctPartials(
        Seq(("a", 1L)).toDF("k", "v"), keys, "v", sign = -1)), keys)
    assert(nd(st1) == Map("a" -> 2L, "b" -> 1L), nd(st1).toString)
    // delete the second copy: now it leaves
    val st2 = IncrementalAgg.distinctMerge(Seq(
      st1, IncrementalAgg.distinctPartials(
        Seq(("a", 1L)).toDF("k", "v"), keys, "v", sign = -1)), keys)
    assert(nd(st2) == Map("a" -> 1L, "b" -> 1L), nd(st2).toString)
    // delete folded BEFORE its insert: negative stub survives and cancels
    val stubFirst = IncrementalAgg.distinctMerge(Seq(
      IncrementalAgg.distinctMerge(Seq(IncrementalAgg.distinctPartials(
        Seq(("c", 9L)).toDF("k", "v"), keys, "v", sign = -1)), keys),
      IncrementalAgg.distinctPartials(Seq(("c", 9L)).toDF("k", "v"), keys, "v")),
      keys)
    assert(IncrementalAgg.distinctView(stubFirst, keys).count() == 0)
    // NULL values never count toward n_distinct, but a group surviving
    // ONLY through NULL-valued rows still exists with n_distinct = 0 —
    // exactly what the from-scratch rebuild returns (r13 review)
    val withNull = IncrementalAgg.distinctMerge(
      Seq(IncrementalAgg.distinctPartials(
        Seq(("d", Some(1L)), ("d", None), ("e", None)).toDF("k", "v"),
        keys, "v")), keys)
    assert(nd(withNull) == Map("d" -> 1L, "e" -> 0L), nd(withNull).toString)
    // retracting d's only non-null value leaves (d, 0), not a vanished group
    val nullOnly = IncrementalAgg.distinctMerge(Seq(
      withNull,
      IncrementalAgg.distinctPartials(
        Seq(("d", Some(1L))).toDF("k", "v"), keys, "v", sign = -1)), keys)
    assert(nd(nullOnly) == Map("d" -> 0L, "e" -> 0L), nd(nullOnly).toString)
  }

  test("MinMaxAgg: maintained extremes equal rebuild under inserts + deletes") {
    import spark.implicits._
    import graft.operators.MinMaxAgg
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (s"g${i % 4}", rnd.nextInt(1000).toDouble))
      .toDF("k", "v").cache()
    val Seq(a, b) = Seq(0, 1).map(r => rows.filter(abs(hash(col("v"))) % 2 === r))
    // delete a slice that includes per-group extremes but fewer than k
    // of them (k = 8 absorbs it without underflow)
    val wv = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
    val del = rows.withColumn("rn", row_number().over(wv))
      .filter(col("rn") <= 3).drop("rn")
    val keys = Seq("k")
    val merged = MinMaxAgg.mergeInserts(Seq(
      MinMaxAgg.partials(a, keys, "v"), MinMaxAgg.partials(b, keys, "v")), keys)
    val after = MinMaxAgg.applyDeletes(merged, del, keys, "v")
    assert(MinMaxAgg.underflowed(after, keys).count() == 0)
    val got = MinMaxAgg.view(after, keys).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    // rebuild the surviving multiset driver-side (instance-counted)
    val deleted = del.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(identity).map { case (kv, xs) => kv -> xs.length }
    val surv = rows.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(identity).map { case (kv, xs) => kv -> (xs.length - deleted.getOrElse(kv, 0)) }
      .filter(_._2 > 0)
    val exp = surv.keys.groupBy(_._1).map { case (k, kvs) =>
      val vs = kvs.map(_._2)
      val n = surv.filter(_._1._1 == k).map(_._2).sum
      (k, n.toLong, vs.min, vs.max)
    }.toSet
    assert(got == exp, s"got $got\nexp $exp")
    rows.unpersist()
  }

  test("MinMaxAgg: underflow is detected, view raises, repair rebuilds only that group") {
    import spark.implicits._
    import graft.operators.MinMaxAgg
    // k = 2: deleting THREE copies of the minimum exhausts group a's lo
    // heap while survivors remain — the exact blind spot the heap has
    val base = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 5.0), ("a", 9.0),
      ("b", 2.0), ("b", 4.0)).toDF("k", "v")
    val del = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0)).toDF("k", "v")
    val keys = Seq("k")
    val state = MinMaxAgg.mergeInserts(
      Seq(MinMaxAgg.partials(base, keys, "v", k = 2)), keys, k = 2)
    val after = MinMaxAgg.applyDeletes(state, del, keys, "v")
    // group a underflowed (lo exhausted), b untouched
    assert(MinMaxAgg.underflowed(after, keys).collect().map(_.getString(0)).toSeq
      == Seq("a"))
    val e = intercept[Exception] {
      MinMaxAgg.view(after, keys).collect()
    }
    assert(e.getMessage.contains("underflow"), e.getMessage)
    // repair rescans the survivors for group a only and restores truth
    val survivors = Seq(("a", 5.0), ("a", 9.0), ("b", 2.0), ("b", 4.0))
      .toDF("k", "v")
    val repaired = MinMaxAgg.repair(after, survivors, keys, "v", k = 2)
    val got = MinMaxAgg.view(repaired, keys).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == Set(("a", 2L, 5.0, 9.0), ("b", 2L, 2.0, 4.0)), got.toString)
  }

  test("MinMaxAgg: insert fold after a delete cannot mask survivors (cap check)") {
    import spark.implicits._
    import graft.operators.MinMaxAgg
    // the r13 review's failure scenario: k=2 over {1..20} -> lo=[1,2],
    // cap=2; delete {1} -> lo=[2] (survivors 3..20 beyond the covered
    // window); fold insert {30} -> lo=[2,30]; delete {2}. The naive heap
    // would answer min=30 while the true min is 3 — the cap check must
    // flag the group instead, and repair must restore the truth.
    val base = (1 to 20).map(i => ("g", i.toDouble)).toDF("k", "v")
    val keys = Seq("k")
    val st0 = MinMaxAgg.partials(base, keys, "v", k = 2)
    val st1 = MinMaxAgg.applyDeletes(st0, Seq(("g", 1.0)).toDF("k", "v"), keys, "v")
    val st2 = MinMaxAgg.mergeInserts(Seq(
      st1, MinMaxAgg.partials(Seq(("g", 30.0)).toDF("k", "v"), keys, "v", k = 2)),
      keys, k = 2)
    val st3 = MinMaxAgg.applyDeletes(st2, Seq(("g", 2.0)).toDF("k", "v"), keys, "v")
    assert(MinMaxAgg.underflowed(st3, keys).count() == 1,
      "cap check failed to flag the masked-survivor state")
    intercept[Exception] { MinMaxAgg.view(st3, keys).collect() }
    val survivors = ((3 to 20).map(i => ("g", i.toDouble)) :+ (("g", 30.0)))
      .toDF("k", "v")
    val r = MinMaxAgg.view(
      MinMaxAgg.repair(st3, survivors, keys, "v", k = 2), keys).collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3)) == ((19L, 3.0, 30.0)),
      r.toString)
    // and the benign fold (inserts only, no deletes) raises no false alarm
    val benign = MinMaxAgg.mergeInserts(Seq(
      MinMaxAgg.partials(base, keys, "v", k = 2),
      MinMaxAgg.partials(Seq(("g", 30.0)).toDF("k", "v"), keys, "v", k = 2)),
      keys, k = 2)
    assert(MinMaxAgg.underflowed(benign, keys).count() == 0)
    val b = MinMaxAgg.view(benign, keys).collect().head
    assert((b.getLong(1), b.getDouble(2), b.getDouble(3)) == ((21L, 1.0, 30.0)),
      b.toString)
  }

  test("MinMaxAgg: NULL measures count in n (COUNT(*)) but never enter the heaps") {
    import spark.implicits._
    import graft.operators.MinMaxAgg
    // r13 advice: n must be COUNT(*) — the rebuild oracle's count — so
    // NULL-measure rows ride in cnt while the heaps/caps/cntv track the
    // non-null multiset SQL MIN/MAX see. An all-NULL group is a live row
    // with NULL extremes and never underflows (nothing to certify).
    val base = Seq(("a", Some(3.0)), ("a", None), ("b", None), ("b", None))
      .toDF("k", "v")
    val keys = Seq("k")
    val st = MinMaxAgg.mergeInserts(
      Seq(MinMaxAgg.partials(base, keys, "v")), keys)
    assert(MinMaxAgg.underflowed(st, keys).count() == 0)
    val got = MinMaxAgg.view(st, keys).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    // exactly what `SELECT k, COUNT(*), MIN(v), MAX(v) GROUP BY k` gives
    assert(got == Set(
      ("a", 2L, Some(3.0), Some(3.0)),
      ("b", 2L, None, None)), got.toString)
    // deleting a NULL-measure row decrements n only — no phantom
    // heap retraction, extremes untouched
    val st2 = MinMaxAgg.applyDeletes(
      st, Seq(("a", None: Option[Double])).toDF("k", "v"), keys, "v")
    val a2 = MinMaxAgg.view(st2, keys).filter(col("k") === "a").collect().head
    assert((a2.getLong(1), a2.getDouble(2)) == ((1L, 3.0)), a2.toString)
    // deleting ALL rows of the all-NULL group removes it entirely
    val st3 = MinMaxAgg.applyDeletes(
      st2, Seq(("b", None: Option[Double]), ("b", None: Option[Double]))
        .toDF("k", "v"), keys, "v")
    assert(MinMaxAgg.view(st3, keys).collect().map(_.getString(0)).toSeq
      == Seq("a"))
  }

  test("MinMaxAgg: tie-run truncation inside the heap still yields exact extremes") {
    import spark.implicits._
    import graft.operators.MinMaxAgg
    // k = 2, four copies of the min: heap holds 2, deleting 1 keeps the
    // heap a subset of survivors whose head is still the true min
    val base = Seq.fill(4)(("a", 3.0)) ++ Seq(("a", 7.0), ("a", 8.0))
    val del = Seq(("a", 3.0)).toDF("k", "v")
    val keys = Seq("k")
    val st = MinMaxAgg.applyDeletes(
      MinMaxAgg.mergeInserts(
        Seq(MinMaxAgg.partials(base.toDF("k", "v"), keys, "v", k = 2)), keys, k = 2),
      del, keys, "v")
    val r = MinMaxAgg.view(st, keys).collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3)) == ((5L, 3.0, 8.0)),
      r.toString)
  }

  test("IncrementalAgg: a delete folded BEFORE its inserts still cancels (negative stubs survive)") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    // the r12 review's failure scenario: merging the delete batch first
    // leaves a negative-count stub for g; dropping it (the old cnt > 0
    // filter in merge) would make the later insert fold forget the
    // delete entirely
    val keys = Seq("k")
    val ins = Seq(("g", 12.5), ("g", 4.0), ("g", 8.5), ("h", 1.0), ("g", 2.0), ("g", 3.0)).toDF("k", "v")
    val del = Seq(("g", 4.0), ("g", 8.5)).toDF("k", "v")
    val deleteFirst = IncrementalAgg.merge(Seq(
      IncrementalAgg.merge(Seq(IncrementalAgg.partials(del, keys, "v", sign = -1)), keys),
      IncrementalAgg.partials(ins, keys, "v")), keys)
    val insertFirst = IncrementalAgg.merge(Seq(
      IncrementalAgg.partials(ins, keys, "v"),
      IncrementalAgg.partials(del, keys, "v", sign = -1)), keys)
    def st(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.view(df, keys).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Set(("g", 3L, 17.5), ("h", 1L, 1.0))
    assert(st(insertFirst) == want, st(insertFirst).toString)
    assert(st(deleteFirst) == want,
      s"delete-first fold lost the retraction: ${st(deleteFirst)}")
  }

  test("IncrementalAgg: state round-trips parquet between maintenance runs bit-exactly") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    // run 1 persists its state; run 2 loads it and folds a new delta —
    // the production shape (the state outlives the job). Decimal sums
    // must survive the parquet round trip bit-exactly.
    val keys = Seq("k")
    val gen1 = (1 to 100).map(i => (s"g${i % 3}", i * 0.125)).toDF("k", "v")
    val gen2 = (101 to 150).map(i => (s"g${i % 3}", i * 0.125)).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm").toString + "/state"
    IncrementalAgg.merge(Seq(IncrementalAgg.partials(gen1, keys, "v")), keys)
      .write.parquet(dir)
    val resumed = IncrementalAgg.merge(Seq(
      spark.read.parquet(dir),
      IncrementalAgg.partials(gen2, keys, "v")), keys)
    val direct = IncrementalAgg.partials(gen1.unionByName(gen2), keys, "v")
    def st(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.view(df, keys).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(st(resumed) == st(direct))
  }
}
