package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress probe: replicate sf0.1 lineitem N× with shifted keys (so
  * group/join cardinalities grow with the data, like real scale-up — a
  * plain union would only deepen groups) and time the headline operators
  * at 1×/2×/4×. Near-linear wall-time growth is the local evidence that
  * the plans would survive a 100× cluster scale-up; anything quadratic
  * shows up immediately.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {

  def scaled(li: DataFrame, copies: Int): DataFrame =
    (0 until copies)
      .map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L)))
      .reduce(_ unionAll _)

  /** Scale documents by replication with a per-copy suffix on every
    * TOKEN — copy i's shingle set is disjoint from every other copy's
    * (a plain replica would be a 100% dup of its source, multiplying pair
    * output instead of testing candidate scaling) while token/shingle
    * counts and frequency shape match the original, and planted dups
    * WITHIN a copy remain dups.
    */
  def scaledDocs(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      // FIXED-WIDTH suffix: "c1" is a string PREFIX of "c10", so past
      // 10 copies a bare index makes cross-copy CHAR windows collide
      // (dup_spans' x16 run showed 62x match volume from exactly
      // this) — zero-padding keeps every copy's suffix the same
      // length and prefix-free, so shingles AND char windows stay
      // disjoint across copies at any ladder height
      val newText = regexp_replace(col("text"), "(\\S+)", f"$$1c$i%02d")
      // EVERY other column rides through unchanged (the r15 sf1 drive
      // found 20 queries erroring on a corpus that silently dropped
      // `source`/`n_chars` — and several of those reference literal
      // source values, so the domain must not be copy-suffixed either).
      // `n_chars` is the one derived column: the testdata invariant is
      // n_chars = length(text), and the suffixing changes the text, so
      // it is recomputed to keep the invariant true in the scaled corpus.
      // single select — every expression binds to the INPUT row, so
      // n_chars measures the suffixed text exactly once
      docs.select(docs.columns.map {
        case "doc_id" => (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id")
        case "text" => newText.as("text")
        case "n_chars" => length(newText).cast("long").as("n_chars")
        case c => col(c)
      }: _*)
    }.reduce(_ unionAll _)

  /** Scale the embeddings table by replication with DETERMINISTIC per-copy
    * jitter — exact copies would be near-dups of each other by
    * construction, inflating pair counts quadratically and masking the
    * real scaling behavior of the banded join.
    */
  def scaledEmb(emb: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000)).cast("double")
            / lit(1000.0) - lit(0.5)) * lit(0.2)).as("embedding"))
    }.reduce(_ unionAll _)

  /** Scale the embeddings keeping TRUE near-dup density LINEAR: copy i's
    * vectors all go through the same per-copy Rademacher sign flip (a
    * diagonal ±1 orthogonal transform keyed on (copy, dim)), which
    * preserves every within-copy cosine — planted near-dups included —
    * EXACTLY, while cross-copy cosines collapse toward zero (sign flips
    * destroy the shared per-dimension mean that makes unrelated vectors
    * of this table correlate; a mere dimension rotation would not).
    * [[scaledEmb]]'s jittered replicas of one base vector are genuine
    * near-dups of EACH OTHER, so on that fixture the true pair count
    * itself grows quadratically in copies and pair-output growth says
    * nothing about whether the ALGORITHM scales; this fixture makes
    * output growth an algorithmic signal again (measured truth:
    * 4137/8274/16548 pairs at 1×/2×/4×, 0 cross-copy).
    */
  def scaledEmbSign(emb: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      // non-geometry columns (`label`) ride through UNCHANGED: queries
      // reference literal label values (`label = 0`), and the sign flip
      // preserves within-copy geometry, so per-copy labels stay
      // consistent with their copy's vectors
      emb.select(emb.columns.map {
        case "vec_id" => (col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id")
        case "embedding" =>
          transform(col("embedding"), (x, j) =>
            when(pmod(xxhash64(lit(i), j), lit(2)) === 0, x).otherwise(-x)).as("embedding")
        case c => col(c)
      }: _*)
    }.reduce(_ unionAll _)

  /** [[scaledEmbSign]] plus `planted` near-identical twins per copy
    * (≈0.999 cosine to their source), probed at a threshold high enough
    * (0.6 ≈ 4.8σ for random 64-dim directions) that chance-level pairs
    * are negligible. Measured on the raw table: at 64 dims ANY threshold
    * low enough to catch its organic 0.35-band near-dups admits a
    * quadratic floor of pure-chance cross-copy pairs (0.35 is only
    * 2.8σ — ~0.26 % of all pairs pass at random), so linear pair-output
    * growth is structurally impossible there no matter the algorithm.
    * Planted twins + a 4.8σ threshold make the true pair count
    * `planted × copies` — exactly linear — so the probe's output growth
    * is finally an algorithmic signal.
    */
  def scaledEmbPlanted(emb: DataFrame, copies: Int, planted: Int): DataFrame = {
    val base = scaledEmbSign(emb, copies)
    val twins = base
      .filter(pmod(col("vec_id"), lit(100000000L)) < planted)
      .select(base.columns.map {
        case "vec_id" => (col("vec_id") + lit(50000000L)).as("vec_id")
        case "embedding" =>
          transform(col("embedding"), (x, j) =>
            x + (pmod(xxhash64(col("vec_id"), j), lit(1000)).cast("double")
              / lit(1000.0) - lit(0.5)) * lit(0.02)).as("embedding")
        case c => col(c)
      }: _*)
    base.unionAll(twins)
  }

  /** Scale events by replication with shifted user/event ids: the
    * sessionize window gets `copies`× more partitions at CONSTANT
    * per-user depth — the growth mode a bigger corpus actually has.
    */
  def scaledEvents(ev: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      ev.select(
        (col("event_id") + lit(i.toLong * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 100000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    li.groupBy("l_returnflag").count().collect() // warmup

    // optional CLI filter: `runMain graft.tools.ScaleProbe <probe-name>`
    val only = args.headOption
    // copy ladder, override with SPARK_GRAFT_PROBE_COPIES=1,2,4,8
    val copiesLadder = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    def timed(name: String, copies: Int)(body: => Long): Unit =
      if (only.forall(_ == name)) {
        val t0 = System.nanoTime()
        val n = body
        println(f"""{"probe":"$name","copies":$copies,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      }
    def time(name: String, copies: Int)(body: DataFrame => Long): Unit =
      timed(name, copies)(body(scaled(li, copies)))

    for (c <- copiesLadder) {
      time("q1_agg", c) { df =>
        df.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
          .collect().length.toLong
      }
      time("zorder_manifest", c) { df =>
        // layout_zorder's shape: 1-row bounds broadcast + map-side
        // quantize/interleave + one 256-group hash aggregate — the
        // ladder must stay flat-per-row (one scan, one tiny shuffle)
        import graft.operators.ZOrder
        val b = df.agg(
          min("l_extendedprice").as("mnx"), max("l_extendedprice").as("mxx"),
          min("l_quantity").as("mny"), max("l_quantity").as("mxy"))
        df.select(col("l_extendedprice").as("x"), col("l_quantity").as("y"))
          .crossJoin(broadcast(b))
          .select(
            ZOrder.bucketize("x", "mnx", "mxx", 8).as("bx"),
            ZOrder.bucketize("y", "mny", "mxy", 8).as("by"))
          .select(ZOrder.interleave("bx", "by", 8).as("z"))
          .groupBy(ZOrder.bucketOf("z", 8, 4).as("zb"))
          .agg(count(lit(1)))
          .collect().length.toLong
      }
      time("agg_ivm", c) { df =>
        // maint_agg_incremental's shape: three delta partials + one
        // group-bounded merge — per-delta cost linear, merge constant
        import graft.operators.IncrementalAgg
        val keys = Seq("l_returnflag")
        val base = df.filter(col("l_orderkey") % 3 =!= 2)
        val ins = df.filter(col("l_orderkey") % 3 === 2)
        val del = df.filter(col("l_orderkey") % 7 === 0)
        IncrementalAgg.view(IncrementalAgg.merge(Seq(
          IncrementalAgg.partials(base, keys, "l_quantity"),
          IncrementalAgg.partials(ins, keys, "l_quantity"),
          IncrementalAgg.partials(del, keys, "l_quantity", sign = -1)), keys), keys)
          .collect().length.toLong
      }
      time("minmax_ivm", c) { df =>
        // maint_minmax_incremental's shape: two window-ranked partials
        // (delta-bounded sorts, shared exchange), a group-bounded heap
        // merge, value-matched delete retraction, no-underflow repair
        // fast path — per-delta cost linear, state constant
        import graft.operators.MinMaxAgg
        val keys = Seq("l_returnflag")
        val v = "l_quantity"
        val base = df.filter(col("l_orderkey") % 3 =!= 2)
        val ins = df.filter(col("l_orderkey") % 3 === 2)
        val del = df.filter(col("l_orderkey") % 7 === 0)
        val merged = MinMaxAgg.mergeInserts(Seq(
          MinMaxAgg.partials(base, keys, v),
          MinMaxAgg.partials(ins, keys, v)), keys)
        val after = MinMaxAgg.applyDeletes(merged, del, keys, v)
        MinMaxAgg.view(
          MinMaxAgg.repair(after, df.filter(col("l_orderkey") % 7 =!= 0), keys, v),
          keys).collect().length.toLong
      }
      // r14 verdict item 7: ADVERSARIAL DELETE PRESSURE on the MIN/MAX
      // heaps — delete rate swept over the fraction of groups whose k+1
      // smallest values are retracted (guaranteed lo-heap exhaustion),
      // so 0% / 1% / 10% of ~40k groups underflow AT ONCE. The repair
      // path must stay semi-join-pruned: its wall cost should move with
      // the underflowed-group count, never approach a full-corpus
      // rebuild. The returned row count is the number of repaired
      // (underflowed) groups — the honesty metric for the ladder.
      for (pct <- Seq(0, 1, 10)) time(s"minmax_repair_p$pct", c) { df =>
        import graft.operators.MinMaxAgg
        import org.apache.spark.sql.expressions.Window
        val keys = Seq("gid")
        val kk = MinMaxAgg.DefaultK
        val df2 = df.select(
          (col("l_orderkey") % 40000L).as("gid"), col("l_extendedprice").as("v"))
        val w = Window.partitionBy("gid").orderBy("v", "l_orderkey")
        val tagged = df
          .select(
            (col("l_orderkey") % 40000L).as("gid"),
            col("l_extendedprice").as("v"), col("l_orderkey"))
          .withColumn("rn", row_number().over(w))
          .withColumn("hit",
            pmod(hash(col("gid")), lit(100)) < pct && col("rn") <= kk + 1)
        val del = tagged.filter(col("hit")).select("gid", "v")
        val survivors = tagged.filter(!col("hit")).select("gid", "v")
        val after = MinMaxAgg.applyDeletes(
          MinMaxAgg.partials(df2, keys, "v"), del, keys, "v")
        val bad = MinMaxAgg.underflowed(after, keys).count()
        MinMaxAgg.view(MinMaxAgg.repair(after, survivors, keys, "v"), keys)
          .queryExecution.toRdd.count()
        bad
      }
      time("collected_charge", c) { df =>
        // pipeline_collected_charge's shape: the replica fan is touched
        // twice (bounds + histogram, both map-side-partial hash aggs),
        // windows only over replica-sized groups — wall should track
        // the fan linearly
        import graft.analyses.{CollectedCharge => CC}
        val base = df.filter(col("l_linenumber").isin(1, 2))
          .groupBy("l_orderkey", "l_linenumber")
          .agg(min("l_extendedprice").as("p"))
          .select(
            col("l_orderkey").as("n_trigger"),
            (lit(100) + (col("l_orderkey") % 4) * 25).as("v"),
            concat(lit("dev"), col("l_linenumber").cast("string")).as("dev"),
            expr("FLOOR(p / 1.0e2)").as("charge"))
        val fan = CC.fanReplicas(base, "n_trigger", CC.DefaultReplicas)
        val mpvs = CC.mpvPerReplica(fan, Seq("v", "dev"), "charge")
        CC.sweepOverReplicas(mpvs, Seq("v", "dev")).collect().length.toLong
      }
      time("selfjoin_grid", c) { df =>
        val a = df.filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"), col("l_extendedprice").as("p1"))
        val b = df.filter(col("l_linenumber") === 2)
          .select(col("l_orderkey"), col("l_extendedprice").as("p2"))
        a.join(b, "l_orderkey").count()
      }
      time("window_half", c) { df =>
        graft.operators.Windows.firstHalf(
          df.select("l_orderkey", "l_linenumber", "l_quantity"),
          Seq("l_orderkey"), Seq(col("l_linenumber"), col("l_quantity"))).count()
      }
      time("flagship_tr", c) { df =>
        val base = df.filter(col("l_linenumber").isin(1, 2))
          .groupBy("l_orderkey", "l_linenumber")
          .agg(min("l_extendedprice").as("p"))
          .select(
            col("l_orderkey").as("n_trigger"),
            concat(lit("dev"), col("l_linenumber")).as("device_name"),
            (col("p") * lit(1e-9)).as("t0"))
        val wide = graft.analyses.TimeResolution.KGrid
          .foldLeft(base) { (d, k) => d.withColumn(s"t_$k (s)", col("t0") + lit(k * 1e-10)) }
          .drop("t0")
        graft.analyses.TimeResolution.run(
          wide, graft.analyses.TimeResolution.Config(
            "dev1", "dev2", replicas = 8, seed = 42L, iqrSpread = true)).count()
      }
      timed("sessionize", c) {
        // the e2 plan shape: one shuffle on user_id feeds lag + running
        // sum + the session aggregate; copies grow the PARTITION COUNT
        // of the window, never its depth
        import org.apache.spark.sql.expressions.Window
        val ev = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val w = Window.partitionBy("user_id").orderBy(col("tss"), col("event_id"))
        val t = ev.select(
          col("user_id"), col("event_id"), date_trunc("second", col("ts")).as("tss"))
        val marked = t.withColumn(
          "new_session",
          when(
            lag(col("tss"), 1).over(w).isNull ||
              (unix_timestamp(col("tss")) - unix_timestamp(lag(col("tss"), 1).over(w)) > 1800),
            1).otherwise(0))
        marked
          .withColumn(
            "session_id",
            sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"), min("tss"), max("tss"))
          .count()
      }
      timed("asof_join", c) {
        val ev = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
          .withColumn("us", unix_micros(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "us")
        val views = ev.filter(col("event_type") === "view")
          .select("user_id", "us", "value")
        graft.operators.AsOfJoin
          .asOf(clicks, views, Seq("user_id"), "us", "us", Seq("value")).count()
      }
      time("ks_sharded", c) { df =>
        // KS over a near-continuous value whose DISTINCT count grows
        // linearly with copies (price + copy-shifted key jitter) — the
        // regime where the old single-window cumulative became a
        // one-task sort and the sharded prefix must stay flat
        graft.functions.Stats.ks2Samp(
          df.filter(col("l_returnflag").isin("A", "R"))
            .withColumn(
              "__val",
              col("l_extendedprice") + col("l_orderkey").cast("double") / lit(1e9)),
          "__val", col("l_returnflag") === "A").collect().length.toLong
      }
      time("psi", c) { df =>
        // windowless by construction (broadcast 1-row range agg + ≤bins-row
        // hash agg) — probed to pin the expected flatness rather than
        // infer it from the plan shape
        graft.functions.Stats.psi(
          df.filter(col("l_returnflag").isin("A", "R")),
          "l_quantity", col("l_returnflag") === "A", bins = 20)
          .collect().length.toLong
      }
      time("chi2", c) { df =>
        // same windowless family as psi (one category-keyed hash agg,
        // totals from the ≤#cats relation) — pin the expected flatness
        graft.functions.Stats.chi2Homogeneity(
          df, "l_returnflag", col("l_linestatus") === "O")
          .collect().length.toLong
      }
      time("profile", c) { df =>
        // one-pass multi-column profile: count/nulls/distinct/min/max/mean
        // for three columns in a single aggregation
        graft.operators.Profile.describeNumeric(
          df, Seq("l_quantity", "l_extendedprice", "l_discount"))
          .collect().length.toLong
      }
      timed("lsh_pairs", c) {
        graft.operators.Similarity.lshNearDupPairs(
          scaledEmb(emb, c), "vec_id", "embedding",
          dim = 64, bands = 8, planesPerBand = 8, threshold = 0.35, seed = 42L).count()
      }
      timed("ivf_topk", c) {
        val e = scaledEmb(emb, c)
        val model = graft.operators.Ivf.train(e, "vec_id", "embedding",
          k = 16, iters = 3, seed = 11L)
        graft.operators.Ivf.searchTopK(e, "vec_id", "embedding", model,
          queryId = 0L, nprobe = 4, topK = 20).count()
      }
      timed("jaccard_prefix", c) {
        graft.operators.Dedup.prefixJaccardPairs(
          scaledDocs(docs, c), "doc_id", "text", k = 3, threshold = 0.5).count()
      }
      timed("minhash", c) {
        graft.operators.Dedup.minHashPairs(
          scaledDocs(docs, c), "doc_id", "text",
          k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5).count()
      }
      timed("dup_spans", c) {
        // per-copy token suffixes keep planted within-copy dups sharing
        // long char runs while cross-copy windows are disjoint — so the
        // position relation AND the match volume both grow linearly in
        // copies; anything super-linear means the window self-join is
        // pairing across copies
        graft.operators.Dedup.duplicateSpans(
          scaledDocs(docs, c), "doc_id", "text", w = 40).count()
      }
      timed("bpe_train", c) {
        // 8 merge rounds, each one explode + one hash aggregate + a
        // map-only replace over the word relation — expect LINEAR in
        // corpus size (the per-copy token suffixes shift WHICH pair
        // wins, but the loop's work is rows x rounds regardless)
        val scope = new graft.operators.CheckpointScope
        try {
          val (merges, _) = graft.queries.TextQueries
            .bpeChain(scaledDocs(docs, c), scope)
          scope.close()
          merges.length.toLong
        } catch { case t: Throwable => scope.closeAll(); throw t }
      }
      timed("keep_best_chain", c) {
        // the FULL dedup_keep_best composition end-to-end (pairs →
        // alternating-star components → quality → per-cluster winner):
        // each stage is probed alone elsewhere; this row pins the
        // COMPOSITION — the cluster-bounded ranking window must stay
        // cluster-sized as copies grow (per-copy suffixes keep clusters
        // within-copy, so cluster count grows linearly, sizes constant)
        val d = scaledDocs(docs, c)
        val pairs = graft.operators.Dedup.jaccardPairs(
          d, "doc_id", "text", k = 3, threshold = 0.5)
        val comp = graft.operators.Components.alternatingStar(
          d.select("doc_id"), pairs, "doc_id", "id_a", "id_b")
        val qual = d.select(
          col("doc_id"),
          (length(col("text")).cast("double") / lit(1000.0)).as("quality"))
        graft.operators.Dedup.resolveKeep(
          comp.join(qual, "doc_id"), "doc_id", "component", col("quality"))
          .filter(col("keep")).count()
      }
      timed("components", c) {
        // mirrors the REGISTERED dedup_components tier: plain shingle-join
        // pairs (PPJoin's window sorts replicate badly inside unrolled
        // multi-round plans) + the checked fixed-round propagation
        val d = scaledDocs(docs, c)
        val pairs = graft.operators.Dedup.jaccardPairs(
          d, "doc_id", "text", k = 3, threshold = 0.5)
        graft.operators.Components.labelPropagationChecked(
          d.select("doc_id"), pairs, "doc_id", "id_a", "id_b", iters = 6).count()
      }
      timed("components_star", c) {
        // the adversarial-depth tier on the same pair graph
        val d = scaledDocs(docs, c)
        val pairs = graft.operators.Dedup.jaccardPairs(
          d, "doc_id", "text", k = 3, threshold = 0.5)
        graft.operators.Components.alternatingStar(
          d.select("doc_id"), pairs, "doc_id", "id_a", "id_b").count()
      }
      timed("components_chain", c) {
        // adversarial DEPTH scaling: a planted single chain over every
        // scaled doc id (length n, 2n, 4n at 1×/2×/4×) — the worst graph
        // shape for round-based CC. Wall time should grow ~log(n) global
        // rounds after local contraction, not linearly with depth.
        val spark = docs.sparkSession
        val n = 10000L * c
        import spark.implicits._
        val nodes = spark.range(n).select(col("id").as("doc_id"))
        val pairsDf = spark.range(n - 1)
          .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
        graft.operators.Components.alternatingStar(
          nodes, pairsDf, "doc_id", "id_a", "id_b").count()
      }
      timed("decontam", c) {
        val d = scaledDocs(docs, c)
        graft.operators.Decontam.overlap(
          d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", k = 3, threshold = 0.5).count()
      }
      timed("incremental", c) {
        val d = scaledDocs(docs, c)
        graft.operators.Dedup.incrementalFlags(
          d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", graft.functions.TextFunctions.fingerprint,
          k = 3, threshold = 0.5).count()
      }
      time("tdigest", c) { df =>
        df.groupBy("l_returnflag")
          .agg(graft.functions.TDigest.quantilesAgg(
            col("l_extendedprice").cast("double"), Seq(0.25, 0.5, 0.75, 0.99)).as("q"))
          .collect().length.toLong
      }
      timed("lm_score", c) {
        // char-trigram LM: the model stays alphabet-bounded while the
        // corpus grows, so train + score should track corpus size
        val d = scaledDocs(docs, c)
        graft.operators.LmScore.score(d, d, "doc_id", "text").count()
      }
      timed("perplexity_mix", c) {
        // the CCNet-shaped pipeline via the SAME operator the registered
        // query ships (perplexityKeep over a scratch-materialized scored
        // table) — lang stands in for source: scaledDocs has no source
        val d = scaledDocs(docs, c)
        val model = graft.operators.LmScore.train(d, "doc_id", "text")
        val scored = graft.pipeline.PipelineStage.scratch(
          graft.operators.LmScore
            .scoreWith(model, d, "doc_id", "text", keep = Seq("lang")),
          "probe-perplexity-scored")
        graft.operators.Sampling.perplexityKeep(scored, "doc_id", "lang", budget = 5000L)
          .groupBy("lang").agg(count(lit(1)).as("n")).count()
      }
      timed("token_budget_sharded", c) {
        // the extreme-scale budget tier vs its stratum-window twin on the
        // same growing corpus: both should track corpus size (the sharded
        // tier pays TWO column-pruned corpus passes — shard totals, then
        // the fill — vs the window tier's one); its window partitions are
        // shard slices, so its flatness must not depend on the budget
        // staying under windowGroupLimitThreshold
        val d = scaledDocs(docs, c).select(
          col("doc_id"), col("lang"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("n_tokens"))
        graft.operators.Sampling.tokenBudgetCapFullSharded(
          d, "doc_id", Seq("lang"), col("n_tokens"), budget = 20000L, seed = 5)
          .groupBy("lang").agg(sum("n_tokens")).count()
      }
      timed("temperature_sharded", c) {
        // the sharded TEMPERATURE fill on the same growing corpus — its
        // flatness was previously inferred from the shared kernel with the
        // budget tier; this measures it. Extra work vs that tier: the
        // strata-weight aggregate feeding the broadcast targets relation.
        val d = scaledDocs(docs, c).select(col("doc_id"), col("lang"))
        graft.operators.Sampling.temperatureMixFullSharded(
          d, "doc_id", "lang", budget = 20000L, tau = 0.7, seed = 7)
          .groupBy("lang").agg(count(lit(1)).as("n")).count()
      }
      timed("token_budget_window", c) {
        val d = scaledDocs(docs, c).select(
          col("doc_id"), col("lang"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("n_tokens"))
        graft.operators.Sampling.tokenBudgetCapFull(
          d, "doc_id", Seq("lang"), col("n_tokens"), budget = 20000L, seed = 5)
          .groupBy("lang").agg(sum("n_tokens")).count()
      }
      timed("semantic_pairs", c) {
        // cluster-scoped near-dup at FIXED k: cells grow linearly with
        // the corpus, so within-cell pair work grows quadratically — the
        // measured reminder that k must scale with the corpus (the
        // cluster count, not the corpus, bounds per-cell cost)
        val e = scaledEmbPlanted(emb, c, planted = 200)
        val cents = graft.operators.Similarity.hyperplanes(8, dim = 64, seed = 7L).map { v =>
          val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
        }
        graft.operators.Similarity.clusterNearDupPairs(
          e, "vec_id", "embedding", graft.operators.Ivf.Model(cents), threshold = 0.6).count()
      }
      timed("semantic_pairs_auto", c) {
        // the production tier: k derived from the corpus (cells ≈
        // constant size) — the same probe should now grow ~linearly in
        // both output rows (truth = 200·copies planted twins) and wall
        val e = scaledEmbPlanted(emb, c, planted = 200)
        graft.operators.Similarity.clusterNearDupPairsAuto(
          e, "vec_id", "embedding", threshold = 0.6, targetCellSize = 512).count()
      }
      timed("embed_split", c) {
        // the pipeline_embed_split shape end to end: quality gate → exact
        // dedup → embedding join → banded-LSH near-dup drop → split →
        // stats. Scaled docs and embeddings share the same id offsets, so
        // the embedding join stays aligned across copies.
        val d = scaledDocs(docs, c)
        val e = scaledEmb(emb, c)
        val gated = d.select(
          col("doc_id"), col("lang"),
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
          .filter(col("n_tokens") >= 30)
        val keep = gated.groupBy("fp").agg(min("doc_id").as("keep_id"))
        val survivors = gated.join(keep, gated("doc_id") === keep("keep_id"), "left_semi")
        val withVec = survivors
          .join(e.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
            survivors("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("lang"), col("v"))
        val drops = graft.operators.Similarity
          .lshNearDupPairs(withVec.select(col("doc_id"), col("v")), "doc_id", "v",
            dim = 64, bands = 8, planesPerBand = 8, threshold = 0.92, seed = 42L)
          .select(col("id_b").as("doc_id")).distinct()
        val kept = withVec.join(drops, Seq("doc_id"), "left_anti")
          .withColumn("nrm", sqrt(graft.plans.VectorExpressions.dotFast(col("v"), col("v"))))
        graft.operators.Splits
          .trainValTest(kept, "doc_id", trainPct = 80, valPct = 10, seed = 7)
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n"), avg("nrm"))
          .collect().length.toLong
      }
      timed("pack_greedy", c) {
        // the sequential-fill tier: per-shard mapPartitions. Shard count
        // scales with the data (the training-file discipline), so the
        // per-task run length stays bounded — expect linear wall, no
        // single-task cliff.
        graft.operators.Packing
          .greedyPack(scaledDocs(docs, c), "doc_id", "text",
            seqLen = 512, nShards = 16 * c, seed = 11)
          .groupBy("shard")
          .agg(max("seq_id"), sum("n_tokens"))
          .collect().length.toLong
      }
      time("quantiles_sharded", c) { df =>
        // exact quantiles over a near-continuous value whose DISTINCT
        // count grows linearly with copies — same regime as ks_sharded
        // (the shared sharded-cumulative kernel must stay flat-ish)
        graft.functions.Stats.exactQuantiles(
          df.withColumn(
            "__val",
            col("l_extendedprice") + col("l_orderkey").cast("double") / lit(1e9)),
          "__val", Seq(0.25, 0.5, 0.75, 0.9, 0.99)).collect().length.toLong
      }
      timed("winnow", c) {
        // the REGISTERED relation tier: positions explode + per-doc
        // windows — linear, vectorized (the array-lambda form measured
        // ~185 s on this ladder: interpreted HOF slices copy O(len·k)
        // cells per doc AND the tiny-file scan gave it one partition)
        graft.functions.TextFunctions
          .winnowFingerprintsRel(scaledDocs(docs, c), "doc_id", "text", k = 5, w = 4)
          .groupBy("fp").agg(count(lit(1)))
          .count()
      }
      timed("dsir", c) {
        // model relation stays vocabulary-bounded while the corpus grows
        // (per-copy token suffixes multiply the vocab by `copies` here —
        // still broadcast-sized); scoring is one broadcast join pass
        val d = scaledDocs(docs, c)
        graft.operators.Dsir.selectTop(
          graft.operators.Dsir.importanceWeights(
            d, "doc_id", "text", col("lang") === "en"),
          "doc_id", k = 100).count()
      }
      timed("curriculum", c) {
        // sharded ranks under a FULL-RANGE key + broadcast counts — the
        // no-global-window training-order key must track corpus size
        val d = scaledDocs(docs, c).select(col("doc_id"), col("lang"))
        graft.operators.Sampling.curriculumStride(
          d, "doc_id", "lang", xxhash64(col("doc_id"), lit(13))).count()
      }
      timed("logreg", c) {
        // 5 GD iterations = 5 scans with broadcast beta; expect ~linear
        val d = scaledDocs(docs, c)
        val toks = graft.functions.TextFunctions.tokenCount(col("text"))
        val feats = d.select(
          lit(1.0).as("intercept"),
          (toks / lit(100.0)).as("tok_x"),
          (graft.functions.TextFunctions
            .wordHits(col("text"), Seq("the", "and", "of", "to", "is", "a"))
            .cast("double") / toks).as("stop_r"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
        graft.operators.LogReg.train(
          feats, Seq("intercept", "tok_x", "stop_r"), col("y")).count()
      }
      timed("resample_interp", c) {
        // per-user windows at constant depth; copies multiply the user
        // count (scaledEvents shifts user ids) — expect linear
        val ev = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        graft.operators.Resample.linearInterpolate(
          ev, "user_id", col("ts"), col("value"), bucketSeconds = 21600L).count()
      }
      time("pagerank", c) { df =>
        // copies shift l_orderkey, so the edge set (customer→shifted
        // supplier-space) grows ~linearly; 6 integer iterations of
        // edges-join-ranks — the canonical iterative-shuffle op
        val edges = df.select(
          (col("l_orderkey") % 1500L).as("src"),
          (col("l_suppkey") + (col("l_orderkey") - col("l_orderkey") % 100000000L)
            / 100000000L * 10000L + lit(1000000L)).as("dst"))
          .distinct()
        graft.operators.PageRank.fixedPoint(edges, iters = 6).count()
      }
      timed("curation_pipeline", c) {
        // the capstone five-stage plan over a growing corpus: gate +
        // dedup + tournament cap + sharded curriculum + report — every
        // stage scan/hash-bound, expect ~linear
        val d = scaledDocs(docs, c)
          .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20L))))
          .withColumn("n_chars", length(col("text")).cast("long"))
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val gated = d.filter(size(toks) >= 50)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            size(toks).cast("long").as("n_words"),
            graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        val keep = gated.groupBy("fp").agg(min("doc_id").as("keep_id"))
        val ded = gated.join(keep, gated("doc_id") === keep("keep_id"), "left_semi").drop("fp")
        val capped = graft.operators.Sampling.domainCap(
          ded, "doc_id", "source", Seq(col("n_chars").desc, col("doc_id")), k = 200)
        graft.operators.Sampling.curriculumStride(
          capped.select("doc_id", "lang", "n_words"), "doc_id", "lang",
          xxhash64(col("doc_id"), lit(17)))
          .groupBy("lang")
          .agg(count(lit(1)), sum("n_words"), min("vt"), max("vt"))
          .count()
      }
      timed("incremental_cc", c) {
        // incremental component maintenance: prior labels (star edges) +
        // batch-vs-all pairs only — cost should track the BATCH + one
        // corpus shingle scan, with merge rounds bounded by chaining
        val d = scaledDocs(docs, c)
        val corpus = d.filter(col("doc_id") % 10 =!= 0)
        val batch = d.filter(col("doc_id") % 10 === 0)
        val prior = graft.operators.Components.alternatingStar(
          corpus.select("doc_id"),
          graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.5),
          "doc_id", "id_a", "id_b")
          .localCheckpoint(true) // the production state is LOADED, not recomputed — time only the update
        val t0 = System.nanoTime()
        val n = graft.operators.Components.incrementalUpdate(
          prior, "doc_id", "component", batch.select("doc_id"),
          graft.operators.Dedup.jaccardPairsAgainst(batch, d, "doc_id", "text", k = 3, threshold = 0.5),
          "id_a", "id_b").count()
        println(f"""{"probe":"incremental_cc_update_only","copies":$c,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        n
      }
      timed("label_prop", c) {
        // copies shift BOTH orderkey and suppkey: c disjoint replicas of
        // the co-occurrence graph — node and edge counts grow linearly,
        // exactly how a bigger corpus grows a dedup-family graph. Wall
        // should track edges; per-round work is one edge-partitioned
        // join + per-node windows bounded by degree.
        val l = (0 until c).map(i => li.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_linenumber"),
          (col("l_suppkey") + lit(i.toLong * 10000000L)).as("l_suppkey")))
          .reduce(_ unionAll _)
        val pairs = l.as("l1")
          .join(l.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_linenumber") === 1 && col("l2.l_linenumber") === 2 &&
              col("l1.l_suppkey") =!= col("l2.l_suppkey"))
          .select(
            least(col("l1.l_suppkey"), col("l2.l_suppkey")).as("u"),
            greatest(col("l1.l_suppkey"), col("l2.l_suppkey")).as("v"))
          .distinct()
        graft.operators.LabelProp.propagate(pairs, iters = 5).count()
      }
      timed("kcore", c) {
        val l = (0 until c).map(i => li.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_linenumber"),
          (col("l_suppkey") + lit(i.toLong * 10000000L)).as("l_suppkey")))
          .reduce(_ unionAll _)
        val pairs = l.as("l1")
          .join(l.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_linenumber") === 1 && col("l2.l_linenumber") === 2 &&
              col("l1.l_suppkey") =!= col("l2.l_suppkey"))
          .select(
            least(col("l1.l_suppkey"), col("l2.l_suppkey")).as("u"),
            greatest(col("l1.l_suppkey"), col("l2.l_suppkey")).as("v"))
          .distinct()
        graft.operators.KCore.core(pairs, k = 3, rounds = 6).count()
      }
      timed("cms_counters", c) {
        // sketch state is d×w cells regardless of input size: wall must
        // track the scan (map-side partial aggregation), never the value
        // count — the definitional CMS scale property
        val vals = scaled(li, c).select(col("l_partkey").as("v"))
          .filter(col("v").isNotNull)
        graft.operators.CountMin.counters(vals, d = 4, w = 512).count()
      }
      timed("snapshot_diff", c) {
        // one full-outer hash join on the key; copies grow both sides
        // linearly with disjoint key ranges — classic CDC between crawls
        val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        val o = (0 until c).map(i => ord.select(
          (col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))
          .reduce(_ unionAll _)
        val v2 = o.filter(col("o_orderkey") % 97 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .unionByName(o.filter(col("o_orderkey") % 101 === 0)
            .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
              lit("P").as("o_orderstatus"), col("o_totalprice")))
        graft.operators.Snapshot.diff(o, v2,
          Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
          .groupBy("change").count().count()
      }
      timed("spearman", c) {
        // two sharded-rank relations; copies multiply ROWS and (via the
        // orderkey shift) the price column's distinct-value count — the
        // near-continuous case the sharding exists for
        val l = scaled(li, c).withColumn(
          "px", col("l_extendedprice") + col("l_orderkey") % 97)
        graft.functions.Stats.spearman(l, "l_quantity", "px").count()
      }
      timed("hll_registers", c) {
        // register state is 2^p cells at ANY input size: wall must track
        // the scan, output rows stay 256
        val vals = scaled(li, c)
          .select((col("l_partkey") + col("l_orderkey") % 1000003).as("v"))
          .filter(col("v").isNotNull)
        graft.operators.Hll.registers(vals).count()
      }
      timed("adamic_adar", c) {
        // disjoint graph replicas (same fixture as label_prop/kcore):
        // wedge volume grows linearly when hubs don't — the documented
        // Σdeg² contract
        val l = (0 until c).map(i => li.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_linenumber"),
          (col("l_suppkey") + lit(i.toLong * 10000000L)).as("l_suppkey")))
          .reduce(_ unionAll _)
        val pairs = l.as("l1")
          .join(l.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_linenumber") === 1 && col("l2.l_linenumber") === 2 &&
              col("l1.l_suppkey") =!= col("l2.l_suppkey"))
          .select(
            least(col("l1.l_suppkey"), col("l2.l_suppkey")).as("u"),
            greatest(col("l1.l_suppkey"), col("l2.l_suppkey")).as("v"))
          .distinct()
        graft.operators.LinkPredict.adamicAdar(pairs, k = 20).count()
      }
      timed("adamic_adar_capped", c) {
        // the ADVERSARIAL axis for the capped tier: suppkeys are NOT
        // shifted across copies, so the same supplier nodes gain ~c×
        // the co-occurrence edges — node DEGREES grow with copies and
        // the exact tier's Σdeg² wedge volume grows ~quadratically.
        // The capped tier truncates every adjacency at 64, so its
        // wedge volume (≤ n·64²) — and its wall time — must stay flat
        // while degrees climb: the production-tier scale argument
        // measured, not asserted.
        val l = (0 until c).map(i => li.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_linenumber"), col("l_suppkey")))
          .reduce(_ unionAll _)
        val pairs = l.as("l1")
          .join(l.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_linenumber") === 1 && col("l2.l_linenumber") === 2 &&
              col("l1.l_suppkey") =!= col("l2.l_suppkey"))
          .select(
            least(col("l1.l_suppkey"), col("l2.l_suppkey")).as("u"),
            greatest(col("l1.l_suppkey"), col("l2.l_suppkey")).as("v"))
          .distinct()
        graft.operators.LinkPredict.adamicAdarCapped(pairs, k = 20, maxDeg = 64)
          .count()
      }
      time("basket_lift", c) { df =>
        // copies grow ORDERS linearly with a constant brand alphabet:
        // the pair join is keyed on the order, so join volume grows
        // linearly with baskets and the output stays ≤ brands² rows
        val ob = df
          .select(col("l_orderkey").as("o"),
            (col("l_partkey") % 25).cast("string").as("b"))
          .distinct()
        val sa = ob.groupBy("b").agg(count(lit(1)).as("s"))
        ob.select(col("o"), col("b").as("ba"))
          .join(ob.select(col("o").as("o2"), col("b").as("bb")),
            col("o") === col("o2") && col("ba") < col("bb"))
          .groupBy("ba", "bb").agg(count(lit(1)).as("s_ab"))
          .join(broadcast(sa.select(col("b").as("ba"), col("s").as("s1"))), "ba")
          .count()
      }
      timed("interval_join", c) {
        // copies grow points AND intervals linearly (disjoint hour
        // ranges via the orderkey shift trick on events-like longs);
        // join volume = points + interval spans/width — an equi shuffle
        val ev = graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet")
          .withColumn("us", unix_micros(col("ts")))
        val pts = (0 until c).map(i => ev
          .filter(col("event_type") === "purchase")
          .select((col("us") + lit(i.toLong * 4000000000000L)).as("us"), col("value")))
          .reduce(_ unionAll _)
        val hot = (0 until c).map(i => ev
          .filter(col("event_type") === "view")
          .select((col("us") + lit(i.toLong * 4000000000000L)).as("us")))
          .reduce(_ unionAll _)
          .groupBy(expr("us div 3600000000").as("hb"))
          .agg(count(lit(1)).as("nv")).filter(col("nv") >= 4)
          .select(col("hb"),
            (col("hb") * 3600000000L - 1800000000L).as("lo"),
            (col("hb") * 3600000000L + 5400000000L).as("hi"))
        graft.operators.IntervalJoin
          .pointInInterval(pts, hot, "us", "lo", "hi", 3600000000L)
          .groupBy("hb").count().count()
      }
      timed("ppr", c) {
        // same disjoint-replica growth as the pagerank probe; seeds
        // replicate per copy so walk mass stays local to each replica
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_custkey", "o_orderkey")
        val edges = (0 until c).map { i =>
          val oo = o.select(
            (col("o_custkey") + lit(i.toLong * 10000000L)).as("src0"),
            (col("o_orderkey") + lit(i.toLong * 100000000L)).as("ok"))
          val ll = li.select(
            (col("l_orderkey") + lit(i.toLong * 100000000L)).as("ok2"),
            (col("l_suppkey") + lit(i.toLong * 10000000L) + 1000000L).as("dst"))
          oo.join(ll, col("ok") === col("ok2"))
            .select(col("src0").as("src"), col("dst"))
        }.reduce(_ unionAll _).distinct()
        val seeds = (0 until c).map(i =>
          o.groupBy((col("o_custkey") + lit(i.toLong * 10000000L)).as("node"))
            .agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("node")).limit(5).select("node"))
          .reduce(_ unionAll _)
        graft.operators.PageRank.personalized(edges, seeds, iters = 10).count()
      }
      timed("domain_cap_skew", c) {
        // 90% of rows in ONE head domain: the salted tournament must keep
        // wall flat-ish (stage-1 windows bounded by salt fan-in) where the
        // naive single-window form would funnel 90% of the corpus into one
        // task.
        val d = scaledDocs(docs, c).select(
          col("doc_id"),
          when(pmod(col("doc_id"), lit(10L)) < 9, lit("head"))
            .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(7L)))).as("domain"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
        graft.operators.Sampling
          .domainCap(d, "doc_id", "domain",
            Seq(col("n_tok").desc, col("doc_id")), k = 100)
          .count()
      }
      time("assortativity", c) { df =>
        // shifted l_orderkey grows the customer side of the purchase
        // graph linearly; degrees and half-edge count scale with copies,
        // the Pearson aggregate stays constant-output
        val edges = df
          .select(
            (pmod(col("l_orderkey"), lit(15000L)) + col("l_orderkey") / lit(100000000L)
              * lit(15000L)).cast("long").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
          .distinct()
        val h = edges.select("src", "dst")
          .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        val deg = h.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        h.join(deg.select(col("node").as("nu"), col("deg").as("j")), col("src") === col("nu"))
          .join(deg.select(col("node").as("nv"), col("deg").as("k")), col("dst") === col("nv"))
          .agg(count(lit(1)), sum(col("j") * col("k"))).collect().length.toLong
      }
      time("kendall_joint", c) { df =>
        // copies deepen joint-relation cell counts, never its width:
        // the pair join stays |X|·|Y|-bounded by the documented contract
        graft.functions.Stats
          .kendallTau(df, "l_quantity", "l_discount").collect().length.toLong
      }
      time("kruskal_cells", c) { df =>
        // per-copy value offset grows the DISTINCT-value relation
        // linearly (the sharded-cumulative stress, like ks_sharded);
        // plain replication would only deepen cells
        val shifted = df.withColumn(
          "v", col("l_quantity") + (col("l_orderkey") / lit(100000000L))
            .cast("long").cast("double") * lit(50.0))
        graft.functions.Stats
          .rankedCells(shifted, "l_returnflag", "v")
          .agg(sum(col("__c") * (lit(2) * col("__r") - col("__ct") + lit(1))))
          .collect().length.toLong
      }
      time("clustering_coeff", c) { df =>
        // shifted l_orderkey mints new orders → edge count and the
        // degree relation grow linearly; triangle work is bounded by
        // the degree-ordered orientation
        val l = df.select("l_orderkey", "l_linenumber", "l_suppkey")
        val edges = l.as("l1")
          .join(l.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_linenumber") === 1 && col("l2.l_linenumber") === 2 &&
              col("l1.l_suppkey") =!= col("l2.l_suppkey"))
          .select(
            (col("l1.l_suppkey") + (col("l1.l_orderkey") / lit(100000000L))
              .cast("long") * lit(1000000L)).as("u"),
            (col("l2.l_suppkey") + (col("l2.l_orderkey") / lit(100000000L))
              .cast("long") * lit(1000000L)).as("v"))
          .distinct()
        val canon = edges
          .select(least(col("u"), col("v")).as("u"),
            greatest(col("u"), col("v")).as("v")).distinct()
        val tri = graft.operators.Triangles.triangleStats(edges)
        val w = canon.select(col("u").as("n"))
          .unionAll(canon.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
          .agg(expr("CAST(SUM(deg * (deg - 1)) DIV 2 AS BIGINT)").as("nw"))
        tri.crossJoin(broadcast(w)).collect().length.toLong
      }
      timed("attribution_band", c) {
        // per-copy user shift: band-join candidates grow linearly (the
        // per-user series is constant per copy), k-agg is
        // purchase-cardinality
        val ev = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val e = ev.select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("es"))
        val lc = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("es").as("tl"))
        val r = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("ur"), col("event_id").as("purchase_id"),
            col("es").as("tr"), floor(col("es") / 120).cast("long").as("br"))
        val probe = lc.withColumn("pb",
          explode(array(
            floor(col("tl") / 120).cast("long") - 1,
            floor(col("tl") / 120).cast("long"),
            floor(col("tl") / 120).cast("long") + 1)))
        val pairs = probe
          .join(r, col("user_id") === col("ur") && col("pb") === col("br"))
          .filter(abs(col("tl") - col("tr")) <= 120)
          .select("user_id", "click_id", "purchase_id")
        val k = pairs.groupBy("purchase_id").agg(count(lit(1)).as("k"))
        pairs.join(k, "purchase_id")
          .groupBy("user_id", "click_id")
          .agg(round(graft.functions.DetAgg.dsumP(lit(1.0) / col("k")), 6))
          .count()
      }
      time("hits", c) { df =>
        // shifted l_orderkey mints per-copy orders and the suppkey shift
        // mints per-copy suppliers → nodes AND edges grow ×c; per-round
        // cost is two edge joins + two hash aggs, linear in edges
        val copyOf = (col("l_orderkey") / lit(100000000L)).cast("long")
        val edges = df.select(
          col("l_orderkey").as("src"),
          (col("l_suppkey") + copyOf * lit(1000000L) + lit(1000000L)).as("dst"))
          .distinct()
        graft.operators.Hits.fixedPoint(edges, iters = 8).count()
      }
      timed("truncation_recall", c) {
        // corpus grows ×c, the 8-query side is fixed → brute scoring is
        // linear in corpus; the salted tournament keeps every top-k cut
        // partition bounded regardless of corpus size
        val e = scaledEmbSign(emb, c)
        graft.operators.Similarity.truncationRecall(
          e, "vec_id", "embedding", 0L to 7L, truncDims = 32, k = 10).count()
      }
      time("kuiper_cells", c) { df =>
        // per-copy value offset grows the distinct-value relation ×c —
        // same sharded-cumulative kernel as ks_sharded/kruskal_cells
        val shifted = df.withColumn(
          "v", col("l_extendedprice") + (col("l_orderkey") / lit(100000000L))
            .cast("long").cast("double") * lit(1.0e6))
        graft.functions.Stats.kuiper1Samp(shifted, "v").collect().length.toLong
      }
      timed("changepoint_series", c) {
        // copies multiply rows per hourly bucket; the prefix-scan series
        // is calendar-bounded and constant — expect FLAT
        val evs = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val b = evs
          .groupBy(floor(unix_timestamp(col("ts")) / 3600).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
        val spk = graft.plans.ScalarExpressions.singlePartitionKey(col("bucket"))
        val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(spk).orderBy("bucket")
        val wCum = wOrd.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val t = b.agg(count(lit(1)).as("nb"), sum("n").cast("long").as("s"))
        b.select(col("bucket"), row_number().over(wOrd).cast("long").as("k"),
          sum("n").over(wCum).as("p"))
          .crossJoin(broadcast(t))
          .filter(col("k") < col("nb"))
          .select(col("bucket"),
            (col("p").cast("double") * col("p").cast("double") / col("k").cast("double")
              + (col("s") - col("p")).cast("double") * (col("s") - col("p")).cast("double")
                / (col("nb") - col("k")).cast("double")
              - col("s").cast("double") * col("s").cast("double") / col("nb").cast("double"))
              .as("gain"))
          .orderBy(col("gain").desc, col("bucket")).limit(1).count()
      }
      time("percent_rank", c) { df =>
        // the w6 kernel alone: sharded distinct-value cumulative + hash
        // join back to rows — distinct-value count AND row count both
        // grow ×c (shifted keys leave prices shared, so scale the value
        // by the copy index via the shifted orderkey's copy band)
        graft.functions.Stats.percentRank(
          df.select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice")
              + (col("l_orderkey") / lit(100000000L)).cast("long")
                .cast("double") * lit(0.000001)).as("v")),
          "v").count()
      }
      timed("rfm_scores", c) {
        // per-copy user shift: the user relation grows ×c → three
        // sharded percent-rank drives over a growing relation
        val evs = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val e = evs.select(
          col("user_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("es"),
          col("value"))
        val u = e.groupBy("user_id").agg(
          max("es").as("last_es"),
          count(lit(1)).as("freq"),
          graft.functions.DetAgg.dsum(col("value")).as("mon"))
        def sc(df: DataFrame, cn: String, a: String) =
          graft.functions.Stats.percentRank(df, cn)
            .withColumn(a,
              least(floor(col("pct_rank") * 5).cast("long") + 1, lit(5L)))
            .drop("pct_rank")
        sc(sc(sc(u, "last_es", "r"), "freq", "f"), "mon", "m")
          .groupBy("r", "f", "m").agg(count(lit(1))).count()
      }
      timed("cumulative_users", c) {
        // users grow ×c but the cumulative window's relation stays one
        // row per calendar day — expect FLAT
        val evs = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val spk = graft.plans.ScalarExpressions.singlePartitionKey(col("day"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(spk)
          .orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        evs.select(col("user_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("es"))
          .groupBy("user_id").agg(min("es").as("fes"))
          .groupBy(expr("fes div 86400").as("day"))
          .agg(count(lit(1)).as("nu"))
          .select(col("day"), sum("nu").over(w).as("cum"))
          .count()
      }
      timed("pq_distortion", c) {
        // corpus-linear: one posexplode (m rows/vec) + broadcast m·k
        // codebook join + two hash aggregates
        val e = scaledEmb(emb, c)
        val m = 8; val k = 16; val subDim = 8
        val books = {
          val flat = graft.operators.Similarity.hyperplanes(m * k, dim = subDim, seed = 23L)
          (0 until m).toArray.map(s => (0 until k).toArray.map(j => flat(s * k + j)))
        }
        graft.operators.Pq.distortion(
          e, "vec_id", "embedding", graft.operators.Pq.Model(books))
          .collect().length.toLong
      }
      timed("burstiness", c) {
        // scaledDocs suffixes every token per copy → vocabulary AND the
        // (doc, token) relation grow ×c; the top-50 cut is TakeOrdered
        val d = scaledDocs(docs, c)
        val tf = d.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("cc"))
        val dfq = tf.groupBy("t").agg(
          count(lit(1)).as("df"), sum("cc").cast("long").as("s1"),
          sum(col("cc") * col("cc")).cast("long").as("s2"))
        val top = dfq.orderBy(col("df").desc, col("t")).limit(50)
        val nd = d.agg(count(lit(1)).as("n_docs"))
        top.crossJoin(broadcast(nd)).collect().length.toLong
      }
      timed("centroid_drift", c) {
        // vectors ×c → posexplode relation ×c; the centroid relation
        // stays (labels × halves × dims)-bounded
        val e = scaledEmb(emb, c).select(
          col("vec_id"), (col("vec_id") % 10).cast("int").as("label"),
          col("embedding").cast("array<double>").as("v"))
        val m = e.select(col("label"), pmod(col("vec_id"), lit(2)).as("h"),
          posexplode(col("v")).as(Seq("d", "x")))
          .groupBy("label", "h", "d")
          .agg(graft.functions.DetAgg.davg(col("x")).as("mu"))
        m.groupBy("label").agg(count(lit(1))).collect().length.toLong
      }
      timed("time_to_convert", c) {
        // per-copy user shift: pairs grow linearly, the quantile kernel
        // is distinct-dt-bounded
        val evs = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val e = evs.select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("es"))
        val lc = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("es").as("tl"))
          .withColumn("pb", explode(array(
            floor(col("tl") / 300).cast("long"),
            floor(col("tl") / 300).cast("long") + 1)))
        val r = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("ur"), col("es").as("tr"),
            floor(col("es") / 300).cast("long").as("br"))
        val d = lc.join(r, col("user_id") === col("ur") && col("pb") === col("br"))
          .filter(col("tr") >= col("tl") && col("tr") - col("tl") <= 300)
          .groupBy("click_id").agg(min(col("tr") - col("tl")).as("dt"))
        graft.functions.Stats.exactQuantiles(d, "dt", Seq(0.5, 0.9, 0.99))
          .collect().length.toLong
      }
      time("trimmed_cells", c) { df =>
        // per-copy value offset grows the distinct-value relation ×c —
        // the sharded cumulative kernel under the trimming algebra
        val shifted = df.withColumn(
          "v", col("l_extendedprice") + (col("l_orderkey") / lit(100000000L))
            .cast("long").cast("double") * lit(1.0e6))
        graft.functions.Stats.trimmedMean(shifted, "v", 0.1)
          .collect().length.toLong
      }
      timed("knn_accuracy", c) {
        // sign-flip replicas keep within-copy structure; cells grow with
        // the corpus, per-cell pair work stays bounded by cell size
        val e = scaledEmbSign(emb, c).withColumn(
          "label", (col("vec_id") % 10).cast("int"))
        val cents = graft.operators.Similarity.hyperplanes(8, dim = 64, seed = 7L)
          .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
        val knn = graft.operators.Similarity.clusterKnnGraph(
          e, "vec_id", "embedding", graft.operators.Ivf.Model(cents), k = 5)
          .select("src", "dst")
        val lab = e.select(col("vec_id").as("lv"), col("label"))
        knn.join(lab, col("dst") === col("lv"))
          .groupBy(col("src"), col("label").as("nl"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("src")
          .agg(max_by(col("nl"), struct(col("cnt"), -col("nl"))).as("vote"))
          .count()
      }
      timed("user_streaks", c) {
        // per-copy user shift: users ×c, per-user island windows stay
        // bounded by each user's active-day count
        val evs = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("day")
        evs.select(col("user_id"),
          (unix_timestamp(date_trunc("second", col("ts")))
            .cast("long") / 86400).cast("long").as("day"))
          .distinct()
          .withColumn("island", col("day") - row_number().over(w))
          .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max("len").as("ms"))
          .groupBy("ms").agg(count(lit(1)))
          .count()
      }
      timed("ks_exp_cells", c) {
        // per-copy user shift: deltas ×c rows; the sharded ECDF kernel's
        // relation is bounded by DISTINCT delta values
        val evs = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("es"), col("event_id"))
        val deltas = evs.select(col("user_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("es"),
          col("event_id"))
          .withColumn("nxt", lead(col("es"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select((col("nxt") - col("es")).as("delta"))
        graft.functions.Stats.ks1Exp(deltas, "delta").collect().length.toLong
      }
      timed("heaps_cells", c) {
        // scaledDocs: docs ×c, per-copy token suffixes grow the vocab ×c
        // — both the first-doc aggregate and the dual-weight sharded
        // cumulative scale with the corpus
        val d = scaledDocs(docs, c)
        val tok = d.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
        val dt = tok.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
        val nv = tok.groupBy("t").agg(min("doc_id").as("fd"))
          .groupBy(col("fd").as("nvdoc")).agg(count(lit(1)).as("nnew"))
        val j = dt.join(nv, col("doc_id") === col("nvdoc"), "left")
          .select(col("doc_id"), col("ntok"),
            coalesce(col("nnew"), lit(0L)).as("nnew"))
        val keyed = j.withColumn(
          "__shard",
          shiftright(
            graft.plans.ScalarExpressions.sortableBits(col("doc_id").cast("double")),
            52) + lit(1L << 11))
        keyed.groupBy("__shard")
          .agg(sum("ntok").as("s1"), sum("nnew").as("s2"))
          .count()
      }
      timed("ewma_lags", c) {
        // copies multiply rows per hourly bucket; the bucket series —
        // and so the 20-lag grid join — is calendar-bounded and constant
        val ev = scaledEvents(
          graft.streaming.EventsStream.readBatch(spark, s"$sfDir/events.parquet"), c)
        val b = ev
          .withColumn("bucket", floor(unix_timestamp(col("ts")) / 3600).cast("long"))
          .groupBy("bucket")
          .agg((sum(graft.functions.DetAgg.dec(col("value"))) * 1000000)
            .cast("long").as("x"))
        graft.functions.Stats.ewmaTrunc(b, "bucket", "x").count()
      }
      timed("edit_distance", c) {
        // wave-56 tier, the one r12 operator without a ladder cell
        // (r12 verdict item 7). Short-string relation: variable-length
        // document prefixes (25 length buckets) on a 10% doc sample.
        // Copy i's tag is ('a'+i) REPEATED 3+5·i TIMES: tag-length gaps
        // of 5 > 2·maxDist push every cross-copy pair OUTSIDE the
        // admissible band, so candidates AND survivors grow linearly —
        // the occupancy-CONSTANT regime (length spread grows with the
        // corpus) where length banding is the right tool. The converse
        // regime — occupancy growing linearly under a fixed length
        // distribution — makes ANY length-band candidate set grow
        // quadratically by construction; that is the domain boundary in
        // the operator's scaladoc (route long uniform-length text to
        // the shingle tiers), not a plan defect this cell could fix.
        val names = (0 until c).map { i =>
          docs.filter(col("doc_id") % 10 === 0).select(
            (col("doc_id") + lit(i.toLong * 100000000L)).as("nid"),
            concat(
              expr("substring(text, 1, 20 + CAST(doc_id % 25 AS INT))"),
              lit(('a' + i).toChar.toString * (3 + 5 * i))).as("nm"))
        }.reduce(_ unionAll _)
        graft.operators.Dedup.editDistancePairs(
          names, id = "nid", text = "nm", maxDist = 2).count()
      }
      timed("fuzzy_keys", c) {
        // j_fuzzy_keys' kernel on a ×c supplier-name relation (r14
        // verdict item 2). Copy tags of stride-5 lengths push every
        // cross-copy pair outside the ±2 admissible band, so candidates
        // AND survivors grow LINEARLY in c (each copy joins only
        // within itself) — the r13 crossJoin form grew as c² by
        // construction. Sub-quadratic wall at ×8 is the pass criterion.
        val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
          .select(col("s_suppkey"), col("s_name"))
        val names = (0 until c).map { i =>
          sup.select(
            (col("s_suppkey") + lit(i.toLong * 100000000L)).as("nid"),
            concat(col("s_name"),
              lit(('a' + i).toChar.toString * (3 + 5 * i))).as("nm"))
        }.reduce(_ unionAll _)
        graft.operators.Dedup.editDistancePairs(
          names, id = "nid", text = "nm", maxDist = 2).count()
      }
      timed("fuzzy_keys_uniform", c) {
        // the UNIFORM-LENGTH regime (r14 sf1 knee): every copy's tag has
        // the SAME length but pairwise distance 3 > k, so true pairs are
        // exactly linear while length banding sees ONE bucket holding
        // the whole relation (candidates ×c²). The deletion-variant
        // tier's buckets track near-dup density instead — sub-quadratic
        // wall here is what fixed j_fuzzy_keys at sf1.
        val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
          .select(col("s_suppkey"), col("s_name"))
        val names = (0 until c).map { i =>
          sup.select(
            (col("s_suppkey") + lit(i.toLong * 100000000L)).as("nid"),
            concat(col("s_name"),
              lit(('a' + i).toChar.toString * 3)).as("nm"))
        }.reduce(_ unionAll _)
        graft.operators.Dedup.editDistancePairsByDeletion(
          names, id = "nid", text = "nm", maxDist = 2).count()
      }
    }
    spark.stop()
  }
}
