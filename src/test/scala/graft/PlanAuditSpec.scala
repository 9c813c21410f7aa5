package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape audits on real parquet: the properties that keep the
  * engine viable at 100 TB — filters reaching the scan, column pruning,
  * broadcast for small dims, map-side partial aggregation, and no
  * cartesian products where an equi-join belongs. */
class PlanAuditSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def planOf(prql: String): String = {
    val df = Graft.compileDir(prql, spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("filters push down to the parquet scan") {
    val p = planOf(
      """from lineitem
        |filter l_quantity > 45
        |select [l_orderkey, l_quantity]""".stripMargin)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"),
      s"no pushed filter in plan:\n$p")
  }

  test("column pruning reaches the scan (2-column projection reads 2+sort columns, not 16)") {
    val df = Graft.compileDir(
      """from lineitem
        |select [l_orderkey, l_quantity]""".stripMargin, spark, dir)
    val scan = df.queryExecution.executedPlan.toString
    val m = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(scan)
    assert(m.isDefined, s"no ReadSchema in:\n$scan")
    val cols = m.get.group(1).split(",").length
    assert(cols == 2, s"expected 2 read columns, got $cols: ${m.get.group(1)}")
  }

  test("joining a small dim broadcasts it (no shuffle of the fact side)") {
    val p = planOf(
      """from orders
        |join customer [o_custkey == c_custkey]
        |group c_mktsegment (aggregate [n = count])
        |sort c_mktsegment""".stripMargin)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast join for small dim:\n$p")
  }

  test("group-aggregate uses two-phase hash aggregation (map-side partial)") {
    val df = Graft.compileDir(
      """from lineitem
        |group l_returnflag (aggregate [n = count])""".stripMargin, spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final HashAggregate:\n$p")
  }

  test("equi-join conditions never degrade to cartesian products") {
    val p = planOf(
      """from orders
        |join customer [o_custkey == c_custkey]
        |take 10""".stripMargin)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"equi-join planned as product:\n$p")
  }

  test("whole-stage codegen covers the scan-filter-project hot path") {
    val p = planOf(
      """from lineitem
        |filter l_quantity > 45
        |derive v = l_extendedprice * (1 - l_discount)
        |select [l_orderkey, v]""".stripMargin)
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
  }

  test("global-sort window carries a compile-time scale diagnostic") {
    val (_, diags) = Graft.compileWithDiagnostics(
      """from nation
        |sort n_nationkey
        |derive [p = lag 1 n_name]""".stripMargin,
      spark, Graft.parquetCatalog(spark, dir))
    assert(diags.exists(_.contains("single partition")))
    // partitioned window: no diagnostic
    val (_, d2) = Graft.compileWithDiagnostics(
      """from orders
        |group o_custkey (
        |  sort o_orderkey
        |  derive [p = lag 1 o_totalprice]
        |)""".stripMargin,
      spark, Graft.parquetCatalog(spark, dir))
    assert(!d2.exists(_.contains("single partition")))
  }

  test("pipeline materialization barriers are real (localCheckpoint, not a hint)") {
    // p04/p08/p12/p21 materialize their reused HOF-computed arrays behind
    // localCheckpoint (PipelineOps.materialized): the consumer plan must
    // start from the materialized partitions (Scan ExistingRDD), because
    // CollapseProject inlines through a REPARTITION hint and re-evaluates
    // the array once per lambda reference (measured 28.5 s vs ~2 s on p21
    // at sf0.1 — see the materialized() doc). Also: no round-robin exchange
    // may sneak in (a literal REPARTITION(32) would cap any cluster at 32
    // tasks), and the barrier itself must not add one.
    Seq("p04_minhash_lsh", "p08_ann_srp_lsh", "p12_lang_id",
        "p21_decontam", "p28_contamination_matrix").foreach { q =>
      val p = pipeline.PipelineOps.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("Scan ExistingRDD"),
        s"$q: expected the materialized barrier (Scan ExistingRDD) in:\n$p")
      assert(!p.contains("RoundRobinPartitioning"),
        s"$q: fixed-width round-robin exchange survives in:\n$p")
    }
  }

  test("the barrier property holds under every spark.graft.barrier mode") {
    // The 100 TB story must not rest on localCheckpoint alone (its blocks
    // are non-replicated and lineage-truncating): each configured strategy
    // must (a) produce identical results, and (b) leave the consumer plan
    // reading MATERIALIZED data — Scan ExistingRDD for the checkpoint
    // modes, InMemoryTableScan for persistDisk — never the re-inlined
    // producing plan (which would re-run p12's score arrays per reference).
    import graft.pipeline.Barrier
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val base = pipeline.PipelineOps.queries("p12_lang_id")(spark, dir)
      .collect().map(_.toString).sorted
    val modes = Seq(
      "checkpoint" -> "Scan ExistingRDD",
      "persistDisk" -> "InMemoryTableScan")
    try {
      modes.foreach { case (mode, expectNode) =>
        spark.conf.set(Barrier.ModeKey, mode)
        spark.conf.set(Barrier.DirKey, ckDir)
        val df = pipeline.PipelineOps.queries("p12_lang_id")(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains(expectNode),
          s"$mode: expected $expectNode as the barrier node in:\n$p")
        assert(df.collect().map(_.toString).sorted.sameElements(base),
          s"$mode: results diverge from localCheckpoint mode")
      }
      // p16's iterative loop under a non-default barrier: label propagation
      // must still converge to the same clusters (exercises the per-round
      // release path too)
      spark.conf.set(Barrier.ModeKey, "persistDisk")
      val p16a = pipeline.PipelineOps.queries("p16_dedup_clusters")(spark, dir)
        .collect().map(_.toString).sorted
      spark.conf.set(Barrier.ModeKey, "localCheckpoint")
      val p16b = pipeline.PipelineOps.queries("p16_dedup_clusters")(spark, dir)
        .collect().map(_.toString).sorted
      assert(p16a.sameElements(p16b))
      // unknown mode is a loud error, not a silent localCheckpoint
      spark.conf.set(Barrier.ModeKey, "replicatedMagic")
      intercept[IllegalArgumentException] {
        pipeline.PipelineOps.queries("p12_lang_id")(spark, dir)
      }
    } finally {
      spark.conf.set(Barrier.ModeKey, "localCheckpoint")
      spark.conf.unset(Barrier.DirKey)
    }
  }

  test("p13 sessionization shuffles user data exactly once") {
    // windows + per-session rollup all ride one hashpartitioning(user_id…)
    // (HashPartitioning on a key prefix satisfies the rollup's clustered
    // distribution); the only other exchange is the output sort
    val p = pipeline.PipelineOps.queries("p13_sessionize")(spark, dir)
      .queryExecution.executedPlan.toString
    val hashParts = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(hashParts == 1, s"expected one user_id shuffle, plan:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"unexpected extra hash shuffle:\n$p")
  }

  test("p01 exact dedup aggregates in two phases over one hash shuffle") {
    val p = pipeline.PipelineOps.queries("p01_dedup_exact")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final HashAggregate:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash shuffle:\n$p")
  }

  test("p21 decontamination broadcasts the eval gram set, no per-gram rows") {
    val p = pipeline.PipelineOps.queries("p21_decontam")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"),
      s"eval gram array should broadcast, plan:\n$p")
    // VERDICT r4 #3: the training side must answer membership against the
    // broadcast eval array per-doc — never explode into per-gram rows (the
    // r4 form's explode → join → groupBy). No Generate node may appear.
    assert(!p.contains("Generate"),
      s"training side must not explode per-gram rows, plan:\n$p")
  }

  test("p21 chunked path: bounded bucket fanout, no per-gram training-side rows") {
    // VERDICT r5 #3: with decontamBuckets=B the training side may generate
    // at most B bucket rows per doc (the transform(sequence(0,B-1)) split),
    // never one row per gram. Exactly two Generates are legal: the EVAL
    // side's per-gram explode (fixed-size benchmark set, sanctioned) and
    // the bounded bucket split; the bucket split must be the sequence form.
    spark.conf.set("spark.graft.decontamBuckets", "16")
    try {
      val p = pipeline.PipelineOps.queries("p21_decontam")(spark, dir)
        .queryExecution.optimizedPlan.toString
      val generates = "Generate".r.findAllIn(p).length
      assert(generates == 2, s"expected eval explode + bucket split only, plan:\n$p")
      // training side: explode of a transform over the CONSTANT bucket array
      // (sequence(0,B-1) constant-folds to an UnsafeArrayData literal) —
      // bounded fanout, never explode of the raw gram array
      // exactly ONE bounded bucket-split Generate; the other Generate is the
      // eval side's per-gram explode (its textual form varies with project
      // collapse — explode(gs) or explode(<inlined gram expr>) — so only
      // the count is pinned)
      assert("Generate explode\\(transform\\(".r.findAllIn(p).length == 1,
        s"training-side Generate must be the bounded bucket split, plan:\n$p")
      // the per-doc shared-gram count is one grouped sum over bucket rows
      // (physically a partial+final HashAggregate pair around the doc_id
      // shuffle — same contract PlanAuditSpec pins for p01)
      assert("Aggregate \\[doc_id".r.findFirstIn(p).isDefined, s"plan:\n$p")
    } finally spark.conf.unset("spark.graft.decontamBuckets")
  }

  test("p21 salted chunked path: salt replicate is bounded, still no per-gram training rows") {
    // VERDICT r6 #1 sub-split: B=2 at the suite's 4 shuffle partitions →
    // salt S=2, which adds exactly ONE more bounded Generate (the eval-side
    // explode(sequence(0,1)) replicate — S rows per eval bucket). The
    // training side must still only emit the B-bounded bucket split.
    spark.conf.set("spark.graft.decontamBuckets", "2")
    try {
      assert(pipeline.PipelineOps.decontamSalt(spark, 2) == 2)
      val p = pipeline.PipelineOps.queries("p21_decontam")(spark, dir)
        .queryExecution.optimizedPlan.toString
      val generates = "Generate".r.findAllIn(p).length
      assert(generates == 3,
        s"expected eval gram explode + salt replicate + bucket split, plan:\n$p")
      assert("Generate explode\\(transform\\(".r.findAllIn(p).length == 1,
        s"training-side Generate must be the bounded bucket split, plan:\n$p")
      assert("Aggregate \\[doc_id".r.findFirstIn(p).isDefined, s"plan:\n$p")
    } finally spark.conf.unset("spark.graft.decontamBuckets")
  }

  test("p23 packing: the corpus-sized window is chunk-partitioned, never global") {
    // the whole point of the two-level prefix sum: the window over
    // documents-sized data must ride Exchange hashpartitioning(chunk) —
    // parallel across chunks — and the only SinglePartition exchange
    // allowed is the one under the per-chunk-TOTALS running sum (row count
    // = chunk count ~ N/64, driver-small). The chunk-offset relation must
    // come back as a broadcast, not a shuffle join.
    val p = pipeline.PipelineOps.queries("p23_pack_sequences")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(chunk".r.findAllIn(p).nonEmpty,
      s"corpus window must partition by chunk:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"more than the one sanctioned tiny-relation SinglePartition exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"chunk offsets should broadcast back onto the corpus:\n$p")
  }

  test("p25 quantized retrieval: barrier holds and candidate scoring uses the kernel") {
    // the quantized relation is materialized once (Scan ExistingRDD) —
    // without the barrier CollapseProject re-runs the per-element
    // quantization lambda once per scored pair; the query set broadcasts;
    // the dot products run in the GraftDot codegen kernel (visible in the
    // analyzed plan; the executed plan starts from the barrier).
    val df = pipeline.PipelineOps.queries("p25_embed_quant")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"),
      s"expected the materialized quantized relation (Scan ExistingRDD):\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the 20-query side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scoring must stay a broadcast nested-loop over != keys, never cartesian:\n$p")
    val analyzed = df.queryExecution.analyzed.toString.toLowerCase
    assert(analyzed.contains("graftdot"),
      s"dot products should use the native kernel:\n${analyzed.take(2000)}")
    // the quant PRODUCER (behind the barrier) must also use the kernel for
    // its norms, not an interpreted fold
    val prod = spark.sql(pipeline.PipelineOps.quantSqlForAudit)
      .queryExecution.analyzed.toString.toLowerCase
    assert(prod.contains("graftdot"),
      s"quantized norms should use the native kernel:\n${prod.take(2000)}")
  }

  test("p27 epoch shuffle rides exactly one shard-key shuffle") {
    // hash + shard assignment are map-side; the per-shard position window
    // and the rollup both ride the single hashpartitioning(shard) exchange
    // (the rollup's clustered distribution is satisfied by the window's);
    // the only other exchange is the output sort. No global-order window
    // may appear — shard files are independent, which is the design.
    val p = pipeline.PipelineOps.queries("p27_shuffle_shard")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(shard".r.findAllIn(p).nonEmpty,
      s"expected the shard-key exchange:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global window/exchange belongs in the shard path:\n$p")
  }

  test("p24 mixture rates broadcast back; only the two sanctioned rollup shuffles") {
    // phase 1 rollup (counts by lang) + final rollup = 2 hash exchanges;
    // the one-row totals and the tiny rates relation come back as
    // broadcasts, never a shuffle join; the single SinglePartition
    // exchange is the one-row global totals aggregate.
    val p = pipeline.PipelineOps.queries("p24_mixture_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).length <= 2,
      s"extra shuffle in the mixture sampler:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"rates must broadcast onto documents:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"only the one-row totals aggregate may single-partition:\n$p")
  }

  test("p33 posting explosion is the only Generate; tf collapses before the term shuffle") {
    // postings explode once (the semantics), then per-doc tf partial-aggs
    // map-side BEFORE the (doc_id, term) exchange, and the term rollup is
    // the second exchange. n_docs rides a broadcast one-row join.
    val p = pipeline.PipelineOps.queries("p33_term_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 1,
      s"exactly one posting explosion is sanctioned:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length <= 2,
      s"tf/term rollups ride two shuffles, no more:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      s"partial+final aggregation expected at both levels:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the one-row n_docs must broadcast:\n$p")
  }

  test("p34 as-of join shuffles the union once, never a range join product") {
    // the tagged-union window rides exactly one hashpartitioning(user_id)
    // (both last(...IGNORE NULLS) columns share the window spec); there is
    // no join operator at all — the whole point vs the exploding
    // range-join formulation
    val p = pipeline.PipelineOps.queries("p34_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"expected one user_id shuffle:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"unexpected extra shuffle:\n$p")
    assert(!p.contains("Join"), s"the windowed as-of must not contain a join:\n$p")
  }

  test("hot-path folds run in the native kernels, not interpreted lambdas") {
    // graft_minhash / graft_top_terms replaced interpreted aggregate()
    // accumulator folds (no codegen, no CSE for lambda bodies). The plans
    // must show the kernels; an `aggregate(...)` reappearing in these
    // operators means someone regressed to the slow path. The minhash
    // kernel lives in the sig PRODUCER plan (consumers start from the
    // materialization barrier), so audit that plan directly.
    pipeline.PipelineOps.queries("p04_minhash_lsh")(spark, dir) // registers + views
    val sigs = spark.sql(pipeline.PipelineOps.lshSigsSqlForAudit)
      .queryExecution.analyzed.toString.toLowerCase
    assert(sigs.contains("graftminhash"),
      s"sig computation should use the native kernel:\n${sigs.take(2000)}")
    assert(!sigs.contains("aggregate(array_sort"),
      "sig computation regressed to the interpreted accumulator fold")
    val p14 = pipeline.PipelineOps.queries("p14_top_terms")(spark, dir)
      .queryExecution.analyzed.toString.toLowerCase
    assert(p14.contains("grafttopterms"),
      s"p14 should use the native kernel:\n${p14.take(2000)}")
    assert(!p14.contains("aggregate(array_sort"),
      "p14 regressed to the interpreted accumulator fold")
  }

  test("p16 iterative label propagation breaks lineage between rounds") {
    // the unrolled-CTE form planned 64 parquet scans (subtree doubling per
    // round); the iterative localCheckpoint form must leave the final plan
    // a small rollup over materialized labels. Exactly ONE parquet scan is
    // legitimate: the singleton-reattach left join reads documents pruned
    // to doc_id (the label loop itself runs over edge-incident nodes only
    // and must contribute zero rescans).
    val df = pipeline.PipelineOps.queries("p16_dedup_clusters")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected only the singleton-reattach scan in the final p16 plan, got $scans:\n$p")
  }

  test("p22 final plan reads parquet once; pairs and labels stay materialized") {
    // same shape as the p16 audit: the SRP pair relation is behind a
    // Barrier and the label loop checkpoints per round, so the only
    // legitimate parquet scan in the FINAL plan is the singleton-reattach
    // read of embeddings pruned to vec_id. More scans means the band join
    // or a label round leaked back into the keep-list plan.
    val df = pipeline.PipelineOps.queries("p22_embed_dedup")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected only the singleton-reattach scan in the final p22 plan, got $scans:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      "p22 keep-list plan must not contain a cartesian product")
  }

  test("p36 chunker is one narrow stage: a single Generate, zero hash shuffles") {
    // the chunk explosion is the only row amplification, and nothing in
    // the plan shuffles — at 100 TB the chunker scales purely with input
    // splits (the trailing rangepartitioning sort is the oracle gate's,
    // not the operator's)
    val p = pipeline.PipelineOps.queries("p36_chunk_sliding")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 1,
      s"exactly one chunk explosion is sanctioned:\n$p")
    assert("hashpartitioning".r.findAllIn(p).isEmpty,
      s"the chunker must not shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the chunker:\n$p")
  }

  test("p37 rank window and funnel rollup share one source-key shuffle") {
    // row_number partitions by source; the rollup groups by the SAME key,
    // so its clustered distribution is satisfied by the window's exchange
    // — one hashpartitioning total, and partial aggregation still applies
    // above the window
    val p = pipeline.PipelineOps.queries("p37_domain_quota")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(source".r.findAllIn(p).length == 1,
      s"expected the one source-key exchange:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"window and rollup must share a single shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the quota path:\n$p")
  }

  test("p38 redaction is pure map-side: zero shuffles, zero row amplification") {
    val p = pipeline.PipelineOps.queries("p38_pii_redact")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).isEmpty,
      s"redaction must not shuffle:\n$p")
    assert("Generate".r.findAllIn(p).isEmpty,
      s"redaction must not amplify rows:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the redaction path:\n$p")
  }

  test("p39 incremental dedup: fingerprint-keyed equi-joins only, no global stage") {
    // base-distinct, batch rank window, and the classify join all key on
    // fp — every exchange is a hashpartitioning (AQE may broadcast the
    // small base side instead), never a cartesian or single partition
    val p = pipeline.PipelineOps.queries("p39_incremental_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"classify must stay an equi-join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the ingest path:\n$p")
    assert("hashpartitioning\\(fp".r.findAllIn(p).nonEmpty || p.contains("BroadcastExchange"),
      s"expected fp-keyed exchanges or a broadcast base:\n$p")
  }

  test("p40 rare-token score: common set broadcasts back; posting explosion is the only Generate") {
    // the term rollup is the one data shuffle; the one-row common array
    // is the sanctioned SinglePartition aggregate (p21's eval_arr idiom)
    // and must come back as a broadcast, never a shuffled or cartesian
    // join; per-doc scoring is map-side after it
    val p = pipeline.PipelineOps.queries("p40_rare_token_score")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 1,
      s"exactly one posting explosion is sanctioned:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the one-row common set must broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the scoring path:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"only the one-row common aggregate may single-partition:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length <= 1,
      s"the term rollup is the only hash shuffle:\n$p")
  }

  test("p44 running-sum window and funnel rollup share one lang-key shuffle") {
    val p = pipeline.PipelineOps.queries("p44_token_budget")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(lang".r.findAllIn(p).length == 1,
      s"expected the one lang-key exchange:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"window and rollup must share a single shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the budget path:\n$p")
  }

  test("p46 weighted sample: salted two-stage windows, no whole-stratum sort") {
    // stage 1 must partition by (lang, salt-bucket) — the skew escape — and
    // stage 2 by lang over only the k·S survivors; neither window may
    // collapse to a global partition
    val p = pipeline.PipelineOps.queries("p46_weighted_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(lang[^,]*, b".r.findAllIn(p).nonEmpty,
      s"stage-1 exchange must key on (lang, b):\n$p")
    assert("hashpartitioning\\(lang#\\d+, \\d+\\)".r.findAllIn(p).nonEmpty,
      s"stage-2 exchange must key on lang alone:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the sample path:\n$p")
    assert(!p.contains("No Partition Defined"),
      s"no unpartitioned window belongs in the sample path:\n$p")
  }

  test("p47 boilerplate: frequent-line set broadcasts back; the explosion is the only Generate") {
    // the line-df rollup owns the line-key shuffles; the one-row frequent
    // array is the sanctioned single-partition aggregate (p40's idiom) and
    // must return as a broadcast; the rewrite is map-side after it
    val p = pipeline.PipelineOps.queries("p47_boilerplate_lines")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 1,
      s"exactly one line explosion is sanctioned:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the one-row frequent set must broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the rewrite path:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"only the one-row frequent aggregate may single-partition:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length <= 2,
      s"the (line,doc) distinct and line-df rollup are the only hash shuffles:\n$p")
  }

  test("p48 bloom dedup: membership gate is a map-side subquery filter before the verify join") {
    // the sketch builds once (scalar subquery over the base), ships as a
    // literal into a might_contain FILTER on the batch side — pruning
    // definitely-new docs before any join — and the exact verify join
    // stays an equi-join on the content hash
    val p = pipeline.PipelineOps.queries("p48_bloom_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"the bloom membership gate must appear as a filter:\n$p")
    assert(p.contains("bloom_filter_agg") || p.contains("Subquery"),
      s"the sketch must build via the scalar-subquery aggregate:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"verify must stay an equi-join:\n$p")
    // the sketch subquery is ONE physical exchange but prints at every
    // consumer site — count distinct plan ids, not textual occurrences
    val singleIds = "Exchange SinglePartition.*?plan_id=(\\d+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(singleIds.size <= 1,
      s"only the one-row sketch aggregate may single-partition:\n$p")
  }

  test("p49 embed outlier: centroid table broadcasts back; no single-partition stage at all") {
    // the fixed quantization scale keeps everything before the rollups
    // map-side (no global-max aggregate); the (label, dim) centroid rollup
    // is tiny (|labels|·dim rows) and must return to the exploded relation
    // as a broadcast, never by shuffling the big side
    val p = pipeline.PipelineOps.queries("p49_embed_outlier")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length <= 2,
      s"only the posting explosion(s) of the twice-consumed relation:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the centroid table must broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the scoring path:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the outlier path:\n$p")
  }

  test("p51 tokenize: vocab join broadcasts; the word explode is the only Generate") {
    val df = pipeline.PipelineOps.queries("p51_bpe_tokenize")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 1,
      s"one word explosion is sanctioned:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the vocab-sized token map must broadcast, not shuffle the corpus:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the encode path:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the encode path:\n$p")
  }

  test("p54 substring dedup: two sanctioned explodes, gram-keyed join, no cartesian") {
    // the gram stream has two consumers (df rollup, back-join), so CTE
    // inlining recomputes the narrow window explode — the DELIBERATE
    // 100 TB trade (re-tokenizing beats materializing a K×-corpus
    // intermediate); with the coverage explode that is 3 Generates, and
    // a 4th would mean an unsanctioned row amplification. The
    // duplicated-gram set is unbounded so the back-join must stay a
    // gram-key equi-join (shuffle or AQE broadcast), never a cartesian
    val p = pipeline.PipelineOps.queries("p54_substring_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 3,
      s"window explode (×2 consumers) + coverage explode only:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"the gram back-join must stay an equi-join:\n$p")
    assert("hashpartitioning\\(gh".r.findAllIn(p).nonEmpty || p.contains("BroadcastExchange"),
      s"expected gram-keyed exchanges (or an AQE broadcast at test scale):\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the span-audit path:\n$p")
  }

  test("p55 NB classifier: V-bounded rollup, one-row model broadcasts, scoring map-side") {
    // Generates: the token explode + the 256-bucket domain generator; the
    // bucket rollup is the one corpus hash shuffle; the model/prior/total
    // one-row aggregates are the sanctioned SinglePartition stages and
    // must come back as broadcasts (never a shuffled join of the corpus)
    val p = pipeline.PipelineOps.queries("p55_nb_quality")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 2,
      s"only the token explode and the bucket-domain generator are sanctioned:\n$p")
    assert("hashpartitioning\\(b".r.findAllIn(p).nonEmpty,
      s"expected the bucket-keyed training rollup:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 256-slot model must broadcast back:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the scoring path:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 3,
      s"only the model/prior/total one-row aggregates may single-partition:\n$p")
  }

  test("p56 BM25: zero corpus explodes, salted two-stage rank, query set broadcasts") {
    val p = pipeline.PipelineOps.queries("p56_bm25")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"tf must come from the map-side HOF, never a corpus explode:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the query struct and idf table must broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the retrieval path:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"only the corpus-stats one-row aggregate may single-partition:\n$p")
    assert(!p.contains("No Partition Defined"),
      s"no unpartitioned window belongs in the ranking path:\n$p")
  }

  test("p57 JL projection is pure map-side: broadcast planes, zero shuffles") {
    val p = pipeline.PipelineOps.queries("p57_jl_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"projection must not amplify rows before the long-form output:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 16-row plane table must broadcast:\n$p")
    assert("hashpartitioning".r.findAllIn(p).isEmpty,
      s"no hash shuffle belongs in a map-side projection:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the projection path:\n$p")
  }

  test("p58/p59 extraction and policy filter are pure map-side") {
    Seq("p58_html_extract", "p59_blocklist").foreach { op =>
      val p = pipeline.PipelineOps.queries(op)(spark, dir)
        .queryExecution.executedPlan.toString
      assert("Generate".r.findAllIn(p).isEmpty, s"$op must not amplify rows:\n$p")
      assert("hashpartitioning".r.findAllIn(p).isEmpty, s"$op must not shuffle:\n$p")
      assert(!p.contains("Exchange SinglePartition"),
        s"no global stage belongs in $op:\n$p")
    }
  }

  test("session carries the scale configs the 100 TB contract depends on") {
    // Graft.localSession is the one place these are set; losing any of them
    // silently degrades cluster behavior (AQE re-planning incl. skew-join
    // splitting, shuffle width, UTC determinism)
    val c = spark.conf
    assert(c.get("spark.sql.adaptive.enabled") == "true")
    assert(c.get("spark.sql.adaptive.skewJoin.enabled", "true") == "true")
    assert(c.get("spark.sql.session.timeZone") == "UTC")
    assert(c.get("spark.sql.shuffle.partitions").toInt > 0)
  }

  test("deep positional offset carries a diagnostic; plain take does not") {
    val cat = Graft.parquetCatalog(spark, dir)
    val (_, d1) = Graft.compileWithDiagnostics("from orders\nsort o_orderkey\ntake 1000..1010", spark, cat)
    assert(d1.exists(_.contains("positional")))
    val (_, d2) = Graft.compileWithDiagnostics("from orders\nsort o_orderkey\ntake 10", spark, cat)
    assert(d2.isEmpty)
  }

  test("p60 simhash pairs: band equi-join, never a cartesian or global stage") {
    // Generates: the twin-fixture struct explode + the two band explodes.
    // The candidate stage must be an EQUI-join on (band, band_value) —
    // shuffle-hash/sort-merge on the band key, or an AQE broadcast at test
    // scale — the Manku table-lookup shape; a cartesian would mean the
    // pigeonhole rewrite silently degraded to all-pairs.
    val p = pipeline.PipelineOps.queries("p60_simhash_pairs")(spark, dir)
      .queryExecution.executedPlan.toString
    // (the twin-fixture UNION ALL and the sig fold live in the barrier-
    // materialized sigs view — the pair plan starts from its leaf)
    assert("Generate".r.findAllIn(p).length == 2,
      s"the two band explodes only:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"band candidates must come from an equi-join:\n$p")
    assert("hashpartitioning\\(band".r.findAllIn(p).nonEmpty || p.contains("BroadcastExchange"),
      s"expected band-keyed exchanges (or an AQE broadcast at test scale):\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the pair path:\n$p")
  }

  test("p61 bigram LM: slot-bounded rollup, one-row model broadcasts, scoring map-side") {
    // p55's audit contract, bigram edition: the training explode + the
    // 4096-slot domain generator are the only Generates; the slot rollup
    // is the one corpus hash shuffle (map-side partials bound every
    // partition at 4096 rows); the model collapses to a one-row array
    // that broadcasts; scoring is a map-side integer fold
    val p = pipeline.PipelineOps.queries("p61_bigram_ppx")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 2,
      s"only the bigram explode and the slot-domain generator are sanctioned:\n$p")
    assert("hashpartitioning\\(slot".r.findAllIn(p).nonEmpty,
      s"expected the slot-keyed training rollup:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 4096-slot model must broadcast back:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the scoring path:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"only the model one-row aggregate may single-partition:\n$p")
  }

  test("p62 FIM transform is pure map-side: zero shuffles, zero row amplification") {
    val p = pipeline.PipelineOps.queries("p62_fim_transform")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).isEmpty,
      s"the augmentation pass must not shuffle:\n$p")
    assert("Generate".r.findAllIn(p).isEmpty,
      s"one output row per document — no amplification:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the augmentation path:\n$p")
  }

  test("p63 paragraph dedup: one explosion; keep-first rollup, rewrite join and reassembly are the only shuffles") {
    // the duplicated-paragraph relation is corpus-sized and unbounded, so
    // the rewrite join is an honest shuffle equi-join (at gate SF AQE may
    // elect broadcast — the audit pins what must NOT appear, not the
    // strategy): no cartesian, no global stage, and at most the three
    // sanctioned hash shuffles (ph min rollup, ph rewrite join, doc_id
    // reassembly)
    val p = pipeline.PipelineOps.queries("p63_paragraph_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    // two explosions, NOT one: the occurrence relation feeds both the
    // keep-first rollup (column-pruned to hashes) and the rewrite side
    // (which must carry the paragraph text anyway) — p54's inherent
    // two-pass class; a materialization barrier would write the corpus
    // text to disk instead
    assert("Generate".r.findAllIn(p).length == 2,
      s"the rollup-side and rewrite-side paragraph explosions are the only Generates:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the rewrite path:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the dedup path:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length <= 3,
      s"ph rollup, ph rewrite join and doc_id reassembly are the only hash shuffles:\n$p")
  }

  test("p64 DSIR: slot-bounded rollup from one training explode, signed model broadcasts, scoring map-side") {
    // p61's audit contract with the ratio model: the single corpus bigram
    // explode + the 4096-slot domain generator are the only Generates
    // (target counts are a conditional sum over the SAME exploded rows —
    // a second corpus pass here would double training I/O); the model
    // collapses through the slot rollup to one-row aggregates (tot and
    // the packed array — both over the 4096-row slot table, never the
    // corpus) and broadcasts back; scoring is a map-side integer fold
    val p = pipeline.PipelineOps.queries("p64_dsir_select")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 2,
      s"only the bigram explode and the slot-domain generator are sanctioned:\n$p")
    assert("hashpartitioning\\(slot".r.findAllIn(p).nonEmpty,
      s"expected the slot-keyed training rollup:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 4096-slot ratio model must broadcast back:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the scoring path:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 2,
      s"only the slot-table totals and the packed-model aggregate may single-partition:\n$p")
  }

  test("p65 span corruption is pure map-side: zero shuffles, zero row amplification") {
    // p62's audit contract: the span table is a per-doc array HOF chain
    val p = pipeline.PipelineOps.queries("p65_span_corrupt")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).isEmpty,
      s"the augmentation pass must not shuffle:\n$p")
    assert("Generate".r.findAllIn(p).isEmpty,
      s"one output row per document — no amplification:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the augmentation path:\n$p")
  }

  test("p66 soft-dedup weights: one content-hash window shuffle, no join, no global stage") {
    val p = pipeline.PipelineOps.queries("p66_softdedup_weights")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"the multiplicity window owns the single hash shuffle:\n$p")
    assert(!p.toLowerCase.contains("join"),
      s"multiplicity comes from a window, never a self-join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the reweighting path:\n$p")
  }

  test("p67 SemDeDup: codebook broadcasts in assignment; pair join is a c_id equi-join") {
    // assignment pass: the deliberate corpus × codebook scoring must ride
    // a BROADCAST of the √N-sized codebook (the p19 IVF contract), never
    // a cartesian of two shuffled sides
    graft.functions.GraftFunctions.registerDot(spark)
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("embeddings")
    val hf = pipeline.PipelineOps.hashFamily(spark)
    val ranked = spark.sql(pipeline.PipelineOps.p67RankedSpark(hf))
      .queryExecution.executedPlan.toString
    assert(ranked.contains("BroadcastExchange") || ranked.contains("BroadcastNestedLoopJoin"),
      s"the codebook must broadcast:\n$ranked")
    assert(!ranked.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the assignment path:\n$ranked")
    // full operator: the within-cluster pair generation is an equi-join on
    // c_id over the barrier-materialized assignment — cluster-bounded pair
    // volume, never corpus × corpus
    val p = pipeline.PipelineOps.queries("p67_semantic_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("cartesianproduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the pair join must stay a c_id equi-join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join for the pair generation:\n$p")
  }

  test("p77 bitext margins: deliberate exact pair baseline, linear window chain, no re-scan") {
    // the src×tgt scoring is the p07-class DELIBERATE exact baseline (one
    // side broadcasts — BroadcastNestedLoopJoin, never CartesianProduct);
    // the tail is a linear chain of pair-relation windows, so the pair
    // dots are computed ONCE (no multi-consumer re-inlining), and no
    // global single-partition stage exists anywhere
    val p = pipeline.PipelineOps.queries("p77_bitext_margin")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the exact baseline broadcasts one side:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian crept in:\n$p")
    assert("graft_dot".r.findAllIn(p).length <= 2,
      s"pair cosines must be computed once (dot + its norm pair), not re-inlined per window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the margin path:\n$p")
    assert("Window".r.findAllIn(p).nonEmpty, s"expected the window chain:\n$p")
  }

  test("p79 bitext ANN: band equi-join candidates, no cartesian, no nested-loop, pair dots once") {
    // the DEPLOYMENT path for p77 (VERDICT r10 #1): the pair relation is
    // an SRP band-key EQUI-join between the corpus halves — there must be
    // no cartesian AND no broadcast nested loop anywhere (unlike p77,
    // whose exact baseline deliberately broadcasts one whole side); the
    // candidate verify re-join computes each pair cosine once
    val p = pipeline.PipelineOps.queries("p79_bitext_ann")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian crept in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the ANN path must never fall back to the all-pairs shape:\n$p")
    assert("graft_dot".r.findAllIn(p).length <= 2,
      s"pair cosines must be computed once (dot + its norm pair), not re-inlined per window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the margin path:\n$p")
    assert("Window".r.findAllIn(p).nonEmpty, s"expected the window chain:\n$p")
  }

  test("p80 quality AUC: p55's passes + one pruned lang pass, per-lang windows, no cartesian") {
    val df = pipeline.PipelineOps.queries("p80_quality_auc")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length <= 4,
      s"p55's three corpus passes + ONE (doc_id, lang) pass — nothing else may rescan:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"one-row model relations come back as broadcasts:\n$p")
    // the AUC rank windows are lang-partitioned (p55's own chain keeps its
    // sanctioned 256-row global windows — the tiny-relation class); assert
    // the partitioned window exists rather than banning single-partition,
    // which p55's model rollup legitimately contains
    assert(p.toLowerCase.contains("windowspecdefinition(lang#"),
      s"rank windows must partition by lang:\n$p")
    // the lang attach pass reads only the two columns it needs
    val langScan = "ReadSchema: struct<doc_id:bigint,lang:string>"
    assert(p.contains(langScan), s"lang pass must prune to (doc_id, lang):\n$p")
  }

  test("p81 KS drift: corpus collapses to the (source, v) grid ONCE behind the barrier") {
    // the tail references the grid three times (srcs twice via the pair
    // table, pv once): without the barrier each reference re-inlined into
    // its own corpus scan (this audit caught 3 scans in the first draft) —
    // the p12 materialized-view rule
    val df = pipeline.PipelineOps.queries("p81_dist_drift")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).isEmpty && p.contains("Scan ExistingRDD"),
      s"the tail must read the ONE materialized grid, never re-scan the corpus:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"the S^2 pair table must broadcast, never cartesian:\n$p")
    assert("Window".r.findAllIn(p).nonEmpty, s"expected the per-pair ECDF windows:\n$p")
  }

  test("p78 calibration bins: p55's three corpus passes + one tiny rollup, nothing new shuffles") {
    // the chain is p55's (train explode + V-bucket rollup, broadcast model,
    // map-side scoring — two corpus scans by design) plus ONE <= 10-row bin
    // rollup; the calibration tail must not add corpus-sized work
    val p = pipeline.PipelineOps.queries("p78_calibration_bins")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length <= 3,
      s"p55's three corpus passes only (train/prior/apply) — the tail must not re-scan:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"one-row model relations come back as broadcasts:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the model must broadcast onto the corpus:\n$p")
  }

  test("p75 mixture weights: one corpus rollup, no second corpus pass, no corpus cartesian") {
    // phase 1 = the single counts-by-lang rollup (one hash exchange); all
    // later math runs on the G-row relation with the one-row total coming
    // back as a broadcast — p24 needs a second corpus pass for per-doc
    // keeps, a weights table must NOT
    val p = pipeline.PipelineOps.queries("p75_mixture_weights")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).length <= 1,
      s"only the counts rollup may shuffle:\n$p")
    assert("Scan parquet".r.findAllIn(p).length <= 1,
      s"the corpus must be scanned exactly once:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"the one-row total joins back as a broadcast:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      s"only the one-row total aggregate may single-partition:\n$p")
  }

  test("p76 stitch merge: slice-built grams, key equi-join, pair-list-bounded windows") {
    // p69's join contract (slices not explodes, honest shuffle equi-join,
    // never cartesian/BNLJ) plus: the two tie-rule windows partition by
    // a_id/b_id over the PAIR LIST, never a global single partition
    val p = pipeline.PipelineOps.queries("p76_stitch_merge")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"grams come from slices, not explodes:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the gram match must stay a key equi-join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the merge path:\n$p")
    assert("Window".r.findAllIn(p).nonEmpty, s"expected the tie-rule windows:\n$p")
  }

  test("p69 boundary overlap: no explode, gram-keyed equi-join, no cartesian") {
    // one suffix row and one prefix row per doc come from array SLICES,
    // never a K× explode; the suffix→prefix match is a BIGINT-key
    // equi-join of two corpus-sized sides (an honest shuffle — the
    // unbounded-set p54 argument: broadcast would be the bug)
    val p = pipeline.PipelineOps.queries("p69_boundary_overlap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"grams come from slices, not explodes:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the gram match must stay a key equi-join:\n$p")
    assert(p.contains("Join"), s"expected the suffix-prefix join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the overlap path:\n$p")
  }

  test("p71 tf-idf: postings barrier-materialized, term equi-join, per-doc window") {
    // the (doc, term, tf) postings feed BOTH the df rollup and the scoring
    // join — the p25/p67 multi-consumer hazard — so the consumer plan must
    // start from the barrier (zero Generates downstream: the one explode
    // happened inside the materialization); tf⋈idf stays a term equi-join;
    // the top-K window partitions by doc_id (WindowGroupLimit, no global
    // sort)
    val df = pipeline.PipelineOps.queries("p71_tfidf_keywords")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"the explode lives before the barrier — consumers must not re-explode:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("InMemoryTableScan"),
      s"consumers must read the materialized postings:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian anywhere in the tf-idf path:\n$p")
    assert(p.contains("Join"), s"expected the tf-idf term join:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the per-doc top-K must prune via WindowGroupLimit:\n$p")
  }

  test("p72 source overlap: no explode, content-key equi-join, no cartesian") {
    // distinct (source, key) is a hash agg over BIGINT keys; the pair
    // generation must stay an equi-join on the content key (per-key
    // fan-out <= #sources); the #sources-row totals joins may broadcast
    // but never degenerate to a product
    val p = pipeline.PipelineOps.queries("p72_source_overlap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"no row amplification in the overlap path:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the pair join must stay a content-key equi-join:\n$p")
    assert(p.contains("Join"), s"expected the pair self-join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the overlap path:\n$p")
  }

  test("p73 CDC chunks: one posexplode, doc-local window, BIGINT-key rollup, no join") {
    // chunking needs positions — ONE posexplode; the running boundary
    // count is a per-DOCUMENT window (never a global sort); the dup
    // rollup groups on 60-bit BIGINT chunk keys; nothing joins
    val p = pipeline.PipelineOps.queries("p73_cdc_chunks")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).size == 1,
      s"exactly one explode (the positional word stream):\n$p")
    assert(!p.toLowerCase.contains("join"),
      s"CDC is explode + window + aggregate — never a join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the chunking path:\n$p")
  }

  test("p74 cluster rep: map-side scoring, one cluster-key window, no join, no explode") {
    val p = pipeline.PipelineOps.queries("p74_cluster_rep")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).isEmpty,
      s"normalization and quality are per-row expressions:\n$p")
    assert(!p.toLowerCase.contains("join"),
      s"rep selection rides the cluster window, not a join-back:\n$p")
    assert("Window".r.findAllIn(p).nonEmpty, s"expected the cluster window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"the cluster window partitions by the normalized key:\n$p")
  }

  test("p70 mojibake score is pure map-side: no shuffle, no join, no amplification") {
    val p = pipeline.PipelineOps.queries("p70_mojibake_score")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).isEmpty,
      s"the scoring pass must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("join"),
      s"counts are per-row arithmetic, never a join:\n$p")
    assert("Generate".r.findAllIn(p).isEmpty,
      s"one output row per document — no amplification:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the scoring path:\n$p")
  }

  test("p68 fertility: vocab join broadcasts; the word explode is the only Generate") {
    // the p51 audit contract carries over: corpus-sized work is one word
    // explosion + a broadcast join to the vocab-sized token map; the
    // bucket rollup owns the (lang, source) shuffle
    val p = pipeline.PipelineOps.queries("p68_tokenizer_fertility")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(p).length == 1,
      s"one word explosion is sanctioned:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the vocab-sized token map must broadcast, not shuffle the corpus:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the fertility path:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no global stage belongs in the fertility path:\n$p")
  }
}
