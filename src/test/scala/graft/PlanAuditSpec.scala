package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Plan-shape invariants for the scale-critical properties the operators
  * rely on at 100 TB: filter pushdown and column pruning must reach the
  * parquet scan, small dimension joins must broadcast, and top-k must
  * plan as TakeOrdered (no global sort). Asserting the plans in CI keeps
  * a refactor from silently trading them away. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("parquet scan: filters push down and projection prunes ReadSchema") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = docs.filter(col("doc_id") < 50).select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]"),
      plan.take(1500))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      plan.take(1500))
  }

  test("small dimension join plans as a broadcast hash join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val region = spark.read.parquet(s"$sf/region.parquet") // 5 rows
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val q = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("knn top-k plans as TakeOrdered, not a global sort") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.knn(emb, 0L, 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("aggregation is partial (map-side combine) before the shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val q = li.groupBy("l_returnflag").agg(sum(col("l_quantity")))
    val plan = q.queryExecution.executedPlan.toString
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning(l_returnflag"), plan.take(1500))
  }

  test("bm25: corpus scalars and df broadcast; top-k is TakeOrdered") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Retrieval.bm25(docs, Seq("hash", "join"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(1500)) // 1-row corpus cross join broadcasts
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("zorder value: broadcast 1-row stats, no cartesian") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
    val q = graft.ops.ZOrder.withZValue(li, Seq("l_partkey", "l_suppkey"), 8)
    val plan = q.queryExecution.executedPlan.toString
    // the per-column lo/hi ride as a broadcast of a 1-row aggregate (the
    // interleave itself is plain shift/and/or in a Project — codegen'd)
    assert(plan.contains("BroadcastExchange"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("repetition signal: kernel projection — no aggregate, no gram explode") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.repetitionStats(docs)
      .queryExecution.executedPlan.toString
    // per-doc kernel pass: no explode rows, no count/countDistinct
    // aggregation — the only exchange is the final orderBy
    assert(plan.contains("dup_ngram_stats"), plan.take(1500))
    assert(!plan.contains("HashAggregate"), plan.take(1500))
    assert(!plan.contains("Generate"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("decontamination: gram membership is a left-semi join, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Decontam.crossSplitContainment(
        graft.ops.Sampling.assignSplit(docs, col("doc_id").cast("string"),
          Seq("train" -> 0.9, "test" -> 0.1)),
        col("split"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("incremental dedup: digest join, no text on the corpus shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ops.Dedup.incrementalExact(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 4000),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 4000))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the corpus side projects digest only before its exchange
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("Aggregate".r.findAllIn(optimized).nonEmpty)
  }

  test("oov rate: vocabulary-bounded window after a partial-agg shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.oovRate(docs, 25)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("pq search: ADC scoring is join-free — codes and LUTs are literals") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity.pqSearch(
        emb, org.apache.spark.sql.functions.col("vec_id") < 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1500))
    assert(plan.contains("Window"), plan.take(1500))
  }

  test("ivf-pq search: probe side broadcasts into both passes, no sort-merge, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity.ivfPqSearch(
        emb, org.apache.spark.sql.functions.col("vec_id") < 10)
      .queryExecution.executedPlan.toString
    // ADC join (codes × LUTs on the cluster key) AND the rerank join
    // (vectors × id-triple shortlist) both build on the broadcast probe
    // side — the big scans stream map-side, never shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // per-probe top-R and top-k run the rank-limit pushdown: a partial
    // window group limit bounds the rows BEFORE each shuffle
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("ivf-routed decontam: probe side broadcasts, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity.semanticDecontamIvf(
        emb, org.apache.spark.sql.functions.col("vec_id") % 40 === 0, 0.35)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("semantic decontam: probe side broadcasts, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity.semanticDecontam(
        emb, org.apache.spark.sql.functions.col("vec_id") >= 1900, 0.35)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("probe-side broadcast gate: above-budget probes fall back without changing results") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = org.apache.spark.sql.functions.col("vec_id") % 40 === 0
    val decontam0 = graft.ops.Similarity.semanticDecontamIvf(emb, pred, 0.35)
      .collect().map(_.toSeq).toSeq
    val pq0 = graft.ops.Similarity.ivfPqSearch(
        emb, org.apache.spark.sql.functions.col("vec_id") < 10)
      .collect().map(_.toSeq).toSeq
    // budget 0 forces every probe-side broadcast hint OFF (a corpus-
    // sized probe file at 100 TB must shuffle, not OOM the driver) —
    // results must be identical either way
    spark.conf.set("spark.graft.ann.probeBroadcastMaxBytes", "0")
    try {
      assert(graft.ops.Similarity.semanticDecontamIvf(emb, pred, 0.35)
        .collect().map(_.toSeq).toSeq == decontam0)
      assert(graft.ops.Similarity.ivfPqSearch(
          emb, org.apache.spark.sql.functions.col("vec_id") < 10)
        .collect().map(_.toSeq).toSeq == pq0)
    } finally spark.conf.unset("spark.graft.ann.probeBroadcastMaxBytes")
  }

  test("semdedup: pair search joins on the cluster key, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity.semDeDup(emb, k = 4, iters = 2, threshold = 0.35)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Join"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the dedup is a partial-then-final aggregate over the pair stream
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
  }

  test("dup ngram chars: kernel projection — no aggregate, no shuffle before the sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.dupNgramChars(docs)
      .queryExecution.executedPlan.toString
    // the census is one per-doc kernel pass: no gram explode, no
    // aggregation anywhere — the only exchange is the final orderBy
    assert(plan.contains("dup_ngram_stats"), plan.take(1500))
    assert(!plan.contains("HashAggregate"), plan.take(1500))
    assert(!plan.contains("Generate"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("apply mixture: rate table broadcasts, gate is map-side, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Mixing.applyMixture(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("mix weights: one partial-agg shuffle + one small window, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Mixing.mixWeights(docs)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500)) // partial+final
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("shardAssign: window partitioned by shard, no single-partition global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Sampling.shardAssign(
        docs.select("doc_id"), col("doc_id").cast("string"), 8)
      .queryExecution.executedPlan.toString
    // the rank window is keyed by shard — never an empty partition spec
    // (which would move all rows to one partition)
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("windowspecdefinition()"), plan.take(1500))
  }

  test("tfidf: corpus df and scalars broadcast into tf rows; per-doc window, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Retrieval.tfidfTopK(docs, col("doc_id") < 50, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // ranking is keyed by doc_id — never a single-partition window
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("windowspecdefinition()"), plan.take(1500))
  }

  test("bigram familiarity: count table broadcast, partial agg before doc shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.bigramFamiliarity(docs, col("doc_id") < 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("prioritySample: window partitioned by stratum, no single-partition sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Sampling.prioritySample(docs,
        col("lang"), col("doc_id").cast("string"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("windowspecdefinition()"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("funnel: step cascade joins stay keyed (no cartesian, no nested loop)") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val plan = graft.ops.Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
  }

  test("gopher rules: single projection + one partial-agg shuffle, no UDFs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.gopherRules(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan.take(1500))
    // partial + final aggregate around exactly one data shuffle (the
    // trailing orderBy adds a range exchange over 20 rows — harmless)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(1500))
  }

  test("winnowing: kernel selection needs no window/shuffle, fingerprint joins keyed, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the fingerprint-selection half (shared by both consumers; pinned
    // on the builder since winnowRemoval checkpoints it away): ONE
    // codegen kernel pass per document — no window operator, no sort,
    // no exchange anywhere before the fingerprints exist
    val fpsPlan = graft.ops.Dedup.winnowedFps(docs)
      .queryExecution.executedPlan.toString
    assert(!fpsPlan.contains("Window"), fpsPlan.take(1500))
    assert(!fpsPlan.contains("Exchange"), fpsPlan.take(1500))
    assert(!fpsPlan.contains("Sort"), fpsPlan.take(1500))
    assert(fpsPlan.contains("winnow_fps"), fpsPlan.take(1500))
    assert(!fpsPlan.contains("CartesianProduct"), fpsPlan.take(1500))
    // the census + membership join downstream: keyed joins only
    val plan = graft.ops.Dedup.winnowedDupSpans(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("winnowRemoval: keyed joins only, one rebuild aggregate, text shuffles once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Dedup.winnowRemoval(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // marks join the token stream on (doc_id, tpos) — a keyed join, and
    // the rebuild is a per-doc hash aggregate (collect_list of structs).
    // (The window half lives behind the occurrence checkpoint; its shape
    // is pinned in the winnowing test above on winnowedFps directly.)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan.take(1500))
    // REBUILD GATE: clean docs must never reach the rebuild aggregate —
    // the doc table is semi-joined against the marked doc_ids BEFORE the
    // token posexplode, so the rebuild shuffle tracks dup density, not
    // corpus size
    assert(plan.contains("LeftSemi"), plan.take(2000))
  }

  test("winnowRemoval gate: a clean corpus rebuilds zero docs") {
    val s2 = spark
    import s2.implicits._
    // three docs with no shared 5-gram: nothing is marked, so the
    // semi-join gate must leave the rebuild input EMPTY (0 output rows)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.winnowRemoval(docs).count() == 0L)
  }

  test("exactDupSpans: gram frame is a kernel projection; span window sorts marked rows only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Dedup.exactDupSpans(docs)
      .queryExecution.executedPlan.toString
    // the all-grams frame comes from the SAME winnowing kernel (window=1)
    // — no posexplode of text, no cartesian, keyed joins only
    assert(plan.contains("winnow_fps"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("Generate posexplode"), plan.take(1500))
    // exactly one window operator (the span merge), running AFTER the
    // dup-membership join — its sort sees dup-density-bounded rows
    assert(plan.sliding("Window".length).count(_ == "Window") >= 1)
    val windowIdx = plan.indexOf("Window")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && windowIdx >= 0 && windowIdx < joinIdx,
      s"span window must consume the join output (window@$windowIdx join@$joinIdx)")
  }

  test("perceptron training: margin scoring is a literal-map projection, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Selection.trainQualityPerceptron(
        docs, org.apache.spark.sql.functions.col("lang") === "en",
        buckets = 64, rounds = 1)
      .queryExecution.executedPlan.toString
    // the final confusion pass scores with the collected weight map as a
    // LITERAL: no join against a weight table, no cartesian — the only
    // operators are the kernel projection and two hash aggregates
    assert(plan.contains("bigram_buckets"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
    assert(plan.contains("HashAggregate"), plan.take(1500))
  }

  test("hard negatives: probe set broadcasts, corpus scans once, no shuffle-heavy join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity.hardNegatives(
        emb, org.apache.spark.sql.functions.col("vec_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("hard negatives above the pair budget: cluster-key equi-join, never a cross join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.ops.Similarity.hardNegatives(
      emb, org.apache.spark.sql.functions.col("vec_id") < 10,
      exactPairBudget = 0L) // force the IVF route
    val plan = df.queryExecution.executedPlan.toString
    // the corpus side joins on the cluster key — an equi-join Spark can
    // hash/broadcast — not the exact path's probe cross join
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("cluster"), plan.take(2000))
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*cluster".r
      .findFirstIn(plan).nonEmpty, plan.take(2000))
  }

  test("corpus drift: kernel projection, buckets-bounded aggregate, totals broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.corpusDrift(
        docs, org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bigram_buckets"), plan.take(1500))
    assert(plan.contains("BroadcastExchange"), plan.take(1500)) // 1-row totals
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("bpe fertility + dup sources: kernel projections and keyed joins only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fPlan = graft.ops.Bpe.fertilityByLang(docs, Seq(("a", "b")))
      .queryExecution.executedPlan.toString
    assert(fPlan.contains("bpe_encode_counts"), fPlan.take(1500))
    assert(!fPlan.contains("Join"), fPlan.take(1500)) // lang rides the projection
    val sPlan = graft.ops.Dedup.dupSourcePairs(
        graft.ops.Dedup.minhashCandidates(spark, docs), docs)
      .queryExecution.executedPlan.toString
    assert(!sPlan.contains("CartesianProduct"), sPlan.take(1500))
    assert(!sPlan.contains("BroadcastNestedLoopJoin"), sPlan.take(1500))
  }

  test("budget threshold: corpus pass partial-aggregates into bins; window keyed by lang") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.TextStats.budgetThreshold(docs, budgetChars = 10000L)
      .queryExecution.executedPlan.toString
    // the only corpus-sized stage is the (lang, q_milli) bin aggregate —
    // map-side combined, so the shuffle carries bins, never documents
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning(lang"), plan.take(1500))
    // the cumulative window runs per language over the bin frame — never
    // an empty partition spec (single-partition global window)
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("windowspecdefinition()"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("epoch plan: one partial-agg shuffle over sources, no cartesian, no UDFs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Mixing.epochPlan(docs, budgetChars = 400000L)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("ScalaUDF"), plan.take(1500))
  }

  test("split leakage: the wide shuffle is keyed on (group, fingerprint), not text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ops.Sampling.splitLeakage(docs,
        col("doc_id").cast("string"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        md5(lower(trim(substring(col("text"), 1, 64)))))
      .queryExecution.executedPlan.toString
    // fingerprint and split are computed map-side; the exchange keys are
    // the digest pair — the document body never rides a shuffle
    assert(plan.contains("Exchange hashpartitioning(lang"), plan.take(1500))
    assert(plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .forall(!_.contains("text#")), plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("bpe census: pair counts partial-aggregate before the shuffle, no UDFs") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    // the per-round census plan: vocab explode → pair groupBy. Partial
    // aggregation (map-side combine) must sit under the exchange, and the
    // whole round is built-in expressions — no ScalaUDF anywhere.
    val vocab = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
    val census = vocab
      .select(col("cnt"), explode(expr(
        "IF(size(syms) < 2, array(), transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS l, syms[i+1] AS r)))")).as("p"))
      .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")))
    val plan = census.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
  }

  test("multimodal codecs: decode stages are mapPartitions over (id, payload) only") {
    val s2 = spark
    import s2.implicits._
    val ids = (0L until 8L).toDF("media_id")
    for (decoded <- Seq(
        graft.ops.Multimodal.decodeImages(graft.ops.Multimodal.imagesFromIds(ids)),
        graft.ops.Multimodal.decodeAudio(graft.ops.Multimodal.audioFromIds(ids)),
        graft.ops.Multimodal.sampleFrames(graft.ops.Multimodal.videoFromIds(ids)))) {
      val plan = decoded.queryExecution.executedPlan.toString
      // the codec kernels run as per-partition object pipelines with no
      // shuffle at all — decode is embarrassingly parallel
      assert(!plan.contains("Exchange"), plan.take(1500))
      assert(plan.contains("MapPartitions"), plan.take(1500))
    }
  }

  test("file-scoped MoR: delete-untouched files scan bare; only hit files pay the anti-join") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-morsplit-wh").toString
    val e = new graft.api.Engine(spark, wh)
    e.createTable("ns.t", new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType))
    e.append("ns.t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    e.append("ns.t", Seq((3L, "c"), (4L, "d")).toDF("k", "v"))
    e.deleteWhere("ns.t", col("k") === 3L) // position delete on file 2 only

    val df = e.readTable("ns.t")
    assert(df.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))

    val t = e.load("ns.t")
    val hitPaths = spark.read.parquet(
        t.deleteFiles().map(d => t.resolvePath(d.filePath)): _*)
      .select("file_path").distinct().as[String].collect()
      .map(rel => t.resolvePath(rel)).toSet
    val cleanPaths = t.files().map(f => t.resolvePath(f.filePath)).toSet -- hitPaths
    assert(hitPaths.size == 1 && cleanPaths.nonEmpty)

    def scannedFiles(p: LogicalPlan): Set[String] = p.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.toSet
        case _ => Set.empty[String]
      }
    }.flatten.map(_.replaceFirst("^file:/+", "/")).toSet

    val plan = df.queryExecution.optimizedPlan
    val antis = plan.collect { case j @ Join(_, _, LeftAnti, _, _) => j }
    assert(antis.size == 1, s"expected exactly one anti-join:\n$plan")
    val underAnti = scannedFiles(antis.head)
    // the delete-hit file (and the delete parquet) are inside the
    // anti-join subtree; the untouched file is NOT — it scans bare
    assert(hitPaths.subsetOf(underAnti), s"$hitPaths vs $underAnti")
    assert(cleanPaths.forall(p => !underAnti.contains(p)),
      s"untouched file dragged through the anti-join: $underAnti")
    assert(cleanPaths.subsetOf(scannedFiles(plan)))
  }

  test("incremental components: small-batch resolution pushes an IN " +
      "literal into the assignment scan; no cartesian in any fold job") {
    val s2 = spark
    import s2.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("icplan").toString + "/assign"
    graft.ops.Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a_id", "b_id"))
      .write.parquet(dir)
    val assign = spark.read.parquet(dir)
    // the resolution pass materializes INSIDE incrementalComponents
    // (localCheckpoint), so its plan is only observable through the
    // query-execution listener — capture every plan the fold runs
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val delta = graft.ops.Dedup.incrementalComponents(assign,
        Seq((3L, 10L)).toDF("a_id", "b_id"))
      val got = delta.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == Map(10L -> 1L, 11L -> 1L))
      // listener events post asynchronously — poll for the scan plan
      def plans = captured.toArray(Array.empty[String]).toSeq
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (!plans.exists(_.contains("In(doc_id")) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(plans.exists(p =>
        p.contains("PushedFilters") && p.contains("In(doc_id")),
        "resolution IN literal never reached a parquet scan:\n" +
          plans.map(_.take(300)).mkString("\n---\n"))
      assert(plans.forall(p => !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin")),
        plans.filter(p => p.contains("CartesianProduct") ||
          p.contains("BroadcastNestedLoopJoin")).mkString("\n").take(2000))
    } finally spark.listenerManager.unregister(listener)
  }

  test("join-path retire (threshold 0): retired-id filters run as " +
      "broadcast joins, no literal id plans, no cartesian in any job") {
    val s2 = spark
    import s2.implicits._
    val wh = java.nio.file.Files.createTempDirectory("retplan").toString
    val e = new graft.api.Engine(spark, wh)
    val idx = new graft.ops.ComponentIndex(e, "ns.rp_comps", nBuckets = 8)
    idx.create()
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    idx.bootstrap(pairs.toDF("a_id", "b_id"))
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = idx.retire(Seq(2L).toDF("doc_id"), ids => {
        val s = ids.collect().map(_.getLong(0)).toSet
        pairs.filter(p => s(p._1) && s(p._2) && p._1 != 2L && p._2 != 2L)
          .toDF("a_id", "b_id")
      }, inMaxIds = 0)
      assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 1L, 3L -> 3L)) // the 1-2-3 chain split at 2
      def plans = captured.toArray(Array.empty[String]).toSeq
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (!plans.exists(_.contains("BroadcastHashJoin")) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      // the retired-id probe is a JOIN above the threshold — the literal
      // form (a pushed-down In over the retire set) must not appear
      assert(plans.exists(_.contains("BroadcastHashJoin")),
        "no broadcast join in any retire job:\n" +
          plans.map(_.take(300)).mkString("\n---\n"))
      assert(plans.forall(p => !p.contains("In(doc_id")),
        "join-path retire still pushed a retired-id literal:\n" +
          plans.filter(_.contains("In(doc_id")).mkString("\n").take(2000))
      assert(plans.forall(p => !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin")),
        plans.filter(p => p.contains("CartesianProduct") ||
          p.contains("BroadcastNestedLoopJoin")).mkString("\n").take(2000))
    } finally spark.listenerManager.unregister(listener)
  }

  test("field-id scan: pushdown and pruning survive the id-attributed schema") {
    // the rename-safe read (FieldIds) must not trade away the scan's
    // scale properties: filters still push to the parquet scan and the
    // projection still prunes ReadSchema, even with a renamed column
    val e = new graft.api.Engine(spark,
      java.nio.file.Files.createTempDirectory("pa-fid-wh").toString)
    val df = spark.range(100).select(col("id"),
      (col("id") * 2).as("v"), (col("id") % 7).as("extra"))
    e.createTable("pa.fid", df.schema)
    e.append("pa.fid", df)
    e.renameColumn("pa.fid", "v", "value")
    val q = e.readTable("pa.fid").filter(col("id") < 10).select("id", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThan(id,10)]"),
      plan.take(1500))
    assert(plan.contains("ReadSchema: struct<id:bigint,value:bigint>"),
      s"projection must prune `extra` from the id-attributed scan\n" +
        plan.take(1500))
    assert(q.collect().map(_.getLong(1)).sorted.toSeq ==
      (0L until 10L).map(_ * 2), "renamed column must serve old data")
  }

  test("hive-adopted table: the metadata fill is ONE projection over the " +
      "scan — residual filters on in-file columns still push to parquet, " +
      "and whole-stage codegen covers the filled plan") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("pa-hive-src").toString
    val wh = java.nio.file.Files.createTempDirectory("pa-hive-wh").toString
    (1L to 200L).map(i => (i, s"v$i", if (i % 2 == 0) "x" else "y"))
      .toDF("id", "name", "p")
      .write.mode("overwrite").partitionBy("p").parquet(src)
    val e = new graft.api.Engine(spark, wh)
    e.registerParquet("pa.hive", src)
    val q = e.readTable("pa.hive").filter(col("id") < 50).select("id", "p")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThan(id,50)]"),
      s"in-file column filters must still reach the parquet scan\n" +
        plan.take(1500))
    // the `*(n)` star prefix is executedPlan.toString's rendering of a
    // whole-stage-codegen'd node — the fill Project must carry it
    assert(plan.linesIterator.exists(l =>
        l.contains("Project") && l.contains("coalesce") && l.contains("*(")),
      s"the literal-map fill must stay codegen-friendly\n" + plan.take(1500))
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"the fill must not multiply scans\n" + plan.take(1500))
    assert(q.count() == 49L)
  }

  test("kmv sketch over many columns reads the table in ONE scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.ops.Stats.kmvSketch(docs,
      Seq("doc_id", "lang", "source", "n_chars"), k = 64)
    // string-match the plan: AdaptiveSparkPlanExec does not expose its
    // inner plan as a child, so collect() cannot see the scan node
    val plan = q.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"ANALYZE must not scan once per column: $scans scans\n" + plan.take(1500))
  }
}
