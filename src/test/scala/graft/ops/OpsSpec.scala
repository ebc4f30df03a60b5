package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit invariants for the generic operators: overlap dual-plan
  * consistency (SURVEY §5 plan item 3), dedup/similarity behavior on
  * synthetic in-test documents, and text statistics. */
class OpsSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private def intervalDf(iv: Seq[(String, Long, Long)]): DataFrame =
    spark.createDataFrame(
      iv.map { case (k, lo, hi) => Row(k, lo, hi) }.asJava,
      StructType(Seq(
        StructField("k", StringType), StructField("lo", LongType),
        StructField("hi", LongType))))

  test("overlap: theta-join pair count agrees with a driver-side O(N^2) oracle") {
    val rng = new Random(7)
    val iv = (0 until 120).map(i =>
      (f"f$i%03d", rng.nextInt(1000).toLong, 0L)).map { case (k, lo, _) =>
      (k, lo, lo + rng.nextInt(150).toLong)
    }
    val expected = (for {
      a <- iv; b <- iv
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield 1).size.toLong
    val got = Overlap.pairCount(intervalDf(iv)).collect().head.getLong(0)
    assert(got == expected)
  }

  test("overlap: sweep flags a subset consistent with pair membership") {
    val rng = new Random(13)
    val iv = (0 until 100).map { i =>
      val lo = rng.nextInt(500).toLong
      (f"f$i%03d", lo, lo + rng.nextInt(80).toLong)
    }
    val overlapKeys = (for {
      a <- iv; b <- iv
      if a._1 != b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield a._1).toSet
    val flagged = Overlap.sweep(intervalDf(iv)).collect()
      .filter(_.getBoolean(1)).map(_.getString(0)).toSet
    // every sweep-flagged interval genuinely overlaps something...
    assert(flagged.subsetOf(overlapKeys))
    // ...and overlaps exist iff the sweep found at least one
    assert(flagged.nonEmpty == overlapKeys.nonEmpty)
  }

  test("overlap: adaptive picks exact count under the limit, sweep above") {
    val iv = intervalDf(Seq(("a", 0L, 10L), ("b", 5L, 15L), ("c", 20L, 30L)))
    assert(Overlap.adaptive(iv, exactLimit = 10).columns.contains("pairs_cnt"))
    assert(Overlap.adaptive(iv, exactLimit = 2).columns.contains("overlapping_cnt"))
  }

  private def docsDf(rows: Seq[(Long, String, String, String, Long)]): DataFrame = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("dedup: exact clusters find the planted duplicate") {
    val docs = docsDf(Seq(
      (1L, "the quick brown fox", "en", "a", 19L),
      (2L, "THE QUICK BROWN FOX  ", "en", "b", 21L), // same after lower+trim
      (3L, "something else entirely", "en", "a", 23L)))
    val clusters = Dedup.exactClusters(docs).collect()
    assert(clusters.length == 1)
    assert(clusters.head.getAs[Long]("n_dups") == 2L)
    assert(clusters.head.getAs[Long]("keep_id") == 1L)
  }

  test("dedup: minhash candidates include near-identical docs and skip distinct ones") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val near = base.replace("kappa", "kappa2")
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val docs = docsDf(Seq(
      (1L, base, "en", "a", base.length.toLong),
      (2L, near, "en", "a", near.length.toLong),
      (3L, far, "en", "a", far.length.toLong)))
    val pairs = Dedup.minhashCandidates(spark, docs, numPerm = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("dedup: simhash of identical docs is identical, hamming 0") {
    val docs = docsDf(Seq(
      (1L, "spark iceberg metadata analytics engine", "en", "a", 39L),
      (2L, "spark iceberg metadata analytics engine", "en", "b", 39L),
      (3L, "completely different words here now", "en", "a", 35L)))
    val pairs = Dedup.simhashCandidates(docs, maxHamming = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("writeShards: deterministic sharded export, re-run identical, partitioning-stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val docs = docsDf((1L to 40L).map(i => (i, s"doc number $i", "en", "a", 12L)))
    val counts = Export.writeShards(docs, col("doc_id").cast("string"), 4, s"$dir/a")
    assert(counts.keySet == Set(0, 1, 2, 3))
    assert(counts.values.sum == 40L)
    // same rows land in the same shard regardless of input partitioning,
    // and within-shard order (shard_pos) is reproduced byte-for-byte
    Export.writeShards(docs.repartition(7), col("doc_id").cast("string"), 4, s"$dir/b")
    val a = spark.read.parquet(s"$dir/a").select("shard", "shard_pos", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = spark.read.parquet(s"$dir/b").select("shard", "shard_pos", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // exactly one data file per shard directory — one writer task each
    (0 until 4).foreach { s =>
      val files = scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/a/shard=$s")))(
        _.iterator().asScala.count(_.toString.endsWith(".parquet")))
      assert(files == 1, s"shard $s has $files parquet files")
    }
  }

  test("writeJsonlShards: byte-identical JSONL re-run, valid JSON lines, one file per shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = docsDf((1L to 40L).map(i => (i, s"doc number $i", "en", "a", 12L)))
    val counts = Export.writeJsonlShards(docs, col("doc_id").cast("string"), 4, s"$dir/a")
    assert(counts.keySet == Set(0, 1, 2, 3) && counts.values.sum == 40L)
    // re-run from a different partitioning: identical shard text
    Export.writeJsonlShards(docs.repartition(7), col("doc_id").cast("string"), 4, s"$dir/b")
    def shardText(d: String, s: Int): Seq[String] = {
      val p = java.nio.file.Paths.get(s"$d/shard=$s")
      scala.util.Using.resource(java.nio.file.Files.list(p)) { st =>
        st.iterator().asScala.filter(_.toString.endsWith(".txt")).toSeq
          .flatMap(f => java.nio.file.Files.readAllLines(f).asScala)
      }
    }
    (0 until 4).foreach { s =>
      assert(shardText(s"$dir/a", s) == shardText(s"$dir/b", s), s"shard $s differs")
    }
    // every line round-trips as JSON carrying the original columns
    val parsed = spark.read.json(spark.read.textFile(s"$dir/a"))
    assert(parsed.count() == 40L)
    assert(parsed.columns.sorted.toSeq == docs.columns.sorted.toSeq)
  }

  test("per-row band signatures match the batch aggregation bit-for-bit") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "completely unrelated content with different words entirely"),
      (4L, "too short"), // < 3 tokens → no signatures on either path
      (5L, "中文 文本 内容 测试 multi byte text")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batch = rows(Dedup.bandSignatures(docs))
    val perRow = rows(Dedup.rowBandSignatures(docs))
    assert(batch.nonEmpty && batch == perRow)
    assert(!batch.exists(_._1 == 4L))
  }

  test("incremental dedup: new docs matching corpus digests flagged, fresh ones pass") {
    val corpus = docsDf(Seq(
      (1L, "existing content one", "en", "a", 20L),
      (2L, "existing content two", "en", "a", 20L)))
    val inc = docsDf(Seq(
      (10L, "EXISTING CONTENT ONE  ", "en", "b", 22L), // dup after normalize
      (11L, "genuinely new text", "en", "b", 18L)))
    val out = Dedup.incrementalExact(inc, corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(out == Map(10L -> true, 11L -> false))
  }

  test("incremental near-dedup: shard doc colliding with corpus bands flagged with min id") {
    val corpus = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L), // same sig as 1
      (3L, "completely different corpus material about engines", "en", "a", 50L)))
    val inc = docsDf(Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "en", "b", 43L),
      (11L, "entirely novel text with no corpus overlap at all", "en", "b", 49L)))
    val out = Dedup.incrementalNearDup(inc, corpus).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L))
    assert(out.head.getAs[Long]("dup_of") == 1L) // min of the two colliding ids
    assert(out.head.getAs[Long]("n_bands") == 4L) // identical text -> all 4 bands
  }

  test("apply mixture: generous budget keeps everything, zero budget keeps nothing") {
    val docs = docsDf(Seq(
      (1L, "aaa", "en", "a", 100L),
      (2L, "bbb", "en", "b", 300L),
      (3L, "ccc", "de", "a", 200L)))
    assert(graft.ops.Mixing.applyMixture(docs, budgetChars = 1000000L).count() == 3)
    assert(graft.ops.Mixing.applyMixture(docs, budgetChars = 0L).count() == 0)
  }

  test("epoch plan: integral milli-epoch arithmetic with the repeat cap binding") {
    val docs = docsDf(Seq(
      (1L, "x", "en", "a", 100L),
      (2L, "x", "en", "b", 400L)))
    val out = graft.ops.Mixing.epochPlan(docs, budgetChars = 900L, maxEpochsMilli = 2000L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // sqrt weights: a=10e6, b=20e6 -> shares 333/666 permille of 900
    assert(out("a").getAs[Long]("share_permille") == 333L)
    assert(out("a").getAs[Long]("target_chars") == 299L)
    // a needs 2.99 epochs of its 100 chars -> capped at 2.0 -> 200 planned
    assert(out("a").getAs[Long]("epochs_milli") == 2000L)
    assert(out("a").getAs[Long]("planned_chars") == 200L)
    // b's 599-char target is 1.497 epochs of 400 -> under the cap
    assert(out("b").getAs[Long]("epochs_milli") == 1497L)
    assert(out("b").getAs[Long]("planned_chars") == 598L)
  }

  test("epoch plan / temperature weights: zero-char sources surface as NULL, not DIVIDE_BY_ZERO") {
    // a source whose docs sum to zero chars — under ANSI mode an
    // unguarded DIV would kill the whole plan
    val docs = docsDf(Seq(
      (1L, "", "en", "a", 0L),
      (2L, "x", "en", "b", 400L)))
    val plan = graft.ops.Mixing.epochPlan(docs, budgetChars = 900L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(plan("a").isNullAt(plan("a").fieldIndex("epochs_milli")))
    assert(plan("b").getAs[Long]("epochs_milli") > 0L)
    // all-empty corpus: every share is NULL, nothing throws
    val empty = docsDf(Seq((1L, "", "en", "a", 0L)))
    val rows = graft.ops.Mixing.temperatureWeights(empty).collect()
    assert(rows.length == 1 &&
      rows.head.isNullAt(rows.head.fieldIndex("share_permille")))
  }

  test("budget threshold: keeps best bins within budget; infeasible budget emits nothing") {
    // three docs with strictly ordered quality scores (alpha-heavy ->
    // mixed -> punctuation-heavy), 100 chars each
    val docs = docsDf(Seq(
      (1L, "aaaaaaaaaa", "en", "a", 100L),
      (2L, "aaaa 1111", "en", "a", 100L),
      (3L, "....!!!!", "en", "a", 100L)))
    val k250 = TextStats.budgetThreshold(docs, budgetChars = 250L).collect()
    assert(k250.length == 1)
    assert(k250.head.getAs[Long]("kept_docs") == 2L)   // top two fit, third overshoots
    assert(k250.head.getAs[Long]("kept_chars") == 200L)
    val k100 = TextStats.budgetThreshold(docs, budgetChars = 100L).collect()
    assert(k100.head.getAs[Long]("kept_docs") == 1L)
    // the single best bin already exceeds a 50-char budget -> no row
    assert(TextStats.budgetThreshold(docs, budgetChars = 50L).isEmpty)
  }

  test("split leakage: duplicate fingerprints straddling splits are flagged") {
    val s2 = spark
    import s2.implicits._
    val weights = Seq("train" -> 0.5, "test" -> 0.5)
    // find ids the hash split genuinely separates (deterministic, but
    // not chosen by hand — the op must flag whatever the split does)
    val splitOf = Sampling.assignSplit(
        (1L to 20L).toDF("doc_id"), col("doc_id").cast("string"), weights)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val (idA, idB) = {
      val byClass = splitOf.groupBy(_._2).map { case (_, m) => m.keys.min }
      (byClass.head, byClass.last) // one id from each split
    }
    val sameSplit = splitOf.collect { case (id, s) if s == splitOf(idA) && id != idA => id }.head
    val docs = docsDf(Seq(
      (idA, "leaky duplicated text", "en", "a", 21L),
      (idB, "leaky duplicated text", "en", "a", 21L),     // same text, other split
      (idA + 100L, "benign dup", "en", "a", 10L),
      (idB + 100L, "benign dup", "en", "a", 10L),
      (sameSplit, "unique document", "en", "a", 15L)))
    val out = Sampling.splitLeakage(docs, col("doc_id").cast("string"),
        weights, graft.ops.Dedup.contentDigest()).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("leak_groups") >= 1L)
    assert(r.getAs[Long]("leaked_docs") >= 2L)
    assert(r.getAs[Long]("dup_groups") >= r.getAs[Long]("leak_groups"))
  }

  test("oov rate: full vocab covers everything; k=1 leaves the tail out") {
    val docs = docsDf(Seq(
      (1L, "the cat and the dog and the bird", "en", "a", 32L)))
    val full = TextStats.oovRate(docs, 100).collect().head
    assert(full.getAs[Long]("oov_permille") == 0L)
    // top-1 = "the" (3 of 8 occurrences) -> 5/8 OOV = 625 permille
    val top1 = TextStats.oovRate(docs, 1).collect().head
    assert(top1.getAs[Long]("covered") == 3L)
    assert(top1.getAs[Long]("oov_permille") == 625L)
  }

  test("dedup lines: cross-doc boilerplate removed, unique lines and order kept") {
    val docs = docsDf(Seq(
      (1L, "Cookie banner. unique alpha. Cookie banner. unique beta", "en", "a", 50L),
      (2L, "Cookie banner. other text here", "en", "b", 30L),
      (3L, "totally original document", "en", "a", 25L)))
    val out = Dedup.dedupLines(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("new_text"))).toMap
    // doc 3 untouched -> absent; both banner copies in doc 1 removed
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 2L)
    assert(out(1L)._2 == "unique alpha. unique beta")
    assert(out(2L)._2 == "other text here")
  }

  test("ngram jaccard: identical docs score 1.0") {
    val docs = docsDf(Seq(
      (1L, "abcdefgh", "en", "a", 8L),
      (2L, "abcdefgh", "en", "b", 8L)))
    val j = Dedup.ngramJaccard(docs, 3).collect().head
    assert(j.getAs[Double]("jaccard") == 1.0)
  }

  test("ngram jaccard: maxDf prunes a planted universal gram, bounding buckets") {
    // every doc shares the hot gram "zzz"; pairs (1,2) and (3,4) also share
    // rarer grams
    val docs = docsDf(Seq(
      (1L, "zzz abcdef", "en", "a", 10L),
      (2L, "zzz abcxyz", "en", "a", 10L),
      (3L, "zzz qrstuv", "en", "a", 10L),
      (4L, "zzz qrsmno", "en", "a", 10L),
      (5L, "zzz 123789", "en", "a", 10L)))
    // unpruned: "zzz " grams connect ALL pairs → C(5,2) = 10 candidates
    assert(Dedup.ngramJaccard(docs, 3).count() == 10L)
    // huge threshold ≡ unpruned (default contract for oracle stability)
    assert(Dedup.ngramJaccard(docs, 3, maxDf = 1000L).collect().toSeq ==
      Dedup.ngramJaccard(docs, 3).collect().toSeq)
    // df <= 2 drops the universal grams: only truly-similar pairs remain,
    // so the hot-gram bucket no longer produces a quadratic candidate set
    val pruned = Dedup.ngramJaccard(docs, 3, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == Set((1L, 2L), (3L, 4L)))
  }

  test("simhash blocked candidates: complete vs brute force for hamming < nBlocks, no cartesian plan") {
    val rng = new Random(2026)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    // clusters of near-identical docs (one word tweaked) + random docs
    val rows = (0 until 40).map { i =>
      val base = Vector.fill(12)(vocab(rng.nextInt(vocab.size)))
      val text = if (i % 4 == 1) base.updated(3, "tweak").mkString(" ")
        else base.mkString(" ")
      (i.toLong, text, "en", "a", text.length.toLong)
    }
    val docs = docsDf(rows)
    val blocked = Dedup.simhashCandidates(docs, maxHamming = 3, nBlocks = 4)
    // plan shape: (block, bv) equi-join, never a nested-loop cartesian
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // completeness: pigeonhole guarantees every pair within maxHamming
    val sigs = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys
      if a < b && java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
  }

  test("sampling: hash split is exhaustive, deterministic and repartition-stable") {
    val docs = docsDf((1 to 500).map(i =>
      (i.toLong, s"document number $i content", "en", "a", 25L)))
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Sampling.assignSplit(docs, col("doc_id").cast("string"), w)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500L)
    // roughly proportional (hash-uniform; wide tolerance)
    assert(counts("train") > 300L && counts("val") < 120L && counts("test") < 120L)
    // repartitioning must not move any row between splits
    val again = Sampling.assignSplit(docs.repartition(7),
      col("doc_id").cast("string"), w)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
    // stratified: absent stratum defaults to dropped
    val mixed = docsDf(Seq(
      (1L, "aa", "en", "a", 2L), (2L, "bb", "xx", "a", 2L)))
    val kept = Sampling.stratifiedSample(mixed, col("lang"), col("text"),
      Map("en" -> 1.0)).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.2)))
  }

  test("packing: lengthBuckets splits into ~equal-frequency ordered buckets") {
    val docs = docsDf((1 to 400).map(i =>
      (i.toLong, "x", "en", "a", i.toLong))) // lengths 1..400
    val b = Packing.lengthBuckets(docs, "n_chars", 4)
      .groupBy("len_bucket")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max(col("n_chars")).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(b.keySet == Set(1, 2, 3, 4))
    assert(b.values.map(_._1).sum == 400L)
    b.values.foreach { case (n, _) => assert(n >= 90L && n <= 110L, b.toString) }
    // buckets are ordered by length: max of bucket i < max of bucket i+1
    assert(b(1)._2 < b(2)._2 && b(2)._2 < b(3)._2 && b(3)._2 < b(4)._2)
  }

  test("similarity: int8 quantization bounds and zero-vector guard") {
    val s2 = spark
    import s2.implicits._
    val emb = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0), // all-zero: scale 0, q all 0
      (2L, Array(2.0f, 2.0f, -2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Similarity.quantizeStats(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // vec 0: scale 1.0 → q = (64, -127, 32)
    assert(q(0L) == ((-31L, -127L, 64L, 1000000L)))
    assert(q(1L) == ((0L, 0L, 0L, 0L)))
    // vec 2: scale 2 → q = (127, 127, -127)
    assert(q(2L) == ((127L, -127L, 127L, 2000000L)))
    q.values.foreach { case (_, mn, mx, _) =>
      assert(mn >= -127L && mx <= 127L)
    }
  }

  test("sampling: shardAssign is a repartition-stable deterministic shuffle") {
    val docs = docsDf((1 to 400).map(i =>
      (i.toLong, s"doc $i", "en", "a", 5L)))
    val sharded = Sampling.shardAssign(docs, col("doc_id").cast("string"), 8)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(sharded.size == 400)
    // every shard's positions are exactly 0..n-1 (a permutation)
    sharded.values.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.map(_._2).toSeq.sorted == (0L until vs.size).toSeq)
    }
    // repartitioning changes nothing — shard AND position are content-keyed
    val again = Sampling.shardAssign(
      docs.repartition(5), col("doc_id").cast("string"), 8)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(again == sharded)
  }

  test("connected components: chains merge across hops to the min id") {
    val s2 = spark
    import s2.implicits._
    // chain 1-2-3-4 (needs multi-hop propagation), pair 10-11, singleton edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 20L)
    // long chain converges within the iteration cap
    val chain = (0 until 30).map(i => (i.toLong, i + 1L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(chain).collect().map(_.getLong(1)).toSet
    assert(cc == Set(0L))
    // the driver union-find fast path and the distributed label
    // propagation produce IDENTICAL assignments
    val viaDriver = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLabelProp = Dedup.connectedComponents(pairs, driverThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDriver == viaLabelProp)
  }

  test("connected components hub guard: star graph over the degree threshold " +
      "salts the propagation join and still converges") {
    val s2 = spark
    import s2.implicits._
    // hubSalts is the decision function the guard runs on the measured max
    // degree — pin its envelope
    assert(Dedup.hubSalts(100000L, 100000L) == 1)
    assert(Dedup.hubSalts(100001L, 100000L) == 2)
    assert(Dedup.hubSalts(350000L, 100000L) == 4)
    assert(Dedup.hubSalts(100000000L, 100000L) == 32) // capped
    assert(Dedup.hubSalts(5L, 0L) == 1)               // guard disabled
    // a 120k-edge star (node 0 is the hub): force the distributed path and
    // a low threshold so the salted hop actually runs, and verify the
    // fixpoint still lands every node on the hub's min id
    val n = 120000
    val star = s2.range(1, n + 1).select(lit(0L).as("a_id"), col("id").as("b_id"))
    val comp = Dedup.connectedComponents(star, driverThreshold = 0,
      hubDegreeThreshold = 10000L)
    assert(comp.filter(col("component") =!= 0L).count() == 0L)
    assert(comp.count() == (n + 1).toLong)
    // salted and unsalted distributed paths agree on a mixed graph
    val mixed = Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (9L, 5L))
      .toDF("a_id", "b_id")
    val unsalted = Dedup.connectedComponents(mixed, driverThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.connectedComponents(mixed, driverThreshold = 0,
        hubDegreeThreshold = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unsalted == salted)
  }

  test("bandCollisionPairs keeps the full edge structure bandCollisions " +
      "aggregates away") {
    val s2 = spark
    import s2.implicits._
    // batch doc 150 collides with corpus docs 100 AND 200 (different
    // bands): the gate's aggregate keeps only dup_of = min = 100, but
    // the ledger fold needs BOTH edges or the two standing components
    // never merge
    val batchSigs = Seq((150L, 0, 111L), (150L, 1, 222L), (151L, 2, 333L))
      .toDF("doc_id", "band", "band_sig")
    val index = Seq((100L, 0, 111L), (200L, 1, 222L), (100L, 2, 999L))
      .toDF("doc_id", "band", "band_sig")
    val agg = Dedup.bandCollisions(batchSigs, index).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg == Map(150L -> 100L)) // the lost edge: (150, 200)
    val pairs = Dedup.bandCollisionPairs(batchSigs, index).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((150L, 100L), (150L, 200L)))
  }

  test("incremental components: batch folds match from-scratch, touch only " +
      "affected components, and are idempotent") {
    val s2 = spark
    import s2.implicits._
    def asMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def merge(assign: DataFrame, delta: DataFrame): DataFrame = assign
      .join(broadcast(delta.select("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(delta).localCheckpoint()

    // standing: {1,2,3}, {10,11}, {20,21}
    val standing = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a_id", "b_id"))
      .localCheckpoint()

    // a NEW doc joins an existing component: the delta is exactly the
    // new row — untouched components and unchanged members never appear
    val d1 = Dedup.incrementalComponents(standing,
      Seq((11L, 30L)).toDF("a_id", "b_id"))
    assert(asMap(d1) == Map(30L -> 10L))

    // a new doc with the SMALLEST id takes over the merged component's
    // label (the min-id invariant holds across generations)
    val d2 = Dedup.incrementalComponents(standing,
      Seq((0L, 21L)).toDF("a_id", "b_id"))
    assert(asMap(d2) == Map(0L -> 0L, 20L -> 0L, 21L -> 0L))

    // a batch edge BRIDGES two standing components: the loser's members
    // relabel, the winner's and bystanders' do not
    val d3 = Dedup.incrementalComponents(standing,
      Seq((3L, 10L)).toDF("a_id", "b_id"))
    assert(asMap(d3) == Map(10L -> 1L, 11L -> 1L))

    // both endpoint-resolution tiers (pushed IN literal vs broadcast
    // semi-join) produce the identical delta
    val d3join = Dedup.incrementalComponents(standing,
      Seq((3L, 10L)).toDF("a_id", "b_id"), resolveInMaxIds = 0)
    assert(asMap(d3join) == asMap(d3))

    // idempotence: re-folding an already-absorbed batch is a no-op
    val after = merge(standing, d3)
    assert(Dedup.incrementalComponents(after,
      Seq((3L, 10L)).toDF("a_id", "b_id")).count() == 0L)

    // bootstrap: an EMPTY standing assignment reproduces from-scratch
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "component")
    val pairs0 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    assert(asMap(Dedup.incrementalComponents(empty, pairs0)) ==
      asMap(Dedup.connectedComponents(pairs0)))

    // randomized multi-batch fold == one global recompute (seeded)
    val rnd = new Random(20260815)
    val edges = Seq.fill(240)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(e => e._1 != e._2)
    val global = asMap(Dedup.connectedComponents(edges.toDF("a_id", "b_id")))
    var assign = Seq.empty[(Long, Long)].toDF("doc_id", "component")
      .localCheckpoint()
    edges.grouped(60).foreach { batch =>
      assign = merge(assign,
        Dedup.incrementalComponents(assign, batch.toDF("a_id", "b_id")))
    }
    assert(asMap(assign) == global)
  }

  test("winnowRemoval excises shared spans and rebuilds the survivors byte-exact") {
    val s2 = spark
    import s2.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"unique lead-in $shared"),
      (2L, s"$shared different tail words here"),
      (3L, "totally unrelated content with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowRemoval(docs, k = 5, window = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // only the two overlapping docs are affected; the single shared
    // fingerprint is the "beta gamma delta epsilon zeta" gram (verified
    // against an independent Python replay of the algorithm), so exactly
    // its 5-token span is excised from each doc
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((10L, 5L, "unique lead-in alpha eta theta")))
    assert(out(2L) == ((12L, 5L, "alpha eta theta different tail words here")))
    // deterministic: a second run rebuilds byte-identical text
    val again = Dedup.winnowRemoval(
      docs.select(col("doc_id"), col("text")), k = 5, window = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again(1L) == out(1L)._3 && again(2L) == out(2L)._3)
  }

  test("asof join: reserved and colliding column names fail fast") {
    val s2 = spark
    import s2.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "payload")
    val r = Seq((1L, 5L, 2.0)).toDF("k", "ts", "v")
    val lBad = Seq((1L, 10L, "x")).toDF("k", "ts", "__side")
    intercept[IllegalArgumentException](AsOf.asofJoin(lBad, r, "k", "ts"))
    val lClash = Seq((1L, 10L, "x")).toDF("k", "ts", "r_v")
    intercept[IllegalArgumentException](AsOf.asofJoin(lClash, r, "k", "ts"))
    // clean inputs still work
    assert(AsOf.asofJoin(l, r, "k", "ts").count() == 1L)
  }

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("similarity: knn ranks the aligned vector first") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, Seq(0.9f, 0.1f, 0f), 0),
      (2L, Seq(0f, 1f, 0f), 0),
      (3L, Seq(-1f, 0f, 0f), 0)))
    val top = Similarity.knn(e, 0L, 2).collect()
    assert(top.head.getAs[Long]("vec_id") == 1L)
    assert(top.head.getAs[Double]("sim") > 0.99)
  }

  test("similarity: hard negatives are the nearest DIFFERENT-label vectors") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f, 0f), 0),      // probe, label 0
      (1L, Seq(0.95f, 0.05f, 0f), 0), // same label: excluded even if nearest
      (2L, Seq(0.9f, 0.1f, 0f), 1),   // hard negative (near-miss)
      (3L, Seq(0f, 1f, 0f), 1),       // easy negative
      (4L, Seq(-1f, 0f, 0f), 2)))     // opposite
    val out = Similarity.hardNegatives(e, col("vec_id") === 0L, k = 2).collect()
    assert(out.map(_.getAs[Long]("c_id")).toSeq == Seq(2L, 3L))
    assert(out.forall(_.getAs[Int]("c_label") != 0))
    assert(out.map(_.getAs[Int]("rn")).toSeq == Seq(1, 2))
  }

  test("bpe fertility: multi-token words raise a language's permille") {
    val docs = docsDf(Seq(
      (1L, "aa aa aa aa", "aa-lang", "s", 0L),
      (2L, "xy zq xy zq", "xx-lang", "s", 0L)))
    // one merge round learns (a,a) -> every "aa" word becomes ONE token;
    // "xy"/"zq" words stay two single-char tokens each
    val merges = Bpe.trainMerges(docs, nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "a")))
    val out = Bpe.fertilityByLang(docs, merges).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("fertility_milli")).toMap
    assert(out("aa-lang") == 1000L) // 4 words -> 4 tokens
    assert(out("xx-lang") == 2000L) // 4 words -> 8 tokens
  }

  test("clusterBalancedSample caps every learned cluster and is stable across runs") {
    val e = embDf((0L until 40L).map { i =>
      // four well-separated axis clusters, 10 members each
      val base = Array(0f, 0f, 0f, 0f); base((i % 4).toInt) = 1f
      base((i % 4).toInt) += (i / 4).toFloat * 0.01f
      (i, base.toSeq, (i % 4).toInt)
    })
    val out = Sampling.clusterBalancedSample(e, k = 4, iters = 2, cap = 3)
    val byCluster = out.collect().groupBy(_.getAs[Int]("cluster"))
    assert(byCluster.values.forall(_.length <= 3))
    assert(byCluster.values.forall(_.map(_.getAs[Int]("sample_rank")).sorted
      .sameElements(1 to math.min(3, 10))))
    // deterministic: a second run picks the identical survivors
    val again = Sampling.clusterBalancedSample(e, k = 4, iters = 2, cap = 3)
    assert(out.collect().map(_.toSeq).toSeq == again.collect().map(_.toSeq).toSeq)
  }

  test("similarity: ivf top-1 searches only the probe's partition") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0.8f, 0.2f), 0),
      (2L, Seq(1f, 0.001f), 1))) // closer, but different coarse partition
    val rows = Similarity.ivfTop1(e, col("vec_id") === 0).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("c_id") == 1L)
  }

  test("semantic decontam: near-identical cross-split vector flagged, distant one not") {
    // probe 100 ≈ corpus 0 (same direction — same LSH bucket, cosine ≈ 1);
    // corpus 1 is orthogonal to every probe
    val e = embDf(Seq(
      (0L, Seq(1f, 0.01f, 0f, 0.02f), 0),
      (1L, Seq(0f, 0f, 1f, 0f), 0),
      (100L, Seq(0.99f, 0.011f, 0f, 0.02f), 1),
      (101L, Seq(0f, 1f, 0f, 0f), 1)))
    val out = Similarity.semanticDecontam(e, col("vec_id") >= 100L, 0.9)
      .collect()
    assert(out.map(_.getAs[Long]("c_id")).toSeq == Seq(0L))
    assert(out.head.getAs[Double]("top_sim") > 0.99)
    assert(out.head.getAs[Long]("first_probe") == 100L)
  }

  test("semdedup: in-cluster near-dup dropped with min-id dup_of, cross-cluster twin kept") {
    // two clusters (k=2, seeded by the two lowest ids): 0/1/2 align on x,
    // 3 aligns on y. 1 and 2 are near-dups of 0 (dup_of = 0 for both);
    // 3 has no in-cluster neighbor so it survives even though nothing
    // else is checked against it
    val e = embDf(Seq(
      (0L, Seq(1f, 0f), 0),
      (3L, Seq(0f, 1f), 0),
      (1L, Seq(0.99f, 0.01f), 0),
      (2L, Seq(0.98f, 0.02f), 0)))
    val out = Similarity.semDeDup(e, k = 2, iters = 2, threshold = 0.9).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
    assert(out.forall(_.getAs[Long]("dup_of") == 0L))
    assert(out.forall(_.getAs[Double]("max_sim") > 0.9))
  }

  test("pq search: ADC ranks the near-identical vector first") {
    // two tight groups in 8-d; probe 0's nearest true neighbor is 1
    val e = embDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.95f, 0.05f, 0f, 0f, 0.95f, 0.05f, 0f, 0f), 0),
      (2L, Seq(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f), 1),
      (3L, Seq(0f, 0f, 0.9f, 0.1f, 0f, 0f, 0.9f, 0.1f), 1)))
    val out = Similarity.pqSearch(e, col("vec_id") === 0L,
      m = 2, k = 2, iters = 2, topK = 3).collect()
    assert(out.length == 3)
    assert(out.head.getAs[Long]("c_id") == 1L) // same-group vector wins ADC
    assert(out.head.getAs[Int]("rn") == 1)
    // ADC distances ascend with rank
    val adcs = out.map(_.getAs[Long]("adc_micro")).toSeq
    assert(adcs == adcs.sorted)
  }

  test("pq search: empty probe set and empty corpus return empty frames, not errors") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0f, 1f, 0f, 0f), 0)))
    val noProbes = Similarity.pqSearch(e, col("vec_id") > 100L, m = 2, k = 2)
    assert(noProbes.collect().isEmpty)
    assert(noProbes.columns.toSeq == Seq("q_id", "c_id", "adc_micro", "rn"))
    val noCorpus = Similarity.pqSearch(
      e.filter(col("vec_id") < 0), col("vec_id") === 0L, m = 2, k = 2)
    assert(noCorpus.collect().isEmpty)
  }

  test("writeShards: duplicate shard keys fail fast instead of silent nondeterminism") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export-dup").toString
    val docs = docsDf(Seq(
      (1L, "a", "en", "a", 1L), (2L, "b", "en", "a", 1L)))
    val e = intercept[IllegalArgumentException] {
      Export.writeShards(docs, col("lang"), 2, s"$dir/x") // lang ties
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("dedup lines: separator containing a quote does not break expression parsing") {
    val docs = docsDf(Seq(
      (1L, "dup' part' unique one", "en", "a", 21L),
      (2L, "dup' other text", "en", "b", 15L)))
    val out = Dedup.dedupLines(docs, minDf = 2, sep = "' ").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("new_text")).toMap
    assert(out(1L) == "part' unique one")
    assert(out(2L) == "other text")
  }

  test("kmeans: deterministic assignment, full coverage, shuffle-free argmin") {
    val rng = new Random(99)
    // three well-separated blobs in 8-d
    val rows = (0 until 90).map { i =>
      val center = i % 3
      val v = Array.tabulate(8)(d =>
        (if (d % 3 == center) 5f else 0f) + rng.nextFloat() * 0.2f)
      (i.toLong, v.toSeq, center)
    }
    val e = embDf(rows)
    val m = Clustering.kmeans(e, 3, 3)
    val assigned = m.assignments.collect()
    assert(assigned.length == 90)
    // every vector got a cluster in [0, 3)
    assert(assigned.forall(r => (0 until 3).contains(r.getAs[Int]("cluster"))))
    // well-separated blobs: after 3 rounds each blob maps to ONE cluster
    val byBlob = assigned.groupBy(_.getAs[Long]("vec_id") % 3)
      .map { case (b, rs) => b -> rs.map(_.getAs[Int]("cluster")).toSet }
    assert(byBlob.values.forall(_.size == 1))
    // deterministic: identical stats on a re-run
    val s1 = Clustering.clusterStats(m).collect().toSeq
    val s2 = Clustering.clusterStats(Clustering.kmeans(e, 3, 3)).collect().toSeq
    assert(s1 == s2)
    // centroids moved off the 3 seed vectors after the update
    assert(m.centroids != Clustering.kmeans(e, 3, 1).centroids)
    // the assignment stage is a pure projection: no shuffle in its plan
    val plan = Clustering.assign(e, m.centroids).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    // learned-quantizer IVF: every probe finds a same-blob neighbor
    val ivf = Similarity.ivfSearch(e, m.centroids, col("vec_id") < 6).collect()
    assert(ivf.length == 6)
    ivf.foreach { r =>
      assert(r.getAs[Long]("q_id") % 3 == r.getAs[Long]("c_id") % 3)
      assert(r.getAs[Double]("sim") > 0.9)
    }
  }

  test("text: quality score stays in [0,1] and tokens count correctly") {
    val docs = docsDf(Seq(
      (1L, "Clean prose with words.", "en", "a", 23L),
      (2L, "!!!???...,,,", "en", "a", 12L)))
    val scores = docs.select(TextStats.qualityScore(col("text")).as("s")).collect()
    scores.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
    val toks = docs.select(TextStats.wsTokens(col("text"))).collect().map(_.getInt(0))
    assert(toks(0) == 4)
  }

  test("winnowing: shared span yields shared fingerprints, unique doc absent") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = docsDf(Seq(
      (1L, shared, "en", "a", shared.length.toLong),
      (2L, shared + " iota kappa", "en", "a", (shared.length + 11).toLong),
      (3L, "one two three four five six seven eight nine", "en", "a", 44L),
      (4L, "too short to window", "en", "a", 19L)))
    val out = Dedup.winnowedDupSpans(docs, k = 5, window = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_fps"), r.getAs[Long]("dup_fps"))).toMap
    // the 8-token shared span >= window + k - 1 guarantees a common
    // fingerprint between docs 1 and 2; docs 3/4 must not appear
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._2 >= 1L && out(2L)._2 >= 1L)
    out.values.foreach { case (n, d) => assert(d <= n) }
  }

  test("exactSubstrRemoval excises covered tokens byte-exact; clean docs untouched") {
    val shared = "alpha beta gamma delta epsilon zeta"  // exactly one 6-gram
    val docs = docsDf(Seq(
      (1L, "intro words here " + shared + " tail words", "en", "a", 0L),
      (2L, shared, "en", "a", 0L),
      (3L, "totally unique sentence with no duplicate grams at all", "en", "a", 0L)))
    val out = Dedup.exactSubstrRemoval(docs, k = 6, minOccurs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("new_text")))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((6L, "intro words here tail words")))
    assert(out(2L) == ((6L, "")))  // fully duplicated doc empties out
  }

  test("exactDupSpans: adjacent dup grams merge into one maximal span; " +
      "within-doc repeats count; clean docs absent") {
    // docs 1/2 share a 9-token sentence -> its 4 6-grams mark tokens
    // 0..8 as ONE merged span of 9 in each doc
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    // doc 3 repeats the same 6 tokens twice WITHIN itself (self-dup):
    // both occurrences are spans (separated by unique filler)
    val rep = "uno dos tres cuatro cinco seis"
    val docs = docsDf(Seq(
      (1L, shared, "en", "a", shared.length.toLong),
      (2L, shared + " kappa lambda", "en", "a", 0L),
      (3L, rep + " filler1 filler2 filler3 filler4 filler5 filler6 filler7 " + rep,
        "en", "a", 0L),
      (4L, "one two three four five six seven eight nine ten", "en", "a", 0L)))
    val out = Dedup.exactDupSpans(docs, k = 6, minOccurs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("max_span")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((1L, 9L, 9L))) // one merged maximal span, all 9 tokens
    assert(out(2L) == ((1L, 9L, 9L))) // same span inside the longer doc
    assert(out(3L) == ((2L, 12L, 6L))) // two separate 6-token self-dup spans
  }

  test("perceptron quality training separates disjoint vocabularies; " +
      "weights score fresh docs") {
    // two classes with disjoint bigrams: linearly separable, so the
    // batch perceptron must reach a zero-error confusion matrix
    val docs = docsDf(Seq(
      (1L, "good clean prose reads well here", "en", "a", 0L),
      (2L, "good clean text reads well here", "en", "a", 0L),
      (3L, "spam junk noise garbage filler spam", "xx", "b", 0L),
      (4L, "junk noise spam garbage filler junk", "xx", "b", 0L)))
    val confusion = Selection.trainQualityPerceptron(
        docs, col("lang") === "en", buckets = 64, rounds = 3)
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("predicted"),
        r.getAs[Long]("n_docs"))).toSeq
    assert(confusion == Seq((-1L, -1L, 2L), (1L, 1L, 2L)))

    // the trained weights transfer: a fresh doc from the good vocabulary
    // scores positive, one from the junk vocabulary negative
    val (w, _) = Selection.perceptronWeights(
      docs, col("lang") === "en", buckets = 64, rounds = 3)
    def score(text: String): Long = {
      val toks = text.split("\\s+")
      toks.sliding(2).map(_.mkString(" ")).map { bg =>
        val b = graft.expr.Md5Ops.md5Prefix(
          org.apache.spark.unsafe.types.UTF8String.fromString(bg), 8) % 64
        w.getOrElse(b, 0L)
      }.sum
    }
    assert(score("clean prose reads well") > 0)
    assert(score("spam junk noise garbage") < 0)

    // the adaptive driver path and the distributed per-round path must
    // produce identical integer weights (driverRowLimit = 0 forces the
    // distributed loop)
    val (wDist, _) = Selection.perceptronWeights(
      docs, col("lang") === "en", buckets = 64, rounds = 3,
      driverRowLimit = 0)
    assert(wDist == w)
  }

  test("corpusDrift: disjoint slices drift hard, identical slices drift zero") {
    val disjoint = docsDf(Seq(
      (0L, "alpha beta alpha beta alpha beta", "en", "a", 0L),
      (2L, "alpha beta alpha beta", "en", "a", 0L),
      (1L, "uno dos uno dos uno dos", "xx", "b", 0L),
      (3L, "uno dos uno dos", "xx", "b", 0L)))
    val top = TextStats.corpusDrift(disjoint, col("doc_id") % 2 === 0,
      buckets = 64, topK = 5).collect()
    // every bucket is exclusive to one slice: drift = its full share
    assert(top.nonEmpty)
    top.foreach(r => assert(r.getAs[Long]("n_a") == 0L || r.getAs[Long]("n_b") == 0L))
    assert(top.head.getAs[Long]("drift_micro") > 400000L) // >40% of one side

    val same = docsDf(Seq(
      (0L, "alpha beta gamma delta", "en", "a", 0L),
      (1L, "alpha beta gamma delta", "en", "a", 0L)))
    val zero = TextStats.corpusDrift(same, col("doc_id") % 2 === 0,
      buckets = 64, topK = 5).collect()
    assert(zero.forall(_.getAs[Long]("drift_micro") == 0L))
  }

  test("text: gopher rules flag each heuristic independently") {
    val docs = docsDf(Seq(
      (1L, "the cat and dog run", "en", "a", 19L),                   // passes all
      (2L, "hi there", "en", "b", 8L),                               // too short + no stopwords
      (3L, "the cat ### and ### dog", "en", "c", 23L),               // symbols (+ alpha)
      (4L, "- the cat\n- and dog", "en", "d", 19L),                  // bullets (+ meanlen, alpha)
      (5L, "the end is near...\nand more to come...", "en", "e", 38L), // ellipsis (+ symbols)
      (6L, "cat dog bird fish", "en", "f", 17L),                     // no stopwords
      (7L, "supercalifragilistic expialidocious abcdefghijklmnop", "en", "g", 52L))) // long words
    val out = TextStats.gopherRules(docs, minWords = 3, maxWords = 10)
      .orderBy("source").collect()
    def flags(i: Int): Map[String, Long] = {
      val r = out(i)
      r.schema.fieldNames.filter(c => c.startsWith("fail_") || c == "pass_all")
        .map(c => c -> r.getAs[Long](c)).toMap
    }
    assert(out.map(_.getAs[String]("source")).toSeq ==
      Seq("a", "b", "c", "d", "e", "f", "g"))
    assert(out.forall(_.getAs[Long]("n_docs") == 1L))
    assert(flags(0).values.sum == 1L && flags(0)("pass_all") == 1L)
    assert(flags(1)("fail_wordcount") == 1L && flags(1)("fail_stopword") == 1L)
    assert(flags(2)("fail_symbol") == 1L && flags(2)("fail_alpha") == 1L)
    assert(flags(3)("fail_bullet") == 1L && flags(3)("fail_meanlen") == 1L &&
      flags(3)("fail_alpha") == 1L)
    assert(flags(4)("fail_ellipsis") == 1L && flags(4)("fail_symbol") == 1L)
    assert(flags(5) == Map("fail_wordcount" -> 0L, "fail_meanlen" -> 0L,
      "fail_symbol" -> 0L, "fail_bullet" -> 0L, "fail_ellipsis" -> 0L,
      "fail_alpha" -> 0L, "fail_stopword" -> 1L, "pass_all" -> 0L))
    assert(flags(6)("fail_meanlen") == 1L && flags(6)("fail_stopword") == 1L)
  }

  test("text: character entropy separates spam from balanced text") {
    val docs = docsDf(Seq(
      (1L, "aaaaaaaa", "en", "a", 8L),   // zero entropy
      (2L, "abababab", "en", "a", 8L),   // 2 symbols, p=0.5 each
      (3L, "abcdefgh", "en", "a", 8L)))  // 8 symbols, maximal
    val e = TextStats.charEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("entropy_micro")).toMap
    assert(e(1L) == 0L)
    assert(e(2L) == 693148L)  // -2 * floor(0.5 * ln 0.5 * 1e6)
    assert(e(1L) < e(2L) && e(2L) < e(3L))
  }

  test("dup ngram chars: planted repeated trigram dominates, clean doc absent") {
    val rep = "alpha beta gamma delta alpha beta gamma delta alpha beta gamma"
    val clean = "one two three four five six seven eight nine ten"
    val docs = docsDf(Seq(
      (1L, rep, "en", "a", rep.length.toLong),
      (2L, clean, "en", "a", clean.length.toLong)))
    val out = TextStats.dupNgramChars(docs, 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L)) // clean doc filtered
    val r = out.head
    // 9 trigrams total; "alpha beta gamma" ×3 and the two ×2 bridges all dup
    assert(r.getAs[Long]("n_grams") == 9L)
    assert(r.getAs[Long]("dup_chars") > 0L)
    assert(r.getAs[Long]("dup_permille") > 500L)
    assert(r.getAs[Long]("dup_chars") <= r.getAs[Long]("gram_chars"))
  }

  test("temperature weights: small sources upsample, large ones downsample") {
    val docs = docsDf(Seq(
      (1L, "x", "en", "big", 90000L),
      (2L, "x", "en", "small", 100L)))
    val out = Mixing.temperatureWeights(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("natural_permille"), r.getAs[Long]("share_permille"))).toMap
    val (bigNat, bigShare) = out("big")
    val (smallNat, smallShare) = out("small")
    assert(bigShare < bigNat)      // temperature flattens the head
    assert(smallShare > smallNat)  // and lifts the tail
    // sqrt determinism: floor(sqrt(90000)*1e6) = 300 * 1e6 exactly
    assert(bigShare + smallShare <= 1000L)
  }

  test("sampling: prioritySample takes exactly k per stratum, stable under repartition") {
    val s2 = spark
    import s2.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val k = 5
    val once = Sampling.prioritySample(df, col("grp"), col("id").cast("string"), k)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Int]("sample_rank"),
        r.getAs[Long]("id"))).sorted.toSeq
    assert(once.count(_._1 == "a") == k && once.count(_._1 == "b") == k)
    assert(once.filter(_._1 == "a").map(_._2).toSeq == (1 to k))
    // deterministic: identical survivors from a differently-partitioned input
    val again = Sampling.prioritySample(df.repartition(7), col("grp"),
        col("id").cast("string"), k)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Int]("sample_rank"),
        r.getAs[Long]("id"))).sorted.toSeq
    assert(once == again)
  }

  test("dedup: degree histogram counts neighbors on both edge ends") {
    val s2 = spark
    import s2.implicits._
    // star: 1-2, 1-3, 1-4 → node 1 degree 3, nodes 2,3,4 degree 1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    val out = Dedup.degreeHistogram(pairs).collect()
      .map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map(1L -> 3L, 3L -> 1L))
  }

  test("text: bigram familiarity scores corpus-typical text above gibberish") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the hat"),
      (2L, "the mat sat on the cat"),
      (3L, "zqxj qzxv jxqz")).toDF("doc_id", "text")
    val out = TextStats.bigramFamiliarity(docs, lit(true)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("familiarity_milli")).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    // the English-ish docs share most bigrams; the gibberish doc does not
    assert(out(3L) < out(0L) && out(3L) < out(1L) && out(3L) < out(2L))
    // exact integer check on a tiny corpus: "aa" has corpus count 2
    val tiny = Seq((0L, "aa"), (1L, "aa")).toDF("doc_id", "text")
    val t = TextStats.bigramFamiliarity(tiny, col("doc_id") === 0L).collect()
    assert(t.length == 1 && t.head.getAs[Long]("familiarity_milli") == 2000L)
  }

  test("format: byte/compact/path formatting matches the reference shapes") {
    import graft.expr.Format
    val s2 = spark
    import s2.implicits._
    val df = Seq(512L, 2048L, 3145728L).toDF("b")
      .select(Format.formatBytes(col("b")).as("s"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("512 B", "2.0 KB", "3.0 MB"))
    val p = Seq("a/b/c.parquet", ("x/" * 40) + "file.parquet").toDF("p")
      .select(Format.truncatePath(col("p")).as("s")).collect().map(_.getString(0))
    assert(p(0) == "a/b/c.parquet")
    assert(p(1) == ".../file.parquet")
  }
}
