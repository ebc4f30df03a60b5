package graft.ops

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine

/** [[Engine.forget]] — ONE ordered verb for corpus deletion across every
  * piece of standing state. The spec is the verdict contract: after one
  * call, the doc is absent from corpus reads, a fresh copy re-admits
  * through the gate, the affected ledger components equal the
  * from-scratch closure over the survivors, and ANN search stops
  * returning the vector. */
class ForgetSpec extends SparkSpec {

  private def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("forget retires one id set across corpus, gate, ledger, and ANN " +
      "index in the required order") {
    val s2 = spark
    import s2.implicits._
    val wh = java.nio.file.Files.createTempDirectory("forget").toString
    val e = new Engine(spark, wh)

    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val textC = "sphinx of black quartz judge my vow tonight folks"
    val docs = Seq((1L, textA), (2L, textA), (3L, textB), (4L, textC))
      .toDF("doc_id", "text")
    e.createTable("lake.corpus", docs.schema)
    e.append("lake.corpus", docs)

    val gate = new NearDupIndex(e, "lake.gate")
    gate.create(); gate.bootstrap(docs)
    val comps = new ComponentIndex(e, "lake.comps")
    comps.create()
    comps.bootstrap(gate.pairsAmong(docs.select("doc_id")))
    assert(asMap(comps.assignments) == Map(2L -> 1L)) // {1,2} are dups

    val vecs = Seq(
      AnnIndexSpec.Vec(1L, 0, Seq(1f, 0f, 0f, 0f)),
      AnnIndexSpec.Vec(2L, 0, Seq(0.9f, 0.1f, 0f, 0f)),
      AnnIndexSpec.Vec(3L, 1, Seq(0f, 0f, 1f, 0f)),
      AnnIndexSpec.Vec(4L, 1, Seq(0f, 0f, 0.1f, 0.9f))).toDF()
    val ann = new AnnIndex(e, "lake.ann", kClusters = 2, iters = 2)
    ann.create(); ann.bootstrap(vecs)
    val probe3 = Seq((100L, Seq(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    assert(ann.search(probe3, 2, 2).select("c_id").as[Long].collect()
      .contains(3L))

    // ---- the verb under test: forget docs 2 (a dup of 1) and 3 ----
    val r = e.forget(Seq(2L, 3L), corpusRef = Some("lake.corpus"),
      gate = Some(gate), ledger = Some(comps), annIndex = Some(ann),
      ledgerPairs = None, idColumn = "doc_id")
    assert(r.corpusDeleted.contains("lake.corpus") && r.gateRetired
      && r.annRetired)

    // 1. corpus reads no longer return the forgotten docs
    assert(e.readTable("lake.corpus").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 4L))

    // 2. the gate no longer rejects a FRESH copy of forgotten text (no
    // ghost signatures), while a copy of a RETAINED doc still gates
    val fresh = Seq((99L, textB)).toDF("doc_id", "text")
    assert(gate.check(fresh).count() == 0L, "ghost rejection after forget")
    assert(gate.check(Seq((98L, textA)).toDF("doc_id", "text")).count() > 0L,
      "doc 1 is still corpus-resident — its dups must still gate")

    // 3. the affected ledger component re-clustered: {1,2} lost 2, so 1
    // is a singleton again and the sparse store is empty — exactly the
    // from-scratch closure over the surviving docs' pairs
    assert(comps.assignments.count() == 0L)
    assert(asMap(r.ledgerRemaining.get) == Map(1L -> 1L))

    // 4. ANN search stops serving the forgotten vector; the quantizer
    // survives (frozen — deletion is not distribution shift)
    assert(!ann.search(probe3, 2, 2).select("c_id").as[Long].collect()
      .contains(3L))
    assert(ann.centroids.nonEmpty)

    // idempotence posture: forgetting again touches nothing the reader
    // can observe
    e.forget(Seq(2L, 3L), corpusRef = Some("lake.corpus"),
      gate = Some(gate), ledger = Some(comps), annIndex = Some(ann),
      ledgerPairs = None, idColumn = "doc_id")
    assert(e.readTable("lake.corpus").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 4L))
    assert(comps.assignments.count() == 0L)
  }

  test("forget with a ledger but neither gate nor ledgerPairs is refused " +
      "(a silent no-pair retire would degrade provenance to singletons)") {
    val s2 = spark
    import s2.implicits._
    val wh = java.nio.file.Files.createTempDirectory("forgetref").toString
    val e = new Engine(spark, wh)
    val comps = new ComponentIndex(e, "lake.only_comps")
    comps.create()
    val ex = intercept[IllegalArgumentException] {
      e.forget(Seq(1L), corpusRef = None, gate = None,
        ledger = Some(comps), annIndex = None, ledgerPairs = None,
        idColumn = "doc_id")
    }
    assert(ex.getMessage.contains("residual pairs"))
  }

  test("gate-composed ledger: forget with pairsFromDocs keeps rejected " +
      "docs' provenance through a bystander retire") {
    val s2 = spark
    import s2.implicits._
    val wh = java.nio.file.Files.createTempDirectory("forgetprov").toString
    val e = new Engine(spark, wh)
    val textX = "the quick brown fox jumps over the lazy dog"
    val docs = Seq((1L, textX), (2L, textX), (3L, textX))
      .toDF("doc_id", "text").localCheckpoint()
    val gate = new NearDupIndex(e, "lake.pg")
    val comps = new ComponentIndex(e, "lake.pc")
    gate.create(); comps.create()
    // 1 and 2 admitted; 3 REJECTED later — its provenance edge is in the
    // ledger but its signatures never entered the gate
    gate.bootstrap(docs.filter(col("doc_id") <= 2L))
    val sigs3 = Dedup.bandSignatures(
      docs.filter(col("doc_id") === 3L), gate.numPerm, gate.rowsPerBand)
    comps.fold(Dedup.bandCollisionPairs(sigs3, gate.signatures)
      .select(col("doc_id").as("a_id"), col("corpus_doc_id").as("b_id")))
    assert(asMap(comps.assignments) == Map(2L -> 1L, 3L -> 1L))

    // forget bystander 2 with the DOCS-based provider: doc 3's
    // dup-of-1 provenance must survive
    e.forget(Seq(2L), corpusRef = None, gate = Some(gate),
      ledger = Some(comps), annIndex = None,
      ledgerPairs = Some(Dedup.pairsFromDocs(
        docs.filter(col("doc_id") =!= 2L))),
      idColumn = "doc_id")
    assert(asMap(comps.assignments) == Map(3L -> 1L))
  }

  test("forget surfaces its delete debt: adviseIndexes names compaction " +
      "on every touched index table, and compact + prune restores the " +
      "delete-free scan path") {
    val s2 = spark
    import s2.implicits._
    val wh = java.nio.file.Files.createTempDirectory("forgetadv").toString
    val e = new Engine(spark, wh)
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val docs = Seq((1L, textA), (2L, textA), (3L, textA), (4L, textB))
      .toDF("doc_id", "text")
    e.createTable("lake.c2", docs.schema); e.append("lake.c2", docs)
    val gate = new NearDupIndex(e, "lake.g2")
    gate.create(); gate.bootstrap(docs)
    val comps = new ComponentIndex(e, "lake.l2")
    comps.create(); comps.bootstrap(gate.pairsAmong(docs.select("doc_id")))
    val vecs = Seq(
      AnnIndexSpec.Vec(1L, 0, Seq(1f, 0f, 0f, 0f)),
      AnnIndexSpec.Vec(2L, 0, Seq(0.9f, 0.1f, 0f, 0f)),
      AnnIndexSpec.Vec(3L, 0, Seq(0.95f, 0.05f, 0f, 0f)),
      AnnIndexSpec.Vec(4L, 1, Seq(0f, 0f, 1f, 0f))).toDF()
    val ann = new AnnIndex(e, "lake.a2", kClusters = 2, iters = 2)
    ann.create(); ann.bootstrap(vecs)

    val r = e.forget(Seq(3L), corpusRef = Some("lake.c2"),
      gate = Some(gate), ledger = Some(comps), annIndex = Some(ann),
      ledgerPairs = None, idColumn = "doc_id")
    assert(r.indexRefs == Seq("lake.g2", "lake.l2", "lake.a2"))

    def hasAnti(ref: String): Boolean =
      e.readTable(ref).queryExecution.optimizedPlan.collect {
        case j @ Join(_, _, LeftAnti, _, _) => j
      }.nonEmpty
    // the retires landed equality deletes: every index read pays the
    // merge-on-read anti-join fallback until compaction folds them
    assert(r.indexRefs.forall(hasAnti),
      "expected the MoR fallback path right after forget")
    def adviceOf(): Set[(String, String, String)] =
      e.adviseIndexes(r).collect()
        .map(row => (row.getString(0), row.getString(1), row.getString(2)))
        .toSet
    val before = adviceOf()
    assert(r.indexRefs.forall(ref =>
      before.contains((ref, "compact-incremental", "RECOMMENDED"))),
      before.toString)

    // pay the debt: with live delete files rewriteSmallFiles runs the
    // MAJOR fold (the replace commit itself drops delete manifests);
    // prune-deletes is then the no-op closing half of the contract
    r.indexRefs.foreach { ref =>
      assert(e.rewriteSmallFiles(ref).nonEmpty, s"no fold commit on $ref")
      e.pruneDanglingDeletes(ref)
    }
    assert(r.indexRefs.forall(ref => !hasAnti(ref)),
      "expected the bare vectorized path after compaction")
    val after = adviceOf()
    assert(r.indexRefs.forall(ref =>
      after.contains((ref, "compact-incremental", "OK"))), after.toString)
    // survivors intact through fold + prune
    assert(asMap(comps.assignments) == Map(2L -> 1L))
    assert(gate.check(Seq((98L, textA)).toDF("doc_id", "text")).count() > 0L)
  }

  test("multi-ledger forget: a minhash AND a semantic ledger over one " +
      "corpus re-cluster in one verb; bystander components survive in both") {
    val s2 = spark
    import s2.implicits._
    val wh = java.nio.file.Files.createTempDirectory("forgetml").toString
    val e = new Engine(spark, wh)
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val docs = Seq((1L, textA), (2L, textA), (3L, textB), (4L, textB))
      .toDF("doc_id", "text")
    val gate = new NearDupIndex(e, "lake.mg")
    gate.create(); gate.bootstrap(docs)
    val minhash = new ComponentIndex(e, "lake.ml")
    minhash.create(); minhash.bootstrap(gate.pairsAmong(docs.select("doc_id")))
    assert(asMap(minhash.assignments) == Map(2L -> 1L, 4L -> 3L))

    val vecs = Seq(
      AnnIndexSpec.Vec(1L, 0, Seq(1f, 0f, 0f, 0f)),
      AnnIndexSpec.Vec(2L, 0, Seq(0.99f, 0.14f, 0f, 0f)),
      AnnIndexSpec.Vec(3L, 1, Seq(0f, 0f, 1f, 0f)),
      AnnIndexSpec.Vec(4L, 1, Seq(0f, 0f, 0.99f, 0.14f))).toDF()
    val ann = new AnnIndex(e, "lake.ma", kClusters = 2, iters = 2)
    ann.create(); ann.bootstrap(vecs)
    val semantic = new ComponentIndex(e, "lake.ms")
    semantic.create()
    semantic.bootstrap(ann.pairsAmong(0.9)(docs.select("doc_id")))
    assert(asMap(semantic.assignments) == Map(2L -> 1L, 4L -> 3L))

    // ONE verb, both ledgers: each with its own edge-semantics provider
    val r = e.forget(Seq(2L).toDF("doc_id"), corpusRef = None,
      gate = Some(gate), ledger = Some(minhash), annIndex = Some(ann),
      ledgers = Seq(semantic -> (ann.pairsAmong(0.9) _)))
    assert(r.indexRefs == Seq("lake.mg", "lake.ml", "lake.ms", "lake.ma"))

    // both ledgers equal their from-scratch closure over the survivors:
    // {1} degrades to a singleton (sparse store — gone), the bystander
    // component {3,4} is untouched in BOTH
    assert(asMap(minhash.assignments) == Map(4L -> 3L))
    assert(asMap(semantic.assignments) == Map(4L -> 3L))
    // per-ledger outcomes: ref-keyed, the single-ledger field rides along
    assert(r.ledgersRemaining.map(_._1) == Seq("lake.ml", "lake.ms"))
    assert(asMap(r.ledgerRemaining.get) == Map(1L -> 1L))
    assert(r.ledgersRemaining.forall(p => asMap(p._2) == Map(1L -> 1L)))
  }

  test("persisted-index admitStream is forget-consistent per batch: the " +
      "first micro-batch after forget stops rejecting fresh copies, no " +
      "restart needed") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("forgetstr").toString
    val e = new Engine(spark, wh)
    val idx = new NearDupIndex(e, "lake.sg", nBuckets = 8)
    idx.create()
    val textA = "the quick brown fox jumps over the lazy dog"
    idx.bootstrap(Seq((100L, textA)).toDF("doc_id", "text"))
    val admitted = scala.collection.mutable.Buffer.empty[Long]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[NearDupIndexSpec.StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("forgetstrc").toString
    val q = idx.admitStream(input.toDF(), ckpt) { surv =>
      admitted ++= surv.select("doc_id").as[Long].collect(); ()
    }
    try {
      input.addData(NearDupIndexSpec.StreamDoc(1, textA))
      q.processAllAvailable()
      assert(admitted.isEmpty, "dup of indexed text must be rejected")
      // forget the indexed doc MID-STREAM — no restart of the query
      e.forget(Seq(100L), corpusRef = None, gate = Some(idx),
        ledger = None, annIndex = None, ledgerPairs = None,
        idColumn = "doc_id")
      input.addData(NearDupIndexSpec.StreamDoc(2, textA))
      q.processAllAvailable()
      // admitStream re-reads the index every micro-batch: the very next
      // batch sees no ghost signatures (contrast: EventStreams.
      // nearDupStream gates a STATIC snapshot and needs a restart)
      assert(admitted.sorted == Seq(2L), admitted.toString)
    } finally q.stop()
  }
}
