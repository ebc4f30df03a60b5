package graft.ops

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
}
