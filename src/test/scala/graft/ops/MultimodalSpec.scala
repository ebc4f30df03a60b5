package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs = {
    val s2 = spark
    import s2.implicits._
    Seq(
      (1L, "hello multimodal world", "en", "a", 22L),
      (2L, "binary payload stand-in", "en", "a", 23L),
      (3L, "", "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("packText produces the canonical media schema") {
    val media = Multimodal.packText(docs)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val m = media.filter(col("media_id") === 1).select("meta.modality").collect().head
    assert(m.getString(0) == "image")
  }

  test("payloadStats: byte lengths, frame counts and digests are deterministic") {
    val stats = Multimodal.payloadStats(Multimodal.packText(docs), frameStride = 8)
      .orderBy("media_id").collect()
    assert(stats(0).getAs[Int]("n_bytes") == 22)
    assert(stats(0).getAs[Long]("n_frames") == 2L)
    assert(stats(0).getAs[String]("digest8").length == 8)
    // same payload → same digest across runs
    val again = Multimodal.payloadStats(Multimodal.packText(docs), frameStride = 8)
      .orderBy("media_id").collect()
    assert(stats.map(_.getString(4)).toSeq == again.map(_.getString(4)).toSeq)
  }

  test("decodeFeatures runs the batch kernel per partition and stays distributed") {
    val feats = Multimodal.decodeFeatures(Multimodal.packText(docs).repartition(3))
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getSeq[Float](1).length == 4))
    // empty payload gets the zero vector
    assert(rows.find(_.getLong(0) == 3L).get.getSeq[Float](1).forall(_ == 0f))
  }

  test("fakeDecodeKernel is the pinned code-point fold the oracle reproduces") {
    // "hello": code points 104,101,108,108,111 → a = 532,
    // b = ((((104*31+101)*31+108)*31+108)*31+111) mod 1e9+7 = 99162322
    val f = Multimodal.fakeDecodeKernel("hello".getBytes("UTF-8"))
    assert(f.toSeq == Seq(0.532f, 0.322f, 5f, 104f))
    // multi-byte text folds over CODE POINTS (not bytes): "é" = U+00E9
    val g = Multimodal.fakeDecodeKernel("é".getBytes("UTF-8"))
    assert(g.toSeq == Seq((233 % 1000) / 1000f, (233 % 1000) / 1000f, 1f, 233f))
  }

  // closed-form per-channel sum the oracle uses — the decode path must
  // recover exactly this from the encoded bytes
  private def patternSums(id: Long): (Int, Int, Long, Long, Long) = {
    val w = Multimodal.patW(id); val h = Multimodal.patH(id)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += Multimodal.patR(id, x, y)
      sg += Multimodal.patG(id, x, y)
      sb += Multimodal.patB(id, x, y)
    }
    (w, h, sr, sg, sb)
  }

  test("real ImageIO round-trip: PNG encode on executors, decode recovers exact pixels") {
    val s2 = spark
    import s2.implicits._
    val ids = (0L until 40L).toDF("media_id").repartition(4)
    val media = Multimodal.imagesFromIds(ids, "png")
    // payloads are REAL PNG files (magic bytes), not a stand-in
    val first = media.orderBy("media_id").select("payload").head.getAs[Array[Byte]](0)
    assert(first.take(8).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val decoded = Multimodal.decodeImages(media).orderBy("media_id").collect()
    assert(decoded.length == 40)
    decoded.foreach { r =>
      val (w, h, sr, sg, sb) = patternSums(r.getLong(0))
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getLong(3) == sr && r.getLong(4) == sg && r.getLong(5) == sb)
    }
  }

  test("real ImageIO round-trip: BMP codec produces identical sums to PNG") {
    val s2 = spark
    import s2.implicits._
    val ids = (5L until 15L).toDF("media_id")
    val viaPng = Multimodal.decodeImages(Multimodal.imagesFromIds(ids, "png"))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    val viaBmp = Multimodal.decodeImages(Multimodal.imagesFromIds(ids, "bmp"))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(viaPng == viaBmp)
    // BMP payload really is BMP ("BM" magic)
    val bmp = Multimodal.imagesFromIds(ids, "bmp")
      .select("payload").head.getAs[Array[Byte]](0)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
  }

  test("real audio round-trip: WAV encode on executors, decode recovers exact PCM") {
    val s2 = spark
    import s2.implicits._
    val ids = (0L until 25L).toDF("media_id").repartition(3)
    val media = Multimodal.audioFromIds(ids)
    // payloads are REAL RIFF/WAVE files
    val first = media.orderBy("media_id").select("payload").head.getAs[Array[Byte]](0)
    assert(new String(first.take(4), "US-ASCII") == "RIFF")
    assert(new String(first.slice(8, 12), "US-ASCII") == "WAVE")
    val decoded = Multimodal.decodeAudio(media).orderBy("media_id").collect()
    assert(decoded.length == 25)
    decoded.foreach { r =>
      val id = r.getLong(0)
      val n = Multimodal.patNSamples(id)
      val samples = (0 until n).map(Multimodal.patSample(id, _))
      assert(r.getLong(1) == n.toLong)
      assert(r.getInt(2) == 8000)
      assert(r.getLong(3) == samples.map(_.toLong).sum)
      assert(r.getInt(4) == samples.min && r.getInt(5) == samples.max)
    }
    // corrupt payload → n_samples = -1, not a task failure
    val junk = Seq((7L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    assert(Multimodal.decodeAudio(junk).head.getLong(1) == -1L)
  }

  test("real video round-trip: multi-frame GIF encode, frame-sampled decode is exact") {
    val s2 = spark
    import s2.implicits._
    val ids = (0L until 20L).toDF("media_id").repartition(3)
    val media = Multimodal.videoFromIds(ids)
    // payloads are REAL GIF files ("GIF89a" / "GIF87a" magic)
    val first = media.orderBy("media_id").select("payload").head.getAs[Array[Byte]](0)
    assert(new String(first.take(3), "US-ASCII") == "GIF")
    val decoded = Multimodal.sampleFrames(media, stride = 2)
      .orderBy("media_id").collect()
    assert(decoded.length == 20)
    decoded.foreach { r =>
      val id = r.getLong(0)
      val n = Multimodal.patNFrames(id)
      val w = Multimodal.patW(id); val h = Multimodal.patH(id)
      val expect = (0 until n by 2).map { f =>
        (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.patFrame(id, f, x, y).toLong).sum
      }.sum
      assert(r.getInt(1) == n && r.getInt(2) == (n + 1) / 2)
      assert(r.getInt(3) == w && r.getInt(4) == h)
      assert(r.getLong(5) == expect,
        s"id=$id: got ${r.getLong(5)}, want $expect")
    }
    // stride 1 samples every frame
    val all = Multimodal.sampleFrames(media, stride = 1)
      .filter(col("media_id") === 4L).head
    assert(all.getInt(1) == all.getInt(2))
    // corrupt payload → n_frames = -1, not a task failure
    val junk = Seq((7L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    assert(Multimodal.sampleFrames(junk).head.getInt(1) == -1)
  }

  test("resizeImages: nearest-neighbor resample matches source-pattern sampling; corrupt rows survive") {
    val s2 = spark
    import s2.implicits._
    val ids = (0L until 20L).toDF("media_id")
    val out = Multimodal.resizeImages(Multimodal.imagesFromIds(ids, "png"), 8, 6)
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 13 + 4).toInt, (id % 11 + 4).toInt)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 6; x <- 0 until 8) {
        val (sx, sy) = (x * w / 8, y * h / 6)
        sr += (id + 2 * sx + 3 * sy) % 256
        sg += (3 * id + 5 * sx + 7 * sy) % 256
        sb += (7 * id + 11 * sx + 13 * sy) % 256
      }
      assert(r.getInt(1) == 8 && r.getInt(2) == 6)
      assert(r.getLong(3) == sr && r.getLong(4) == sg && r.getLong(5) == sb)
    }
    // corrupt payload → -1 row, not a task failure
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val bad = Multimodal.resizeImages(junk, 8, 6).collect().head
    assert(bad.getInt(1) == -1)
  }

  test("decodeImages surfaces corrupt payloads as width=-1 rows, not task failures") {
    val s2 = spark
    import s2.implicits._
    val junk = Seq((99L, Array[Byte](1, 2, 3)), (100L, Array.empty[Byte]))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeImages(junk).orderBy("media_id").collect()
    assert(out.forall(r => r.getInt(1) == -1 && r.getLong(3) == 0L))
  }

  test("normalizeFeatures scales to unit max") {
    val norm = Multimodal.normalizeFeatures(
      Multimodal.decodeFeatures(Multimodal.packText(docs)))
    val v = norm.filter(col("media_id") === 1)
      .select("norm_features").collect().head.getSeq[Double](0)
    assert(v.forall(x => math.abs(x) <= 1.0 + 1e-9))
    assert(v.exists(x => math.abs(x) > 0.99)) // max element is ±1
  }
}
