package graft.meta

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import graft.fixtures.FixtureWriter

/** In-process Hive-metastore stub speaking Thrift binary protocol over a
  * raw `ServerSocket`, driven through the real [[HiveCatalog]] client.
  * The stub's replies are HAND-ENCODED with a plain `DataOutputStream`
  * (independent of the client's [[TBinary]] codec) and include unknown
  * extra fields of several types, so the client's decode + generic skip
  * are tested against independently-authored bytes — and one call's
  * request encoding is pinned byte-for-byte against the published wire
  * format. */
class HiveCatalogSpec extends SparkSpec {

  test("TBinary call encoding matches the published strict wire format byte-for-byte") {
    val bos = new ByteArrayOutputStream()
    val w = new TBinary.Writer(new DataOutputStream(bos))
    w.writeMessageBegin("get_all_tables", TBinary.MsgCall, 1)
    w.writeFieldString(1, "db")
    w.writeStructStop()
    w.flush()
    val expect =
      Array[Int](0x80, 0x01, 0x00, 0x01,              // VERSION_1 | CALL
        0x00, 0x00, 0x00, 0x0e) ++                    // name length 14
      "get_all_tables".getBytes(StandardCharsets.UTF_8).map(_.toInt & 0xff) ++
      Array[Int](0x00, 0x00, 0x00, 0x01,              // seqid 1
        0x0b, 0x00, 0x01,                             // field STRING id 1
        0x00, 0x00, 0x00, 0x02, 'd', 'b',             // "db"
        0x00)                                         // struct STOP
    assert(bos.toByteArray.map(_.toInt & 0xff).toSeq == expect.toSeq)
  }

  // ---- hand-rolled stub encoder (deliberately NOT TBinary.Writer) ----

  private def str(o: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    o.writeInt(b.length); o.write(b)
  }

  private def replyHeader(o: DataOutputStream, method: String, seq: Int): Unit = {
    o.writeInt(0x80010000 | 2) // REPLY
    str(o, method); o.writeInt(seq)
  }

  /** Independent generic thrift-binary value decoder for the stub
    * (deliberately NOT the client's TBinary): structs →
    * Map[fieldId → value], strings → String, numbers → Long/Int, maps →
    * Map, lists → Seq. */
  private def readVal(in: DataInputStream, t: Byte): Any = t match {
    case 2 => in.readByte() != 0
    case 3 => in.readByte()
    case 6 => in.readShort()
    case 8 => in.readInt()
    case 10 => in.readLong()
    case 4 => in.readDouble()
    case 11 =>
      val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    case 12 =>
      var m = Map.empty[Int, Any]
      var ft = in.readByte()
      while (ft != 0) {
        val id = in.readShort().toInt
        m += id -> readVal(in, ft)
        ft = in.readByte()
      }
      m
    case 13 =>
      val kt = in.readByte(); val vt = in.readByte(); val n = in.readInt()
      (0 until n).map(_ => readVal(in, kt) -> readVal(in, vt)).toMap
    case 15 | 14 =>
      val et = in.readByte(); val n = in.readInt()
      (0 until n).map(_ => readVal(in, et))
    case other => throw new IllegalStateException(s"stub: unknown type $other")
  }

  /** Stateful metastore stub: per-table parameter maps seeded from the
    * fixture warehouse, EXCLUSIVE table locks with a WAITING-then-
    * ACQUIRED hook, and alter_table that VERIFIES the client echoed the
    * junk fields get_table planted (createTime, nested sd, tableType) —
    * a synthesized Table that dropped server-side fields fails here. */
  private def startStub(whDir: String): (ServerSocket,
      scala.collection.mutable.Map[String, Map[String, String]],
      java.util.concurrent.atomic.AtomicBoolean) = {
    val fs = new FsCatalog(whDir)
    val tables = scala.collection.mutable.Map.empty[String, Map[String, String]]
    fs.listTables().foreach { case (n, t) =>
      tables(s"$n.$t") = Map(
        "table_type" -> "ICEBERG",
        "metadata_location" ->
          IcebergMeta.latestMetadataPath(fs.tableLocation(s"$n.$t")).toString)
    }
    // when set, the next lock call answers WAITING once (check_lock then
    // acquires) — exercises the client's poll loop
    val waitFirst = new java.util.concurrent.atomic.AtomicBoolean(false)
    val heldLocks = scala.collection.mutable.Map.empty[Long, String]
    val nextLock = new java.util.concurrent.atomic.AtomicLong(100L)
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    def writeTable(o: DataOutputStream, name: String,
        params: Map[String, String]): Unit = {
      o.writeByte(12); o.writeShort(0)      // field 0: Table STRUCT
      // tableName (1: string)
      o.writeByte(11); o.writeShort(1); str(o, name)
      // createTime (4: i32) — client must skip AND echo on alter
      o.writeByte(8); o.writeShort(4); o.writeInt(123456)
      // sd (7: struct with nested junk) — client must skip/echo deep
      o.writeByte(12); o.writeShort(7)
      o.writeByte(15); o.writeShort(1)      //   cols: list<struct>
      o.writeByte(12); o.writeInt(1)
      o.writeByte(11); o.writeShort(1); str(o, "col_a")
      o.writeByte(0)                        //   end col struct
      o.writeByte(10); o.writeShort(3); o.writeLong(9L) // i64
      o.writeByte(0)                        //   end sd
      // parameters (9: map<string,string>) — the payload
      o.writeByte(13); o.writeShort(9)
      o.writeByte(11); o.writeByte(11); o.writeInt(params.size)
      params.toSeq.sortBy(_._1).foreach { case (k, v) => str(o, k); str(o, v) }
      // tableType (12: string) — AFTER the map, must also skip/echo
      o.writeByte(11); o.writeShort(12); str(o, "EXTERNAL_TABLE")
      o.writeByte(0)                        // end Table
      o.writeByte(0)                        // result STOP
    }
    def lockResponse(o: DataOutputStream, id: Long, state: Int): Unit = {
      o.writeByte(12); o.writeShort(0)      // field 0: LockResponse
      o.writeByte(10); o.writeShort(1); o.writeLong(id)
      o.writeByte(8); o.writeShort(2); o.writeInt(state)
      o.writeByte(0)                        // end LockResponse
      o.writeByte(0)                        // result STOP
    }
    def exceptionResult(o: DataOutputStream, fieldId: Int, msg: String): Unit = {
      o.writeByte(12); o.writeShort(fieldId)
      o.writeByte(11); o.writeShort(1); str(o, msg)
      o.writeByte(0)
      o.writeByte(0)
    }
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          try {
            val in = new DataInputStream(sock.getInputStream)
            val o = new DataOutputStream(sock.getOutputStream)
            val head = in.readInt()
            assert((head & 0xffff0000) == 0x80010000 && (head & 0xff) == 1)
            val nameLen = in.readInt()
            val nameB = new Array[Byte](nameLen); in.readFully(nameB)
            val method = new String(nameB, StandardCharsets.UTF_8)
            val seq = in.readInt()
            // generic arg decode: fieldId → value, until STOP
            var args = Map.empty[Int, Any]
            var ft = in.readByte()
            while (ft != 0) {
              val id = in.readShort().toInt
              args += id -> readVal(in, ft)
              ft = in.readByte()
            }
            def s1 = args(1).asInstanceOf[String]
            def s2 = args(2).asInstanceOf[String]
            method match {
              case "get_all_databases" =>
                replyHeader(o, method, seq)
                o.writeByte(15); o.writeShort(0)      // field 0: LIST
                o.writeByte(11)                       // of STRING
                val dbs = tables.keySet.map(_.split("\\.", 2)(0)).toSeq
                  .distinct.sorted
                o.writeInt(dbs.size); dbs.foreach(str(o, _))
                o.writeByte(0)                        // result STOP
              case "get_all_tables" =>
                replyHeader(o, method, seq)
                o.writeByte(15); o.writeShort(0); o.writeByte(11)
                val ts = tables.keySet.toSeq.sorted.map(_.split("\\.", 2))
                  .filter(_(0) == s1).map(_(1))
                o.writeInt(ts.size); ts.foreach(str(o, _))
                o.writeByte(0)
              case "get_table" =>
                replyHeader(o, method, seq)
                tables.get(s"$s1.$s2") match {
                  case Some(params) => writeTable(o, s2, params)
                  case None => exceptionResult(o, 2, "no such table")
                }
              case "lock" =>
                replyHeader(o, method, seq)
                val id = nextLock.incrementAndGet()
                if (waitFirst.getAndSet(false)) {
                  heldLocks(id) = "pending"
                  lockResponse(o, id, 2)              // WAITING once
                } else {
                  heldLocks(id) = "acquired"
                  lockResponse(o, id, 1)              // ACQUIRED
                }
              case "check_lock" =>
                replyHeader(o, method, seq)
                val id = args(1).asInstanceOf[Map[Int, Any]](1)
                  .asInstanceOf[Long]
                heldLocks(id) = "acquired"
                lockResponse(o, id, 1)
              case "unlock" =>
                val id = args(1).asInstanceOf[Map[Int, Any]](1)
                  .asInstanceOf[Long]
                heldLocks.remove(id)
                replyHeader(o, method, seq)
                o.writeByte(0)                        // void result
              case "alter_table" =>
                val tbl = args(3).asInstanceOf[Map[Int, Any]]
                // the client must ECHO the junk fields get_table planted
                assert(tbl(4) == 123456,
                  s"alter_table dropped createTime: $tbl")
                assert(tbl(12) == "EXTERNAL_TABLE",
                  s"alter_table dropped tableType: $tbl")
                assert(tbl(7).asInstanceOf[Map[Int, Any]](3) == 9L,
                  s"alter_table dropped nested sd fields: $tbl")
                replyHeader(o, method, seq)
                tables.get(s"$s1.$s2") match {
                  case Some(_) =>
                    tables(s"$s1.$s2") = tbl(9)
                      .asInstanceOf[Map[Any, Any]]
                      .map { case (k, v) =>
                        k.asInstanceOf[String] -> v.asInstanceOf[String] }
                    o.writeByte(0)                    // void result
                  case None => exceptionResult(o, 1, "no such table")
                }
              case "create_table" =>
                val tbl = args(1).asInstanceOf[Map[Int, Any]]
                val db = tbl(2).asInstanceOf[String]
                val name = tbl(1).asInstanceOf[String]
                replyHeader(o, method, seq)
                if (tables.contains(s"$db.$name"))
                  exceptionResult(o, 1, "already exists")
                else {
                  tables(s"$db.$name") = tbl(9).asInstanceOf[Map[Any, Any]]
                    .map { case (k, v) =>
                      k.asInstanceOf[String] -> v.asInstanceOf[String] }
                  o.writeByte(0)
                }
              case "drop_table" =>
                replyHeader(o, method, seq)
                if (tables.remove(s"$s1.$s2").isDefined) o.writeByte(0)
                else exceptionResult(o, 1, "no such table")
              case other =>
                // TApplicationException
                o.writeInt(0x80010000 | 3); str(o, other); o.writeInt(seq)
                o.writeByte(0)
            }
            o.flush()
          } finally sock.close()
        }
      } catch { case _: java.net.SocketException => () } // closed
    })
    t.setDaemon(true); t.start()
    (server, tables, waitFirst)
  }

  test("HiveCatalog walks and loads tables through a thrift stub with unknown fields") {
    val wh = Files.createTempDirectory("hivewh").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, _, _) = startStub(wh)
    try {
      val hive = new HiveCatalog("127.0.0.1", server.getLocalPort)
      val fs = new FsCatalog(wh)
      assert(hive.listNamespaces() == fs.listNamespaces())
      assert(hive.listTables() == fs.listTables())
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      val viaHive = hive.loadTable(ref)
      assert(viaHive.metadata.tableUuid == fs.loadTable(ref).metadata.tableUuid)
      assert(graft.rel.MetaRelations.files(spark, viaHive).count() > 0)
      // the Engine facade runs over hive like every other backend
      val eng = graft.api.Engine.forConfig(spark, CatalogConfig(
        "h", Some(s"thrift://127.0.0.1:${server.getLocalPort}"), None))
      assert(eng.listTables().count() == fs.listTables().size.toLong)
      assert(eng.summary(ref).collect().head.getAs[Long]("file_count") > 0)
    } finally server.close()
  }

  test("engine commits mirror into the Hive metastore: exclusive lock, " +
      "full-struct-echoing alter_table, conflicts on stale pointers") {
    import spark.implicits._
    val wh = Files.createTempDirectory("hivewh-commit").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, stubTables, waitFirst) = startStub(wh)
    try {
      val cfg = CatalogConfig(
        "h", Some(s"thrift://127.0.0.1:${server.getLocalPort}"), Some(wh))
      val eng = graft.api.Engine.forConfig(spark, cfg)
      val fs = new FsCatalog(wh)
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      val hive = eng.catalog.asInstanceOf[HiveCatalog]
      val p0 = hive.metadataPointer(ref).get
      val before = eng.readTable(ref).count()

      // a commit locks, alters (echoing every server-side field — the
      // stub asserts createTime/sd/tableType survive), unlocks; a fresh
      // engine reads the new snapshot through the pointer
      eng.append(ref, eng.readTable(ref).limit(1))
      val p1 = hive.metadataPointer(ref).get
      assert(p1 != p0, "the commit must advance the metastore pointer")
      assert(stubTables(ref).get("previous_metadata_location").contains(p0),
        "alter_table must preserve the superseded location")
      assert(graft.api.Engine.forConfig(spark, cfg)
        .readTable(ref).count() == before + 1)

      // the WAITING → check_lock → ACQUIRED poll path commits too
      waitFirst.set(true)
      eng.append(ref, eng.readTable(ref).limit(1))
      assert(graft.api.Engine.forConfig(spark, cfg)
        .readTable(ref).count() == before + 2)

      // a STALE expected location loses with a conflict, under the lock
      val p2 = hive.metadataPointer(ref).get
      intercept[CommitConflictException](hive.casPointer(ref, Some(p0), p2))
      assert(hive.metadataPointer(ref).contains(p2))

      // CREATE through the Hive engine registers the pointer; the
      // create-race and dropPointer behave like the other backends
      eng.createTable("sales.hive_new",
        Seq((1L, "a")).toDF("id", "name").schema)
      assert(hive.metadataPointer("sales.hive_new").exists(_.startsWith(wh)))
      eng.append("sales.hive_new", Seq((1L, "a")).toDF("id", "name"))
      assert(graft.api.Engine.forConfig(spark, cfg)
        .readTable("sales.hive_new").count() == 1L)
      // a CAS-create under an existing name is the create-race conflict
      intercept[CommitConflictException](
        hive.casPointer("sales.hive_new", None, p2))
      hive.dropPointer("sales.hive_new")
      assert(hive.metadataPointer("sales.hive_new").isEmpty)
      hive.dropPointer("sales.hive_new") // idempotent (NoSuchObject)
    } finally server.close()
  }

  test("CLI drives table-info over the Hive metastore end-to-end (thrift uri arg)") {
    val wh = Files.createTempDirectory("hivewh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, _, _) = startStub(wh)
    try {
      val fs = new FsCatalog(wh)
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      // the real CLI entrypoint, thrift:// positional arg → config
      // resolution → HiveCatalog → engine verb, over a live socket
      assert(graft.tools.Cli.run(Array(
        s"thrift://127.0.0.1:${server.getLocalPort}", "table-info", ref)) == 0)
      assert(graft.tools.Cli.run(Array(
        s"thrift://127.0.0.1:${server.getLocalPort}", "list-tables")) == 0)
    } finally server.close()
  }

  test("forConfig routes hive configs and rejects malformed ones") {
    assert(Catalogs.forConfig(CatalogConfig(
      "h", Some("thrift://meta:9083"), None)).isInstanceOf[HiveCatalog])
    assert(Catalogs.forConfig(CatalogConfig(
      "h2", Some("thrift://meta:9083"), None, Map("type" -> "hive")))
      .isInstanceOf[HiveCatalog])
    intercept[IllegalArgumentException](
      Catalogs.forConfig(CatalogConfig("h3", None, None, Map("type" -> "hive"))))
    intercept[IllegalArgumentException](
      Catalogs.forConfig(CatalogConfig(
        "h4", Some("thrift://no-port"), None, Map("type" -> "hive"))))
    // an unreachable metastore is a clear error, not a hang
    val dead = new HiveCatalog("127.0.0.1", 1)
    val err = intercept[IllegalStateException](dead.listNamespaces())
    assert(err.getMessage.contains("unreachable"))
  }
}
