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

  private def startStub(whDir: String): (ServerSocket, Thread) = {
    val fs = new FsCatalog(whDir)
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          try {
            val in = new DataInputStream(sock.getInputStream)
            val o = new DataOutputStream(sock.getOutputStream)
            // decode the request with an independent reader: header,
            // then STRING fields until STOP
            val head = in.readInt()
            assert((head & 0xffff0000) == 0x80010000 && (head & 0xff) == 1)
            val nameLen = in.readInt()
            val nameB = new Array[Byte](nameLen); in.readFully(nameB)
            val method = new String(nameB, StandardCharsets.UTF_8)
            val seq = in.readInt()
            var args = Vector.empty[String]
            var ft = in.readByte()
            while (ft != 0) {
              assert(ft == 11); in.readShort()
              val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
              args :+= new String(b, StandardCharsets.UTF_8)
              ft = in.readByte()
            }
            method match {
              case "get_all_databases" =>
                replyHeader(o, method, seq)
                o.writeByte(15); o.writeShort(0)      // field 0: LIST
                o.writeByte(11)                       // of STRING
                val dbs = fs.listNamespaces()
                o.writeInt(dbs.size); dbs.foreach(str(o, _))
                o.writeByte(0)                        // result STOP
              case "get_all_tables" =>
                replyHeader(o, method, seq)
                o.writeByte(15); o.writeShort(0); o.writeByte(11)
                val ts = fs.listTables().filter(_._1 == args(0)).map(_._2)
                o.writeInt(ts.size); ts.foreach(str(o, _))
                o.writeByte(0)
              case "get_table" =>
                val mdPath = IcebergMeta.latestMetadataPath(
                  fs.tableLocation(s"${args(0)}.${args(1)}"))
                replyHeader(o, method, seq)
                o.writeByte(12); o.writeShort(0)      // field 0: Table STRUCT
                // tableName (1: string)
                o.writeByte(11); o.writeShort(1); str(o, args(1))
                // createTime (4: i32) — client must skip
                o.writeByte(8); o.writeShort(4); o.writeInt(123456)
                // sd (7: struct with nested junk) — client must skip deep
                o.writeByte(12); o.writeShort(7)
                o.writeByte(15); o.writeShort(1)      //   cols: list<struct>
                o.writeByte(12); o.writeInt(1)
                o.writeByte(11); o.writeShort(1); str(o, "col_a")
                o.writeByte(0)                        //   end col struct
                o.writeByte(10); o.writeShort(3); o.writeLong(9L) // i64
                o.writeByte(0)                        //   end sd
                // parameters (9: map<string,string>) — the payload
                o.writeByte(13); o.writeShort(9)
                o.writeByte(11); o.writeByte(11); o.writeInt(2)
                str(o, "table_type"); str(o, "ICEBERG")
                str(o, "metadata_location"); str(o, mdPath.toString)
                // tableType (12: string) — AFTER the map, must also skip
                o.writeByte(11); o.writeShort(12); str(o, "EXTERNAL_TABLE")
                o.writeByte(0)                        // end Table
                o.writeByte(0)                        // result STOP
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
    (server, t)
  }

  test("HiveCatalog walks and loads tables through a thrift stub with unknown fields") {
    val wh = Files.createTempDirectory("hivewh").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, _) = startStub(wh)
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

  test("CLI drives table-info over the Hive metastore end-to-end (thrift uri arg)") {
    val wh = Files.createTempDirectory("hivewh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, _) = startStub(wh)
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
