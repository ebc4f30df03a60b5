package graft.meta

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** Hive-metastore catalog client — the LAST of the reference's four
  * network backends (ref `catalog.py:99-142`, `type: hive`). The Hive
  * metastore speaks Thrift BINARY protocol over a raw socket (publicly
  * documented: strict message header `0x8001_000T | name | seqid`, typed
  * field headers, STOP-terminated structs), so a minimal hand-rolled
  * codec ([[TBinary]]) covers the three read methods the reference
  * needs: `get_all_databases`, `get_all_tables`, `get_table`. Iceberg
  * tables carry their current metadata file in
  * `Table.parameters["metadata_location"]` (the HiveCatalog convention
  * pyiceberg reads); the metadata parses through [[IcebergMeta]].
  *
  * The codec's on-wire encoding is pinned byte-for-byte against the
  * published protocol in `HiveCatalogSpec` (not just round-tripped), and
  * unknown fields/types skip generically, so newer metastore responses
  * with extra fields still parse.
  */
final class HiveCatalog(host: String, port: Int) extends MetaCatalog {

  private def call[A](method: String, writeArgs: TBinary.Writer => Unit)(
      readResult: TBinary.Reader => A): A = {
    val socket = new java.net.Socket()
    try {
      socket.connect(new java.net.InetSocketAddress(host, port), 10000)
      socket.setSoTimeout(30000)
      val out = new TBinary.Writer(
        new DataOutputStream(socket.getOutputStream))
      out.writeMessageBegin(method, TBinary.MsgCall, 1)
      writeArgs(out)
      out.flush()
      val in = new TBinary.Reader(
        new DataInputStream(socket.getInputStream))
      val (name, mtype, _) = in.readMessageBegin()
      if (mtype == TBinary.MsgException) throw new IllegalStateException(
        s"metastore $method raised a TApplicationException")
      require(name == method, s"out-of-order reply: asked $method, got $name")
      readResult(in)
    } catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"hive metastore at $host:$port unreachable ($method): ${e.getMessage}", e)
    } finally socket.close()
  }

  override def name: String = s"hive:$host:$port"

  override def listNamespaces(): Seq[String] =
    call("get_all_databases", w => { w.writeStructStop() }) { r =>
      r.readResultStringList()
    }.sorted

  override def listTables(): Seq[(String, String)] =
    listNamespaces().flatMap { db =>
      call("get_all_tables", w => {
        w.writeFieldString(1, db); w.writeStructStop()
      })(r => r.readResultStringList()).map(db -> _)
    }.sorted

  private def metadataLocation(ref: String): String = {
    val parts = ref.split("\\.", 2)
    require(parts.length == 2, s"table ref must be <namespace>.<table>: $ref")
    val params = call("get_table", w => {
      w.writeFieldString(1, parts(0))
      w.writeFieldString(2, parts(1))
      w.writeStructStop()
    }) { r =>
      // result struct: field 0 = success (Table struct); walk the Table
      // keeping only field 9 (parameters map), skipping everything else
      var params = Map.empty[String, String]
      r.forEachField { (ftype, fid) =>
        if (fid == 0 && ftype == TBinary.TStruct) {
          r.forEachField { (tft, tfid) =>
            if (tfid == 9 && tft == TBinary.TMap) params = r.readStringMap()
            else r.skip(tft)
          }
        } else r.skip(ftype)
      }
      params
    }
    params.getOrElse("metadata_location", throw new IllegalStateException(
      s"hive table $ref has no metadata_location parameter (not an Iceberg table?)"))
  }

  override def loadTable(ref: String): IcebergTable = {
    val md = IcebergMeta.loadAt(
      MetadataLocations.localPath(metadataLocation(ref), "hive"))
    new IcebergTable(md.location, md)
  }

  override def tableLocation(ref: String): String =
    loadTable(ref).metadata.location
}

/** Minimal Thrift BINARY protocol (strict), enough for the metastore
  * read calls: message header, typed fields, strings, string lists,
  * string maps, and a generic skip for everything else. */
object TBinary {
  val Version1 = 0x80010000
  val MsgCall = 1; val MsgReply = 2; val MsgException = 3

  val TStop: Byte = 0; val TBool: Byte = 2; val TByte: Byte = 3
  val TDouble: Byte = 4; val TI16: Byte = 6; val TI32: Byte = 8
  val TI64: Byte = 10; val TString: Byte = 11; val TStruct: Byte = 12
  val TMap: Byte = 13; val TSet: Byte = 14; val TList: Byte = 15

  final class Writer(out: DataOutputStream) {
    def writeMessageBegin(name: String, mtype: Int, seqid: Int): Unit = {
      out.writeInt(Version1 | mtype)
      writeString(name)
      out.writeInt(seqid)
    }
    def writeString(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    def writeFieldString(id: Int, v: String): Unit = {
      out.writeByte(TString); out.writeShort(id); writeString(v)
    }
    def writeFieldStructBegin(id: Int): Unit = {
      out.writeByte(TStruct); out.writeShort(id)
    }
    def writeFieldStringList(id: Int, vs: Seq[String]): Unit = {
      out.writeByte(TList); out.writeShort(id)
      out.writeByte(TString); out.writeInt(vs.size)
      vs.foreach(writeString)
    }
    def writeFieldStringMap(id: Int, m: Map[String, String]): Unit = {
      out.writeByte(TMap); out.writeShort(id)
      out.writeByte(TString); out.writeByte(TString); out.writeInt(m.size)
      m.foreach { case (k, v) => writeString(k); writeString(v) }
    }
    def writeStructStop(): Unit = out.writeByte(TStop)
    def flush(): Unit = out.flush()
  }

  final class Reader(in: DataInputStream) {
    def readMessageBegin(): (String, Int, Int) = {
      val head = in.readInt()
      require((head & 0xffff0000) == Version1,
        f"not a strict thrift binary message (0x$head%08x)")
      val name = readString()
      (name, head & 0xff, in.readInt())
    }
    def readString(): String = {
      val n = in.readInt()
      require(n >= 0 && n < 64 * 1024 * 1024, s"implausible string length $n")
      val b = new Array[Byte](n); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    }
    /** Iterate a struct's fields until STOP; the callback must consume
      * each field's value (read or [[skip]]). */
    def forEachField(f: (Byte, Int) => Unit): Unit = {
      var t = in.readByte()
      while (t != TStop) {
        f(t, in.readShort().toInt)
        t = in.readByte()
      }
    }
    /** Read a `list<string>` value. */
    def readStringList(): Seq[String] = {
      val et = in.readByte()
      require(et == TString, s"expected list<string>, element type $et")
      val n = in.readInt()
      (0 until n).map(_ => readString())
    }
    /** Read a `map<string,string>` value. */
    def readStringMap(): Map[String, String] = {
      val kt = in.readByte(); val vt = in.readByte()
      require(kt == TString && vt == TString,
        s"expected map<string,string>, got <$kt,$vt>")
      val n = in.readInt()
      (0 until n).map(_ => readString() -> readString()).toMap
    }
    /** Shape of every read-call result here: field 0 = list<string>. */
    def readResultStringList(): Seq[String] = {
      var out = Seq.empty[String]
      forEachField { (t, id) =>
        if (id == 0 && t == TList) out = readStringList() else skip(t)
      }
      out
    }
    /** Generic value skip so unknown fields never break parsing. */
    def skip(t: Byte): Unit = t match {
      case TBool | TByte => in.readByte(); ()
      case TI16 => in.readShort(); ()
      case TI32 => in.readInt(); ()
      case TI64 => in.readLong(); ()
      case TDouble => in.readDouble(); ()
      case TString =>
        val n = in.readInt(); in.skipNBytes(n.toLong)
      case TStruct => forEachField((ft, _) => skip(ft))
      case TMap =>
        val kt = in.readByte(); val vt = in.readByte()
        val n = in.readInt()
        (0 until n).foreach { _ => skip(kt); skip(vt) }
      case TList | TSet =>
        val et = in.readByte(); val n = in.readInt()
        (0 until n).foreach(_ => skip(et))
      case other => throw new IllegalStateException(s"unknown thrift type $other")
    }
  }
}
