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
final class HiveCatalog(host: String, port: Int,
    warehouse: Option[String] = None)
    extends MetaCatalog with PointerCatalog {

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

  // ---- commit mirror (PointerCatalog): the Iceberg-on-Hive commit
  // shape (HiveTableOperations) — take the metastore's EXCLUSIVE table
  // lock, re-read the table, require `metadata_location` still at the
  // expected value, `alter_table` echoing the WHOLE Table struct with
  // only the parameters rewritten, unlock. The lock closes the
  // check-then-alter window the metastore has no native CAS for. ----

  import TBinary.TValue

  private def refParts(ref: String): (String, String) = {
    val parts = ref.split("\\.", 2)
    require(parts.length == 2, s"table ref must be <namespace>.<table>: $ref")
    (parts(0), parts(1))
  }

  /** Result-struct read: field 0 = success value; any other present
    * field is a thrown exception (`ids` names the interesting ones). */
  private def readResult(r: TBinary.Reader): (Option[TValue], Option[Int]) = {
    var success: Option[TValue] = None
    var errField: Option[Int] = None
    r.forEachField { (t, id) =>
      if (id == 0) success = Some(r.readValue(t))
      else { if (errField.isEmpty) errField = Some(id); r.skip(t) }
    }
    (success, errField)
  }

  /** `get_table` as a generic struct (None = NoSuchObjectException,
    * thrift field 2 of the result). */
  private def getTableStruct(ref: String): Option[TValue.StructV] = {
    val (db, t) = refParts(ref)
    call("get_table", w => {
      w.writeFieldString(1, db); w.writeFieldString(2, t); w.writeStructStop()
    }) { r =>
      readResult(r) match {
        case (Some(s: TValue.StructV), _) => Some(s)
        case (_, Some(2)) => None // NoSuchObjectException
        case (_, err) => throw new IllegalStateException(
          s"metastore get_table($ref) failed (exception field $err)")
      }
    }
  }

  private def tableParams(s: TValue.StructV): Map[String, String] =
    s.fields.collectFirst { case (9, TBinary.TMap, m) => TValue.asStringMap(m) }
      .getOrElse(Map.empty)

  override def metadataPointer(ref: String): Option[String] =
    getTableStruct(ref).flatMap(s => tableParams(s).get("metadata_location"))

  /** Acquire the metastore's EXCLUSIVE table lock (LockComponent
    * type=EXCLUSIVE(3) level=TABLE(2)), polling `check_lock` while
    * WAITING; NOT_ACQUIRED/ABORT surface as commit conflicts. */
  private def lockExclusive(db: String, table: String): Long = {
    def response(r: TBinary.Reader): (Long, Int) =
      readResult(r) match {
        case (Some(TValue.StructV(fields)), _) =>
          val id = fields.collectFirst {
            case (1, TBinary.TI64, TValue.Prim(_, v: Long)) => v }.getOrElse(0L)
          val state = fields.collectFirst {
            case (2, TBinary.TI32, TValue.Prim(_, v: Int)) => v }.getOrElse(0)
          (id, state)
        case (_, err) => throw new IllegalStateException(
          s"metastore lock on $db.$table failed (exception field $err)")
      }
    val component = TValue.StructV(Vector(
      (1, TBinary.TI32, TValue.Prim(TBinary.TI32, 3)), // LockType.EXCLUSIVE
      (2, TBinary.TI32, TValue.Prim(TBinary.TI32, 2)), // LockLevel.TABLE
      (3, TBinary.TString, TValue.str(db)),
      (4, TBinary.TString, TValue.str(table))))
    val request = TValue.StructV(Vector(
      (1, TBinary.TList,
        TValue.ListV(isSet = false, TBinary.TStruct, Vector(component))),
      (3, TBinary.TString, TValue.str("graft")),
      (4, TBinary.TString, TValue.str(
        java.net.InetAddress.getLoopbackAddress.getHostName))))
    var (lockId, state) = call("lock", w => {
      w.writeField(1, TBinary.TStruct, request); w.writeStructStop()
    })(response)
    var polls = 0
    while (state == 2 /* WAITING */ && polls < 40) {
      polls += 1
      Thread.sleep(25L * math.min(polls, 8))
      val next = call("check_lock", w => {
        w.writeField(1, TBinary.TStruct, TValue.StructV(Vector(
          (1, TBinary.TI64, TValue.Prim(TBinary.TI64, lockId)))))
        w.writeStructStop()
      })(response)
      state = next._2
    }
    if (state != 1 /* ACQUIRED */) {
      unlock(lockId)
      throw new CommitConflictException(
        s"could not acquire the metastore lock on $db.$table " +
          s"(state $state) — a concurrent writer holds it; retry")
    }
    lockId
  }

  private def unlock(lockId: Long): Unit =
    try {
      call("unlock", w => {
        w.writeField(1, TBinary.TStruct, TValue.StructV(Vector(
          (1, TBinary.TI64, TValue.Prim(TBinary.TI64, lockId)))))
        w.writeStructStop()
      })(r => { readResult(r); () })
    } catch { case _: IllegalStateException => () } // best-effort release

  /** `params` merged over the table struct's field-9 map (other fields
    * echoed untouched). */
  private def withParams(
      s: TValue.StructV, params: Map[String, String]): TValue.StructV = {
    val merged = TValue.stringMap(tableParams(s) ++ params)
    val without = s.fields.filterNot { case (id, t, _) =>
      id == 9 && t == TBinary.TMap }
    TValue.StructV(without :+ ((9, TBinary.TMap, merged: TValue)))
  }

  override def casPointer(
      ref: String, expected: Option[String], next: String): Unit = {
    val (db, t) = refParts(ref)
    expected match {
      case None =>
        // minimal Iceberg-style Table struct; AlreadyExists (result
        // field 1) is the create-race conflict
        val table = TValue.StructV(Vector(
          (1, TBinary.TString, TValue.str(t)),
          (2, TBinary.TString, TValue.str(db)),
          (9, TBinary.TMap, TValue.stringMap(Map(
            "table_type" -> "ICEBERG", "metadata_location" -> next))),
          (12, TBinary.TString, TValue.str("EXTERNAL_TABLE"))))
        call("create_table", w => {
          w.writeField(1, TBinary.TStruct, table); w.writeStructStop()
        }) { r =>
          readResult(r) match {
            case (_, Some(1)) => throw new CommitConflictException(
              s"hive table $ref was created by a concurrent writer — " +
                "reload and retry")
            case (_, Some(err)) => throw new IllegalStateException(
              s"metastore create_table($ref) failed (exception field $err)")
            case _ => ()
          }
        }
      case Some(exp) =>
        val lockId = lockExclusive(db, t)
        try {
          val current = getTableStruct(ref).getOrElse(
            throw new CommitConflictException(
              s"hive table $ref vanished while mirroring the commit — " +
                "reload and retry"))
          val loc = tableParams(current).get("metadata_location")
          if (!loc.contains(exp)) throw new CommitConflictException(
            s"hive pointer for $ref is no longer at $exp — a concurrent " +
              "writer moved it; reload and retry")
          val updated = withParams(current, Map(
            "metadata_location" -> next,
            "previous_metadata_location" -> exp))
          call("alter_table", w => {
            w.writeFieldString(1, db); w.writeFieldString(2, t)
            w.writeField(3, TBinary.TStruct, updated)
            w.writeStructStop()
          }) { r =>
            readResult(r) match {
              case (_, Some(err)) => throw new IllegalStateException(
                s"metastore alter_table($ref) failed (exception field $err)")
              case _ => ()
            }
          }
        } finally unlock(lockId)
    }
  }

  override def createLocation(ref: String): String = {
    val (db, t) = refParts(ref)
    val wh = warehouse.getOrElse(throw new IllegalArgumentException(
      s"creating $ref through the hive catalog needs a 'warehouse' path " +
        "(set it in the catalog config)"))
    s"${wh.stripSuffix("/")}/$db/$t"
  }

  override def dropPointer(ref: String): Unit = {
    val (db, t) = refParts(ref)
    call("drop_table", w => {
      w.writeFieldString(1, db); w.writeFieldString(2, t)
      w.writeStructStop()
    }) { r =>
      readResult(r) match {
        case (_, Some(1)) => () // NoSuchObjectException: idempotent
        case (_, Some(err)) => throw new IllegalStateException(
          s"metastore drop_table($ref) failed (exception field $err)")
        case _ => ()
      }
    }
  }
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

  /** GENERIC thrift value tree — what the commit path needs to carry a
    * whole metastore `Table` struct through unchanged: `alter_table`
    * must echo every field the server sent (storage descriptor, stats,
    * fields this codec has never heard of) with ONLY the parameters map
    * rewritten; a synthesized struct would silently drop them. */
  sealed trait TValue
  object TValue {
    /** Bool/Byte/I16/I32/I64/Double/String (string keeps raw bytes). */
    final case class Prim(t: Byte, v: Any) extends TValue
    final case class StructV(fields: Vector[(Int, Byte, TValue)]) extends TValue
    final case class MapV(kt: Byte, vt: Byte,
        entries: Vector[(TValue, TValue)]) extends TValue
    final case class ListV(isSet: Boolean, et: Byte,
        items: Vector[TValue]) extends TValue

    def str(s: String): Prim =
      Prim(TString, s.getBytes(StandardCharsets.UTF_8))
    def asString(v: TValue): String = v match {
      case Prim(TString, b: Array[Byte]) => new String(b, StandardCharsets.UTF_8)
      case other => throw new IllegalStateException(s"not a thrift string: $other")
    }
    def stringMap(m: Map[String, String]): MapV =
      MapV(TString, TString,
        m.toVector.sortBy(_._1).map { case (k, v) => (str(k), str(v)) })
    def asStringMap(v: TValue): Map[String, String] = v match {
      case MapV(TString, TString, es) =>
        es.map { case (k, vv) => asString(k) -> asString(vv) }.toMap
      case other => throw new IllegalStateException(s"not a map<string,string>: $other")
    }
  }

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

    def writeFieldI64(id: Int, v: Long): Unit = {
      out.writeByte(TI64); out.writeShort(id); out.writeLong(v)
    }
    /** One typed field carrying a generic [[TValue]]. */
    def writeField(id: Int, t: Byte, v: TValue): Unit = {
      out.writeByte(t); out.writeShort(id); writeValue(t, v)
    }
    /** Generic value emit — the mirror of [[Reader.readValue]]. */
    def writeValue(t: Byte, v: TValue): Unit = (t, v) match {
      case (TBool, TValue.Prim(_, b: Boolean)) => out.writeByte(if (b) 1 else 0)
      case (TByte, TValue.Prim(_, b: Byte)) => out.writeByte(b.toInt)
      case (TI16, TValue.Prim(_, s: Short)) => out.writeShort(s.toInt)
      case (TI32, TValue.Prim(_, i: Int)) => out.writeInt(i)
      case (TI64, TValue.Prim(_, l: Long)) => out.writeLong(l)
      case (TDouble, TValue.Prim(_, d: Double)) => out.writeDouble(d)
      case (TString, TValue.Prim(_, b: Array[Byte])) =>
        out.writeInt(b.length); out.write(b)
      case (TStruct, TValue.StructV(fields)) =>
        fields.foreach { case (id, ft, fv) => writeField(id, ft, fv) }
        out.writeByte(TStop)
      case (TMap, TValue.MapV(kt, vt, es)) =>
        out.writeByte(kt); out.writeByte(vt); out.writeInt(es.size)
        es.foreach { case (k, vv) => writeValue(kt, k); writeValue(vt, vv) }
      case (TList, TValue.ListV(_, et, items)) =>
        out.writeByte(et); out.writeInt(items.size)
        items.foreach(writeValue(et, _))
      case (TSet, TValue.ListV(_, et, items)) =>
        out.writeByte(et); out.writeInt(items.size)
        items.foreach(writeValue(et, _))
      case other => throw new IllegalStateException(
        s"cannot encode thrift value shape $other")
    }
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
    /** Generic value READ into a [[TValue]] tree — lossless, so a whole
      * metastore struct can be echoed back by [[Writer.writeValue]]. */
    def readValue(t: Byte): TValue = t match {
      case TBool => TValue.Prim(TBool, in.readByte() != 0)
      case TByte => TValue.Prim(TByte, in.readByte())
      case TI16 => TValue.Prim(TI16, in.readShort())
      case TI32 => TValue.Prim(TI32, in.readInt())
      case TI64 => TValue.Prim(TI64, in.readLong())
      case TDouble => TValue.Prim(TDouble, in.readDouble())
      case TString =>
        val n = in.readInt()
        require(n >= 0 && n < 64 * 1024 * 1024, s"implausible string length $n")
        val b = new Array[Byte](n); in.readFully(b)
        TValue.Prim(TString, b)
      case TStruct =>
        var fields = Vector.empty[(Int, Byte, TValue)]
        forEachField { (ft, id) => fields :+= ((id, ft, readValue(ft))) }
        TValue.StructV(fields)
      case TMap =>
        val kt = in.readByte(); val vt = in.readByte()
        val n = in.readInt()
        TValue.MapV(kt, vt,
          (0 until n).map(_ => (readValue(kt), readValue(vt))).toVector)
      case TList | TSet =>
        val et = in.readByte(); val n = in.readInt()
        TValue.ListV(t == TSet, et, (0 until n).map(_ => readValue(et)).toVector)
      case other => throw new IllegalStateException(s"unknown thrift type $other")
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
