package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** String-bound truncation (Iceberg `truncate(16)` metrics default,
  * round 18): long-text columns must not copy full min/max text into
  * every manifest entry, and the truncated bounds must stay SOUND —
  * lower <= every value, upper >= every value — so pruning never drops
  * a matching file. */
class StringBoundsSpec extends SparkSpec {

  import spark.implicits._

  test("truncateLower / truncateUpper: prefix semantics, bump, fallbacks") {
    // short strings pass through untouched
    assert(TableWriter.truncateLower("short") == "short")
    assert(TableWriter.truncateUpper("short") == "short")
    val s16 = "abcdefghijklmnop" // exactly 16
    assert(TableWriter.truncateLower(s16) == s16)
    assert(TableWriter.truncateUpper(s16) == s16)
    val long = s16 + "qrstuvwxyz"
    assert(TableWriter.truncateLower(long) == s16)
    assert(TableWriter.truncateUpper(long) == "abcdefghijklmnoq") // p -> q
    assert(TableWriter.truncateUpper(long) > long)
    // last char at Char.MaxValue: the bump walks left
    val maxTail = "abcdefghijklmno￿" + "z"
    assert(TableWriter.truncateUpper(maxTail) == "abcdefghijklmnp")
    assert(TableWriter.truncateUpper(maxTail) > maxTail)
    // code points, not chars: a surrogate PAIR counts once and is never
    // split by the lower prefix
    val emoji = "😀" // one code point, two chars
    val emojis = emoji * 20
    val lower = TableWriter.truncateLower(emojis)
    assert(lower == emoji * 16 && lower.codePointCount(0, lower.length) == 16)
    // nothing bumpable in an all-surrogate prefix: fall back to the FULL
    // value (a bigger bound, never an unsound or absent one)
    assert(TableWriter.truncateUpper(emojis) == emojis)
  }

  test("string range pruning compares in UTF-8 BYTE order — the order " +
      "the bounds were computed in — not Java UTF-16 order") {
    // file holds {emoji-run, "￿"+"z"}: Spark's min/max (UTF8String
    // binary order) rank the emoji HIGHEST (F0 9F.. > EF BF BF), so
    // upper = emoji-run. Java String order ranks it LOWEST of the two
    // (0xD83D < 0xFFFF) — a UTF-16 comparison would prune the file for
    // the "￿"-probe it actually holds.
    val dir = Files.createTempDirectory("graft-strb-utf8").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType))))
    val emojiRun = "😀" * 20
    val ffz = "￿" + "z"
    TableWriter.append(spark, dir,
      Seq((1L, emojiRun), (2L, ffz)).toDF("id", "txt").coalesce(1))
    val t = IcebergTable.load(dir)
    import org.apache.spark.sql.sources.EqualTo
    // the file holding ffz must KEEP for the ffz probe under every entry
    val hit = t.files().filter(e =>
      graft.sql.FilePrune.keep(t, e, EqualTo("txt", ffz)))
    assert(hit.nonEmpty, "UTF-16 ordering would have pruned the holder")
    // and the probe-through read is exact
    val kept = graft.sql.FilePrune.liveEntries(t, None, Seq(EqualTo("txt", ffz)))
    assert(kept.map(_.filePath).toSet == hit.map(_.filePath).toSet)
  }

  test("append stamps truncated string bounds; equality probes on long " +
      "values still keep the file") {
    val dir = Files.createTempDirectory("graft-strbounds").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType))))
    val loVal = "aardvark " + ("x" * 100)
    val hiVal = "zebra " + ("y" * 100)
    TableWriter.append(spark, dir,
      Seq((1L, loVal), (2L, hiVal), (3L, "middle")).toDF("id", "txt"))
    val t = IcebergTable.load(dir)
    val entries = t.files()
    val txtId = t.metadata.currentSchema.fields.find(_.name == "txt").get.id
    val los = entries.map(e => new String(e.lowerBounds(txtId), "UTF-8"))
    val his = entries.map(e => new String(e.upperBounds(txtId), "UTF-8"))
    // truncated, not full text…
    assert((los ++ his).forall(_.length <= 16))
    // …and sound: some lower <= min value, some upper >= max value
    assert(los.min <= loVal && his.max >= hiVal)
    // DSv2 pruning keeps the file holding an in-range long literal…
    import org.apache.spark.sql.sources.EqualTo
    assert(entries.exists(e => graft.sql.FilePrune.keep(t, e, EqualTo("txt", hiVal))))
    assert(entries.exists(e => graft.sql.FilePrune.keep(t, e, EqualTo("txt", "middle"))))
    // …and every file prunes for a value provably past the bumped uppers
    assert(entries.forall(e =>
      !graft.sql.FilePrune.keep(t, e, EqualTo("txt", "zz_way_past"))))
    // read-back is exact through the truncated metadata
    assert(graft.ops.ScanPlanner.readTable(spark, t)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
