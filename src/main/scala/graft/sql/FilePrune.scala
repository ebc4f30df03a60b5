package graft.sql

import org.apache.spark.sql.sources._

import graft.expr.IcebergDecode
import graft.meta.{DataFileEntry, IcebergTable, Transforms}

/** Driver-side conservative file pruning from pushed DSv2 filters — the
  * Iceberg scan-planning step, evaluated per [[DataFileEntry]] over the
  * manifest stats: `keep = false` only when the file PROVABLY holds no
  * matching row (bounds disjoint, partition-transform value differs, or
  * null counts rule the predicate out). Anything unrecognized — unknown
  * filter shape, undecodable bound, missing stat — keeps the file; the
  * engine returns every pushed filter as a residual, so pruning errors
  * toward extra IO, never wrong results.
  *
  * Scale shape: runs over the manifest entry list (metadata-scale:
  * thousands of entries at 100 TB), saving the DATA scan of every pruned
  * file. */
object FilePrune {

  /** Filters this pruner understands (used to report `pushedFilters` in
    * EXPLAIN; untranslatable shapes are residual-only). */
  def translatable(f: Filter): Boolean = f match {
    case EqualTo(_, _) | EqualNullSafe(_, _) | GreaterThan(_, _) |
         GreaterThanOrEqual(_, _) | LessThan(_, _) | LessThanOrEqual(_, _) |
         In(_, _) | IsNull(_) | IsNotNull(_) => true
    case And(l, r) => translatable(l) && translatable(r)
    case Or(l, r) => translatable(l) && translatable(r)
    case _ => false
  }

  /** May `e` contain a row satisfying `f`? Conservative. */
  def keep(t: IcebergTable, e: DataFileEntry, f: Filter): Boolean = f match {
    case EqualTo(a, v) => rangeKeep(t, e, a, Some(v), Some(v)) && partKeep(t, e, a, v)
    case EqualNullSafe(a, null) => nullKeep(t, e, a)
    case EqualNullSafe(a, v) => rangeKeep(t, e, a, Some(v), Some(v)) && partKeep(t, e, a, v)
    case GreaterThan(a, v) => rangeKeep(t, e, a, Some(v), None)
    case GreaterThanOrEqual(a, v) => rangeKeep(t, e, a, Some(v), None)
    case LessThan(a, v) => rangeKeep(t, e, a, None, Some(v))
    case LessThanOrEqual(a, v) => rangeKeep(t, e, a, None, Some(v))
    case In(a, vs) =>
      vs.isEmpty || vs.exists(v =>
        rangeKeep(t, e, a, Option(v), Option(v)) &&
          (v == null || partKeep(t, e, a, v)))
    case IsNull(a) => nullKeep(t, e, a)
    case IsNotNull(a) => nonNullKeep(t, e, a)
    case And(l, r) => keep(t, e, l) && keep(t, e, r)
    case Or(l, r) => keep(t, e, l) || keep(t, e, r)
    case _ => true
  }

  // ------------------------------------------------------------ helpers

  private def field(t: IcebergTable, name: String) =
    t.metadata.currentSchema.fields.find(f => f.name == name && !f.path.contains('.'))

  /** Filter value → the numeric domain bounds are decoded into
    * (dates → epoch days, timestamps → micros). */
  private def toNum(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
    case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
    case ts: java.sql.Timestamp =>
      Some(ts.getTime * 1000.0 + (ts.getNanos / 1000) % 1000)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1e6 + i.getNano / 1000.0)
    case b: java.lang.Boolean => Some(if (b) 1.0 else 0.0)
    case _ => None
  }

  /** Bounds intersection test: may the file's [lower, upper] for `a`
    * intersect [lo, hi]? Missing/undecodable stats keep. */
  private def rangeKeep(
      t: IcebergTable, e: DataFileEntry, a: String,
      lo: Option[Any], hi: Option[Any]): Boolean =
    field(t, a) match {
      case None => true
      case Some(sf) if sf.fieldType == "string" =>
        // compare in unsigned UTF-8 BYTE order — the order the bounds
        // were COMPUTED in (Spark min/max uses UTF8String binary order).
        // Java String ordering (UTF-16 units) disagrees around
        // supplementary characters vs U+E000..U+FFFF and would prune
        // files that hold the probed value.
        val fLo = e.lowerBounds.get(sf.id)
        val fUp = e.upperBounds.get(sf.id)
        def vBytes(v: Any): Option[Array[Byte]] = v match {
          case s: String => Some(s.getBytes("UTF-8"))
          case _ => None
        }
        val okLo = (lo.flatMap(vBytes), fUp) match {
          case (Some(v), Some(up)) => cmpBytes(up, v) >= 0
          case _ => true
        }
        val okHi = (hi.flatMap(vBytes), fLo) match {
          case (Some(v), Some(lw)) => cmpBytes(lw, v) <= 0
          case _ => true
        }
        okLo && okHi
      case Some(sf) =>
        val fLo = e.lowerBounds.get(sf.id)
          .flatMap(b => IcebergDecode.decodeNumeric(sf.fieldType, b))
        val fUp = e.upperBounds.get(sf.id)
          .flatMap(b => IcebergDecode.decodeNumeric(sf.fieldType, b))
        // a NaN bound means the file HOLDS NaNs (Spark min/max ranks NaN
        // greatest) — Java comparisons against it answer false, which
        // would wrongly PRUNE; keep instead
        val okLo = (lo.flatMap(toNum), fUp) match {
          case (Some(v), Some(up)) => up.isNaN || up >= v
          case _ => true
        }
        val okHi = (hi.flatMap(toNum), fLo) match {
          case (Some(v), Some(lw)) => lw.isNaN || lw <= v
          case _ => true
        }
        okLo && okHi
    }

  /** Unsigned lexicographic byte comparison (UTF8String / parquet binary
    * order). */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Partition-transform test: for every spec field derived from source
    * `a` that this file's partition map carries, the transformed literal
    * must match (identity, bucket[N], truncate[W] — see
    * [[graft.meta.Transforms.literal]]). Mirrors
    * [[graft.ops.ScanPlanner.pruneFiles]]'s column-side logic. */
  private def partKeep(t: IcebergTable, e: DataFileEntry, a: String, v: Any): Boolean =
    field(t, a) match {
      case None => true
      case Some(sf) =>
        val raw = v match {
          case d: java.time.LocalDate => java.sql.Date.valueOf(d).toString
          case i: java.time.Instant => java.sql.Timestamp.from(i).toString
          case other => String.valueOf(other)
        }
        t.metadata.partitionSpecs.flatMap(_.fields).filter(_.sourceId == sf.id)
          .groupBy(_.name).forall { case (pname, sfs) =>
            sfs.map(_.transform).distinct match {
              case Seq(tr) =>
                (e.partition.get(pname),
                  Transforms.literalForms(tr, raw, sf.fieldType)) match {
                  case (Some(actual), Some(expected)) => expected.contains(actual)
                  case _ => true
                }
              case _ => true // conflicting transforms under one name: keep
            }
          }
    }

  // ------------------------------------------ manifest-level tier

  /** ONE pruned listing shared across a scan's construction: the
    * manifests the pushed filters keep, and the per-entry survivors
    * inside them — each computed at most once (a DSv2 scan consults the
    * listing from the fill gate, the plan lambda and the statistics
    * estimate; without sharing, each re-derived it). Manifest-level
    * pruning first: a data manifest whose partition summaries
    * ([[graft.meta.ManifestSummaries]]) exclude every pushed filter is
    * never opened. When nothing can be skipped the memoized full
    * listing answers, so the fast path costs nothing extra. */
  final class PrunedListing(t: IcebergTable, snapshotId: Option[Long],
      pushed: Seq[Filter]) {
    lazy val allManifests: Seq[graft.meta.ManifestFile] =
      t.manifests(snapshotId).filter(_.content == 0)
    lazy val keptManifests: Seq[graft.meta.ManifestFile] =
      allManifests.filter(m => pushed.forall(f => keepManifest(t, m, f)))
    lazy val entries: Seq[DataFileEntry] = {
      val listed =
        if (keptManifests.size == allManifests.size) t.files(snapshotId)
        else keptManifests.flatMap(m => t.manifestEntries(m.manifestPath))
          .filter(_.status != 2)
      listed.filter(e => pushed.forall(f => keep(t, e, f)))
    }
  }

  /** Live data-file entries surviving `pushed` (one-shot form of
    * [[PrunedListing]]). */
  def liveEntries(t: IcebergTable, snapshotId: Option[Long],
      pushed: Seq[Filter]): Seq[DataFileEntry] =
    new PrunedListing(t, snapshotId, pushed).entries

  /** May manifest `m` hold an entry satisfying `f`? Conservative, the
    * manifest-level twin of [[keep]]: answers from the manifest-list
    * partition summaries alone, without opening the manifest. */
  def keepManifest(t: IcebergTable, m: graft.meta.ManifestFile, f: Filter): Boolean = f match {
    case EqualTo(a, v) =>
      partManifestKeep(t, m, a, v) && rangeManifestKeep(t, m, a, Some(v), Some(v))
    case EqualNullSafe(a, null) => nullManifestKeep(t, m, a)
    case EqualNullSafe(a, v) =>
      partManifestKeep(t, m, a, v) && rangeManifestKeep(t, m, a, Some(v), Some(v))
    case GreaterThan(a, v) => rangeManifestKeep(t, m, a, Some(v), None)
    case GreaterThanOrEqual(a, v) => rangeManifestKeep(t, m, a, Some(v), None)
    case LessThan(a, v) => rangeManifestKeep(t, m, a, None, Some(v))
    case LessThanOrEqual(a, v) => rangeManifestKeep(t, m, a, None, Some(v))
    case In(a, vs) =>
      vs.isEmpty || vs.exists(v =>
        if (v == null) nullManifestKeep(t, m, a)
        else partManifestKeep(t, m, a, v) &&
          rangeManifestKeep(t, m, a, Some(v), Some(v)))
    case IsNull(a) => nullManifestKeep(t, m, a)
    case IsNotNull(a) => nonNullManifestKeep(t, m, a)
    case And(l, r) => keepManifest(t, m, l) && keepManifest(t, m, r)
    case Or(l, r) => keepManifest(t, m, l) || keepManifest(t, m, r)
    case _ => true
  }

  /** The filter value in the stored-form domain [[partKeep]] renders
    * into. */
  private def rawForm(v: Any): String = v match {
    case d: java.time.LocalDate => java.sql.Date.valueOf(d).toString
    case i: java.time.Instant => java.sql.Timestamp.from(i).toString
    case other => String.valueOf(other)
  }

  private def partManifestKeep(
      t: IcebergTable, m: graft.meta.ManifestFile, a: String, v: Any): Boolean =
    field(t, a) match {
      case None => true
      case Some(sf) =>
        val groups = t.metadata.partitionSpecs.flatMap(_.fields)
          .filter(_.sourceId == sf.id)
          .groupBy(_.name).toSeq.map { case (pname, sfs) =>
            pname -> (sfs.map(_.transform).distinct match {
              case Seq(tr) =>
                Transforms.literalForms(tr, rawForm(v), sf.fieldType).map(_.toSet)
              case _ => None
            })
          }
        graft.meta.ManifestSummaries.mayMatch(t.metadata, m, groups)
    }

  private def rangeManifestKeep(t: IcebergTable, m: graft.meta.ManifestFile,
      a: String, lo: Option[Any], hi: Option[Any]): Boolean =
    field(t, a) match {
      case None => true
      case Some(sf) =>
        val nLo = lo.flatMap(toNum)
        val nHi = hi.flatMap(toNum)
        if (nLo.isEmpty && nHi.isEmpty) true
        else graft.meta.ManifestSummaries.mayIntersect(
          t.metadata, m, sf.id, nLo, nHi)
    }

  /** All three supported transforms (identity, bucket[N], truncate[W])
    * map null to null and non-null to non-null, so a summary's
    * containsNull answers for the SOURCE column too. */
  private def specFieldsOf(t: IcebergTable, m: graft.meta.ManifestFile, srcId: Int) =
    t.metadata.partitionSpecs.find(_.specId == m.partitionSpecId)
      .map(_.fields.filter(pf => pf.sourceId == srcId &&
        Transforms.isSupported(pf.transform)))
      .getOrElse(Seq.empty)

  private def nullManifestKeep(
      t: IcebergTable, m: graft.meta.ManifestFile, a: String): Boolean =
    field(t, a).forall(sf => !specFieldsOf(t, m, sf.id).exists(pf =>
      m.partitions.find(_.name == pf.name).exists(!_.containsNull)))

  private def nonNullManifestKeep(
      t: IcebergTable, m: graft.meta.ManifestFile, a: String): Boolean =
    field(t, a).forall(sf => !specFieldsOf(t, m, sf.id).exists(pf =>
      // summary with no bounds = every value in the manifest is null
      m.partitions.find(_.name == pf.name)
        .exists(s => s.containsNull && s.lower.isEmpty && s.upper.isEmpty)))

  private def nullKeep(t: IcebergTable, e: DataFileEntry, a: String): Boolean =
    field(t, a).forall(sf => !e.nullValueCounts.get(sf.id).contains(0L))

  private def nonNullKeep(t: IcebergTable, e: DataFileEntry, a: String): Boolean =
    field(t, a).forall { sf =>
      (e.valueCounts.get(sf.id), e.nullValueCounts.get(sf.id)) match {
        case (Some(vc), Some(nc)) => vc - nc > 0
        case _ => true
      }
    }
}
