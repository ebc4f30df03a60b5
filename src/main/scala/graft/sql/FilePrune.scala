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
        val fLo = e.lowerBounds.get(sf.id).map(b => new String(b, "UTF-8"))
        val fUp = e.upperBounds.get(sf.id).map(b => new String(b, "UTF-8"))
        val okLo = (lo, fUp) match {
          case (Some(v: String), Some(up)) => up >= v
          case _ => true
        }
        val okHi = (hi, fLo) match {
          case (Some(v: String), Some(lw)) => lw <= v
          case _ => true
        }
        okLo && okHi
      case Some(sf) =>
        val fLo = e.lowerBounds.get(sf.id)
          .flatMap(b => IcebergDecode.decodeNumeric(sf.fieldType, b))
        val fUp = e.upperBounds.get(sf.id)
          .flatMap(b => IcebergDecode.decodeNumeric(sf.fieldType, b))
        val okLo = (lo.flatMap(toNum), fUp) match {
          case (Some(v), Some(up)) => up >= v
          case _ => true
        }
        val okHi = (hi.flatMap(toNum), fLo) match {
          case (Some(v), Some(lw)) => lw <= v
          case _ => true
        }
        okLo && okHi
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
