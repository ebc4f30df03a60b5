package graft.meta

import scala.util.Try

/** Compute and evaluate manifest-list partition field summaries
  * ([[PartitionFieldSummary]], Iceberg spec `partitions`/`field_summary`)
  * — the MANIFEST-level tier of scan planning. File-level pruning
  * ([[graft.ops.ScanPlanner.pruneFiles]], [[graft.sql.FilePrune]]) still
  * decides per entry; this tier decides per MANIFEST, before the
  * manifest's Avro is even opened. At 100 TB — thousands of manifests,
  * millions of entries — a partition-equals probe that touches one
  * partition should parse the handful of manifests whose summary ranges
  * cover it, not every manifest in the list (ref reads every manifest
  * unconditionally, `formatters.py:263-281`; Iceberg's own planner skips
  * via exactly these summaries).
  *
  * Soundness contract (mirrors the file tier): every answer errors
  * toward KEEP. A summary is only written when every entry in the
  * manifest carries the field and every stored value parses under the
  * field's type ([[TableWriter.typedPartitionValue]] — raw foreign
  * spellings like "0123" parse to the same typed value their canonical
  * form does); anything else omits the field and pruning treats absence
  * as "may match". Bounds are stored canonically and parsed back to
  * TYPED values on the probe side, so ordering is the value type's own
  * (timestamps compare as instants under the probing JVM's zone on both
  * sides of the comparison — write-side zone never leaks in).
  */
object ManifestSummaries {

  /** Result type of a transform over its source column type — the type
    * partition VALUES of that spec field carry. None for transforms the
    * summary machinery does not model. */
  def resultType(transform: String, sourceType: String): Option[String] =
    transform match {
      case "identity" => Some(sourceType)
      case t if t.startsWith("bucket[") => Some("int")
      case t if t.startsWith("truncate[") => Some(sourceType)
      case _ => None
    }

  /** Partition field name -> transform-result ice type for `specId`'s
    * fields, restricted to types the canonical-value machinery can parse
    * and order. Fields whose source has left the current schema, or
    * whose result type is not canonicalizable, are absent. */
  def fieldTypes(md: TableMetadata, specId: Int): Map[String, String] =
    md.partitionSpecs.find(_.specId == specId).map(_.fields.flatMap { pf =>
      for {
        src <- md.currentSchema.fields.find(f =>
          f.id == pf.sourceId && !f.path.contains('.'))
        tp <- resultType(pf.transform, src.fieldType)
        if TableWriter.canonicalizableType(tp)
      } yield pf.name -> tp
    }.toMap).getOrElse(Map.empty)

  /** Typed partition value of a stored form — `Some(None)` for the null
    * sentinel, `None` when the form does not parse under `tp`. */
  private def typed(tp: String, raw: String): Option[Option[Any]] =
    Try(TableWriter.typedPartitionValue(tp, raw)).toOption

  /** All the summary types are JVM Comparables with value semantics
    * (Long, Integer, Double, Float, String, Boolean, java.sql.Date,
    * java.sql.Timestamp); both sides of a comparison always carry the
    * same type because they parsed under the same ice type. */
  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[AnyRef]].compareTo(b.asInstanceOf[AnyRef])

  /** Summaries for a manifest holding exactly `entries`, under `specId`.
    * Driver-side O(entries x spec fields) string work at write time —
    * the same scale as rendering the entries themselves. */
  def of(md: TableMetadata, specId: Int,
      entries: Seq[DataFileEntry]): Seq[PartitionFieldSummary] = {
    if (entries.isEmpty) return Seq.empty
    fieldTypes(md, specId).toSeq.sortBy(_._1).flatMap { case (name, tp) =>
      val raws = entries.map(_.partition.get(name))
      if (raws.exists(_.isEmpty)) None // an older-spec entry lacks the key
      else {
        val parsed = raws.map(r => typed(tp, r.get))
        if (parsed.exists(_.isEmpty)) None // unparseable foreign spelling
        else {
          val containsNull = parsed.exists(_.get.isEmpty)
          val pairs = raws.map(_.get).zip(parsed.map(_.get))
            .collect { case (raw, Some(v)) => (raw, v) }
          // NaN is unordered: every range comparison against it answers
          // false, which would PRUNE instead of keep — a field holding
          // one is not summarizable
          val hasNaN = pairs.exists {
            case (_, d: Double) => d.isNaN
            case (_, f: Float) => f.isNaN
            case _ => false
          }
          if (hasNaN) None
          else if (pairs.isEmpty)
            Some(PartitionFieldSummary(name, containsNull = true, None, None))
          else {
            val loRaw = pairs.reduceLeft((a, b) => if (cmp(b._2, a._2) < 0) b else a)._1
            val hiRaw = pairs.reduceLeft((a, b) => if (cmp(b._2, a._2) > 0) b else a)._1
            Some(PartitionFieldSummary(name, containsNull,
              Some(TableWriter.canonicalPartitionValue(tp, loRaw)),
              Some(TableWriter.canonicalPartitionValue(tp, hiRaw))))
          }
        }
      }
    }
  }

  /** May a value stored as `form` (canonical or raw spelling, or the
    * null sentinel) appear in a manifest summarized by `s`? */
  def mayContain(s: PartitionFieldSummary, tp: String, form: String): Boolean =
    typed(tp, form) match {
      case None => true // unparseable probe: keep
      case Some(None) => s.containsNull
      case Some(Some(v)) => (s.lower, s.upper) match {
        case (Some(lo), Some(hi)) =>
          (typed(tp, lo).flatten, typed(tp, hi).flatten) match {
            case (Some(lov), Some(hiv)) =>
              if (isNaN(v) || isNaN(lov) || isNaN(hiv)) true // unordered: keep
              else cmp(lov, v) <= 0 && cmp(v, hiv) <= 0
            case _ => true
          }
        // BOTH bounds absent is our writer's all-null shape: a non-null
        // probe cannot match. A ONE-SIDED summary is not a shape this
        // writer emits (a foreign tool's) — absence reads as may-match.
        case (None, None) => false
        case _ => true
      }
    }

  private def isNaN(v: Any): Boolean = v match {
    case d: Double => d.isNaN
    case f: Float => f.isNaN
    case _ => false
  }

  /** Manifest-level twin of the file tier's partition-equals groups
    * ([[graft.ops.ScanPlanner.pruneFiles]] / `readTableWhereIn`): keep
    * the manifest iff for every probed spec-field name with a concrete
    * allowed-form set, the manifest's summary admits at least one form.
    * A manifest with no summaries, a field with no summary, or a field
    * the spec does not type all keep — conservative. */
  def mayMatch(md: TableMetadata, m: ManifestFile,
      groups: Seq[(String, Option[Set[String]])]): Boolean =
    m.partitions.isEmpty || {
      lazy val types = fieldTypes(md, m.partitionSpecId)
      groups.forall { case (pname, allowedOpt) =>
        allowedOpt.forall { allowed =>
          m.partitions.find(_.name == pname) match {
            case None => true
            case Some(s) => types.get(pname) match {
              case None => true
              case Some(tp) => allowed.exists(form => mayContain(s, tp, form))
            }
          }
        }
      }
    }

  /** A LEXICALLY-ordered rendering of one stored partition value, for
    * clustering sorts (rewrite_manifests packing): numeric types render
    * so that string order equals value order ("2" before "10"), temporal
    * canonical forms are already lexical, nulls sort last, unparseable
    * forms sort as themselves. Only tightness depends on this —
    * correctness never does. */
  def sortForm(tp: String, raw: String): String = {
    // flipping the sign bit maps signed order onto unsigned order
    def sortableBits(bits: Long): String = {
      val s = java.lang.Long.toUnsignedString(bits ^ Long.MinValue)
      "0" * (20 - s.length) + s
    }
    // IEEE-754 trick: negative floats reverse-order as raw bits
    def floatBits(d: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(d)
      if (b < 0) ~b else b ^ Long.MinValue
    }
    typed(tp, raw) match {
      case Some(None) => "￿" // null sentinel: one partition, sorted last
      case Some(Some(v: Long)) => sortableBits(v)
      case Some(Some(v: Int)) => sortableBits(v.toLong)
      case Some(Some(v: Double)) =>
        val s = java.lang.Long.toUnsignedString(floatBits(v))
        "0" * (20 - s.length) + s
      case Some(Some(v: Float)) =>
        val s = java.lang.Long.toUnsignedString(floatBits(v.toDouble))
        "0" * (20 - s.length) + s
      case Some(Some(v)) => TableWriter.canonicalPartitionValue(tp, raw)
      case None => raw
    }
  }

  /** Numeric domain of a typed summary value for RANGE probes — the same
    * domain [[graft.expr.IcebergDecode.decodeNumeric]] decodes file
    * bounds into (dates = epoch days). Timestamps are deliberately
    * absent: their summary strings parse in the JVM-default zone while
    * range probes arrive in the bounds domain (session-zone micros), and
    * a zone disagreement would mis-prune. */
  private def toNum(v: Any): Option[Double] = v match {
    // NaN is unordered — comparisons answer false, which would PRUNE;
    // exclude it so the conservative keep applies instead
    case n: java.lang.Number if !n.doubleValue().isNaN => Some(n.doubleValue())
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
    case b: java.lang.Boolean => Some(if (b) 1.0 else 0.0)
    case _ => None
  }

  /** May an IDENTITY-partitioned source column with values in
    * `[lo, hi]` (bounds-numeric domain, either side open) intersect the
    * manifest? Only identity fields carry the column's own values;
    * bucket hashes and truncations do not preserve order. */
  def mayIntersect(md: TableMetadata, m: ManifestFile, sourceId: Int,
      lo: Option[Double], hi: Option[Double]): Boolean =
    m.partitions.isEmpty || {
      val spec = md.partitionSpecs.find(_.specId == m.partitionSpecId)
      val idFields = spec.map(_.fields.filter(pf =>
        pf.sourceId == sourceId && pf.transform == "identity"))
        .getOrElse(Seq.empty)
      lazy val types = fieldTypes(md, m.partitionSpecId)
      idFields.forall { pf =>
        (m.partitions.find(_.name == pf.name), types.get(pf.name)) match {
          case (Some(s), Some(tp)) =>
            (s.lower, s.upper) match {
              case (Some(sLo), Some(sHi)) =>
                val nLo = typed(tp, sLo).flatten.flatMap(toNum)
                val nHi = typed(tp, sHi).flatten.flatMap(toNum)
                val okLo = (lo, nHi) match {
                  case (Some(v), Some(h)) => h >= v
                  case _ => true
                }
                val okHi = (hi, nLo) match {
                  case (Some(v), Some(l)) => l <= v
                  case _ => true
                }
                okLo && okHi
              // both absent = all null: no non-null value intersects;
              // one-sided (foreign writer) = conservative keep
              case (None, None) => lo.isEmpty && hi.isEmpty
              case _ => true
            }
          case _ => true
        }
      }
    }
}
