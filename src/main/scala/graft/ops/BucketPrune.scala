package graft.ops

import graft.meta.IcebergTable

/** Shared bucket-partition prune soundness rules for the persisted
  * index tables ([[NearDupIndex]], [[ComponentIndex]]): the bucket
  * count a table's files were WRITTEN under is read from the table's
  * own partition spec — pruning with any other N would silently miss
  * rows — and evolution ambiguity disables pruning rather than
  * guessing. One definition, so a fix to the rules cannot diverge
  * between the indexes. */
private[ops] object BucketPrune {

  /** Bucket count of the single `bucket[N]` transform over `colName` in
    * the table's partition specs. None = not bucket-partitioned on that
    * column, or CONFLICTING specs after evolution → callers fall back
    * to the full scan (conservative). */
  def bucketCount(t: IcebergTable, colName: String): Option[Int] = {
    val BucketRe = """bucket\[(\d+)\]""".r
    val srcId = t.metadata.currentSchema.fields
      .find(_.name == colName).map(_.id)
    t.metadata.partitionSpecs.flatMap(_.fields)
      .filter(f => srcId.contains(f.sourceId))
      .map(_.transform).distinct match {
      case Seq(BucketRe(n)) => Some(n.toInt)
      case _ => None
    }
  }
}
