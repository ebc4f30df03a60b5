package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The union+window as-of join must implement `l.ts >= r.ts` backward
  * semantics exactly: equal-ts right rows visible, no-prior-right rows
  * null, and agreement with a brute-force theta-join oracle on random
  * data. */
class AsOfSpec extends SparkSpec {

  test("hand-built: picks latest at-or-before, equal ts included, no match is null") {
    val s2 = spark
    import s2.implicits._
    val left = Seq(
      (1L, "u1", 100L), // after r@50, r@100 -> equal ts 100 wins
      (2L, "u1", 60L),  // only r@50 before
      (3L, "u1", 10L),  // nothing at-or-before -> null
      (4L, "u2", 500L)  // u2 has no right rows at all -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", 50L, 5.0),
      ("u1", 100L, 7.0),
      ("u1", 200L, 9.0) // after every left row -> never picked
    ).toDF("k", "t", "v")

    val out = AsOf.asofJoin(left, right, "k", "t", rightPrefix = "r_")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(0).getAs[Long]("r_t") == 100L && out(0).getAs[Double]("r_v") == 7.0)
    assert(out(1).getAs[Long]("r_t") == 50L && out(1).getAs[Double]("r_v") == 5.0)
    assert(out(2).isNullAt(out(2).fieldIndex("r_t")))
    assert(out(3).isNullAt(out(3).fieldIndex("r_v")))
  }

  test("tolerance: stale matches null out, fresh ones and never-matched rows unchanged") {
    val s2 = spark
    import s2.implicits._
    val left = Seq(
      (1L, "u1", 100L), // match r@95, gap 5 <= 10 -> kept
      (2L, "u1", 300L), // match r@95, gap 205 > 10 -> nulled
      (3L, "u2", 50L)   // no right row at all -> null either way
    ).toDF("id", "k", "t")
    val right = Seq(("u1", 95L, 5.0)).toDF("k", "t", "v")
    val out = AsOf.asofJoinTolerance(left, right, "k", "t", tolerance = 10L)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("r_t") == 95L && out(0).getAs[Double]("r_v") == 5.0)
    assert(out(1).isNullAt(out(1).fieldIndex("r_t")))
    assert(out(1).isNullAt(out(1).fieldIndex("r_v")))
    assert(out(2).isNullAt(out(2).fieldIndex("r_t")))
    assert(out.map(_.schema.fieldNames.toSeq).distinct.head ==
      Seq("k", "t", "id", "r_t", "r_v")) // no __stale leak
  }

  test("null right payload fields are attached as-is, not skipped over") {
    val s2 = spark
    import s2.implicits._
    val left = Seq((1L, "u", 100L)).toDF("id", "k", "t")
    val right = Seq(
      ("u", 10L, Option(5.0)),
      ("u", 90L, Option.empty[Double]) // latest row has null payload
    ).toDF("k", "t", "v")
    val r = AsOf.asofJoin(left, right, "k", "t").collect().head
    assert(r.getAs[Long]("r_t") == 90L)
    assert(r.isNullAt(r.fieldIndex("r_v"))) // NOT 5.0 from the older row
  }

  test("random data agrees with a brute-force theta-join oracle") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7L)
    // few keys + coarse timestamps force plenty of boundary/equal-ts cases
    val left = Seq.tabulate(300)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong)).toDF("id", "k", "t")
    val right = Seq.tabulate(120)(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(40).toLong, i.toDouble))
      .toDF("k", "t", "v")
      // dedup (k, t): "the latest right row" must be unique for the
      // comparison to be well-defined
      .groupBy("k", "t").agg(max("v").as("v"))

    val ours = AsOf.asofJoin(left, right, "k", "t")
      .select("id", "r_t", "r_v")

    val w = Window.partitionBy("id").orderBy(col("rt").desc)
    val r2 = right.select(col("k").as("rk"), col("t").as("rt"), col("v"))
    val brute = left.join(r2, col("k") === col("rk") && col("t") >= col("rt"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      // unmatched left rows survive the left join as one all-null-right row
      .select(col("id"), col("rt").as("r_t"), col("v").as("r_v"))

    assert(ours.count() == 300 && brute.count() == 300)
    assert(ours.exceptAll(brute).isEmpty && brute.exceptAll(ours).isEmpty)
  }
}
