package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.LatticeArgMin

/** The native lattice argmin: parity between the interpreted eval and the
  * generated loop, the lowest-position tie-break, and null semantics.
  */
class LatticeArgMinSpec extends SparkSpecBase {
  import spark.implicits._

  private def argmin(q: Column, cents: Column, cids: Column): Column =
    ColumnBridge.column(LatticeArgMin(
      ColumnBridge.expression(q),
      ColumnBridge.expression(cents),
      ColumnBridge.expression(cids)))

  private val cents = typedLit(Seq(Seq(0L, 0L), Seq(3L, 4L), Seq(10L, 0L)))
  private val cids  = typedLit(Seq(7L, 8L, 9L))

  test("picks the exact squared-distance minimum and reports it") {
    val df = Seq(Tuple1(Seq(3L, 3L)), Tuple1(Seq(9L, 1L)))
      .toDF("q").select(argmin(col("q"), cents, cids).as("a"))
    val got = df.select(col("a.cid"), col("a.dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // (3,3): d²=18/1/37 → cid 8; (9,1): d²=82/45/2 → cid 9
    assert(got.toSeq == Seq((8L, 1L), (9L, 2L)))
  }

  test("ties go to the lowest position (lowest cid when sorted)") {
    // (5, 2): equidistant from (0,0) and (10,0) at d²=29, beats (3,4)'s 8?
    // no — (3,4) gives 4+4=8, so use a point tied ONLY between pos 0 and 2
    val df = Seq(Tuple1(Seq(5L, 20L))).toDF("q")
      .select(argmin(col("q"), cents, cids).as("a"))
    // d² = 425 / 260 / 425 → unique min at pos 1; now a true tie:
    val tie = Seq(Tuple1(Seq(5L, 0L))).toDF("q")
      .select(argmin(col("q"),
        typedLit(Seq(Seq(0L, 0L), Seq(10L, 0L))),
        typedLit(Seq(3L, 4L))).as("a"))
    assert(df.select(col("a.cid")).head.getLong(0) == 8L)
    assert(tie.select(col("a.cid"), col("a.dist")).head.toSeq ==
      Seq(3L, 25L))
  }

  test("interpreted eval matches the generated loop") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val e = LatticeArgMin(
      Literal.create(Seq(9L, 1L), ArrayType(LongType)),
      Literal.create(Seq(Seq(0L, 0L), Seq(3L, 4L), Seq(10L, 0L)),
        ArrayType(ArrayType(LongType))),
      Literal.create(Seq(7L, 8L, 9L), ArrayType(LongType)))
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(interpreted.getLong(0) == 9L && interpreted.getLong(1) == 2L)
  }

  test("registered in SQL via GraftExtensions: lattice_argmin callable " +
      "from spark.sql") {
    val r = spark.sql(
      """SELECT lattice_argmin(array(9L, 1L),
        |         array(array(0L, 0L), array(3L, 4L), array(10L, 0L)),
        |         array(7L, 8L, 9L)) AS a""".stripMargin)
      .select(col("a.cid"), col("a.dist")).head
    assert(r.getLong(0) == 9L && r.getLong(1) == 2L)
  }

  test("null array, ragged centroid, or empty matrix yields null") {
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("q")
    assert(df.select(argmin(col("q"),
      typedLit(Seq(Seq(1L, 2L, 3L))), typedLit(Seq(1L)))).head.isNullAt(0))
    assert(df.select(argmin(col("q"),
      typedLit(Seq.empty[Seq[Long]]), typedLit(Seq.empty[Long])))
      .head.isNullAt(0))
    assert(df.select(argmin(lit(null).cast("array<bigint>"), cents, cids))
      .head.isNullAt(0))
  }
}
