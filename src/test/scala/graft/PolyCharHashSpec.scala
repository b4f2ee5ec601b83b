package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.PolyCharHash

/** Pins the native PolyCharHash expression against the two formulations it
  * replaced: the rpad + substr/ascii/pmod chain (padded mode) and the
  * plain Scala char fold (whole-string mode), plus null propagation.
  */
class PolyCharHashSpec extends SparkSpecBase {
  import spark.implicits._

  private val P = 1000000007L

  private def expr(c: org.apache.spark.sql.Column, base: Long, mod: Long,
      padTo: Int) =
    ColumnBridge.column(PolyCharHash(ColumnBridge.expression(c), base, mod, padTo))

  test("padded mode equals the rpad + per-position ascii chain") {
    val chain = {
      val padded = rpad(col("s"), 16, " ")
      (1 to 16).foldLeft(lit(0L): org.apache.spark.sql.Column) { (acc, i) =>
        pmod(acc * lit(31L) + ascii(substring(padded, i, 1)).cast("long"), lit(P))
      }
    }
    val df = Seq("the", "a", "", "exactly-16-chars", "longer-than-sixteen-chars")
      .toDF("s")
      .select(expr(col("s"), 31L, P, 16).as("native"), chain.as("chain"))
    assert(df.filter(col("native") =!= col("chain")).count() === 0)
  }

  test("whole-string mode equals the scala char fold and propagates null") {
    def fold(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % P; i += 1 }
      acc
    }
    val inputs = Seq("hello world", "", "x")
    val got = inputs.toDF("s")
      .select(expr(col("s"), 31L, P, -1).as("h")).as[Long].collect()
    assert(got.toSeq === inputs.map(fold))
    val nullRow = Seq(Option.empty[String]).toDF("s")
      .select(expr(col("s"), 31L, P, -1).as("h"))
      .collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("registered in SQL via GraftExtensions: poly_char_hash callable " +
      "from spark.sql, parameters must be literals") {
    val got = spark.sql(s"SELECT poly_char_hash('hello world', 31, $P, -1)")
      .collect().head.getLong(0)
    val direct = Seq("hello world").toDF("s")
      .select(expr(col("s"), 31L, P, -1)).as[Long].collect().head
    assert(got === direct)
    val err = intercept[Exception] {
      spark.sql(s"SELECT poly_char_hash('x', length('abc'), $P, -1)")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
