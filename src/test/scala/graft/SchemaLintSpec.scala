package graft

import org.apache.spark.sql.types._

/** Result-schema type lint over the ENTIRE query registry — the round-10
  * lesson institutionalized: `q_trend` and `q_corr_matrix` were the only
  * two queries exposing DECIMAL(38,0) result columns, their VALUES were
  * oracle-exact, and they still hash-red because wide decimals are
  * canonicalized differently by different hashers ("42" vs "42.000…",
  * plain vs scientific). The engine's rule is therefore structural:
  * DecimalType is an ACCUMULATOR type (exact ~10³⁸ integer moments,
  * the silent-BIGINT-wrap guard), never a RESULT type — rationals leave
  * as digit strings or GCD-reduced bigints. Same for MapType, whose
  * key order is hasher-dependent. This spec builds every registered
  * query's analyzed schema (no execution) and rejects any column whose
  * type — at any nesting depth — is outside the hash-stable set
  * observed across the 190 r10-green queries.
  */
class SchemaLintSpec extends SparkSpecBase {

  /** The driver-hash-safe scalar set: types with exactly one textual
    * canonical form. FloatType/DoubleType are included because every
    * green query that exposes them derives the value deterministically
    * (FpAggregateLintSpec covers the accumulation-order hazard, a
    * different failure mode than representation).
    */
  private def scalarSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType                        => true
    case StringType | BooleanType | BinaryType         => true
    case DateType | TimestampType | TimestampNTZType   => true
    case _                                             => false
  }

  private def violations(dt: DataType, path: String): Seq[String] =
    dt match {
      case _ if scalarSafe(dt)  => Nil
      case ArrayType(el, _)     => violations(el, s"$path[]")
      case StructType(fields)   =>
        fields.toSeq.flatMap(f => violations(f.dataType, s"$path.${f.name}"))
      case d: DecimalType       =>
        Seq(s"$path: $d — DecimalType is accumulation-only; cast the " +
          "result to string (digit strings hash identically everywhere)")
      case m: MapType           =>
        Seq(s"$path: $m — map key order is hasher-dependent; explode or " +
          "sort into an array of structs")
      case other                => Seq(s"$path: $other — not in the " +
        "hash-stable result-type set")
    }

  test("ENGINE-WIDE: no registered query exposes DecimalType, MapType, " +
      "or any other hash-unstable type in its result schema") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // .schema triggers analysis only — no job runs
        fn(spark, sfDir).schema.fields.toSeq.flatMap(f =>
          violations(f.dataType, s"$name/${f.name}"))
    }
    assert(bad.isEmpty, "hash-unstable result columns:\n" +
      bad.mkString("\n"))
  }

  test("the lint itself rejects a DECIMAL(38,0) column (self-check: a " +
      "revert of the r10 fix would fail the engine-wide test)") {
    val df = spark.range(3).selectExpr(
      "id", "CAST(id * id AS DECIMAL(38,0)) AS moment")
    val v = df.schema.fields.toSeq.flatMap(f =>
      violations(f.dataType, s"probe/${f.name}"))
    assert(v.size == 1 && v.head.contains("DecimalType"), v.toString)
    // and the shipped fix shape — same math, string result — passes
    val ok = df.selectExpr("id", "CAST(moment AS STRING) AS moment")
      .schema.fields.toSeq
      .flatMap(f => violations(f.dataType, s"probe/${f.name}"))
    assert(ok.isEmpty, ok.toString)
  }
}
