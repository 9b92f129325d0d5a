package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-contract validation — the "schema" half of a schema + constraint
  * validation engine: an incoming table's ACTUAL schema is diffed against a
  * declared column contract and the differences come out as the same
  * structured violation rows the data rules emit, so one triage consumes
  * both. The reference encodes its contract in the `MTBPatientRecord` case
  * class tree and fails at JSON decode; a lake table's contract must instead
  * be checked against live table metadata before a 100 TB scan is launched
  * on wrong assumptions.
  *
  * Scale shape: pure driver-side metadata — O(columns), zero jobs, zero
  * scans. Nested types (array/struct) compare structurally as a whole via
  * `DataType.simpleString`, so a drifted field INSIDE `spans` surfaces as a
  * type mismatch on the `spans` column with both full type strings as
  * evidence.
  */
object SchemaCheck {

  /** One column of the declared contract. */
  final case class ColContract(name: String, dataType: DataType)

  private final case class SchemaViolation(
      col_name: String, rule_id: String, severity: String,
      expected_type: String, actual_type: String)

  /** Diff `actual` against `contract`:
    *   - R_COL_MISSING (error): contract column absent from the table;
    *   - R_COL_TYPE (error): column present with a different type;
    *   - R_COL_UNEXPECTED (warning): table column the contract doesn't know
    *     (schema-evolution signal, not necessarily fatal).
    * Absent sides are the '-' sentinel so every row is self-contained and
    * non-null. */
  def violations(spark: SparkSession, actual: StructType,
                 contract: Seq[ColContract]): DataFrame = {
    import spark.implicits._
    val actualTypes = actual.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val contractTypes = contract.map(c => c.name -> c.dataType.simpleString).toMap

    val missing = contract.collect {
      case c if !actualTypes.contains(c.name) =>
        SchemaViolation(c.name, "R_COL_MISSING", "error",
          c.dataType.simpleString, "-")
    }
    val mismatched = contract.collect {
      case c if actualTypes.get(c.name).exists(_ != c.dataType.simpleString) =>
        SchemaViolation(c.name, "R_COL_TYPE", "error",
          c.dataType.simpleString, actualTypes(c.name))
    }
    val unexpected = actual.fields.collect {
      case f if !contractTypes.contains(f.name) =>
        SchemaViolation(f.name, "R_COL_UNEXPECTED", "warning",
          "-", f.dataType.simpleString)
    }
    (missing ++ mismatched ++ unexpected).toSeq.toDF()
  }
}
