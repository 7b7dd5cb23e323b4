package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row → JSON serialization with the reference's coercion semantics (F1-F3).
  *
  * Reference: `json.dumps(row, default=json_serialize)`
  * (`service_layer/service.py:117`, `:177-182`):
  *   - datetime/date → ISO-8601 string (`:178-179`)
  *   - Decimal → float, lossy (`:180-181`)
  *   - null fields are KEPT (json.dumps default)
  *   - key order = column order.
  *
  * Spark parity deltas handled here (SURVEY §7 hard parts):
  *   - `to_json` drops null fields by default → `ignoreNullFields=false`.
  *   - timestamp format pinned to ISO with microseconds, matching Python
  *     `isoformat()`.
  *   - DecimalType cast to double *before* serialization to reproduce the
  *     reference's lossy Decimal→float.
  */
object JsonRows {

  val IsoTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** All columns of `df` serialized per-row to a JSON string column, with
    * reference coercions applied. */
  def toJsonCol(df: DataFrame): Column = {
    val coerced: Seq[Column] = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _ => col(f.name)
      }
    }
    to_json(
      struct(coerced: _*),
      Map(
        "ignoreNullFields" -> "false",
        "timestampFormat" -> IsoTimestampFormat))
  }

  /** Inverse (engine extension, F1⁻¹): parse a JSON column with a schema —
    * the reference never reads JSON back, but a queryable engine must. */
  def fromJsonCol(c: Column, schema: StructType): Column =
    from_json(c, schema)
}
