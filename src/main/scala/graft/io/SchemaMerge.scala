package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructField, StructType}

/** Additive schema evolution for real-format appends (Delta + Iceberg).
  *
  * Reference semantics: dataset writes default `schema_evolution=True`
  * and Iceberg writes diff the incoming frame against the table and ALTER
  * in the new columns (`athena/_write_iceberg.py:112-234`
  * `_determine_differences` + ADD COLUMNS generation). The real-format
  * equivalents: Delta appends commit a `metaData` action carrying the
  * widened schema (old files read the new columns as null), Iceberg
  * appends commit metadata whose schema gains the new trailing fields
  * (stable positional field-ids; old files resolve the new ids to null).
  *
  * What evolution is NOT allowed to do, in either engine:
  *  - retype an existing column (raise — a silent cast corrupts data);
  *  - drop a non-nullable column from the append (old rows can't
  *    invent values, but new rows MUST have them — raise);
  *  - reorder existing columns' ids (merged schema always preserves the
  *    table's field order and appends genuinely-new fields at the end).
  */
object SchemaMerge {

  /** The widened table schema for an append: table fields in table
    * order, then incoming fields the table lacks (forced nullable —
    * every pre-evolution file reads them as null). Raises on retyped
    * columns, on new columns when `evolve=false`, and on appends missing
    * a non-nullable table column.
    */
  def mergeAppend(table: StructType, incoming: StructType,
      evolve: Boolean): StructType = {
    val t = table.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      t.get(f.name).foreach { tf =>
        if (tf.dataType != f.dataType)
          throw new IllegalArgumentException(
            s"append column ${f.name}: ${f.dataType.simpleString} != " +
              s"table's ${tf.dataType.simpleString}")
      }
    }
    val incNames = incoming.fieldNames.toSet
    table.fields.foreach { f =>
      if (!incNames.contains(f.name) && !f.nullable)
        throw new IllegalArgumentException(
          s"append missing non-nullable table column ${f.name}")
    }
    val fresh = incoming.fields.filterNot(f => t.contains(f.name))
    if (fresh.nonEmpty && !evolve)
      throw new IllegalArgumentException(
        s"append column ${fresh.head.name} not in table schema " +
          "(schemaEvolution=false; use overwrite to evolve)")
    StructType(table.fields ++ fresh.map(_.copy(nullable = true)))
  }

  /** Project `df` onto `merged` — every merged column in merged order,
    * absent ones as typed nulls. Positional-field-id writers (Iceberg)
    * need this so the parquet/statistics ids line up with the committed
    * schema regardless of the incoming frame's column order. */
  def alignTo(df: DataFrame, merged: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(merged.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** True when the schema carries Delta column-mapping physical names —
    * evolving such a table needs new `delta.columnMapping.id`/
    * `physicalName` assignments we deliberately don't fabricate. */
  def isColumnMapped(schema: StructType): Boolean =
    schema.fields.exists(
      _.metadata.contains("delta.columnMapping.physicalName"))
}
