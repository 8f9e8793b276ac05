package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import graft.types.AthenaTypes

/** Glue-style additive schema evolution on write — the reference's
  * `_determine_differences` → ALTER generation
  * (`athena/_write_iceberg.py:112-234`): when an append carries columns
  * the catalog table lacks, the table schema evolves additively (new
  * columns appended, nullable — old files read them as NULL via parquet
  * schema-evolution semantics); type CHANGES are gated — an incoming
  * column may narrow into the declared type (lossless widening on the
  * table side), anything else raises instead of silently corrupting.
  *
  * Scale: evolution is pure catalog DDL + a column-aligned append — no
  * data rewrite, no scan of existing files. That is what makes additive
  * evolution the only kind that is free at 100 TB.
  */
object SchemaEvolution {

  final class SchemaEvolutionException(msg: String)
    extends IllegalArgumentException(msg)

  /** The three difference classes of `_determine_differences`:
    * `toAdd` — in the frame, not in the table (the evolvable case);
    * `missing` — in the table, not in the frame (filled with NULL);
    * `typeChanges` — same name, different type: (name, table, frame). */
  final case class Differences(
      toAdd: Seq[StructField],
      missing: Seq[StructField],
      typeChanges: Seq[(String, DataType, DataType)]) {
    def isEmpty: Boolean =
      toAdd.isEmpty && missing.isEmpty && typeChanges.isEmpty
  }

  def determineDifferences(existing: StructType,
      incoming: StructType): Differences = {
    val exByName = existing.fields.map(f => f.name -> f).toMap
    val inByName = incoming.fields.map(f => f.name -> f).toMap
    Differences(
      toAdd = incoming.fields.filterNot(f => exByName.contains(f.name)).toSeq,
      missing = existing.fields.filterNot(f => inByName.contains(f.name)).toSeq,
      typeChanges = incoming.fields.toSeq.flatMap(f =>
        exByName.get(f.name).collect {
          case e if e.dataType != f.dataType => (f.name, e.dataType, f.dataType)
        }))
  }

  /** Lossless widening `from` → `to` (an int frame column may land in a
    * bigint table column; the reverse raises). */
  def isWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale)
    case _ => false
  }

  /** Append `df` to a catalog table, evolving the table schema additively
    * when `schemaEvolution` is on:
    *
    *  - new frame columns → `ALTER TABLE … ADD COLUMNS` (nullable);
    *  - frame columns missing from the table → NULL;
    *  - type changes → allowed only when the frame type widens losslessly
    *    into the declared type (cast on write); otherwise
    *    [[SchemaEvolutionException]] — and with `schemaEvolution = false`
    *    ANY difference raises (the reference's strict mode).
    *
    * Returns the differences that were applied. */
  def appendToTable(df: DataFrame, table: String,
      schemaEvolution: Boolean = true): Differences = {
    val spark = df.sparkSession
    val existing = spark.table(table).schema
    val d = determineDifferences(existing, df.schema)
    if (!schemaEvolution && (d.toAdd.nonEmpty || d.typeChanges.nonEmpty))
      throw new SchemaEvolutionException(
        s"schema_evolution=False but frame differs from $table: " +
          s"new=${d.toAdd.map(_.name).mkString(",")} " +
          s"changed=${d.typeChanges.map(_._1).mkString(",")}")
    val bad = d.typeChanges.filterNot { case (_, tableT, frameT) =>
      isWidening(frameT, tableT)
    }
    if (bad.nonEmpty)
      throw new SchemaEvolutionException(
        "incompatible type changes (frame type must widen losslessly " +
          "into the declared column type): " + bad.map {
            case (n, t, f) =>
              s"$n: ${t.simpleString} <- ${f.simpleString}"
          }.mkString(", "))
    if (schemaEvolution)
      d.toAdd.foreach(f =>
        Catalog.addColumn(spark, table, f.name, AthenaTypes.toAthena(f.dataType)))
    val evolved = spark.table(table).schema
    val aligned = df.select(evolved.fields.toSeq.map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    aligned.write.insertInto(table)
    spark.catalog.refreshTable(table)
    d
  }

  /** Render the ALTER statements evolution would run, without executing —
    * the `_alter_iceberg_table` statement-generation surface. */
  def generateAlterStatements(table: String, existing: StructType,
      incoming: StructType): Seq[String] = {
    val d = determineDifferences(existing, incoming)
    if (d.toAdd.isEmpty) Nil
    else Seq(d.toAdd
      .map(f => s"`${f.name}` ${AthenaTypes.toAthena(f.dataType)}")
      .mkString(s"ALTER TABLE $table ADD COLUMNS (", ", ", ")"))
  }
}
