package graft.catalog

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition projection — the Glue feature with no Spark equivalent
  * (`catalog/_create.py:71-110`; SURVEY §2.6 / §7.4): partition values
  * are COMPUTED from configuration instead of listed from storage, so a
  * query over a billion-partition table never pays a listing call.
  *
  * Spark-native realization: the projection config enumerates the
  * partition directories directly (after pruning against the requested
  * value range), and the read goes to exactly those paths with `basePath`
  * discovery re-attaching the partition columns. On object stores this
  * replaces O(partitions) LIST calls with zero.
  */
object PartitionProjection {

  sealed trait Projection { def values: Seq[String] }

  /** `integer` projection: range + digits padding. */
  final case class IntegerProjection(min: Long, max: Long, digits: Int = 0,
      interval: Long = 1) extends Projection {
    def values: Seq[String] =
      (min to max by interval).map { v =>
        if (digits > 0) s"%0${digits}d".format(v) else v.toString
      }
  }

  /** `enum` projection: explicit value list. */
  final case class EnumProjection(enumValues: Seq[String]) extends Projection {
    def values: Seq[String] = enumValues
  }

  /** `date` projection: [start, end] with a day interval and format. */
  final case class DateProjection(start: String, end: String,
      format: String = "yyyy-MM-dd", intervalDays: Int = 1) extends Projection {
    def values: Seq[String] = {
      val fmt = DateTimeFormatter.ofPattern(format)
      val s = LocalDate.parse(start, fmt)
      val e = LocalDate.parse(end, fmt)
      Iterator.iterate(s)(_.plusDays(intervalDays.toLong))
        .takeWhile(!_.isAfter(e)).map(_.format(fmt)).toSeq
    }
  }

  /** Enumerate projected partition paths (cross product over projection
    * columns, optionally pruned per column), and read them — no listing
    * of the table prefix happens.
    */
  def readProjected(
      spark: SparkSession,
      basePath: String,
      projections: Seq[(String, Projection)],
      prune: Map[String, String => Boolean] = Map.empty): DataFrame = {
    val perCol = projections.map { case (name, p) =>
      val keep = prune.getOrElse(name, (_: String) => true)
      name -> p.values.filter(keep)
    }
    require(perCol.forall(_._2.nonEmpty), "a projection pruned to empty")
    val paths = perCol.foldLeft(Seq(basePath)) { case (acc, (name, vs)) =>
      for (prefix <- acc; v <- vs) yield s"$prefix/$name=$v"
    }
    // missing projected partitions are legal (sparse data): keep only
    // directories that exist, in one batched existence pass
    val conf = spark.sparkContext.hadoopConfiguration
    val existing = paths.filter { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).exists(hp)
    }
    require(existing.nonEmpty, s"no projected partitions exist under $basePath")
    spark.read.option("basePath", basePath).parquet(existing: _*)
  }
}
