package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality rule engine — the Glue Data Quality / DQDL surface of the
  * reference (`data_quality/_create.py:40-371`): declarative rules
  * compiled to aggregate expressions, evaluated in ONE pass over the
  * table (a single Aggregate node computes every rule's metric — no
  * per-rule scans), verdicts returned as a DataFrame.
  */
object DataQuality {

  /** A compiled rule: name, metric expression (aggregate), pass predicate
    * over the metric value. */
  final case class Rule(name: String, metric: Column, passed: Column => Column)

  /** DQDL-ish rule constructors (RowCount, Completeness, Uniqueness,
    * ColumnValues between — `data_quality/_create.py:27-37` renders these
    * as `Rules = [ ... ]` docs; here they compile straight to Catalyst). */
  object Rules {
    def rowCount(min: Long): Rule =
      Rule("row_count", count(lit(1)).cast("double"), _ >= min.toDouble)
    def completeness(c: String, minRatio: Double): Rule =
      Rule(s"completeness_$c",
        count(col(c)).cast("double") / count(lit(1)).cast("double"),
        _ >= minRatio)
    def uniqueness(c: String, minRatio: Double): Rule =
      Rule(s"uniqueness_$c",
        countDistinct(col(c)).cast("double") / count(lit(1)).cast("double"),
        _ >= minRatio)
    def minValue(c: String, bound: Double): Rule =
      Rule(s"min_$c", min(col(c)).cast("double"), _ >= bound)
    def maxValue(c: String, bound: Double): Rule =
      Rule(s"max_$c", max(col(c)).cast("double"), _ <= bound)
  }

  /** Evaluate a ruleset in one aggregate pass; explode to one row per
    * rule with (rule, metric, passed). */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val metricCols = rules.map(r => r.metric.as(r.name))
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val asRows = rules.map { r =>
      struct(lit(r.name).as("rule"), col(r.name).as("metric"),
        r.passed(col(r.name)).as("passed"))
    }
    one.select(explode(array(asRows: _*)).as("r"))
      .select(col("r.rule"), col("r.metric"), col("r.passed"))
  }

  /** Profiling-driven rule suggestion —
    * `data_quality.create_recommendation_ruleset`
    * (`data_quality/_create.py:193-282`): one statistics pass over the
    * table proposes a ruleset (row count floor, completeness of
    * near-complete columns, uniqueness of key-like columns, observed
    * numeric bounds).
    */
  def recommendRuleset(df: DataFrame): Seq[Rule] = {
    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        => f.name
    }.toSeq
    val statCols =
      Seq(count(lit(1)).cast("double").as("__n")) ++
        df.columns.toSeq.map(c =>
          count(col(c)).cast("double").as(s"__nn_$c")) ++
        df.columns.toSeq.map(c =>
          approx_count_distinct(col(c)).cast("double").as(s"__nd_$c")) ++
        numericCols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getAs[Double]("__n")
    val rowRule = Rules.rowCount(math.max(1L, (n * 0.9).toLong))
    val completeness = df.columns.toSeq
      .filter(c => stats.getAs[Double](s"__nn_$c") / n >= 0.99)
      .map(c => Rules.completeness(c, 0.99))
    val uniqueness = df.columns.toSeq
      .filter(c => stats.getAs[Double](s"__nd_$c") / n >= 0.95)
      .map(c => Rules.uniqueness(c, 0.9))
    val bounds = numericCols.flatMap(c => Seq(
      Rules.minValue(c, stats.getAs[Double](s"__min_$c")),
      Rules.maxValue(c, stats.getAs[Double](s"__max_$c"))))
    Seq(rowRule) ++ completeness ++ uniqueness ++ bounds
  }

  /** Parse a DQDL-ish ruleset document (`data_quality/_create.py:27-37`
    * renders `Rules = [ RowCount > 100, Completeness "c" > 0.9, … ]`)
    * into compiled rules. Supported: RowCount, Completeness, Uniqueness,
    * ColumnValues min/max comparisons.
    */
  def parseRuleset(dqdl: String): Seq[Rule] = {
    val body = dqdl.replaceAll("(?s).*Rules\\s*=\\s*\\[", "")
      .replaceAll("\\].*$", "").trim
    if (body.isEmpty) return Nil
    body.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { r =>
      val RowCountP = """RowCount\s*(>=|>)\s*([0-9.]+)""".r
      val ColRuleP = """(Completeness|Uniqueness)\s*"([^"]+)"\s*(>=|>)\s*([0-9.]+)""".r
      val ValuesP = """ColumnValues\s*"([^"]+)"\s*(<=|>=)\s*([0-9.-]+)""".r
      r match {
        case RowCountP(_, v) => Rules.rowCount(v.toDouble.toLong)
        case ColRuleP("Completeness", c, _, v) => Rules.completeness(c, v.toDouble)
        case ColRuleP("Uniqueness", c, _, v) => Rules.uniqueness(c, v.toDouble)
        case ValuesP(c, ">=", v) => Rules.minValue(c, v.toDouble)
        case ValuesP(c, "<=", v) => Rules.maxValue(c, v.toDouble)
        case other =>
          throw new IllegalArgumentException(s"unsupported DQDL rule: $other")
      }
    }
  }

  /** Ruleset registry — `create_ruleset` / `update_ruleset` /
    * `get_ruleset` / `list_rulesets` (`data_quality/_create.py`,
    * `_get.py`, `_list.py`): named DQDL documents in a small keyed
    * dataset. Documents are validated by parsing at write time, so a
    * registered ruleset is always evaluable. */
  final class RulesetRegistry(spark: SparkSession, path: String) {
    import org.apache.spark.sql.Row
    private val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("dqdl",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("updated_ms",
        org.apache.spark.sql.types.LongType)))

    def createRuleset(name: String, dqdl: String): Unit = put(name, dqdl,
      failIfExists = true)

    def updateRuleset(name: String, dqdl: String): Unit = put(name, dqdl,
      failIfExists = false)

    private def put(name: String, dqdl: String, failIfExists: Boolean): Unit = {
      parseRuleset(dqdl) // validate before storing
      val exists = graft.io.DatasetReader.datasetExists(spark, path) &&
        getRuleset(name).isDefined
      if (exists && failIfExists)
        throw new IllegalArgumentException(s"ruleset exists: $name")
      val row = spark.createDataFrame(
        java.util.List.of(Row(name, dqdl, System.currentTimeMillis())), schema)
      if (!graft.io.DatasetReader.datasetExists(spark, path))
        graft.io.DatasetWriter.toParquet(row, path,
          mode = graft.io.DatasetWriter.Overwrite)
      else graft.table.MergeOps.upsert(spark, path, row, keys = Seq("name"))
    }

    def getRuleset(name: String): Option[String] =
      if (!graft.io.DatasetReader.datasetExists(spark, path)) None
      else spark.read.parquet(path).filter(col("name") === name)
        .select("dqdl").collect().headOption.map(_.getString(0))

    def listRulesets(): Seq[String] =
      if (!graft.io.DatasetReader.datasetExists(spark, path)) Nil
      else spark.read.parquet(path).select("name")
        .collect().map(_.getString(0)).toSeq.sorted

    /** Evaluate a registered ruleset against a DataFrame. */
    def evaluateRuleset(name: String, df: DataFrame): DataFrame =
      evaluate(df, parseRuleset(getRuleset(name).getOrElse(
        throw new IllegalArgumentException(s"no such ruleset: $name"))))
  }

  /** The declared ruleset evaluated over lineitem for the oracle gate. */
  def lineitemRuleset(s: SparkSession, dir: String): DataFrame =
    evaluate(Tables.lineitem(s, dir), Seq(
      Rules.rowCount(1000L),
      Rules.completeness("l_shipdate", 1.0),
      Rules.uniqueness("l_orderkey", 0.05),
      Rules.minValue("l_quantity", 1.0),
      Rules.maxValue("l_discount", 0.5)))

  def lineitemRulesetOracle: String =
    """WITH m AS (
      |  SELECT cast(count(*) as double) AS row_count,
      |    cast(count(l_shipdate) as double) / cast(count(*) as double) AS completeness_l_shipdate,
      |    cast(count(DISTINCT l_orderkey) as double) / cast(count(*) as double) AS uniqueness_l_orderkey,
      |    cast(min(l_quantity) as double) AS min_l_quantity,
      |    cast(max(l_discount) as double) AS max_l_discount
      |  FROM lineitem)
      |SELECT 'row_count' AS rule, row_count AS metric, row_count >= 1000.0 AS passed FROM m
      |UNION ALL SELECT 'completeness_l_shipdate', completeness_l_shipdate, completeness_l_shipdate >= 1.0 FROM m
      |UNION ALL SELECT 'uniqueness_l_orderkey', uniqueness_l_orderkey, uniqueness_l_orderkey >= 0.05 FROM m
      |UNION ALL SELECT 'min_l_quantity', min_l_quantity, min_l_quantity >= 1.0 FROM m
      |UNION ALL SELECT 'max_l_discount', max_l_discount, max_l_discount <= 0.5 FROM m""".stripMargin
}
