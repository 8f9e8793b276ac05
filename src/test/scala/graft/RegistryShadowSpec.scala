package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{SqlEngine, TrinoCompat}

/** The order-swap gate for the FunctionRegistry shadowing class
  * (round-12 verdict #1): Spark 4 DSL `functions.*` and `spark.sql`
  * resolve function names through the SESSION registry, so a dialect
  * shim registered under a Spark-builtin name would silently flip
  * native semantics for the rest of the session once any
  * `readSqlQuery` ran (caught twice in round 12: `regexp_extract` in
  * LogsInsights and 1-arg `bit_count` in simhash). Round 13 closes
  * the class STRUCTURALLY — every shim name that collides with a
  * Spark builtin registers only as `graft_trino_<name>` and the
  * rewrite renames dialect text to match — and this spec is the gate
  * that keeps it closed:
  *
  *  1. run dialect queries FIRST on the shared session;
  *  2. assert no builtin registry entry was replaced (identity check
  *     over every builtin name);
  *  3. replay native sentinels for every previously-caught or
  *     likely-caught semantic flip and assert Spark semantics;
  *  4. replay the two historically shadow-sensitive oracled entries
  *     (`logs_error_volume`, `dedup_simhash`) on the same session and
  *     assert their results match a pre-dialect snapshot.
  */
class RegistryShadowSpec extends AnyFunSuite {
  import TestSpark._

  // Snapshot the shadow-sensitive entries BEFORE any dialect query
  // runs in this suite. Suite order within a JVM is not guaranteed, so
  // `ensureRegistered` may already have run — that is fine: the
  // structural fix means registration never touches bare builtin
  // names, which is exactly what this spec proves.
  private lazy val before: Map[String, Seq[String]] = {
    Seq("logs_error_volume", "dedup_simhash").map { name =>
      name -> SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    }.toMap
  }

  private def runDialect(): Unit = {
    // exercise renamed shadowed names end-to-end: digests, regex
    // defaults, kurtosis, typeof, bit_count, contains
    val r = SqlEngine.readSqlQuery(spark,
      """SELECT to_hex(md5(to_utf8('abc'))) AS h,
        |  regexp_extract('a1b2', '[a-z](\d)') AS g0,
        |  regexp_extract('zzz', '\d') AS miss,
        |  bit_count(7, 32) AS bc,
        |  contains(ARRAY[1, 2, 3], 2) AS c,
        |  typeof(1) AS t,
        |  kurtosis(x) AS k
        |FROM (VALUES 1.0e0, 2.0e0, 3.0e0, 4.0e0) AS t(x)""".stripMargin)
      .head()
    assert(r.getAs[String]("h") == "900150983CD24FB0D6963F7D28E17F72")
    assert(r.getAs[String]("g0") == "a1") // Trino defaults to group 0
    assert(r.getAs[String]("miss") == null) // Trino: NULL on no match
    assert(r.getAs[Long]("bc") == 3L)
    assert(r.getAs[Boolean]("c"))
    assert(r.getAs[String]("t") == "integer")
    assert(math.abs(r.getAs[Double]("k") - (-1.2)) < 1e-9)
  }

  test("shadowed-builtin list is detected and non-trivial") {
    val s = TrinoCompat.shadowedBuiltins.toSet
    // the canaries: every semantic flip round 12 caught or documented
    for (n <- Seq("md5", "sha1", "regexp_extract", "regexp_extract_all",
        "regexp_count", "regexp_replace", "bit_count", "contains",
        "typeof", "kurtosis", "date_format", "from_unixtime"))
      assert(s.contains(n), s"expected $n to be shadow-namespaced")
    // and nothing namespaced that Spark does not actually define
    for (n <- s)
      assert(FunctionRegistry.builtin.functionExists(FunctionIdentifier(n)),
        s"$n namespaced but not a Spark builtin")
  }

  test("dialect queries leave every builtin registry entry untouched") {
    before // force the pre-dialect snapshot
    runDialect()
    val sess = spark.sessionState.functionRegistry
    val replaced = FunctionRegistry.builtin.listFunction.filter { f =>
      // the session registry is a clone of builtin: an untouched entry
      // is the SAME ExpressionInfo instance; createOrReplaceTempFunction
      // would have swapped it
      (sess.lookupFunction(f), FunctionRegistry.builtin.lookupFunction(f)) match {
        case (Some(a), Some(b)) => !(a eq b)
        case (a, b) => a.isDefined != b.isDefined
      }
    }
    assert(replaced.isEmpty,
      s"dialect registration replaced builtins: ${replaced.mkString(", ")}")
  }

  test("native semantics survive a prior dialect query (order swap)") {
    runDialect()
    // Spark semantics, asserted AFTER the dialect query on the SAME
    // session — each of these flips under the old bare-name shadowing
    val r = spark.sql(
      """SELECT md5('abc') AS h,
        |  regexp_extract('a1b2', '[a-z](\\d)') AS g1,
        |  regexp_extract('zzz', '\\d', 0) AS miss,
        |  bit_count(7) AS bc,
        |  contains('hello', 'ell') AS c,
        |  typeof(1) AS t,
        |  kurtosis(x) AS k,
        |  from_unixtime(0) AS fu,
        |  date_format(timestamp'2024-03-05 00:00:00', 'yyyy-MM') AS df
        |FROM VALUES (1.0d), (2.0d), (3.0d), (4.0d) AS t(x)""".stripMargin)
      .head()
    assert(r.getAs[String]("h") == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getAs[String]("g1") == "1") // Spark defaults to group 1
    assert(r.getAs[String]("miss") == "") // Spark: '' on no match
    assert(r.getAs[Int]("bc") == 3)
    assert(r.getAs[Boolean]("c"))
    assert(r.getAs[String]("t") == "int")
    assert(math.abs(r.getAs[Double]("k") - (-1.36)) < 1e-9)
    assert(r.getAs[String]("fu") == "1970-01-01 00:00:00")
    assert(r.getAs[String]("df") == "2024-03")
  }

  test("shadow-sensitive oracled entries unchanged after dialect use") {
    val snap = before
    runDialect()
    for ((name, expected) <- snap) {
      val after = SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(after == expected, s"$name changed after a dialect query ran")
    }
  }
}
