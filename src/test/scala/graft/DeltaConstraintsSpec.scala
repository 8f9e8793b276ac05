package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** Delta CHECK constraints (PROTOCOL.md "CHECK Constraints", writer
  * feature `checkConstraints`) and `delta.appendOnly` (feature
  * `appendOnly`): constraint storage in the table configuration,
  * validation of existing rows on ADD, per-commit enforcement on every
  * row-adding path (SQL CHECK semantics — NULL satisfies), the
  * append-only gate on data-removing commits, and the protocol feature
  * merges. */
class DeltaConstraintsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-ck").toString

  private def seed(dir: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    DeltaLogWriter.write(
      Seq((1L, 10.0, "a"), (2L, 20.0, null.asInstanceOf[String]))
        .toDF("id", "amount", "note"),
      dir)
  }

  test("ADD CONSTRAINT validates existing rows and stores the expression") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    seed(dir)
    // existing row violates -> refused, nothing committed
    val before = DeltaLogReader.latestVersion(spark, dir)
    val e = intercept[IllegalArgumentException] {
      DeltaLogWriter.addCheckConstraint(spark, dir, "big", "amount > 15")
    }
    assert(e.getMessage.contains("existing row"))
    assert(DeltaLogReader.latestVersion(spark, dir) == before)
    // valid constraint commits: configuration + writer feature
    DeltaLogWriter.addCheckConstraint(spark, dir, "positive", "amount > 0")
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.configuration("delta.constraints.positive") == "amount > 0")
    assert(snap.protocol.minWriterVersion >= 3 ||
      snap.protocol.writerFeatures.contains("checkConstraints"))
  }

  test("writes enforce constraints; NULL satisfies; DROP lifts the gate") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    seed(dir)
    DeltaLogWriter.addCheckConstraint(spark, dir, "positive", "amount > 0")
    // violating append raises and commits nothing
    val v = DeltaLogReader.latestVersion(spark, dir)
    val e = intercept[IllegalArgumentException] {
      DeltaLogWriter.write(Seq((3L, -1.0, "x")).toDF("id", "amount", "note"),
        dir)
    }
    assert(e.getMessage.contains("positive"))
    assert(DeltaLogReader.latestVersion(spark, dir) == v)
    // NULL result satisfies (SQL CHECK semantics)
    DeltaLogWriter.write(
      Seq((3L, null.asInstanceOf[java.lang.Double], "x"))
        .toDF("id", "amount", "note")
        .select(col("id"), col("amount").cast("double"), col("note")),
      dir)
    // MERGE enforces too
    intercept[IllegalArgumentException] {
      DeltaLogWriter.merge(spark, dir,
        Seq((1L, -5.0, "y")).toDF("id", "amount", "note"), Seq("id"))
    }
    DeltaLogWriter.dropCheckConstraint(spark, dir, "positive")
    DeltaLogWriter.write(Seq((4L, -2.0, "z")).toDF("id", "amount", "note"),
      dir)
    assert(DeltaLogReader.read(spark, dir).count() == 4)
  }

  test("in-commit timestamps: monotonic, preferred by time travel") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    seed(dir)
    DeltaLogWriter.enableInCommitTimestamps(spark, dir)
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.configuration("delta.enableInCommitTimestamps") == "true")
    assert(snap.configuration.contains(
      "delta.inCommitTimestampEnablementVersion"))
    assert(snap.protocol.writerFeatures.contains("inCommitTimestamp"))
    // rapid commits: ICTs must STRICTLY increase even inside one ms
    DeltaLogWriter.write(Seq((3L, 30.0, "c")).toDF("id", "amount", "note"), dir)
    DeltaLogWriter.write(Seq((4L, 40.0, "d")).toDF("id", "amount", "note"), dir)
    DeltaLogWriter.write(Seq((5L, 50.0, "e")).toDF("id", "amount", "note"), dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val icts = (1L to 4L).map { v =>
      DeltaLogReader.commitInfoTimestamp(fs,
        f"$dir/_delta_log/$v%020d.json")._1.get
    }
    assert(icts == icts.sorted && icts.distinct.size == icts.size,
      s"ICTs must strictly increase: $icts")
    // time travel by the ICT of version 2 resolves exactly version 2
    val v2 = DeltaLogReader.versionAtTimestamp(spark, dir, icts(1))
    assert(v2 == 2L, s"expected version 2 at ICT ${icts(1)}, got $v2")
    assert(DeltaLogReader.read(spark, dir, asOfVersion = Some(v2))
      .count() == 3)
    // a protocol-upgrade commit (checkpointV2) must ALSO carry an ICT —
    // a plain-timestamp commit in the chain would let the sequence
    // regress and reorder time travel
    DeltaLogWriter.checkpointV2(spark, dir)
    DeltaLogWriter.write(Seq((6L, 60.0, "f")).toDF("id", "amount", "note"),
      dir)
    val latest = DeltaLogReader.latestVersion(spark, dir)
    val all = (1L to latest).map { v =>
      DeltaLogReader.commitInfoTimestamp(fs,
        f"$dir/_delta_log/$v%020d.json")._1.get
    }
    assert(all == all.sorted && all.distinct.size == all.size,
      s"every commit incl. protocol upgrades must chain ICTs: $all")
  }

  test("append-only: removes raise, appends and OPTIMIZE stay allowed") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    seed(dir)
    DeltaLogWriter.setAppendOnly(spark, dir)
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.configuration("delta.appendOnly") == "true")
    assert(snap.protocol.minWriterVersion >= 2)
    intercept[UnsupportedOperationException] {
      DeltaLogWriter.deleteWhere(spark, dir, col("id") === 1L)
    }
    intercept[UnsupportedOperationException] {
      DeltaLogWriter.merge(spark, dir,
        Seq((1L, 11.0, "u")).toDF("id", "amount", "note"), Seq("id"))
    }
    intercept[UnsupportedOperationException] {
      DeltaLogWriter.write(Seq((9L, 9.0, "w")).toDF("id", "amount", "note"),
        dir, mode = "overwrite")
    }
    // appends and dataChange=false maintenance remain legal, per spec
    DeltaLogWriter.write(Seq((3L, 30.0, "c")).toDF("id", "amount", "note"),
      dir)
    DeltaLogWriter.optimize(spark, dir)
    assert(DeltaLogReader.read(spark, dir).count() == 3)
    // and the gate can be lifted
    DeltaLogWriter.setAppendOnly(spark, dir, enabled = false)
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 1L)
    assert(DeltaLogReader.read(spark, dir).count() == 2)
  }
}
