package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.DeltaLogReader
import graft.ops.Dedup
import graft.streaming.EventStream

/** [[EventStream.ingestDedupIncremental]] — the daily dedup loop at
  * micro-batch cadence: per batch, within-batch exact dedup → probe
  * against base index ∪ stream layer → admit novel → replay-idempotent
  * per-batch index write → SetTransaction Delta append.
  *
  * Three gates: (1) verdict semantics across batches (a doc admitted in
  * batch N blocks its duplicate in batch N+1 — the stream layer is
  * live); (2) the final base∪stream index is ROW-IDENTICAL to a fresh
  * rebuild over corpus ∪ admitted; (3) the two crash windows
  * re-converge — commit-marker loss (table committed, checkpoint not)
  * and the operator-specific one: index layer written, table commit
  * never happened (the probe's batch_id exclusion makes the replay
  * deterministic). */
class StreamDedupIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val corpusText1 = "alpha beta gamma delta epsilon zeta eta theta"
  private val corpusText2 = "one two three four five six seven eight"
  private val novel1 = "brand new vocabulary first batch document xx yy"
  private val novel2 = "second wave tokens entirely fresh content aa bb"

  private def ingest(srcDir: String, table: String, ckpt: String,
      idx: String, sidx: String,
      schema: org.apache.spark.sql.types.StructType,
      foldEvery: Int = 0): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    EventStream.ingestDedupIncremental(stream, table, ckpt,
      appId = "sdi-spec", indexPath = idx, streamIndexPath = sidx,
      foldEvery = foldEvery)
      .awaitTermination()
  }

  private def tableIds(table: String): Set[Long] =
    DeltaLogReader.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("cross-batch dedup via the live stream layer; index " +
    "row-identical to a fresh rebuild; crash windows re-converge") {
    import spark.implicits._
    val root = graft.session.Scratch.dir("sdi")
    val (srcDir, table, ckpt, idx, sidx) =
      (s"$root/src", s"$root/t", s"$root/ck", s"$root/idx", s"$root/sidx")

    val corpus = Seq((1L, corpusText1), (2L, corpusText2))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus, idx)

    // batch 0: an exact corpus dup (100), a novel doc (101), and a
    // WITHIN-batch dup of it (102 — dedupBatch keeps min id 101)
    val fileA = Seq((100L, corpusText1), (101L, novel1), (102L, novel1))
      .toDF("doc_id", "text")
    fileA.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    ingest(srcDir, table, ckpt, idx, sidx, schema)
    assert(tableIds(table) == Set(101L))

    // batch 1: a CROSS-batch dup of the batch-0 admit (200 — must be
    // blocked by the stream layer, not the base index), a new novel
    // (201), and a token-PERMUTED corpus doc (202: same distinct-token
    // set -> identical signature -> agreement 1.0 -> near, dropped)
    val near = corpusText2.split(" ").reverse.mkString(" ")
    Seq((200L, novel1), (201L, novel2), (202L, near))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    ingest(srcDir, table, ckpt, idx, sidx, schema)
    assert(tableIds(table) == Set(101L, 201L))

    // ---- index row-identity to a fresh rebuild ------------------------
    val rebuilt = s"$root/rebuilt"
    Dedup.buildDedupIndex(
      corpus.unionByName(Seq((101L, novel1), (201L, novel2))
        .toDF("doc_id", "text")), rebuilt)
    // frame-level helpers: the base index reads go through the TxnLog
    // snapshot reader; the stream layers stay raw per-batch parquet
    def hashRows(dfs: org.apache.spark.sql.DataFrame*) = dfs
      .flatMap(_.select("h", "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1)))).sorted
    def bandRows(dfs: org.apache.spark.sql.DataFrame*) = dfs
      .flatMap(_.select(col("band"), col("bkey"),
          concat_ws("|", col("sig")), col("doc_id"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3)))).sorted
    def idxH = Dedup.readDedupIndex(spark, idx)._1
    def idxB = Dedup.readDedupIndex(spark, idx)._2
    def layer(p: String) = spark.read.parquet(p)
    assert(hashRows(idxH, layer(s"$sidx/hashes"))
      == hashRows(Dedup.readDedupIndex(spark, rebuilt)._1))
    assert(bandRows(idxB, layer(s"$sidx/bands"))
      == bandRows(Dedup.readDedupIndex(spark, rebuilt)._2))

    // ---- crash window 1: commit marker lost (table committed) ---------
    val commits = new java.io.File(s"$ckpt/commits")
    val last = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commits, last.toString).delete())
    new java.io.File(commits, s".$last.crc").delete()
    ingest(srcDir, table, ckpt, idx, sidx, schema)
    assert(tableIds(table) == Set(101L, 201L),
      "replayed batch duplicated table rows")
    assert(hashRows(idxH, layer(s"$sidx/hashes"))
      == hashRows(Dedup.readDedupIndex(spark, rebuilt)._1),
      "replayed batch duplicated index rows")

    // ---- crash window 2: index layer written, table commit lost -------
    // Reproduce the on-disk state: batch 2 would admit a new novel doc;
    // a crashed attempt already wrote its stream-index layer but never
    // reached the Delta commit. The probe's batch_id exclusion must
    // keep the replay's verdicts identical, re-overwrite the layer, and
    // land the doc exactly once.
    val novel3 = "third novel body of text with its own words cc dd"
    val batch2 = Seq((300L, novel3)).toDF("doc_id", "text")
    Dedup.writeStreamIndexBatch(batch2, sidx, batchId = 2L)
    batch2.coalesce(1).write.mode("append").parquet(srcDir)
    ingest(srcDir, table, ckpt, idx, sidx, schema)
    assert(tableIds(table) == Set(101L, 201L, 300L),
      "pre-written index layer must not block its own batch's admit")
    val rebuilt2 = s"$root/rebuilt2"
    Dedup.buildDedupIndex(
      corpus.unionByName(
        Seq((101L, novel1), (201L, novel2), (300L, novel3))
          .toDF("doc_id", "text")), rebuilt2)
    assert(hashRows(idxH, layer(s"$sidx/hashes"))
      == hashRows(Dedup.readDedupIndex(spark, rebuilt2)._1))
    assert(bandRows(idxB, layer(s"$sidx/bands"))
      == bandRows(Dedup.readDedupIndex(spark, rebuilt2)._2))

    // ---- maintenance: fold the stream layers into the base index ------
    Dedup.foldStreamIndex(spark, idx, sidx, uptoBatch = 3L)
    assert(hashRows(idxH)
      == hashRows(Dedup.readDedupIndex(spark, rebuilt2)._1),
      "folded base index must equal the fresh rebuild")
    assert(bandRows(idxB)
      == bandRows(Dedup.readDedupIndex(spark, rebuilt2)._2))
    def layerDirs(sub: String): Set[String] = {
      val d = new java.io.File(s"$sidx/$sub")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).toSet
    }
    assert(layerDirs("hashes").isEmpty && layerDirs("bands").isEmpty,
      "folded layers must be deleted")

    // crash window: a previous fold published the rewrite but died
    // before deleting a layer — re-folding the leftover rows must be
    // absorbed by the group-key dedup, not duplicated
    Dedup.writeStreamIndexBatch(batch2, sidx, batchId = 2L)
    Dedup.foldStreamIndex(spark, idx, sidx, uptoBatch = 3L)
    assert(hashRows(idxH)
      == hashRows(Dedup.readDedupIndex(spark, rebuilt2)._1),
      "re-fold of a leftover layer duplicated index rows")
    assert(bandRows(idxB)
      == bandRows(Dedup.readDedupIndex(spark, rebuilt2)._2))

    // the stream keeps working against the folded base: a dup of a
    // folded admit is blocked, a new novel doc is admitted
    val novel4 = "fourth stream document unique tokens ee ff gg hh"
    Seq((400L, novel3), (401L, novel4)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    ingest(srcDir, table, ckpt, idx, sidx, schema)
    assert(tableIds(table) == Set(101L, 201L, 300L, 401L),
      "post-fold probe must see folded docs in the base index")
  }

  test("scheduled fold inside the loop: every-N-batches maintenance, " +
    "kill DURING the fold re-converges on replay") {
    import spark.implicits._
    val root = graft.session.Scratch.dir("sdi-fold")
    val (srcDir, table, ckpt, idx, sidx) =
      (s"$root/src", s"$root/t", s"$root/ck", s"$root/idx", s"$root/sidx")
    Dedup.buildDedupIndex(
      Seq((1L, corpusText1)).toDF("doc_id", "text"), idx)

    def layerDirs(sub: String): Set[String] = {
      val d = new java.io.File(s"$sidx/$sub")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).toSet
    }
    // batches 0 and 1 admit one novel doc each; foldEvery=2 means no
    // fold yet (ids 0, 1), both live in the stream layer
    Seq((100L, novel1)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    ingest(srcDir, table, ckpt, idx, sidx, schema, foldEvery = 2)
    Seq((101L, novel2)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    ingest(srcDir, table, ckpt, idx, sidx, schema, foldEvery = 2)
    assert(layerDirs("hashes") == Set("batch_id=0", "batch_id=1"))

    // batch 2 crosses the fold boundary — but the fold is KILLED
    // between the two sub-table rewrites (hashes folded, bands not,
    // layers not deleted): the query fails, and the replay must
    // re-converge through the idempotent re-fold
    val novel3 = "third novel body of text with its own words cc dd"
    Seq((200L, novel1), (201L, novel3)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Dedup.foldBarrier =
      () => throw new RuntimeException("injected fold crash")
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        ingest(srcDir, table, ckpt, idx, sidx, schema, foldEvery = 2)
      }
    } finally Dedup.foldBarrier = () => ()
    assert(layerDirs("hashes") == Set("batch_id=0", "batch_id=1"),
      "crashed fold must not have deleted layers")

    // replay: fold completes (batches 0,1 into base), then batch 2
    // probes — 200 is a cross-batch dup of the FOLDED batch-0 admit
    // (now only in the base index), 201 is novel
    ingest(srcDir, table, ckpt, idx, sidx, schema, foldEvery = 2)
    assert(tableIds(table) == Set(100L, 101L, 201L))
    assert(layerDirs("hashes") == Set("batch_id=2") &&
      layerDirs("bands") == Set("batch_id=2"),
      "folded layers deleted, current batch's layer kept")
    // base ∪ remaining layer must equal a fresh rebuild over all admits
    val rebuilt = s"$root/rebuilt"
    Dedup.buildDedupIndex(
      Seq((1L, corpusText1), (100L, novel1), (101L, novel2),
        (201L, novel3)).toDF("doc_id", "text"), rebuilt)
    def hrows(dfs: org.apache.spark.sql.DataFrame*) = dfs
      .flatMap(_.select("h", "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1)))).sorted
    assert(hrows(Dedup.readDedupIndex(spark, idx)._1,
        spark.read.parquet(s"$sidx/hashes"))
      == hrows(Dedup.readDedupIndex(spark, rebuilt)._1))
  }

  test("composed pipeline: quality gate ahead of the dedup loop — " +
    "junk never reaches the probe, dups never reach the table") {
    import spark.implicits._
    val root = graft.session.Scratch.dir("sdi-composed")
    val (srcDir, table, ckpt, idx, sidx) =
      (s"$root/src", s"$root/t", s"$root/ck", s"$root/idx", s"$root/sidx")
    Dedup.buildDedupIndex(
      Seq((1L, corpusText1)).toDF("doc_id", "text"), idx)
    Seq(
      (500L, "x1 y2 z3"),   // fails the gate (mean word length < 3)
      (501L, corpusText1),  // passes the gate, exact dup -> probe drops
      (502L, novel1)        // passes the gate, novel -> admitted
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    EventStream.curationIngestDeduped(
      spark.readStream.schema(schema).parquet(srcDir),
      table, ckpt, appId = "sdi-composed", indexPath = idx,
      streamIndexPath = sidx, minWords = 3,
      stopWords = Seq("alpha", "beta", "brand", "new"))
      .awaitTermination()
    // a gate failure would surface here: 500 is novel, so only the
    // gate keeps it out of the table; 501 only the probe keeps out
    assert(tableIds(table) == Set(502L))
  }
}
