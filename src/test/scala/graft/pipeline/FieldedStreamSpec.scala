package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * The fielded-index streaming sink and its N-delta protocol:
 * `streamToFieldedTextIndex` must be replay-idempotent across the
 * whole per-field fan-out (postings, stats deltas, AND the idf
 * denominator N), including a REAL crash-replay — the newest
 * checkpoint commit marker deleted and the stream restarted, so the
 * engine re-executes that micro-batch against the identical file set.
 */
class FieldedStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val fields = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
  private val q = Seq("quick", "dog", "slow")

  private def corpus = {
    val words = Seq("quick", "dog", "slow", "fox", "cat", "sun", "walk",
      "jump", "lazy", "green")
    (0L until 40L).map { i =>
      val t = (0 until 4).map(j => words(((i + j) % 10).toInt)).mkString(" ")
      val b = (0 until 10).map(j => words(((i * 3 + j) % 10).toInt)).mkString(" ")
      (i, t, b)
    }.toDF("doc_id", "title", "body")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
    df.select("rank", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq

  test("streamToFieldedTextIndex: crash-replay leaves exact N and ranks") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_fielded_stream").toString
    val path = s"$base/idx"
    val docs = corpus.localCheckpoint(false)
    val seeded = docs.filter(F.col("doc_id") % 2 === 0)
    val fresh = docs.filter(F.col("doc_id") % 2 =!= 0)
    Retrieval.saveFieldedTextIndex(seeded, "doc_id",
      Seq("title", "body"), path, buckets = 8)
    fresh.repartition(3).write.mode("overwrite").parquet(s"$base/src")
    def runStream(): Unit = {
      val qq = Retrieval.streamToFieldedTextIndex(
          spark.readStream.schema(fresh.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
          path, "doc_id")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      qq.awaitTermination()
    }
    runStream()
    val nAll = docs.count()
    val afterFirst = Retrieval.loadFieldedTextIndex(spark, path)
    assert(afterFirst.nDocs == nAll, "N after the clean stream")
    // crash-replay: the newest commit marker vanishes; the restart
    // re-executes that micro-batch with the identical files
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(s"$base/ckpt/commits")
    val newest = fs.listStatus(commits).map(_.getPath)
      .filter(p => p.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    fs.delete(newest, false)
    runStream()
    val replayed = Retrieval.loadFieldedTextIndex(spark, path)
    // exact N: the replayed batch dynamic-overwrote its own delta
    assert(replayed.nDocs == nAll, "N after the crash-replay")
    // exact per-field cardinality: each field index holds every doc
    // with >= 1 indexable token in that field, exactly once
    Seq("title", "body").foreach { f =>
      val expected = docs
        .filter(F.size(F.filter(F.split(F.lower(F.col(f)), "\\s+"),
          (t: org.apache.spark.sql.Column) => F.length(t) > 0)) > 0)
        .count()
      val got = replayed.perField(f).postings.select("id").distinct().count()
      assert(got == expected, s"field $f distinct docs")
      assert(replayed.perField(f).nDocs == expected, s"field $f stats n")
    }
    // ranks equal the one-shot BM25F over the full corpus
    val oneShot = ranks(Retrieval.bm25fTopK(docs, "doc_id", fields, q, 10))
    val probed = ranks(Retrieval.bm25fTopKIndexed(replayed, fields, q, 10))
    assert(probed == oneShot, "streamed+replayed index ranks == one-shot")
  }

  test("compactFieldedTextIndex: folds N deltas, replays stay suppressed") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_fielded_compact").toString
    val path = s"$base/idx"
    val docs = corpus.localCheckpoint(false)
    Retrieval.saveFieldedTextIndex(docs.filter(F.col("doc_id") % 2 === 0),
      "doc_id", Seq("title", "body"), path, buckets = 8)
    val fresh = docs.filter(F.col("doc_id") % 2 =!= 0)
    fresh.repartition(3).write.mode("overwrite").parquet(s"$base/src")
    def runStream(): Unit = {
      val qq = Retrieval.streamToFieldedTextIndex(
          spark.readStream.schema(fresh.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
          path, "doc_id")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      qq.awaitTermination()
    }
    runStream()
    val before = Retrieval.loadFieldedTextIndex(spark, path)
    val ranksBefore = ranks(Retrieval.bm25fTopKIndexed(before, fields, q, 10))
    Maintenance.releaseWriterLease(spark, path)
    val compacted = Retrieval.compactFieldedTextIndex(spark, path)
    assert(compacted.nDocs == before.nDocs, "fold preserves N exactly")
    // base row + the kept newest-stream row only
    val nRows = spark.read.parquet(s"$path/n_deltas").count()
    assert(nRows == 2L, s"expected base + newest rows, got $nRows")
    assert(ranks(Retrieval.bm25fTopKIndexed(compacted, fields, q, 10)) ==
      ranksBefore, "fold is invisible to ranks")
    // crash-replay of a FOLDED batch (commit 1) and the kept newest
    // (commit 2): the fielded watermark suppresses the folded one, the
    // newest rewrites its own partition — N and ranks unchanged
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1L, 2L).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/ckpt/commits/$c"), false)
    }
    runStream()
    val replayed = Retrieval.loadFieldedTextIndex(spark, path)
    assert(replayed.nDocs == before.nDocs, "post-compact replay: N exact")
    assert(ranks(Retrieval.bm25fTopKIndexed(replayed, fields, q, 10)) ==
      ranksBefore, "post-compact replay: ranks exact")
  }

  test("N-delta protocol: append/remove are deltas, reconcile rewrites") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_fielded_ndelta").toString
    val path = s"$base/idx"
    val docs = corpus.localCheckpoint(false)
    Retrieval.saveFieldedTextIndex(docs.filter(F.col("doc_id") < 30L),
      "doc_id", Seq("title", "body"), path, buckets = 8)
    val grown = Retrieval.appendToFieldedTextIndex(spark, path,
      docs.filter(F.col("doc_id") >= 30L), "doc_id")
    assert(grown.nDocs == 40L)
    // removal decrements by ids actually PRESENT (request is over-broad)
    val pruned = Retrieval.removeFromFieldedTextIndex(spark, path,
      Seq(0L, 1L, 2L, 999L).toDF("doc_id"), "doc_id")
    assert(pruned.nDocs == 37L)
    // retried takedown: the ids are gone, N must not drift
    val retried = Retrieval.removeFromFieldedTextIndex(spark, path,
      Seq(0L, 1L, 2L).toDF("doc_id"), "doc_id")
    assert(retried.nDocs == 37L)
    val fixed = Retrieval.setFieldedTextIndexN(spark, path, 37L)
    assert(fixed.nDocs == 37L)
    // legacy fallback: an index without a delta table reads the
    // manifest's n_docs
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/n_deltas"), true)
    val legacy = Retrieval.loadFieldedTextIndex(spark, path)
    assert(legacy.nDocs == 30L, "manifest n_docs is the legacy fallback")
  }
}
