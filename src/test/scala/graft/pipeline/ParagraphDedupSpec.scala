package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Paragraph-level exact dedup: keep-first semantics, reconstruction,
  * NULL discipline, and the minCount threshold. */
class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("dedupParagraphs keeps the globally first copy and reconstructs") {
    val docs = Seq(
      (1L, "alpha one\nshared para\nbeta two"),
      (2L, "shared para\ngamma three"),
      (3L, "delta four\nshared para")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "text", "paras_removed")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha one\nshared para\nbeta two", 0L), // first copy survives
      (2L, "gamma three", 1L),
      (3L, "delta four", 1L)))
  }

  test("dedupParagraphs: within-doc repeats, full-duplicate doc, NULL text") {
    val docs = Seq(
      (1L, "same line\nsame line\nsame line"), // within-doc: keep first only
      (2L, "same line"),                       // whole doc already seen
      (3L, null.asInstanceOf[String]),         // NULL passes through
      (4L, "unique content here")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "text", "paras_removed")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "same line", 2L),
      (2L, "", 1L),
      (3L, null, -1L),
      (4L, "unique content here", 0L)))
  }

  test("dedupParagraphs minCount=3 leaves pairs alone") {
    val docs = Seq(
      (1L, "twice seen\nthrice seen"),
      (2L, "twice seen\nthrice seen"),
      (3L, "thrice seen\nfiller para")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text", minCount = 3)
      .orderBy("doc_id")
      .select("doc_id", "text", "paras_removed")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "twice seen\nthrice seen", 0L),
      (2L, "twice seen", 1L),
      (3L, "filler para", 1L)))
  }

  test("dedupParagraphs preserves extra columns and custom separators") {
    val docs = Seq(
      (1L, "a|dup|b", "x"),
      (2L, "dup|c", "y")
    ).toDF("doc_id", "text", "tag")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text",
        sep = "\\|", joinSep = "|")
      .orderBy("doc_id")
      .select("doc_id", "text", "tag", "paras_removed")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a|dup|b", "x", 0L), (2L, "c", "y", 1L)))
  }
}
