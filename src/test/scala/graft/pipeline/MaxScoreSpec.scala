package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class StemmerSpec extends SparkTestBase {
  import spark.implicits._

  test("Porter pairs from the published algorithm") {
    val pairs = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "hopping" -> "hop",
      "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
      "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      // step-2 rewrites these to relate/condition; steps 4-5a then
      // strip further — the official full-pipeline outputs:
      "relational" -> "relat", "conditional" -> "condit",
      "generalizations" -> "gener", "oscillators" -> "oscil")
    pairs.foreach { case (in, want) =>
      assert(Stemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("morphological variants fold to one stem") {
    assert(Seq("merge", "merges", "merged", "merging")
      .map(Stemmer.stem).distinct == Seq("merg"))
  }

  test("non-alphabetic and short tokens pass through unchanged") {
    assert(Stemmer.stem("x1") == "x1")
    assert(Stemmer.stem("its-a") == "its-a")
    assert(Stemmer.stem("42") == "42")
    assert(Stemmer.stem("ab") == "ab")
    assert(Stemmer.stem(null) == null)
  }

  test("column form stems token arrays; null array stays null") {
    val df = Seq(
      (1L, Seq("merging", "caresses", "x9")),
      (2L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "toks")
    val out = df.select(F.col("id"), Stemmer.stemTerms(F.col("toks")).as("s"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[String]]("s")).map(_.toSeq))
      .toMap
    assert(out(1L).get == Seq("merg", "caress", "x9"))
    assert(out(2L).isEmpty)
  }

  test("bm25TopKStemmed retrieves morphological variants of the query") {
    val docs = Seq(
      (1L, "files were merging nicely"),
      (2L, "she merges the branches"),
      (3L, "it was merged yesterday"),
      (4L, "nothing relevant here at all"),
      (5L, "merge conflicts are painful")
    ).toDF("doc_id", "text")
    val hits = Retrieval.bm25TopKStemmed(docs, "doc_id", "text",
      Seq("merge"), 10).select("id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L, 3L, 5L))
    // unstemmed retrieval finds only the exact surface form
    val plain = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("merge"), 10).select("id").as[Long].collect().toSet
    assert(plain == Set(5L))
  }
}

class MaxScoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(name).toString
    new java.io.File(p).delete()
    p
  }

  // every doc carries the filler term (stopword-class: df = N, tiny
  // idf); docs 3k carry "rare"; text varies dl and tf
  private def corpus(n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val base = Seq.fill(1 + i % 5)(s"tok${i % 7}").mkString(" ")
      val rare = if (i % 3 == 0) " rarex" else ""
      val mid = if (i % 2 == 0) " midx midx" else " midx"
      (i.toLong, s"$base$mid$rare filler")
    }

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.select("rank", "id", "tf_total", "n_terms_hit")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq

  test("termMetaOf: exact per-term max_tf / min_dl") {
    val docs = Seq((1L, "a a b"), (2L, "a b b b c c")).toDF("doc_id", "text")
    val idx = Retrieval.buildTextIndex(docs, "doc_id", "text", 4)
    val m = Retrieval.termMetaOf(idx.postings)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("max_tf"), r.getAs[Int]("min_dl"))).toMap
    assert(m("a") == (2L, 3))
    assert(m("b") == (3L, 3))
    assert(m("c") == (2L, 6))
  }

  test("pruned probe equals the plain probe and actually prunes") {
    val path = tmp("maxscore")
    val docs = corpus(120).toDF("doc_id", "text")
    Retrieval.buildTextIndex(docs, "doc_id", "text", 8).save(path)
    val r = Retrieval.bm25TopKMaxScore(spark, path,
      Seq("rarex", "midx", "filler"), 10, maxTailShare = 0.05)
    assert(r.pruned, s"expected prune; theta=${r.kthScore} sTail=${r.tailBound}")
    assert(r.tail.contains("filler"))
    val plain = Retrieval.bm25TopKIndexed(
      Retrieval.loadTextIndex(spark, path), Seq("rarex", "midx", "filler"), 10)
    assert(norm(r.rows) == norm(plain))
    // scores match too (same dfs, same weight formula)
    val s1 = r.rows.select("id", "score").as[(Long, Double)].collect().toMap
    val s2 = plain.select("id", "score").as[(Long, Double)].collect().toMap
    s1.foreach { case (id, s) => assert(math.abs(s - s2(id)) < 1e-12) }
  }

  test("theta-check failure falls back to the exact full scan") {
    val path = tmp("maxscore_fb")
    val docs = corpus(40).toDF("doc_id", "text")
    Retrieval.buildTextIndex(docs, "doc_id", "text", 8).save(path)
    // k exceeds the candidate count for any split -> theta = -inf
    val r = Retrieval.bm25TopKMaxScore(spark, path,
      Seq("rarex", "filler"), 39, maxTailShare = 0.05)
    assert(!r.pruned)
    val plain = Retrieval.bm25TopKIndexed(
      Retrieval.loadTextIndex(spark, path), Seq("rarex", "filler"), 39)
    assert(norm(r.rows) == norm(plain))
  }

  test("missing meta table falls back; buildTermMeta restores pruning") {
    val path = tmp("maxscore_legacy")
    val docs = corpus(120).toDF("doc_id", "text")
    Retrieval.buildTextIndex(docs, "doc_id", "text", 8).save(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/term_meta"), true)
    val q = Seq("rarex", "midx", "filler")
    val r = Retrieval.bm25TopKMaxScore(spark, path, q, 10,
      maxTailShare = 0.05)
    assert(!r.pruned)
    assert(norm(r.rows) == norm(Retrieval.bm25TopKIndexed(
      Retrieval.loadTextIndex(spark, path), q, 10)))
    Retrieval.buildTermMeta(spark, path)
    val r2 = Retrieval.bm25TopKMaxScore(spark, path, q, 10,
      maxTailShare = 0.05)
    assert(r2.pruned)
    assert(norm(r2.rows) == norm(r.rows))
  }

  test("meta tracks the full lifecycle: append, remove, compact, reconcile") {
    val path = tmp("maxscore_life")
    val docs = corpus(90).toDF("doc_id", "text")
    Retrieval.buildTextIndex(docs, "doc_id", "text", 8).save(path)
    val q = Seq("rarex", "midx", "filler")
    def check(tag: String): Unit = {
      val r = Retrieval.bm25TopKMaxScore(spark, path, q, 10,
        maxTailShare = 0.05)
      val plain = Retrieval.bm25TopKIndexed(
        Retrieval.loadTextIndex(spark, path), q, 10)
      assert(norm(r.rows) == norm(plain), tag)
    }
    check("fresh")
    // append a doc that RAISES filler's max_tf (bound must widen —
    // stale-low would be unsound and break equality)
    val extra = Seq((1000L, "filler filler filler filler rarex midx"))
      .toDF("doc_id", "text")
    Retrieval.appendToTextIndex(spark, path, extra, "doc_id", "text")
    val metaAfterAppend = spark.read.parquet(s"$path/term_meta")
      .filter(F.col("term") === "filler")
      .agg(F.max("max_tf")).as[Long].head()
    assert(metaAfterAppend == 4L)
    check("appended")
    // remove that doc: the touched-bucket recompute must TIGHTEN
    Retrieval.removeFromTextIndex(spark, path,
      Seq(1000L).toDF("doc_id"), "doc_id")
    val metaAfterRemove = spark.read.parquet(s"$path/term_meta")
      .filter(F.col("term") === "filler")
      .agg(F.max("max_tf")).as[Long].head()
    assert(metaAfterRemove == 1L)
    check("removed")
    Retrieval.appendToTextIndex(spark, path,
      Seq((1001L, "rarex midx filler")).toDF("doc_id", "text"),
      "doc_id", "text")
    Retrieval.compactTextIndex(spark, path)
    // compaction folds meta to the base layer, values exact
    val postFold = spark.read.parquet(s"$path/term_meta")
      .withColumn("__batch", F.col("__batch").cast("long"))
    assert(postFold.filter(F.col("__batch") =!= -1L).count() == 0)
    check("compacted")
    Retrieval.reconcileTextIndexStats(spark, path)
    check("reconciled")
  }

  test("batch MaxScore: per-query prune/fallback, all rows equal the plain batch") {
    val path = tmp("maxscore_batch")
    val docs = corpus(120).toDF("doc_id", "text")
    Retrieval.buildTextIndex(docs, "doc_id", "text", 8).save(path)
    val qs = Seq(
      (0L, Seq("rarex", "midx", "filler")),   // prunes (tiny tail)
      (1L, Seq("rarex", "filler")),           // prunes
      (2L, Seq("tok1", "tok2")),              // whatever the split says
      (3L, Seq("zznothing")))                 // matches nothing
    val qdf = qs.toDF("query_id", "terms")
    val r = Retrieval.bm25TopKBatchMaxScore(spark, path, qdf, 10,
      maxTailShare = 0.05)
    val plain = Retrieval.bm25TopKBatch(
      Retrieval.loadTextIndex(spark, path), qdf, 10)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "id", "tf_total", "n_terms_hit")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(norm(r.rows) == norm(plain))
    assert(r.prunedQueries.contains(0L) && r.prunedQueries.contains(1L))
    // k beyond the candidate pool forces the per-query fallback leg
    val rBig = Retrieval.bm25TopKBatchMaxScore(spark, path,
      Seq((7L, Seq("rarex", "filler"))).toDF("query_id", "terms"), 119,
      maxTailShare = 0.05)
    val plainBig = Retrieval.bm25TopKBatch(
      Retrieval.loadTextIndex(spark, path),
      Seq((7L, Seq("rarex", "filler"))).toDF("query_id", "terms"), 119)
    assert(rBig.fallbackQueries == Seq(7L))
    assert(norm(rBig.rows) == norm(plainBig))
  }

  test("re-save over an existing path refreshes meta to the new corpus") {
    val path = tmp("maxscore_resave")
    Retrieval.buildTextIndex(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text", 4).save(path)
    val m1 = spark.read.parquet(s"$path/term_meta")
      .filter(F.col("term") === "alpha").agg(F.max("max_tf"))
      .as[Long].head()
    assert(m1 == 1L)
    // new corpus with a higher tf over the SAME path — meta must
    // describe the new postings, never the old
    Retrieval.buildTextIndex(
      Seq((1L, "alpha alpha alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text", 4).save(path)
    val m2 = spark.read.parquet(s"$path/term_meta")
      .filter(F.col("term") === "alpha").agg(F.max("max_tf"))
      .as[Long].head()
    assert(m2 == 3L)
  }

  test("batch MaxScore: integer query ids survive the fallback union") {
    val path = tmp("maxscore_intq")
    Retrieval.buildTextIndex(corpus(40).toDF("doc_id", "text"),
      "doc_id", "text", 8).save(path)
    val qdfInt = Seq((5, Seq("rarex", "filler")))
      .toDF("query_id", "terms") // INT ids
    val r = Retrieval.bm25TopKBatchMaxScore(spark, path, qdfInt, 39,
      maxTailShare = 0.05)
    assert(r.fallbackQueries == Seq(5L))
    assert(r.rows.select("query_id").distinct()
      .as[Long].collect().toSeq == Seq(5L))
    assert(r.rows.count() > 0)
  }

  test("ragStream: streamed answers equal the one-shot batch composition") {
    val path = tmp("ragstream_idx")
    val out = tmp("ragstream_out")
    val ckpt = tmp("ragstream_ckpt")
    val qdir = tmp("ragstream_q")
    val docs = corpus(80).toDF("doc_id", "text")
    Retrieval.buildTextIndex(docs, "doc_id", "text", 8).save(path)
    val qs = Seq((0L, Seq("rarex", "midx")), (1L, Seq("filler", "tok1")))
    // one file per query -> AvailableNow replays them as micro-batches
    qs.zipWithIndex.foreach { case (row, i) =>
      Seq(row).toDF("query_id", "terms").repartition(1)
        .write.mode("overwrite").parquet(s"$qdir/q$i")
    }
    val stream = spark.readStream
      .schema("query_id LONG, terms ARRAY<STRING>")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$qdir/*")
    Retrieval.ragStream(stream, path, docs, "doc_id", "text",
        k = 5, window = 6, budgetTokens = 30, outPath = out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("query_id", "rank", "id", "start", "end", "n_tokens",
        "cum_tokens", "snippet")
    val idx = Retrieval.loadTextIndex(spark, path)
    val qdf = qs.toDF("query_id", "terms")
    val ranked = Retrieval.bm25TopKBatch(idx, qdf, 5)
      .select(F.col("query_id"), F.col("rank"), F.col("id"))
    val batch = Retrieval.assembleContextBatch(docs, "doc_id", "text",
      ranked, qdf, window = 6, budgetTokens = 30)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Number]("n_tokens").longValue(),
        r.getAs[String]("snippet"))).sortBy(t => (t._1, t._2)).toSeq
    assert(key(streamed) == key(batch))
    assert(key(streamed).map(_._1).distinct.sorted == Seq(0L, 1L))
  }
}
