package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Serving-layer compositions: more-like-this, completion, collapse,
  * sharded federation, result cache. */
class ServingSpec extends SparkTestBase {
  import spark.implicits._

  private def tinyCorpus = Seq(
    (1L, "apple banana banana rare"),
    (2L, "apple cherry banana"),
    (3L, "banana cherry date"),
    (4L, "apple date rare cherry"),
    (5L, "fig date apple")).toDF("id", "text")

  test("moreLikeThis: all-integer term selection (df asc, tf desc, term asc) and source exclusion") {
    val idx = Retrieval.buildTextIndex(tinyCorpus, "id", "text", buckets = 8)
    // doc 1 terms: apple(tf1, df4), banana(tf2, df3), rare(tf1, df2)
    // rank: rare(df2) < banana(df3) < apple(df4) -> top-2 = rare banana
    val out = Serving.moreLikeThisTopK(idx, 1L, "apple banana banana rare",
      mTerms = 2, k = 10).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("query") == "rare banana"))
    assert(!out.exists(_.getAs[Long]("id") == 1L), "source doc excluded")
    // doc 4 has rare; docs 2,3 have banana — all surface
    val ids = out.map(_.getAs[Long]("id")).toSet
    assert(ids == Set(2L, 3L, 4L))
  }

  test("moreLikeThis: tf breaks equal-df ties, then term text") {
    val docs = Seq(
      (1L, "zz aa zz"),      // zz tf2, aa tf1
      (2L, "zz aa"), (3L, "zz aa")).toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", buckets = 4)
    // both terms df=3; zz wins on tf 2>1
    val out = Serving.moreLikeThisTopK(idx, 1L, "zz aa zz", 1, 5).collect()
    assert(out.forall(_.getAs[String]("query") == "zz"))
  }

  test("completion: persisted probe == from-index, (df desc, term asc) order, prefix pruning") {
    val d = sf("sf0.001", "documents")
    val idx = Retrieval.buildTextIndex(d, "doc_id", "text", buckets = 16)
    val tmp = java.nio.file.Files.createTempDirectory("cmpl").toString
    val ipath = s"$tmp/idx"; val cpath = s"$tmp/complete"
    idx.save(ipath)
    Serving.saveCompletionIndex(spark, ipath, cpath)
    val a = Serving.completeTopK(spark, cpath, "s", 8).collect()
    val b = Serving.completionsFromIndex(
      Retrieval.loadTextIndex(spark, ipath), "s", 8).collect()
    assert(a.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq)
    assert(a.nonEmpty)
    assert(a.forall(_.getString(1).startsWith("s")))
    // ranking is df desc then term asc
    val sorted = a.sortBy(r => (-r.getLong(2), r.getString(1)))
    assert(a.map(_.getString(1)).toSeq == sorted.map(_.getString(1)).toSeq)
    // partition pruning: probe plan touches only the __p=s directory
    val plan = Serving.completeTopK(spark, cpath, "s", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__p"), "prefix partition filter present")
  }

  test("collapse: best rank per group survives, ungrouped self-collapse, k groups") {
    val ranked = Seq(
      (1, 10L, 9.0), (2, 11L, 8.0), (3, 12L, 7.0),
      (4, 13L, 6.0), (5, 14L, 5.0), (6, 15L, 4.0))
      .toDF("rank", "id", "score")
    val groups = Seq((10L, "g1"), (11L, "g1"), (12L, "g2"), (14L, "g2"))
      .toDF("id", "grp") // 13, 15 unmapped -> own groups
    val out = Serving.collapseTopK(ranked, groups, "id", "grp", 3)
      .orderBy("collapsed_rank").collect()
    // reps: g1->10 (rank1), g2->12 (rank3), 13->13 (rank4), 15 (rank6)
    assert(out.map(r => (r.getAs[Int]("collapsed_rank"), r.getAs[Long]("id")))
      .toSeq == Seq((1, 10L), (2, 12L), (3, 13L)))
  }

  test("sharded probe == monolithic probe (exact global stats, union dfs)") {
    val d = sf("sf0.001", "documents")
    val tmp = java.nio.file.Files.createTempDirectory("shard").toString
    Serving.saveShardedTextIndex(d, "doc_id", "text", tmp, shards = 3,
      buckets = 16)
    val single = Retrieval.buildTextIndex(d, "doc_id", "text", buckets = 16)
    val q = Seq("slow", "merge", "window")
    val a = Serving.bm25TopKSharded(spark, tmp, q, 15).collect()
    val b = Retrieval.bm25TopKIndexed(single, q, 15).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Int]("rank") == y.getAs[Int]("rank"))
      assert(x.getAs[Long]("id") == y.getAs[Long]("id"))
      assert(math.abs(x.getAs[Double]("score") - y.getAs[Double]("score")) < 1e-9)
    }
    // exact global stats: sum of shard stats == monolithic stats
    val n = (0 until 3)
      .map(s => Retrieval.loadTextIndex(spark, s"$tmp/shard=$s"))
    assert(n.map(_.nDocs).sum == single.nDocs)
    assert(n.map(_.dlSum).sum == single.dlSum)
  }

  test("cache: miss then hit, identical rows, mutation invalidates") {
    val tmp = java.nio.file.Files.createTempDirectory("cache").toString
    val ipath = s"$tmp/idx"; val cpath = s"$tmp/cache"
    Retrieval.buildTextIndex(tinyCorpus, "id", "text", buckets = 4).save(ipath)
    val q = Seq("apple", "banana")
    val r1 = Serving.cachedTopK(spark, cpath, ipath, q, 5)
    assert(!r1.hit)
    val r2 = Serving.cachedTopK(spark, cpath, ipath, q, 5)
    assert(r2.hit)
    assert(r2.token == r1.token)
    val rows1 = r1.rows.orderBy("rank").collect().map(_.toSeq).toSeq
    val rows2 = r2.rows.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(rows1 == rows2)
    // a different query (same index) is its own key -> miss
    assert(!Serving.cachedTopK(spark, cpath, ipath, Seq("cherry"), 5).hit)
    // index mutation flips the token -> forced recompute picks up doc 6
    Retrieval.appendToTextIndex(spark, ipath,
      Seq((6L, "apple apple apple banana")).toDF("id", "text"), "id", "text")
    val r3 = Serving.cachedTopK(spark, cpath, ipath, q, 5)
    assert(!r3.hit)
    assert(r3.token != r1.token)
    assert(r3.rows.filter(F.col("id") === 6L).count() == 1)
    assert(Serving.cachedTopK(spark, cpath, ipath, q, 5).hit)
  }

  test("indexStateToken: stable on unchanged dir, ignores lock churn") {
    val tmp = java.nio.file.Files.createTempDirectory("tok").toString
    Retrieval.buildTextIndex(tinyCorpus, "id", "text", buckets = 4).save(tmp)
    val t1 = Serving.indexStateToken(spark, tmp)
    val t2 = Serving.indexStateToken(spark, tmp)
    assert(t1 == t2)
    // lock/heartbeat files do not perturb the token
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hb = new org.apache.hadoop.fs.Path(s"$tmp/_writer_heartbeat")
    val out = fs.create(hb, true); out.write("x".getBytes); out.close()
    assert(Serving.indexStateToken(spark, tmp) == t1)
  }
}

/** Matryoshka dim-prefix coarse + exact rerank. */
class MatryoshkaSpec extends SparkTestBase {

  test("pool >= corpus: truncated probe == bruteForceTopK row-for-row") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter(F.col("vec_id") % 37 === 0).limit(4)
    val n = emb.count().toInt
    val a = Matryoshka.truncatedTopK(emb, queries, "vec_id", "embedding",
      dPrime = 8, k = 10, poolSize = n + 1)
      .orderBy("query_id", "rank").collect()
    val b = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .orderBy("query_id", "rank").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("query_id") == y.getAs[Long]("query_id"))
      assert(x.getAs[Int]("rank") == y.getAs[Int]("rank"))
      assert(x.getAs[Long]("neighbor_id") == y.getAs[Long]("neighbor_id"))
      assert(math.abs(x.getAs[Double]("cos") - y.getAs[Double]("cos")) < 1e-12)
    }
  }

  test("bounded pool: planted exact copy is rank 1 (prefix of a copy is a copy)") {
    import spark.implicits._
    val emb = sf("sf0.001", "embeddings")
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val src = emb.filter(F.col("vec_id") === 3L)
      .select(F.lit(100000L).as("vec_id"), F.col("embedding"))
    val corpus = emb.unionByName(src)
    val out = Matryoshka.truncatedTopKIndexed(
      Matryoshka.buildTruncatedTable(corpus, "vec_id", "embedding", 4),
      corpus, emb.filter(F.col("vec_id") === 3L), "vec_id", "embedding",
      dPrime = 4, k = 5, poolSize = 50).collect()
    val top = out.filter(_.getAs[Int]("rank") == 1).head
    assert(top.getAs[Long]("neighbor_id") == 100000L)
    assert(math.abs(top.getAs[Double]("cos") - 1.0) < 1e-6)
  }

  test("truncate slices the dim prefix") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f, 2f, 3f, 4f))).toDF("id", "v")
    val t = Matryoshka.buildTruncatedTable(df, "id", "v", 2)
      .select("tvec").collect().head.getSeq[Float](0)
    assert(t == Seq(1f, 2f))
  }
}

/** Paired randomization significance test. */
class SignificanceSpec extends SparkTestBase {
  import spark.implicits._

  private def coin(seed: String, rep: Long, qid: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$rep:$qid".getBytes("UTF-8"))
    (((md(0) >> 4) & 0xf) % 2) == 0
  }

  test("replays the exact integer form: p matches a driver-side replay") {
    val perQ = Seq(("q1", 4.0, 2.0), ("q2", 3.0, 3.0), ("q3", 5.0, 1.0),
      ("q4", 2.0, 4.0), ("q5", 4.0, 0.0)).toDF("qid", "a", "b")
    val reps = 64
    val out = Eval.pairedRandomizationTest(perQ, "qid", "a", "b", reps, "s7")
      .collect().head
    val diffs = Map("q1" -> 2.0, "q2" -> 0.0, "q3" -> 4.0,
      "q4" -> -2.0, "q5" -> 4.0)
    val obs = diffs.values.sum
    val nGe = (1 to reps).count { r =>
      val s = diffs.map { case (q, d) =>
        if (coin("s7", r.toLong, q)) d else -d }.sum
      math.abs(s) >= math.abs(obs)
    }
    assert(out.getAs[Long]("n_queries") == 5L)
    assert(math.abs(out.getAs[Double]("obs_diff") - obs) < 1e-12)
    assert(out.getAs[Long]("n_ge") == nGe.toLong)
    assert(math.abs(out.getAs[Double]("p_value") -
      (nGe + 1.0) / (reps + 1.0)) < 1e-12)
  }

  test("identical systems: obs 0, every signed sum qualifies, p = 1") {
    val perQ = (1 to 10).map(i => (s"q$i", 3.0, 3.0)).toDF("qid", "a", "b")
    val out = Eval.pairedRandomizationTest(perQ, "qid", "a", "b", 100, "s")
      .collect().head
    assert(out.getAs[Double]("obs_diff") == 0.0)
    assert(out.getAs[Double]("p_value") == 1.0)
  }

  test("dominant one-sided difference: minimal p = 1/(reps+1) is rare") {
    // every query favors A by the same amount: only the all-heads and
    // all-tails assignments tie |obs| -> p is small but never 0
    val perQ = (1 to 12).map(i => (s"q$i", 5.0, 1.0)).toDF("qid", "a", "b")
    val out = Eval.pairedRandomizationTest(perQ, "qid", "a", "b", 500, "sig")
      .collect().head
    assert(out.getAs[Double]("p_value") < 0.05)
    assert(out.getAs[Double]("p_value") >= 1.0 / 501.0)
  }
}

/** Sharded index maintenance: routed appends/removals == rebuild. */
class ShardedMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("append routes by the build hash; probe == monolithic full-corpus probe") {
    val d = sf("sf0.001", "documents")
    val tmp = java.nio.file.Files.createTempDirectory("shap").toString
    Serving.saveShardedTextIndex(d.filter(F.col("doc_id") % 2 === 1),
      "doc_id", "text", tmp, shards = 3, buckets = 16)
    Serving.appendToShardedTextIndex(spark, tmp,
      d.filter(F.col("doc_id") % 2 === 0), "doc_id", "text")
    val q = Seq("slow", "merge", "window")
    val a = Serving.bm25TopKSharded(spark, tmp, q, 12).collect()
    val b = Retrieval.bm25TopKIndexed(
      Retrieval.buildTextIndex(d, "doc_id", "text", 16), q, 12).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("id") == y.getAs[Long]("id"))
      assert(math.abs(x.getAs[Double]("score") - y.getAs[Double]("score")) < 1e-9)
    }
  }

  test("removal routes to the owning shard; removed ids vanish, stats shrink") {
    val docs = Seq((1L, "kiwi melon"), (2L, "kiwi melon plum"),
      (3L, "kiwi fig"), (4L, "melon fig"), (5L, "kiwi melon fig"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("shrm").toString
    Serving.saveShardedTextIndex(docs, "doc_id", "text", tmp, 2, 8)
    Serving.removeFromShardedTextIndex(spark, tmp,
      Seq(2L, 5L).toDF("doc_id"), "doc_id")
    val out = Serving.bm25TopKSharded(spark, tmp, Seq("kiwi", "melon"), 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out == Set(1L, 3L, 4L))
    val n = (0 until 2)
      .map(s => Retrieval.loadTextIndex(spark, s"$tmp/shard=$s"))
      .map(_.nDocs).sum
    assert(n == 3L)
  }
}

/** Point-in-time (as-of) text index reads. */
class AsOfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def saveBase(tmp: String) = {
    val base = Seq((1L, "ant bee"), (2L, "ant cow bee")).toDF("id", "text")
    Retrieval.buildTextIndex(base, "id", "text", 4).save(tmp)
  }

  test("asOf(batch) excludes later batches in postings AND stats") {
    val tmp = java.nio.file.Files.createTempDirectory("asof").toString
    saveBase(tmp)
    Retrieval.appendBatchToTextIndex(spark, tmp,
      Seq((3L, "ant bee cow dog")).toDF("id", "text"), "id", "text", 0L)
    Retrieval.appendBatchToTextIndex(spark, tmp,
      Seq((4L, "bee cow")).toDF("id", "text"), "id", "text", 1L)
    val at0 = Retrieval.loadTextIndexAsOf(spark, tmp, 0L)
    assert(at0.nDocs == 3L && at0.dlSum == (2 + 3 + 4))
    val ids0 = at0.postings.select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids0 == Set(1L, 2L, 3L))
    val atBase = Retrieval.loadTextIndexAsOf(spark, tmp, -1L)
    assert(atBase.nDocs == 2L)
    val full = Retrieval.loadTextIndexAsOf(spark, tmp, 1L)
    assert(full.nDocs == 4L &&
      full.nDocs == Retrieval.loadTextIndex(spark, tmp).nDocs)
  }

  test("as-of before the maintenance watermark is refused") {
    val tmp = java.nio.file.Files.createTempDirectory("asofw").toString
    saveBase(tmp)
    Retrieval.appendBatchToTextIndex(spark, tmp,
      Seq((3L, "ant")).toDF("id", "text"), "id", "text", 0L)
    Retrieval.appendBatchToTextIndex(spark, tmp,
      Seq((4L, "bee")).toDF("id", "text"), "id", "text", 1L)
    Retrieval.appendBatchToTextIndex(spark, tmp,
      Seq((5L, "cow")).toDF("id", "text"), "id", "text", 2L)
    // compaction folds all but the newest batch -> watermark advances
    Retrieval.compactTextIndex(spark, tmp)
    intercept[IllegalArgumentException] {
      Retrieval.loadTextIndexAsOf(spark, tmp, 0L)
    }
    // the newest (unfolded) batch stays addressable
    val full = Retrieval.loadTextIndexAsOf(spark, tmp, 2L)
    assert(full.nDocs == 5L)
  }
}

/** BM25 hard-negative mining. */
class HardNegativesSpec extends SparkTestBase {
  import spark.implicits._

  test("positives excluded, neg_rank is the surviving pool order") {
    val docs = Seq(
      (1L, "apple apple apple"), (2L, "apple apple"), (3L, "apple x"),
      (4L, "apple y"), (5L, "z")).toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val queries = Seq((7L, Seq("apple"))).toDF("query_id", "terms")
    val positives = Seq((7L, 1L)).toDF("query_id", "positive_id")
    val out = Serving.mineHardNegatives(idx, queries, positives, 3, 10)
      .orderBy("neg_rank").collect()
    // bm25 order by tf: 1 (excluded), then 2, then 3/4 (tie by id)
    assert(out.map(_.getAs[Long]("negative_id")).toSeq == Seq(2L, 3L, 4L))
    assert(out.map(_.getAs[Int]("neg_rank")).toSeq == Seq(1, 2, 3))
    assert(out.head.getAs[Int]("pool_rank") == 2)
  }

  test("multi-positive queries exclude all their positives") {
    val docs = Seq((1L, "q q"), (2L, "q q q"), (3L, "q"), (4L, "q w"))
      .toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val out = Serving.mineHardNegatives(idx,
      Seq((1L, Seq("q"))).toDF("query_id", "terms"),
      Seq((1L, 2L), (1L, 1L)).toDF("query_id", "positive_id"), 5, 10)
      .collect().map(_.getAs[Long]("negative_id")).toSet
    assert(out == Set(3L, 4L))
  }
}

/** LTR feature export. */
class LtrFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("features derive from the same matched postings as the scores") {
    val docs = Seq(
      (1L, "red blue blue"), (2L, "red green"), (3L, "blue blue"))
      .toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val queries = Seq((0L, Seq("red", "blue"))).toDF("query_id", "terms")
    val labels = Seq((0L, 1L, 2.0)).toDF("query_id", "id", "label")
    val feats = Retrieval.ltrFeatures(idx, queries, labels, 10)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // doc 1: matches red(tf1, df2) + blue(tf2, df2); dl 3
    val d1 = feats(1L)
    assert(d1.getAs[Long]("f_n_hit") == 2L)
    assert(d1.getAs[Long]("f_tf_sum") == 3L)
    assert(d1.getAs[Long]("f_dl") == 3L)
    assert(d1.getAs[Long]("f_n_qterms") == 2L)
    assert(d1.getAs[Double]("label") == 2.0)
    assert(math.abs(d1.getAs[Double]("f_matched_frac") - 1.0) < 1e-12)
    // doc 3: blue only
    val d3 = feats(3L)
    assert(d3.getAs[Long]("f_n_hit") == 1L)
    assert(d3.getAs[Double]("label") == 0.0)
    assert(math.abs(d3.getAs[Double]("f_matched_frac") - 0.5) < 1e-12)
    // idf consistency: doc 2 and doc 1 share the 'red' idf; a doc
    // matching both terms carries the sum
    val idfRed = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    val idfBlue = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    assert(math.abs(d1.getAs[Double]("f_idf_sum") - (idfRed + idfBlue)) < 1e-12)
    // f_bm25 equals the served score for the same query
    val served = Retrieval.bm25TopKIndexed(idx, Seq("red", "blue"), 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    feats.foreach { case (id, r) =>
      assert(math.abs(r.getAs[Double]("f_bm25") - served(id)) < 1e-12) }
  }
}

/** Batched more-like-this. */
class MoreLikeThisBatchSpec extends SparkTestBase {
  import spark.implicits._

  test("batch == per-doc single MLT (terms, order, exclusion)") {
    val d = sf("sf0.001", "documents")
    val idx = Retrieval.buildTextIndex(d, "doc_id", "text", 16)
    val srcIds = Seq(3L, 5L, 9L)
    val sources = d.filter(F.col("doc_id").isin(srcIds: _*))
    val batch = Serving.moreLikeThisBatch(idx, sources, "doc_id", "text", 4, 8)
      .collect().groupBy(_.getAs[Long]("query_id"))
    srcIds.foreach { id =>
      val txt = d.filter(F.col("doc_id") === id).select("text")
        .head.getString(0)
      val single = Serving.moreLikeThisTopK(idx, id, txt, 4, 8).collect()
      val b = batch(id).sortBy(_.getAs[Int]("rel_rank"))
      assert(b.length == single.length, s"src $id row count")
      assert(b.head.getAs[String]("query") ==
        single.head.getAs[String]("query"), s"src $id query")
      b.zip(single).foreach { case (x, y) =>
        assert(x.getAs[Long]("id") == y.getAs[Long]("id"), s"src $id ids")
        assert(math.abs(x.getAs[Double]("score") -
          y.getAs[Double]("score")) < 1e-9)
      }
      assert(!b.exists(_.getAs[Long]("id") == id), s"src $id self-excluded")
    }
  }
}

/** Percolation (reverse search). */
class PercolateSpec extends SparkTestBase {
  import spark.implicits._

  test("conjunctive match: every term required, duplicates collapse") {
    val stored = Seq(
      (1L, Seq("alpha", "beta")),
      (2L, Seq("alpha")),
      (3L, Seq("beta", "gamma", "beta"))).toDF("query_id", "terms")
    val docs = Seq(
      (10L, "alpha beta other"),   // matches 1, 2
      (11L, "alpha alpha"),        // matches 2
      (12L, "beta gamma"),         // matches 3
      (13L, "gamma")).toDF("id", "text") // matches none
    val out = Serving.percolate(stored, docs, "id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("query_id")))
      .toSet
    assert(out == Set((10L, 1L), (10L, 2L), (11L, 2L), (12L, 3L)))
  }

  test("case folding matches the query side") {
    val stored = Seq((1L, Seq("Alpha"))).toDF("query_id", "terms")
    val docs = Seq((1L, "ALPHA rest")).toDF("id", "text")
    assert(Serving.percolate(stored, docs, "id", "text").count() == 1)
  }

  test("stream: per-batch matches land batch-stamped; replay overwrites its own") {
    val stored = Seq((1L, Seq("alpha"))).toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("perc").toString
    val src = s"$tmp/src"; val out = s"$tmp/out"
    Seq((1L, "alpha x"), (2L, "beta")).toDF("id", "text")
      .write.parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    val q = Serving.percolateStream(stored, stream, out, "id", "text")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .select("doc_id", "query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 1L)))
  }
}

/** Completion-index sync policy. */
class CompletionSyncSpec extends SparkTestBase {
  import spark.implicits._

  test("rebuild iff the source index token changed") {
    val tmp = java.nio.file.Files.createTempDirectory("csync").toString
    val ipath = s"$tmp/idx"; val cpath = s"$tmp/cmp"
    Retrieval.buildTextIndex(
      Seq((1L, "melon fig"), (2L, "melon kiwi")).toDF("id", "text"),
      "id", "text", 4).save(ipath)
    assert(Serving.syncCompletionIndex(spark, ipath, cpath), "initial build")
    assert(!Serving.syncCompletionIndex(spark, ipath, cpath), "unchanged no-op")
    Retrieval.appendToTextIndex(spark, ipath,
      Seq((3L, "mango melon")).toDF("id", "text"), "id", "text")
    assert(Serving.syncCompletionIndex(spark, ipath, cpath),
      "rebuild after append")
    val terms = Serving.completeTopK(spark, cpath, "m", 10)
      .collect().map(_.getString(1)).toSet
    assert(terms == Set("melon", "mango"))
    val dfMelon = Serving.completeTopK(spark, cpath, "melon", 1)
      .collect().head.getLong(2)
    assert(dfMelon == 3L)
  }
}

/** Sharded streaming ingest. */
class ShardedStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed docs route to shards; probe == monolithic; stats exact") {
    val d = sf("sf0.001", "documents").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("shstr").toString
    Serving.saveShardedTextIndex(d.filter(F.col("doc_id") % 2 === 1),
      "doc_id", "text", s"$tmp/idx", shards = 2, buckets = 8)
    val fresh = d.filter(F.col("doc_id") % 2 === 0)
    fresh.write.parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema).parquet(s"$tmp/src")
    val q = Serving.streamToShardedTextIndex(stream, s"$tmp/idx",
        "doc_id", "text")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (0 until 2).foreach(sh =>
      Maintenance.releaseWriterLease(spark, s"$tmp/idx/shard=$sh"))
    val a = Serving.bm25TopKSharded(spark, s"$tmp/idx",
      Seq("slow", "merge", "window"), 10).collect()
    val b = Retrieval.bm25TopKIndexed(
      Retrieval.buildTextIndex(d, "doc_id", "text", 8),
      Seq("slow", "merge", "window"), 10).collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("id") == y.getAs[Long]("id"))
      assert(math.abs(x.getAs[Double]("score") - y.getAs[Double]("score")) < 1e-9)
    }
    assert(a.length == b.length && a.nonEmpty)
  }
}

/** Upsert, term stats, facet stats, BM25+. */
class IndexOpsExtrasSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert replaces present ids, inserts absent ones; probe == rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("ups").toString
    val v1 = Seq((1L, "apple banana"), (2L, "cherry date"), (3L, "apple fig"))
      .toDF("id", "text")
    Retrieval.buildTextIndex(v1, "id", "text", 4).save(tmp)
    val changes = Seq((2L, "apple apple apple"), (4L, "apple kiwi"))
      .toDF("id", "text")
    Retrieval.upsertIntoTextIndex(spark, tmp, changes, "id", "text")
    val v2 = Seq((1L, "apple banana"), (2L, "apple apple apple"),
      (3L, "apple fig"), (4L, "apple kiwi")).toDF("id", "text")
    val got = Retrieval.bm25TopKIndexed(
      Retrieval.loadTextIndex(spark, tmp), Seq("apple"), 10).collect()
    val want = Retrieval.bm25TopKIndexed(
      Retrieval.buildTextIndex(v2, "id", "text", 4), Seq("apple"), 10)
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (x, y) =>
      assert(x.getAs[Long]("id") == y.getAs[Long]("id"))
      assert(math.abs(x.getAs[Double]("score") - y.getAs[Double]("score")) < 1e-9)
    }
    // exact stats match the rebuild (delta arithmetic)
    val a = Retrieval.loadTextIndex(spark, tmp)
    assert(a.nDocs == 4L && a.dlSum == (2 + 3 + 2 + 2))
    // retry-convergence: re-running the same upsert changes nothing
    Retrieval.upsertIntoTextIndex(spark, tmp, changes, "id", "text")
    val b = Retrieval.loadTextIndex(spark, tmp)
    assert(b.nDocs == 4L && b.dlSum == a.dlSum)
  }

  test("termStats: df, exact cf, idf at current N; absent terms omitted") {
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "y")).toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val st = Retrieval.termStats(idx, Seq("x", "y", "absent"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(st.keySet == Set("x", "y"))
    assert(st("x")._1 == 2L && st("x")._2 == 3L)
    assert(st("y")._1 == 2L && st("y")._2 == 2L)
    val idfX = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    assert(math.abs(st("x")._3 - idfX) < 1e-12)
  }

  test("facetStats: exact counts and sums per facet over the matched set") {
    val docs = Seq(
      (1L, "hit a", "s1", 10L), (2L, "hit b", "s1", 20L),
      (3L, "hit c", "s2", 5L), (4L, "miss", "s2", 100L))
      .toDF("id", "text", "src", "nch")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val out = Retrieval.facetStats(idx, Seq("hit"), docs, "id", "src",
      "nch", 10).collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("s1") == ((2L, 30L, 15.0)))
    assert(m("s2") == ((1L, 5L, 5.0)))
  }

  test("BM25+: a long doc matching a term outranks a non-matching doc") {
    // plain BM25 can rank a long matching doc below short non-matchers
    // only among MATCHED docs; the delta floor guarantees every match
    // scores >= delta * idf
    val docs = Seq(
      (1L, ("pad " * 200) + "needle"),
      (2L, "needle hay")).toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val out = Retrieval.bm25PlusTopKIndexed(idx, Seq("needle"), 10, 1.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    val idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    assert(out(1L) >= 1.0 * idf - 1e-12, "delta floor holds for the long doc")
    // delta = 0 degenerates to plain BM25
    val plain = Retrieval.bm25PlusTopKIndexed(idx, Seq("needle"), 10, 0.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    val ref = Retrieval.bm25TopKIndexed(idx, Seq("needle"), 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    plain.foreach { case (id, s) => assert(math.abs(s - ref(id)) < 1e-12) }
  }
}

/** Paired bootstrap confidence interval. */
class BootstrapCISpec extends SparkTestBase {
  import spark.implicits._

  private def hexDraw(seed: String, rep: Long, slot: Long, n: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$rep:$slot".getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % n
  }

  test("driver-side replay of the full interval") {
    val perQ = Seq(("a", 4.0, 1.0), ("b", 2.0, 2.0), ("c", 5.0, 3.0),
      ("d", 1.0, 2.0)).toDF("qid", "ma", "mb")
    val reps = 40
    val out = Eval.pairedBootstrapCI(perQ, "qid", "ma", "mb", reps, "bs1")
      .collect().head
    // replay: index by qid order
    val d = Seq("a" -> 3.0, "b" -> 0.0, "c" -> 2.0, "d" -> -1.0)
    val sums = (1 to reps).map { r =>
      (0 until 4).map(i => d(hexDraw("bs1", r.toLong, i.toLong, 4).toInt)._2).sum
    }.sorted
    val lo = sums(math.max(1, math.ceil(0.025 * reps).toInt) - 1)
    val hi = sums(math.min(reps, math.ceil(0.975 * reps).toInt) - 1)
    assert(out.getAs[Long]("n_queries") == 4L)
    assert(math.abs(out.getAs[Double]("obs_mean") - 1.0) < 1e-12)
    assert(math.abs(out.getAs[Double]("ci_lo") - lo / 4.0) < 1e-12)
    assert(math.abs(out.getAs[Double]("ci_hi") - hi / 4.0) < 1e-12)
  }

  test("identical systems: degenerate zero-width interval at 0") {
    val perQ = (1 to 6).map(i => (s"q$i", 2.0, 2.0)).toDF("qid", "a", "b")
    val out = Eval.pairedBootstrapCI(perQ, "qid", "a", "b", 50, "s")
      .collect().head
    assert(out.getAs[Double]("obs_mean") == 0.0)
    assert(out.getAs[Double]("ci_lo") == 0.0 &&
      out.getAs[Double]("ci_hi") == 0.0)
  }
}

/** Pinned results, synonym expansion, explain, rank diff. */
class ServingRankingExtrasSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple apple banana"), (2L, "apple cherry"),
    (3L, "banana cherry"), (4L, "date fig")).toDF("id", "text")

  test("pinned: given order first (matched or not), organic fills excluding pinned") {
    val idx = Retrieval.buildTextIndex(corpus, "id", "text", 4)
    val out = Serving.pinnedTopK(idx, Seq("apple"), Seq(4L, 2L), 4)
      .orderBy("rank").collect()
    // rank1 = 4 (no match -> null score), rank2 = 2 (matched, scored),
    // organic: 1 at rank3 (2 excluded)
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
      r.getAs[Boolean]("pinned"))).toSeq ==
      Seq((1, 4L, true), (2, 2L, true), (3, 1L, false)))
    assert(out(0).isNullAt(out(0).fieldIndex("score")))
    assert(!out(1).isNullAt(out(1).fieldIndex("score")))
    // the pinned matched score equals the organic score for that doc
    val organic = Retrieval.bm25TopKIndexed(idx, Seq("apple"), 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    assert(math.abs(out(1).getAs[Double]("score") - organic(2L)) < 1e-12)
  }

  test("synonyms: tf sums over variants, df counts any-variant docs") {
    val docs = Seq(
      (1L, "car car"), (2L, "auto"), (3L, "car auto"), (4L, "bus"))
      .toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val out = Serving.synonymTopK(idx, Seq(Seq("car", "auto")), 10)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("tf_total"), r.getAs[Double]("score"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(3L)._1 == 2L, "tf summed over variants")
    // group df = 3 (docs 1,2,3): equal-tf equal-dl docs score equally
    assert(math.abs(out(1L)._2 - out(3L)._2) < 1e-12,
      "tf=2 dl=2 docs score the same under group stats")
  }

  test("degenerate single-term groups == plain bm25") {
    val idx = Retrieval.buildTextIndex(corpus, "id", "text", 4)
    val syn = Serving.synonymTopK(idx, Seq(Seq("apple"), Seq("banana")), 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Double]("score")))
    val plain = Retrieval.bm25TopKIndexed(idx, Seq("apple", "banana"), 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Double]("score")))
    syn.zip(plain).foreach { case (x, y) =>
      assert(x._1 == y._1 && x._2 == y._2 && math.abs(x._3 - y._3) < 1e-12)
    }
  }

  test("explain: per-term weights sum to the served score; dfs corpus-level") {
    val idx = Retrieval.buildTextIndex(corpus, "id", "text", 4)
    val ex = Retrieval.explainScores(idx, Seq("apple", "banana"), Seq(1L))
      .collect()
    assert(ex.map(_.getAs[String]("term")).toSet == Set("apple", "banana"))
    // df is corpus-level even though only doc 1 is explained
    assert(ex.find(_.getAs[String]("term") == "apple").get
      .getAs[Long]("df") == 2L)
    val served = Retrieval.bm25TopKIndexed(idx, Seq("apple", "banana"), 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    assert(math.abs(ex.map(_.getAs[Double]("weight")).sum - served(1L)) < 1e-12)
  }

  test("rankListDiff: coalesced absences, delta only when in both") {
    val a = Seq((1, 10L), (2, 11L), (3, 12L)).toDF("rank", "id")
    val b = Seq((1, 11L), (2, 10L), (3, 13L)).toDF("rank", "id")
    val d = Eval.rankListDiff(a, b).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank_a"), r.getAs[Long]("rank_b"),
          r.getAs[Long]("delta"))).toMap
    assert(d(10L) == ((1L, 2L, -1L)))
    assert(d(11L) == ((2L, 1L, 1L)))
    assert(d(12L) == ((3L, 0L, 0L)))
    assert(d(13L) == ((0L, 3L, 0L)))
  }
}

/** Deterministic random walks. */
class RandomWalksSpec extends SparkTestBase {
  import spark.implicits._

  private def hexDraw(seed: String, start: Long, w: Long, t: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$start:$w:$t".getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("walks follow the md5 draw over sorted neighbors; dangling ends early") {
    // 1 -> {2, 3}, 2 -> {3}, 3 -> {} (dangling)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = LinkGraph.randomWalks(edges, walkLen = 4, walksPerNode = 2,
        seed = "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byWalk = out.groupBy(t => (t._1, t._2))
      .map { case (k, rows) => k -> rows.sortBy(_._3).map(_._4).toSeq }
    // driver replay for walk (1, w): step1 picks among sorted [2, 3]
    Seq(0L, 1L).foreach { w =>
      val p1 = if (hexDraw("s", 1L, w, 1L) % 2 == 0) 2L else 3L
      val expected =
        if (p1 == 3L) Seq(1L, 3L) // 3 dangling -> walk ends
        else Seq(1L, 2L, 3L)      // 2 -> 3 forced, then dangling
      assert(byWalk((1L, w)) == expected, s"walk (1,$w)")
    }
    // from 2: forced to 3 then ends; from 3: stays at the start row
    assert(byWalk((2L, 0L)) == Seq(2L, 3L))
    assert(byWalk((3L, 0L)) == Seq(3L))
    // determinism: a second run is identical
    val again = LinkGraph.randomWalks(edges, 4, 2, "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  test("every step lands on an out-neighbor of the previous node") {
    val d = sf("sf0.001", "documents").select("doc_id").limit(50)
    val edges = d.select(F.col("doc_id").as("src"),
        ((F.col("doc_id") * 7 + 3) % 50).as("dst"))
      .unionByName(d.select(F.col("doc_id").as("src"),
        ((F.col("doc_id") * 13 + 5) % 50).as("dst")))
    val eset = edges.distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = LinkGraph.randomWalks(edges, 3, 1, "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      val path = rows.sortBy(_._3).map(_._4)
      path.sliding(2).foreach { p =>
        if (p.length == 2) assert(eset.contains((p(0), p(1))),
          s"edge ${p(0)}->${p(1)} must exist") }
    }
  }
}

/** LSH banding auto-tune + vocabulary coverage. */
class TuningSpec extends SparkTestBase {
  import spark.implicits._

  test("chooseBandsRows picks the s-curve-closest divisor pair") {
    // thresholds for 128: (16,8)->0.7071, (32,4)->0.4204, (8,16)->0.8781
    assert(Dedup.chooseBandsRows(128, 0.7) == ((16, 8)))
    assert(Dedup.chooseBandsRows(128, 0.5) == ((32, 4)))
    assert(Dedup.chooseBandsRows(128, 0.9) == ((8, 16)))
    assert(math.abs(Dedup.sCurveThreshold(16, 8) -
      math.pow(1.0 / 16, 1.0 / 8)) < 1e-15)
    // coarser target -> fewer rows per band (cheaper bands dominate)
    val (_, r1) = Dedup.chooseBandsRows(128, 0.3)
    val (_, r2) = Dedup.chooseBandsRows(128, 0.95)
    assert(r1 < r2)
  }

  test("tokenCoverage: exact occurrence counts, OOV complement") {
    val docs = Seq(
      ("a", "x x y z"), ("a", "x q"), ("b", "q q")).toDF("g", "text")
    val vocab = Seq("x", "y").toDF("term")
    val out = TextFunctions.tokenCoverage(docs, "text", vocab, "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((6L, 2L, 2.0 / 6)))  // z, q OOV
    assert(out("b") == ((2L, 2L, 1.0)))
  }
}

/** Index merge, triangles, collocations. */
class GraphTextExtrasSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeTextIndexes: merged halves probe == full rebuild (exact stats)") {
    val d = sf("sf0.001", "documents")
    val tmp = java.nio.file.Files.createTempDirectory("merge").toString
    Retrieval.buildTextIndex(d.filter(F.col("doc_id") % 2 === 1),
      "doc_id", "text", 16).save(s"$tmp/a")
    Retrieval.buildTextIndex(d.filter(F.col("doc_id") % 2 === 0),
      "doc_id", "text", 16).save(s"$tmp/b")
    Retrieval.mergeTextIndexes(spark, Seq(s"$tmp/a", s"$tmp/b"), s"$tmp/m")
    val merged = Retrieval.loadTextIndex(spark, s"$tmp/m")
    val full = Retrieval.buildTextIndex(d, "doc_id", "text", 16)
    assert(merged.nDocs == full.nDocs && merged.dlSum == full.dlSum)
    val a = Retrieval.bm25TopKIndexed(merged, Seq("slow", "merge"), 10)
      .collect()
    val b = Retrieval.bm25TopKIndexed(full, Seq("slow", "merge"), 10)
      .collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Long]("id") == y.getAs[Long]("id"))
      assert(math.abs(x.getAs[Double]("score") - y.getAs[Double]("score")) < 1e-9)
    }
    assert(a.length == b.length && a.nonEmpty)
  }

  test("mergeTextIndexes refuses mismatched bucket geometry") {
    val tmp = java.nio.file.Files.createTempDirectory("mergeb").toString
    val docs = Seq((1L, "x")).toDF("id", "text")
    Retrieval.buildTextIndex(docs, "id", "text", 8).save(s"$tmp/a")
    Retrieval.buildTextIndex(docs, "id", "text", 16).save(s"$tmp/b")
    intercept[IllegalArgumentException] {
      Retrieval.mergeTextIndexes(spark, Seq(s"$tmp/a", s"$tmp/b"), s"$tmp/m")
    }
  }

  test("triangleCounts: direction/parallel edges collapse, each member counts") {
    // triangle {1,2,3} + pendant 4; duplicate and reversed edges
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (3L, 4L), (4L, 4L)).toDF("src", "dst")
    val out = LinkGraph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: two triangles sharing an edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val out = LinkGraph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {1,2,3} and {2,3,4}
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("collocations: exact counts, hand-checked PMI, minCount floor") {
    val docs = Seq("a b a b c", "a b d", "e f").toDF("text")
    val out = TextFunctions.collocations(docs, "text", 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    // bigrams: (a b)x3, (b a)x1, (b c)x1, (b d)x1, (e f)x1; B = 7
    assert(out.map(t => (t._1, t._2)).toSet == Set(("a b", 3L)))
    // T = 10 tokens; c_a = 3, c_b = 3
    val pmi = math.log((3.0 / 7) / ((3.0 / 10) * (3.0 / 10)))
    assert(math.abs(out.head._3 - pmi) < 1e-12)
  }
}

/** NRT tail serving, boosted ranking, label propagation. */
class NrtBoostLabelSpec extends SparkTestBase {
  import spark.implicits._

  test("NRT: saved index + fresh tail == full rebuild probe") {
    val d = sf("sf0.001", "documents")
    val idx = Retrieval.buildTextIndex(
      d.filter(F.col("doc_id") % 3 =!= 0), "doc_id", "text", 16)
    val got = Serving.bm25TopKWithTail(idx,
      d.filter(F.col("doc_id") % 3 === 0), "doc_id", "text",
      Seq("slow", "merge", "window"), 12).collect()
    val want = Retrieval.bm25TopKIndexed(
      Retrieval.buildTextIndex(d, "doc_id", "text", 16),
      Seq("slow", "merge", "window"), 12).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (x, y) =>
      assert(x.getAs[Long]("id") == y.getAs[Long]("id"))
      assert(math.abs(x.getAs[Double]("score") - y.getAs[Double]("score")) < 1e-9)
    }
  }

  test("boosted: prior flips near-ties, absent ids boost 0, lambda 0 == plain") {
    val docs = Seq((1L, "hit pad"), (2L, "hit pad"), (3L, "other"))
      .toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", 4)
    val boosts = Seq((2L, 1.0)).toDF("id", "boost")
    // docs 1 and 2 tie on bm25; the boost promotes 2 above 1
    val out = Serving.bm25TopKBoosted(idx, Seq("hit"), boosts, 10, 0.5)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id")))
    assert(out.toSeq == Seq((1, 2L), (2, 1L)))
    val plain = Serving.bm25TopKBoosted(idx, Seq("hit"), boosts, 10, 0.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    val ref = Retrieval.bm25TopKIndexed(idx, Seq("hit"), 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    plain.foreach { case (id, s) => assert(math.abs(s - ref(id)) < 1e-12) }
  }

  test("label propagation: frontier advances one hop per iteration, min tie-break") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("node", "label")
    def labels(iters: Int) = LinkGraph
      .labelPropagation(edges, seeds, iters).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val l1 = labels(1)
    assert(l1(2L) == 10L && l1(4L) == 20L && l1(3L) == -1L)
    val l2 = labels(2)
    // node 3 sees 10 and 20 (one vote each) -> min label wins
    assert(l2(3L) == 10L)
    // seeds never change
    assert(l2(1L) == 10L && l2(5L) == 20L)
  }

  test("label propagation: seeds frozen against neighbor majority") {
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 5L), (2L, 9L), (3L, 9L)).toDF("node", "label")
    val out = LinkGraph.labelPropagation(edges, seeds, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 5L, 2L -> 9L, 3L -> 9L))
  }
}

/** Static impact-ordered index pruning. */
class PrunedIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("pruned postings are the (tf desc, id asc) per-term prefix; stats unchanged") {
    val docs = Seq(
      (1L, "w w w x"), (2L, "w w x"), (3L, "w x"), (4L, "w y"))
      .toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", buckets = 4)
    val p = Retrieval.prunedTextIndex(idx, 2)
    val wPost = p.postings.filter(F.col("term") === "w")
      .select("id", "tf").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // w: tf3@1, tf2@2, tf1@3, tf1@4 -> keep (1,3),(2,2)
    assert(wPost == Set((1L, 3L), (2L, 2L)))
    // rare term y untouched
    assert(p.postings.filter(F.col("term") === "y").count() == 1)
    assert(p.nDocs == idx.nDocs && p.dlSum == idx.dlSum)
    // per-term cap holds globally
    val over = p.postings.groupBy("term").count()
      .filter(F.col("count") > 2).count()
    assert(over == 0)
  }

  test("tf ties break by id asc") {
    val docs = Seq((9L, "t z"), (5L, "t z"), (7L, "t z")).toDF("id", "text")
    val idx = Retrieval.buildTextIndex(docs, "id", "text", buckets = 4)
    val kept = Retrieval.prunedTextIndex(idx, 2).postings
      .filter(F.col("term") === "t").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(5L, 7L))
  }

  test("probing the pruned index still ranks (self-consistent dfs)") {
    val d = sf("sf0.001", "documents")
    val idx = Retrieval.buildTextIndex(d, "doc_id", "text", buckets = 16)
    val full = Retrieval.bm25TopKIndexed(idx, Seq("slow", "merge"), 10)
      .collect().map(_.getAs[Long]("id")).toSet
    val pruned = Retrieval.bm25TopKIndexed(
      Retrieval.prunedTextIndex(idx, 50), Seq("slow", "merge"), 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(pruned.size == 10)
    // impact pruning keeps the high-tf postings: healthy overlap
    assert((full intersect pruned).size >= 5,
      s"overlap ${(full intersect pruned).size}")
  }
}
