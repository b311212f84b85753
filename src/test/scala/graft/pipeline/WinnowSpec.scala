package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 4
  private val W = 5

  /** driver-side naive winnowing over a gram-hash sequence */
  private def naive(hs: Seq[Long], w: Int): Seq[(Int, Long)] = {
    val n = hs.length
    if (n == 0) Seq.empty
    else {
      val win = math.min(w, n)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      var last = -1
      for (p <- 0 to n - win) {
        val window = (p until p + win)
        val m = window.map(hs).min
        val sel = window.filter(i => hs(i) == m).max // rightmost min
        if (sel != last) { out += ((sel, hs(sel))); last = sel }
      }
      out.toSeq
    }
  }

  test("winnowFingerprints equals the naive per-window rightmost-argmin reference") {
    val docs = sf("sf0.001", "documents")
      .filter($"text".isNotNull && F.length($"text") >= 100)
      .select($"doc_id", $"text").limit(30)
    // gram hashes exactly as the operator computes them
    val hs = docs.select($"doc_id",
        F.transform(TextFunctions.allWordNgrams($"text", K), g => F.xxhash64(g))
          .as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", K, W)
      .select("id", "pos", "fp").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
    hs.foreach { case (id, seq) =>
      val expect = naive(seq, W)
      assert(got.getOrElse(id, Seq.empty) == expect, s"doc $id")
    }
  }

  test("guarantee: a shared run of w+k-1 tokens always shares a fingerprint") {
    val words = (0 until 200).map(i => s"tok$i")
    val shared = (0 until W + K - 1).map(i => s"shared$i")
    val a = (words.take(80) ++ shared ++ words.slice(80, 120)).mkString(" ")
    val b = (words.slice(120, 180).map(_ + "x") ++ shared ++
      words.slice(180, 200).map(_ + "y")).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text", K, W,
        minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("short docs winnow as a single window; empty/null drop") {
    val docs = Seq(
      (1L, (0 until K + 2).map(i => s"w$i").mkString(" ")), // 3 grams < W
      (2L, ""), (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", K, W).collect()
    assert(fps.length == 1 && fps.head.getAs[Long]("id") == 1L)
  }

  test("all-equal gram hashes: rightmost-min tie selects every window's newest gram") {
    // one repeated token -> every k-gram hash identical -> each
    // window's rightmost min is its LAST position, and that changes
    // every window: the classic (Schleimer) rightmost rule degrades to
    // density 1 on constant content — which is why overlap joins cap
    // flooded fingerprint buckets
    val n = 23 // tokens -> n-k+1 = 20 grams
    val docs = Seq((1L, Seq.fill(n)("same").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", K, W)
      .select("pos").as[Int].collect().sorted.toSeq
    val grams = n - K + 1
    assert(got == (W - 1 until grams).toSeq, s"got $got")
  }

  test("density bounds: ceil((n-w+1)/w) <= fingerprints <= n-w+1") {
    val docs = sf("sf0.001", "documents")
      .filter($"text".isNotNull && F.length($"text") >= 200)
      .select($"doc_id", $"text").limit(50)
    val nGrams = docs.select($"doc_id",
        F.size(TextFunctions.allWordNgrams($"text", K)).as("n"))
      .as[(Long, Int)].collect().toMap
    val counts = Dedup.winnowFingerprints(docs, "doc_id", "text", K, W)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    nGrams.filter(_._2 >= W).foreach { case (id, n) =>
      val c = counts.getOrElse(id, 0L)
      val windows = n - W + 1
      assert(c >= (windows + W - 1) / W, s"doc $id: $c of $n grams")
      assert(c <= windows.toLong, s"doc $id")
    }
  }

  test("streamWinnowOverlap equals the incremental probe (AvailableNow replay)") {
    val docs = sf("sf0.001", "documents")
      .filter($"text".isNotNull && F.length($"text") >= 300)
      .select($"doc_id", $"text").limit(30)
    val fresh = docs.select(($"doc_id" + 1000000L).as("doc_id"),
      F.concat(F.lit("new intro "), F.expr("substring(text, 50)")).as("text"))
    val base = java.nio.file.Files.createTempDirectory("graft_winnow_stream").toString
    Dedup.saveSignatureIndex(
      Dedup.buildWinnowIndex(docs, "doc_id", "text", K, W, maxBucket = 10000),
      s"$base/idx")
    fresh.repartition(2).write.mode("overwrite").parquet(s"$base/src")
    val q = Dedup.streamWinnowOverlap(
        spark.readStream.schema(fresh.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
        s"$base/idx", s"$base/out", "doc_id", "text", K, W, minShared = 2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/out")
      .select("id_new", "id_old", "shared_fps")
      .as[(Long, Long, Long)].collect().toSet
    val inc = Dedup.incrementalWinnowOverlap(fresh,
        Dedup.loadSignatureIndex(spark, s"$base/idx"), "doc_id", "text", K, W,
        minShared = 2)
      .select("id_new", "id_old", "shared_fps")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == inc)
  }

  test("incremental index probe equals the full overlap restricted to (new, old)") {
    val docs = sf("sf0.001", "documents")
      .filter($"text".isNotNull && F.length($"text") >= 300)
      .select($"doc_id", $"text").limit(40)
    val planted = docs.unionByName(docs.select(($"doc_id" + 1000000L).as("doc_id"),
      F.concat(F.lit("new intro that differs "), F.expr("substring(text, 50)"))
        .as("text")))
    val old = planted.filter($"doc_id" < 1000000L)
    val fresh = planted.filter($"doc_id" >= 1000000L)
    // maxBucket far above any bucket here: the full form buckets over
    // old+fresh while the index caps over old only, so a binding cap
    // would legitimately differ between the two forms
    val idx = Dedup.buildWinnowIndex(old, "doc_id", "text", K, W, maxBucket = 10000)
    val inc = Dedup.incrementalWinnowOverlap(fresh, idx, "doc_id", "text", K, W,
        minShared = 2)
      .select("id_new", "id_old", "shared_fps")
      .as[(Long, Long, Long)].collect().toSet
    val full = Dedup.winnowOverlapPairs(planted, "doc_id", "text", K, W,
        minShared = 2, maxBucket = 10000)
      .filter($"id_b" >= 1000000L && $"id_a" < 1000000L)
      .select($"id_b", $"id_a", $"shared_fps")
      .as[(Long, Long, Long)].collect().toSet
    assert(inc == full)
  }
}
