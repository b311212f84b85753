package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class TextFunctionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TextFunctions._

  test("charShingles: distinct, ordered, edge cases") {
    assert(charShingles("abcde", 5).toSeq == Seq("abcde"))
    assert(charShingles("ababab", 2).toSeq == Seq("ab", "ba"))
    assert(charShingles("abc", 5).isEmpty)
    assert(charShingles(null, 3).isEmpty)
  }

  test("minhash: identical sets identical sigs; jaccard estimate near truth") {
    val a = charShingles("the quick brown fox jumps over the lazy dog", 5)
    val b = charShingles("the quick brown fox jumps over the lazy cat", 5)
    val sa = minhashSignature(a, 128)
    val sb = minhashSignature(b, 128)
    assert(minhashSignature(a, 128).toSeq == sa.toSeq)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    val inter = a.toSet.intersect(b.toSet).size.toDouble
    val exact = inter / a.toSet.union(b.toSet).size
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("simhash: near-identical texts have small hamming distance") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val t3 = "completely different words nothing shared here at all whatsoever everything"
    val h12 = java.lang.Long.bitCount(
      simhash64(t1.split(" ")) ^ simhash64(t2.split(" ")))
    val h13 = java.lang.Long.bitCount(
      simhash64(t1.split(" ")) ^ simhash64(t3.split(" ")))
    assert(h12 < h13, s"h12=$h12 h13=$h13")
    assert(h12 <= 12, s"h12=$h12")
  }

  test("fingerprint: whitespace-normalization invariant, content sensitive") {
    assert(fingerprint64("a  b\tc") == fingerprint64("a b c"))
    assert(fingerprint64("a b c") != fingerprint64("a b d"))
  }

  test("language detection on real snippets") {
    assert(detectLanguage("the cat sat on the mat and it was happy") == "en")
    assert(detectLanguage("der hund ist nicht auf der straße und das ist gut") == "de")
    assert(detectLanguage("le chat est dans la maison avec les enfants") == "fr")
    assert(detectLanguage("el perro es un animal con una cola") == "es")
    assert(detectLanguage("xyzzy qwerty") == "und")
    assert(detectLanguage("") == "und")
  }
}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("dropExactDuplicates keeps lowest id per content") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"), (5L, "ccc"))
      .toDF("doc_id", "text")
    val out = Dedup.dropExactDuplicates(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 5L))
  }

  test("minhash LSH near-dup pairs match exact jaccard pairs on documents") {
    val docs = sf("sf0.001", "documents")
    val found = Dedup.nearDuplicatePairs(docs, "doc_id", "text", 5, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact (quadratic) reference computation on the same shingle sets
    val sh = docs.select(F.col("doc_id"),
      TextFunctions.shinglesUdf(5)(F.col("text")).as("sh"))
    val a = sh.select(F.col("doc_id").as("id_a"), F.col("sh").as("sa"))
    val b = sh.select(F.col("doc_id").as("id_b"), F.col("sh").as("sb"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("i", F.size(F.array_intersect($"sa", $"sb")))
      .withColumn("u", F.size(F.array_union($"sa", $"sb")))
      .filter($"i" >= $"u" * 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(found == exact, s"missing=${exact -- found} extra=${found -- exact}")
  }

  test("documents shorter than the shingle size are never near-duplicates") {
    // regression: empty shingle sets collide in every LSH band and
    // 0 >= 0*threshold used to pass verification, mass-deleting short docs
    val df = Seq(
      (1L, "abc"), (2L, "xyz"), (3L, "qq"),
      (4L, "a longer document body that shingles fine and repeats a longer document body"),
      (5L, "a longer document body that shingles fine and repeats a longer document bodX")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(df, "doc_id", "text", 5, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 <= 3 || p._2 <= 3),
      s"short docs must not pair: $pairs")
    assert(pairs.contains((4L, 5L)), "real near-dups still found")
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("dropNearDuplicates removes exactly the larger-id pair members") {
    val docs = sf("sf0.001", "documents")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", 5, 0.8)
      .select("id_b").as[Long].collect().toSet
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(kept == all -- pairs)
    assert(kept.size < all.size, "planted near-dups should be dropped")
  }

  test("minhashCandidates maxBucket cap filters flooded buckets") {
    val docs = sf("sf0.001", "documents")
    val shingled = docs.select(F.col("doc_id"),
      TextFunctions.shinglesUdf(5)(F.col("text")).as("sh"))
    val capped = Dedup.minhashCandidates(shingled, "doc_id", "sh",
      bands = 4, rowsPerBand = 1, maxBucket = 2)
    val uncapped = Dedup.minhashCandidates(shingled, "doc_id", "sh",
      bands = 4, rowsPerBand = 1)
    // 1-row bands collide wildly; the cap must strictly reduce pairs
    assert(capped.count() < uncapped.count())
  }

  test("incremental pairs vs a persisted signature index match the full-corpus pairs") {
    val docs = sf("sf0.001", "documents")
    val hist = docs.filter($"doc_id" % 3 =!= 0)
    val fresh = docs.filter($"doc_id" % 3 === 0)
    val path = java.nio.file.Files.createTempDirectory("sigidx").toString + "/idx"
    Dedup.saveSignatureIndex(
      Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8), path)
    val inc = Dedup.incrementalNearDuplicatePairs(
        fresh, Dedup.loadSignatureIndex(spark, path), hist,
        "doc_id", "text", 5, 0.8, 16, 8)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    // reference: full-corpus verified pairs restricted to cross-split
    val full = Dedup.nearDuplicatePairs(docs, "doc_id", "text", 5, 0.8, 16, 8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        if (a % 3 == 0 && b % 3 != 0) Some((a, b))
        else if (b % 3 == 0 && a % 3 != 0) Some((b, a))
        else None
      }.toSet
    assert(inc === full)
    assert(inc.nonEmpty)
    // the history side must not shuffle: new-batch buckets broadcast
    val plan = Dedup.incrementalNearDuplicatePairs(
      fresh, Dedup.loadSignatureIndex(spark, path), hist,
      "doc_id", "text", 5, 0.8, 16, 8).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("removeFromSavedIndex prunes a flat index exactly to the survivors") {
    val docs = sf("sf0.001", "documents")
    val hist = docs.filter($"doc_id" % 3 =!= 0)
    val path = java.nio.file.Files.createTempDirectory("sigidx_rm").toString + "/idx"
    Dedup.saveSignatureIndex(
      Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8), path)
    val doomed = hist.filter($"doc_id" % 2 === 0).select($"doc_id")
    val pruned = Dedup.removeFromSavedIndex(spark, path, doomed, "doc_id")
    // identical rows to an index built on the survivors (same geometry,
    // same per-doc signatures — banding is per-document)
    val rebuilt = Dedup.buildSignatureIndex(
      hist.filter($"doc_id" % 2 =!= 0), "doc_id", "text", 5, 16, 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("band", "bucket", "id").as[(Int, Long, Long)].collect().toSet
    assert(rows(pruned) === rows(rebuilt))
    assert(rows(pruned).nonEmpty)
    assert(!rows(pruned).exists(_._3 % 2 == 0))
  }

  test("a takedown crash between the temp write and the swap keeps the old index") {
    val docs = sf("sf0.001", "documents")
    val hist = docs.filter($"doc_id" % 3 =!= 0).limit(200)
    val path = java.nio.file.Files.createTempDirectory("sigidx_crash").toString + "/idx"
    Dedup.saveSignatureIndex(
      Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8), path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("band", "bucket", "id").as[(Int, Long, Long)].collect().toSet
    val before = rows(Dedup.loadSignatureIndex(spark, path))
    val doomed = hist.filter($"doc_id" % 2 === 0).select($"doc_id")
    final class Boom extends RuntimeException("crash before the swap")
    intercept[Boom](Dedup.removeFromSavedIndexImpl(spark, path, doomed,
      "doc_id", "id", () => throw new Boom))
    // the pruned rewrite sits in the orphaned temp dir; the live index
    // is byte-for-byte untouched and still loadable
    assert(rows(Dedup.loadSignatureIndex(spark, path)) === before)
    // re-running the takedown overwrites the orphan and completes
    val pruned = Dedup.removeFromSavedIndex(spark, path, doomed, "doc_id")
    assert(rows(pruned).nonEmpty)
    assert(!rows(pruned).exists(_._3 % 2 == 0))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__takedown")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__old")))
  }

  test("nearDuplicatePairs bucket cap bounds a boilerplate flood") {
    val boiler = "this exact boilerplate paragraph is repeated verbatim across the corpus many many times"
    val flood = (1L to 300L).map(i => (i, boiler))
    val normal = Seq(
      (1001L, "a genuinely unique document about alpha particles and detectors"),
      (1002L, "another unique document concerning beta decay chains entirely"),
      (1003L, "a longer document body that shingles fine and repeats a longer document body"),
      (1004L, "a longer document body that shingles fine and repeats a longer document bodX"))
    val df = (flood ++ normal).toDF("doc_id", "text")
    val capped = Dedup.nearDuplicatePairs(df, "doc_id", "text", 5, 0.8, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(_._1 <= 300L), s"flooded bucket must be dropped, not exploded: $capped")
    assert(capped == Set((1003L, 1004L)), "pairs outside the flooded bucket survive")
    val uncapped = Dedup.nearDuplicatePairs(df, "doc_id", "text", 5, 0.8, maxBucket = 0)
    assert(uncapped.count() == 300L * 299 / 2 + 1, "uncapped flood emits all m^2/2 pairs")
    // dropNearDuplicates threads the cap through: flood survives intact
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text", 5, 0.8, maxBucket = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.count(_ <= 300L) == 300, "capped flood rows are not deduped")
    assert(!kept.contains(1004L) && kept.contains(1003L))
  }

  test("simhashPairs bucket cap bounds an identical-signature flood") {
    val boiler = "this exact boilerplate paragraph is repeated verbatim across the corpus many many times"
    val flood = (1L to 300L).map(i => (i, boiler))
    // near-dup docs drawn from real test data so the non-flood pair set
    // is non-trivial (one-char synthetic edits flip too many simhash bits)
    val normal = sf("sf0.001", "documents")
      .select(F.col("doc_id") + 100000L, F.col("text"))
    val df = flood.toDF("doc_id", "text").union(normal)
    val capped = Dedup.simhashPairs(df, "doc_id", "text", 6, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(_._1 <= 300L), s"flooded buckets must be dropped: $capped")
    val uncapped = Dedup.simhashPairs(df, "doc_id", "text", 6, maxBucket = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count(_._1 <= 300L) == 300 * 299 / 2,
      "uncapped flood emits all m^2/2 pairs")
    val uncappedNonFlood = uncapped.filter(_._1 > 300L)
    assert(uncappedNonFlood.nonEmpty, "test data should contain simhash pairs")
    assert(capped == uncappedNonFlood,
      "capping removes exactly the flood-bucket pairs")
  }

  test("embeddingNearDuplicatePairs bucket cap bounds identical-vector floods") {
    val vec = Array.tabulate(8)(i => i.toFloat + 1f)
    val other = Array.tabulate(8)(i => (7 - i).toFloat - 3.5f)
    val flood = (1L to 300L).map(i => (i, vec))
    val pair = Seq((1001L, other), (1002L, other))
    val df = (flood ++ pair).toDF("id", "vec")
    val capped = Dedup.embeddingNearDuplicatePairs(df, "id", "vec", 0.99, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(_._1 <= 300L), s"flooded buckets must be dropped: $capped")
    assert(capped == Set((1001L, 1002L)), "small buckets still pair")
    val uncapped = Dedup.embeddingNearDuplicatePairs(df, "id", "vec", 0.99, maxBucket = 0)
    assert(uncapped.count() == 300L * 299 / 2 + 1)
  }

  test("simhash pairs cover the high-jaccard planted pairs") {
    val docs = sf("sf0.001", "documents")
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val jac = Dedup.nearDuplicatePairs(docs, "doc_id", "text", 5, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(jac.nonEmpty)
    val recall = jac.intersect(sim).size.toDouble / jac.size
    assert(recall >= 0.9, s"simhash recall=$recall over ${jac.size} pairs")
  }

  test("cdcSpans: exact cover, size bounds, deterministic, shift-realigning") {
    val rnd = new scala.util.Random(5)
    val t = Seq.fill(120)("w" + rnd.nextInt(500)).mkString(" ")
    val spans = Dedup.cdcSpans(t, 16, 32, 128)
    // exact cover, in order
    assert(spans.head._1 === 0 && spans.last._2 === t.length)
    spans.sliding(2).foreach { case Array(a, b) => assert(a._2 === b._1); case _ => }
    // bounds: every chunk <= max; every non-final chunk >= min
    spans.foreach { case (a, b, _) => assert(b - a <= 128) }
    spans.dropRight(1).foreach { case (a, b, _) => assert(b - a >= 16) }
    assert(Dedup.cdcSpans(t, 16, 32, 128).toSeq === spans.toSeq)
    // THE CDC property: an inserted prefix re-aligns within ~one chunk —
    // most chunk contents survive the shift (a fixed grid would lose all)
    val shifted = "THE INSERTED PREFIX CHANGES EVERYTHING UP FRONT " + t
    val h1 = spans.map(_._3).toSet
    val h2 = Dedup.cdcSpans(shifted, 16, 32, 128).map(_._3).toSet
    val kept = h1.intersect(h2).size.toDouble / h1.size
    assert(kept >= 0.7, s"only ${kept * 100}% of chunks survived the shift")
    // degenerate inputs
    assert(Dedup.cdcSpans("", 16, 32, 128).isEmpty)
    assert(Dedup.cdcSpans("ab", 16, 32, 128).toSeq
      === Seq((0, 2, Dedup.cdcSpans("ab", 16, 32, 128).head._3)))
  }

  test("bucket-cap drops are observable: chunk/hamming cap reports exact on a planted flood") {
    // CDC: short texts are single chunks — 9 identical docs flood one
    // bucket past cap 8; 2 docs share a second (under-cap) bucket
    val flood = (1L to 9L).map(i => (i, "tiny shared boilerplate"))
    val pairOk = Seq((21L, "another tiny body"), (22L, "another tiny body"))
    val docs = (flood ++ pairOk).toDF("doc_id", "text")
    val rep = Dedup.chunkCapReport(docs, "doc_id", "text", maxBucket = 8)
      .as[(Long, Long, Long)].head()
    assert(rep === ((1L, 36L, 9L))) // one bucket of 9 -> 9*8/2 pairs forgone
    // the capped pair query still yields exactly the under-cap pair
    val pairs = Dedup.chunkOverlapPairs(docs, "doc_id", "text",
      minShared = 1, maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((21L, 22L)))
    // nothing over the cap -> empty-ish report (0 buckets, 0 pairs)
    val clean = Dedup.chunkCapReport(docs, "doc_id", "text", maxBucket = 64)
      .as[(Long, Long, Long)].head()
    assert(clean === ((0L, 0L, 0L)))

    // Hamming: 6 identical signatures collide in ALL 8 band buckets
    val sigs = ((1L to 6L).map(i => (i, 42L)) ++ Seq((11L, -1L), (12L, -1L)))
      .toDF("id", "sig")
    val hrep = Dedup.hammingCapReport(sigs, "id", "sig",
      bands = 8, maxBucket = 4).as[(Long, Long, Long)].head()
    assert(hrep === ((8L, 8L * 15L, 6L))) // 8 buckets of 6, 15 pairs each
    val hp = Dedup.hammingPairs(sigs, "id", "sig",
      maxHamming = 6, bands = 8, maxBucket = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(hp === Set((11L, 12L)))
  }

  test("cdcChunks/duplicateChunks/chunkOverlapPairs find planted partial overlaps") {
    val docs = sf("sf0.001", "documents")
      .filter(F.col("text").isNotNull && F.col("n_chars") >= 400)
      .select(F.col("doc_id"), F.col("text"))
    // plant: B = new intro + the body of A from char 60 on
    val planted = docs.unionByName(docs.select(
      (F.col("doc_id") + 1000000L).as("doc_id"),
      F.concat(F.lit("a freshly rewritten introduction that shares nothing "),
        F.expr("substring(text, 60)")).as("text")))
    val chunks = Dedup.cdcChunks(planted, "doc_id", "text",
      minSize = 16, avgSize = 32, maxSize = 128)
    // chunks reconstruct every document exactly
    val rebuilt = chunks
      .groupBy("id")
      .agg(F.sum(F.col("len")).as("__sum"), F.max(F.col("start") + F.col("len")).as("__end"))
      .join(planted.select(F.col("doc_id").as("id"),
        F.length(F.col("text")).as("__n")), "id")
      .filter(F.col("__sum") =!= F.col("__n") || F.col("__end") =!= F.col("__n"))
    assert(rebuilt.isEmpty, "chunk spans do not cover some document")
    // every planted pair shares interior chunks of the common body
    val pairs = Dedup.chunkOverlapPairs(planted, "doc_id", "text",
      minShared = 2, minSize = 16, avgSize = 32, maxSize = 128)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expectedPairs = docs.select("doc_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    val found = expectedPairs.count(pairs.contains).toDouble / expectedPairs.size
    assert(found >= 0.95, s"only ${found * 100}% of planted pairs found")
    // duplicateChunks sees the shared bodies
    val dup = Dedup.duplicateChunks(planted, "doc_id", "text",
      minSize = 16, avgSize = 32, maxSize = 128)
    assert(dup.filter(F.col("n_docs") >= 2).count() > 0)
    // and the UNPLANTED corpus pairs stay (near) empty — CDC does not
    // hallucinate overlap between unrelated documents
    val natural = pairs.filterNot(p => expectedPairs.contains(p))
      .count { case (a, b) => a < 1000000L && b < 1000000L }
    assert(natural <= expectedPairs.size / 10, s"$natural natural pairs")

    // incremental form: history indexed once, the twins arrive as a
    // batch — pairs equal the self-join restricted to cross pairs
    val idxPath = java.nio.file.Files.createTempDirectory("graft_cdc_idx").toString
    Dedup.saveSignatureIndex(
      Dedup.buildChunkIndex(docs, "doc_id", "text",
        minSize = 16, avgSize = 32, maxSize = 128), idxPath)
    val batch = planted.filter(F.col("doc_id") >= 1000000L)
    val inc = Dedup.incrementalChunkOverlap(batch,
        Dedup.loadSignatureIndex(spark, idxPath), "doc_id", "text",
        minShared = 2, minSize = 16, avgSize = 32, maxSize = 128)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    // every planted twin probes its original out of the index
    val plantedHit = expectedPairs.count { case (orig, twin) =>
      inc.contains((twin, orig)) }
    assert(plantedHit >= (expectedPairs.size * 95) / 100,
      s"only $plantedHit/${expectedPairs.size} planted twins found")
    // non-planted hits = DIRECTED natural overlap (each undirected
    // natural pair from the self-join form can appear twice here:
    // B_i -> A_j and B_j -> A_i), so the bound is twice the
    // q_dedup_cdc natural bound plus slack
    val junk = inc.count { case (nw, old) => old != nw - 1000000L }
    assert(junk <= expectedPairs.size / 4, s"$junk junk pairs")
  }
}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("bruteForceTopK: self excluded, ranks contiguous, cosine sane") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 3)
    val out = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect()
    assert(out.length == 15)
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"))
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    val ranks = out.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Int]("rank")).sorted
    assert(ranks.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("ivfTopK achieves reasonable recall vs brute force") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("lshTopK achieves reasonable recall vs brute force") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5, 12, 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("mineMarginPairs matches a driver-side reference and suppresses hubs") {
    val session = spark
    import session.implicits._
    val emb = sf("sf0.001", "embeddings")
    val a = emb.filter($"vec_id" < 8)
    val b = emb.filter($"vec_id" >= 8 && $"vec_id" < 80)
    val got = Similarity.mineMarginPairs(a, b, "vec_id", "embedding", k = 3, kAvg = 4)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

    // driver-side reference
    def vecs(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i) }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val av = vecs(a); val bv = vecs(b)
    val all = for ((ai, ax) <- av; (bi, bx) <- bv) yield (ai, bi, cos(ax, bx))
    val avgA = all.groupBy(_._1).view.mapValues(
      _.sortBy(t => (-t._3, t._2)).take(4).map(_._3).sum / 4.0).toMap
    val avgB = all.groupBy(_._2).view.mapValues(
      _.sortBy(t => (-t._3, t._1)).take(4).map(_._3).sum / 4.0).toMap
    val expect = all.groupBy(_._1).toSeq.flatMap { case (ai, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map {
        case ((_, bi, c), i) =>
          (ai, bi) -> ((i + 1L, c, c / ((avgA(ai) + avgB(bi)) / 2.0)))
      }
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, (r, c, m)) =>
      val (gr, gc, gm) = got(k)
      assert(gr === r, s"rank at $k")
      assert(math.abs(gc - c) < 1e-9 && math.abs(gm - m) < 1e-9, s"values at $k")
    }

    // hub suppression: a synthetic hub close to every query scores a
    // LOWER margin than a planted exact copy, despite high cosine
    val hubData =
      (0 until 4).map(i => (i.toLong, Array.tabulate(8)(d => if (d == i * 2) 1.0f else 0.0f))) :+
      (100L, Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f)) :+ // exact copy of a0
      (101L, Array.fill(8)(0.5f))                                   // hub
    val hd = hubData.toDF("vec_id", "embedding")
    val ha = hd.filter($"vec_id" < 4)
    val hb = hd.filter($"vec_id" >= 100)
    val hm = Similarity.mineMarginPairs(ha, hb, "vec_id", "embedding", k = 2, kAvg = 2)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(hm((0L, 100L)) > hm((0L, 101L)), s"copy must out-margin the hub: $hm")
    // the hub pairs with every other query too, at margin ~1 (its own
    // neighborhood average IS its similarity level)
    (1L to 3L).foreach { q => assert(hm((q, 101L)) < hm((0L, 100L))) }
  }

  test("mineMarginPairsIndexed ≡ exact under full probing, finds planted twins, no cartesian") {
    val session = spark
    import session.implicits._
    val emb = sf("sf0.001", "embeddings")
    val a = emb.filter($"vec_id" < 8)
    val b = emb.filter($"vec_id" >= 8 && $"vec_id" < 80)
    val exact = Similarity.mineMarginPairs(a, b, "vec_id", "embedding", k = 3, kAvg = 4)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val ai = Similarity.buildIvfIndex(a, "vec_id", "embedding", nlist = 4, iterations = 2)
    val bi = Similarity.buildIvfIndex(b, "vec_id", "embedding", nlist = 8, iterations = 2)
    val idx = Similarity.mineMarginPairsIndexed(ai, bi, k = 3, kAvg = 4,
      nprobe = 4, probeMass = 1.0)
    // the whole point of the indexed form: cell hash joins, never a
    // cartesian product or a corpus broadcast-nested-loop
    val planStr = idx.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct"), "cartesian in plan")
    assert(!planStr.contains("BroadcastNestedLoop"), "nested-loop join in plan")
    // full probing (mass 1.0) must reproduce the exact form row-for-row
    val got = idx.as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.keySet === exact.keySet)
    exact.foreach { case (key, (r, c, m)) =>
      val (gr, gc, gm) = got(key)
      assert(gr === r, s"rank at $key")
      assert(math.abs(gc - c) < 1e-9 && math.abs(gm - m) < 1e-9, s"values at $key")
    }
    // partial probing still finds planted exact copies deterministically:
    // identical vectors co-cluster regardless of centroid training, so
    // the twin's cell is always the first probed
    val bNat = emb.filter($"vec_id" >= 24)
    val aPlanted = emb.filter($"vec_id".between(24, 35))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val mined = Similarity.mineMarginPairsAuto(aPlanted, bNat, "vec_id", "embedding",
        k = 1, kAvg = 4, probeMass = 0.45)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(mined.length === 12)
    mined.foreach { case (aId, bId, rank, c, m) =>
      assert(bId === aId - 10000L, s"rank-1 of $aId must be its twin")
      assert(rank === 1L)
      assert(c > 0.9999, s"twin cos $c")
      assert(m >= 1.0 - 1e-9, s"twin margin $m")
    }
  }

  test("scale-aware ANN sizing: nlist ~ sqrt(n), planes hold bucket occupancy") {
    assert(Similarity.ivfNlistFor(0L) === 16)
    assert(Similarity.ivfNlistFor(2000L) === 45)
    assert(Similarity.ivfNlistFor(100000000L) === 4096)       // clamped
    assert(Similarity.lshPlanesFor(500L) === 4)               // log2(15.6) clamped up
    assert(Similarity.lshPlanesFor(2000L) === 6)              // log2(62.5)
    assert(Similarity.lshPlanesFor(2048L * 32) === 11)
    assert(Similarity.lshPlanesFor(Long.MaxValue) === 24)     // signature cap
  }

  test("mass-adaptive probing covers the requested corpus fraction per query") {
    val cs = Array(Array(0f, 0f), Array(10f, 0f), Array(0f, 10f), Array(10f, 10f))
    val sizes = Array(10L, 60L, 20L, 10L)                     // total 100
    // query near cell 0: distance order 0 (10), then 1/2 (60/20), then 3
    val got = Similarity.nearestCentroidsByMass(cs, sizes, 100L,
      Array(1f, 0f), minProbe = 1, mass = 0.5)
    assert(got.head === 0)
    val mass = got.map(sizes(_)).sum
    assert(mass >= 50L, s"cells $got cover $mass < 50")
    // minProbe wins when the first cell already covers the mass
    assert(Similarity.nearestCentroidsByMass(cs, Array(100L, 0L, 0L, 0L), 100L,
      Array(1f, 0f), minProbe = 3, mass = 0.1).length === 3)
  }

  test("auto ANN forms hold the bench recall floors on the real corpus") {
    // same floors Bench pins at the benched SF (ivf 0.6, lsh 0.7)
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopKAuto(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopKAuto(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfR = exact.intersect(ivf).size.toDouble / exact.size
    val lshR = exact.intersect(lsh).size.toDouble / exact.size
    assert(ivfR >= 0.6, s"ivf auto recall=$ivfR")
    assert(lshR >= 0.7, s"lsh auto recall=$lshR")
  }
}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media pipeline: schema, deterministic stub features, batch shape") {
    val docs = sf("sf0.001", "documents")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.feature.length == 8)
      assert(f.width >= 64 && f.height >= 64)
      assert(f.payload_bytes > 0)
    }
    // determinism: second run bit-identical
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall {
      case (x, y) => x.feature.toSeq == y.feature.toSeq && x.width == y.width
    })
    // payload bytes round-trip: equals n_chars for ASCII text
    val total = feats.agg(F.sum("payload_bytes")).as[Long].collect().head
    val chars = docs.agg(F.sum("n_chars")).as[Long].collect().head
    assert(total == chars)
  }

  test("imageForDHash plants an exact dHash through the PNG round trip") {
    val hashes = Seq(0L, -1L, 0x123456789ABCDEFL,
      TextFunctions.mix64(42L), TextFunctions.mix64(-7L))
    hashes.foreach { h =>
      assert(Multimodal.imageDHash(Multimodal.imageForDHash(h)) === Some(h))
    }
    assert(Multimodal.imageDHash(Array.empty[Byte]) === None)
    assert(Multimodal.imageDHash("not an image".getBytes) === None)
  }

  test("aHash/dHash: brightness-shifted copies collide, distinct images diverge") {
    def gradient(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v0 = 40 + (x * 2 + (y / 16) * 30) % 180 + shift
        val v = math.max(0, math.min(255, v0))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val base = Multimodal.imageDHash(gradient(0)).get
    val bright = Multimodal.imageDHash(gradient(5)).get
    // dHash compares neighbors: a uniform brightness shift is invisible
    assert(java.lang.Long.bitCount(base ^ bright) <= 4)
    val other = Multimodal.imageDHash(
      Multimodal.imageForDHash(TextFunctions.mix64(99L))).get
    assert(java.lang.Long.bitCount(base ^ other) > 10)
    // aHash on the same pair
    val a0 = Multimodal.imageAHash(gradient(0)).get
    val a5 = Multimodal.imageAHash(gradient(5)).get
    assert(java.lang.Long.bitCount(a0 ^ a5) <= 6)
  }

  test("videoDHash: exact-copy videos collide at hamming 0") {
    val f1 = {
      val out = new java.io.ByteArrayOutputStream()
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (x * 8) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val v1 = Multimodal.mjpegAvi(Seq(f1, f1), 32, 32)
    val v2 = Multimodal.mjpegAvi(Seq(f1), 32, 32) // re-containered copy
    val h1 = Multimodal.videoDHash(v1)
    val h2 = Multimodal.videoDHash(v2)
    assert(h1.isDefined && h1 === h2)
    assert(Multimodal.videoDHash("junk".getBytes) === None)
  }

  test("wavForFingerprint plants an exact audio fingerprint; gain-invariant") {
    val hashes = Seq(0L, -1L, 0x0F0F0F0F12345678L, TextFunctions.mix64(11L))
    hashes.foreach { h =>
      assert(Multimodal.audioFingerprint(Multimodal.wavForFingerprint(h)) === Some(h))
    }
    // uniform gain scaling cancels in every bit (all bits are ratios)
    val base = Multimodal.wavForFingerprint(TextFunctions.mix64(5L))
    def scaled(wav: Array[Byte], gain: Double): Array[Byte] = {
      val out = wav.clone()
      var off = 44
      while (off + 1 < out.length) {
        val raw = ((out(off + 1) << 8) | (out(off) & 0xFF)).toShort
        val v = math.max(-32768, math.min(32767, math.round(raw * gain))).toInt
        out(off) = (v & 0xFF).toByte
        out(off + 1) = ((v >> 8) & 0xFF).toByte
        off += 2
      }
      out
    }
    val h0 = Multimodal.audioFingerprint(base)
    assert(Multimodal.audioFingerprint(scaled(base, 0.5)) === h0)
    assert(Multimodal.audioFingerprint(scaled(base, 1.7)) === h0)
    // malformed / too-short payloads yield None
    assert(Multimodal.audioFingerprint("junk".getBytes) === None)
    assert(Multimodal.audioFingerprint(
      Multimodal.pcmWav(Array.fill[Byte](16)(1), 8000)) === None)
  }

  test("nearDuplicateMedia finds planted audio groups through the dispatch") {
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
      .filter(F.col("doc_id") < 120)
    val media = Multimodal.plantedNearDupAudio(docs, "doc_id")
    val pairs = Multimodal.nearDuplicateMedia(media, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val expected = (0L until 120L).groupBy(_ / 3).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield {
        val d = (s(i) % 3, s(j) % 3) match {
          case (0, 1) => 1
          case (0, 2) => 4
          case _      => 5
        }
        (s(i), s(j), d)
      }
    }.toSet
    assert(pairs === expected)
  }

  test("incremental media dedup: batch probes a persisted index, history never re-hashed") {
    // history = variants 0/1, fresh batch = variant 2: expected pairs
    // are exactly (v2, v0, 4) and (v2, v1, 5) per complete group
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
    val hist = Multimodal.plantedNearDupMedia(
      docs.filter(F.col("doc_id") % 3 =!= 2), "doc_id")
    val batch = Multimodal.plantedNearDupMedia(
      docs.filter(F.col("doc_id") % 3 === 2), "doc_id")
    val path = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    Dedup.saveSignatureIndex(Multimodal.buildMediaHashIndex(hist), path)
    val idx = Dedup.loadSignatureIndex(spark, path)
    val pairs = Multimodal.incrementalNearDuplicateMedia(batch, idx, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val expected = (0L until 500L).filter(_ % 3 == 2).flatMap { v2 =>
      Seq((v2, v2 - 2, 4), (v2, v2 - 1, 5))
    }.toSet
    assert(pairs === expected)
    // probe ≡ full rebuild on the union (restricted to cross pairs)
    val full = Multimodal.nearDuplicateMedia(
        Multimodal.plantedNearDupMedia(docs, "doc_id"), maxHamming = 6)
      .as[(Long, Long, Int)].collect()
      .filter { case (a, b, _) => a % 3 == 2 || b % 3 == 2 }
      .map { case (a, b, h) => if (a % 3 == 2) (a, b, h) else (b, a, h) }
      .filter(_._1 % 3 == 2).toSet
    assert(pairs === full.filter { case (_, o, _) => o % 3 != 2 })
  }

  test("nearDuplicateMedia finds exactly the planted groups with exact hammings") {
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
    val media = Multimodal.plantedNearDupMedia(docs, "doc_id")
    val pairs = Multimodal.nearDuplicateMedia(media, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val expected = (0L until 500L).groupBy(_ / 3).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield {
        val d = (s(i) % 3, s(j) % 3) match {
          case (0, 1) => 1
          case (0, 2) => 4
          case _      => 5
        }
        (s(i), s(j), d)
      }
    }.toSet
    assert(pairs === expected)
    // greedy keep-first: the group minimum survives
    val kept = Multimodal.dropNearDuplicateMedia(media, 6)
      .select("media_id").as[Long].collect().toSet
    assert(kept === (0L until 500L).filter(_ % 3 == 0).toSet)
  }

  test("pHash: offset and contrast changes are exactly invariant, dedup finds planted groups") {
    def gradient(offset: Int, scale: Double): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v0 = 60 + (x * 2 + (y / 16) * 25) % 140
        val v = math.max(0, math.min(255,
          (128 + (v0 - 128) * scale).round.toInt + offset))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val base = Multimodal.imagePHash(gradient(0, 1.0)).get
    // brightness offset touches only DC — all 64 AC signs identical
    assert(Multimodal.imagePHash(gradient(7, 1.0)).get === base)
    // positive contrast scaling scales every coefficient: signs hold
    // (up to the integer-rounding of the scaled pixels)
    val scaled = Multimodal.imagePHash(gradient(0, 0.75)).get
    assert(java.lang.Long.bitCount(base ^ scaled) <= 3)
    val other = Multimodal.imagePHash(Multimodal.imageForPHash(
      TextFunctions.mix64(123L))).get
    assert(java.lang.Long.bitCount(base ^ other) > 10)
    // planted pHash fixtures ride the same banded dedup unchanged
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
    val media = Multimodal.plantedNearDupMedia(docs, "doc_id", phash = true)
    val sigs = Multimodal.imageSignatures(media)
    val pairs = graft.pipeline.Dedup
      .hammingPairs(sigs, "media_id", "phash", maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val expected = (0L until 500L).groupBy(_ / 3).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield {
        val d = (s(i) % 3, s(j) % 3) match {
          case (0, 1) => 1
          case (0, 2) => 4
          case _      => 5
        }
        (s(i), s(j), d)
      }
    }.toSet
    assert(pairs === expected)
  }

  test("nearDuplicateVideos catches trimmed re-cuts that first-frame dHash misses") {
    val session = spark
    import session.implicits._
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
      .filter(F.col("doc_id") < 40)
    val media = Multimodal.plantedTrimmedVideos(docs, "doc_id")
    // multi-keyframe: every trimmed pair surfaces at its closest-frame
    // distance (exactly 1 by construction)
    val multi = Multimodal.nearDuplicateVideos(media, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val expected = (0L until 40L by 2).map(a => (a, a + 1, 1)).toSet
    assert(multi === expected)
    // first-keyframe-only signatures compare the dropped lead frame
    // against the survivor: nothing within the threshold
    val single = Multimodal.nearDuplicateMedia(media, maxHamming = 6)
    assert(single.count() === 0L)
    // a bounded frame budget still catches the pair from the shared tail
    val capped = Multimodal.nearDuplicateVideos(media, maxHamming = 6, maxFrames = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped === expected)
  }

  test("alignmentScores/filterAligned: cosine pairing, NULL discipline, map-only") {
    val pairs = Seq(
      (1L, Array(1f, 0f, 0f), Array(2f, 0f, 0f)),    // parallel → 1
      (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),    // orthogonal → 0
      (3L, Array(1f, 0f, 0f), Array(-1f, 0f, 0f)),   // opposite → -1
      (4L, Array(1f, 0f, 0f), null.asInstanceOf[Array[Float]]),
      (5L, null.asInstanceOf[Array[Float]], Array(1f, 0f, 0f)))
      .toDF("id", "img", "txt")
    val scored = Multimodal.alignmentScores(pairs, "img", "txt")
      .select("id", "alignment")
      .as[(Long, Option[Double])].collect().toMap
    assert(math.abs(scored(1L).get - 1.0) < 1e-12)
    assert(math.abs(scored(2L).get) < 1e-12)
    assert(math.abs(scored(3L).get + 1.0) < 1e-12)
    assert(scored(4L).isEmpty && scored(5L).isEmpty)
    val kept = Multimodal.filterAligned(pairs, "img", "txt", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L))
    // map-only: no exchange on a real corpus-sized pairing
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
      .select(F.col("vec_id"), F.col("embedding").as("img"),
        F.col("embedding").as("txt"))
    val plan = Multimodal.filterAligned(emb, "img", "txt", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
