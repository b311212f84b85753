package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat", "the dog sat", "the cat ran").toDF("text")

  test("buildVocabulary ranks by count desc then token asc") {
    val v = Vocab.buildVocabulary(docs, F.col("text"), 3)
      .as[(String, Long)].collect().toSeq
    // the:3, cat:2, sat:2 — cat beats sat on the tie alphabetically
    assert(v === Seq(("the", 3L), ("cat", 2L), ("sat", 2L)))
  }

  test("oovStats counts the mass outside the vocabulary") {
    val v = Vocab.buildVocabulary(docs, F.col("text"), 3)
    val (total, oov, size) = Vocab.oovStats(docs, F.col("text"), v)
      .as[(Long, Long, Long)].head()
    assert(total === 9L)
    assert(oov === 2L)     // dog, ran
    assert(size === 3L)
  }

  test("topDistinctiveTerms ranks by tf/df with term tiebreak, map-only scoring") {
    val d = Seq(
      (1L, "cat cat cat shared shared unique1"),
      (2L, "dog dog shared unique2 unique2 unique2"),
      (3L, "shared other"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Vocab.topDistinctiveTerms(d, "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: cat tf=3 df=1 → 3.0; unique1 1/1=1.0; shared 2/3≈0.67
    assert(out(1L) === Seq((1L, 1L, "cat", 3L, 1L), (1L, 2L, "unique1", 1L, 1L)))
    // doc 2: unique2 3/1=3.0; dog 2/1=2.0
    assert(out(2L) === Seq((2L, 1L, "unique2", 3L, 1L), (2L, 2L, "dog", 2L, 1L)))
    // doc 3: other 1/1=1.0 beats shared 1/3; ties impossible here
    assert(out(3L).head._3 === "other")
    assert(!out.contains(4L))                       // NULL text → no rows

    // tf/df tie breaks by term ASC: both terms 1/1
    val tie = Vocab.topDistinctiveTerms(
      Seq((9L, "zebra apple")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._2)
    assert(tie.map(_._3).toSeq === Seq("apple", "zebra"))

    // scoring pass is map-only: one exchange total (the df aggregate
    // runs at collect time, not in the scoring plan)
    val plan = Vocab.topDistinctiveTerms(d, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("unigramLogLoss scores documents by corpus-unigram cross-entropy") {
    val d = Seq((1L, "a a b"), (2L, "b"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Vocab.unigramLogLoss(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // counts: a=2, b=2, total=4 → every token -ln(1/2) = ln 2 ≈ 0.6931
    assert(out(1L) === ((3L, 0.6931)))
    assert(out(2L) === ((1L, 0.6931)))
    assert(!out.contains(3L) && !out.contains(4L))   // token-less docs omitted

    // rarer tokens score strictly higher
    val d2 = Seq((1L, "common common common common rare"), (2L, "common common"))
      .toDF("doc_id", "text")
    val s2 = Vocab.unigramLogLoss(d2, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s2(1L) > s2(2L))
  }

  test("perplexityPartition tiers a planted three-band corpus head/middle/tail") {
    // 20 docs of a very common token (lowest loss), 20 of mid-frequency
    // tokens, 20 of per-doc rare tokens (highest loss): tiers must
    // recover the construction
    val docs = (
      (0L until 20L).map(i => (i, Seq.fill(10)("common").mkString(" "))) ++
      (20L until 40L).map(i => (i, Seq.fill(5)(s"mid${i % 4}").mkString(" "))) ++
      (40L until 60L).map(i => (i, (0 until 10).map(j => s"rare_${i}_$j").mkString(" ")))
    ).toDF("doc_id", "text")
    val out = Vocab.perplexityPartition(docs, "doc_id", "text")
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(out.size == 60)
    (0L until 20L).foreach(i => assert(out(i) == "head", s"doc $i: ${out(i)}"))
    (20L until 40L).foreach(i => assert(out(i) == "middle", s"doc $i: ${out(i)}"))
    (40L until 60L).foreach(i => assert(out(i) == "tail", s"doc $i: ${out(i)}"))
  }

  /** Independent in-memory BPE reference: plain Scala over a
    * word-count map, no Spark, written from the algorithm definition. */
  private def refBpe(wordCounts: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      w.map(_.toString).toVector -> c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < k && !stop) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sym, c) =>
        sym.iterator.zip(sym.iterator.drop(1)).foreach { p =>
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
        }
      }
      if (pairCounts.isEmpty) stop = true
      else {
        val ((l, r), f) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, f))
        words = words.groupMapReduce { case (sym, _) =>
          val m = Vector.newBuilder[String]
          var j = 0
          while (j < sym.length) {
            if (j + 1 < sym.length && sym(j) == l && sym(j + 1) == r) { m += (l + r); j += 2 }
            else { m += sym(j); j += 1 }
          }
          m.result()
        }(_._2)(_ + _)
        i += 1
      }
    }
    out.toSeq
  }

  test("learnBpeMerges matches an independent reference implementation") {
    val corpus = Seq("low low low lower lower newest newest newest newest widest widest")
    val docs = corpus.toDF("text")
    val wordCounts = corpus.flatMap(_.split("\\s+")).filterNot(_.isEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(1, 3, 8)) {
      val got = Vocab.learnBpeMerges(docs, "text", k)
      val exp = refBpe(wordCounts, k)
      assert(got === exp, s"k=$k")
    }
    // the classic example: 'es' (from newest/widest, freq 6) merges first
    assert(Vocab.learnBpeMerges(docs, "text", 1).head._1 === "e")

    // and on the real corpus
    val real = sf("sf0.001", "documents")
    val realCounts = real.select(F.explode(F.filter(
        F.split(F.col("text"), "\\s+"), t => F.length(t) > 0)).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(Vocab.learnBpeMerges(real, "text", 5) === refBpe(realCounts, 5))
  }

  test("batched BPE: 256 merges in a bounded number of Spark jobs, still exact") {
    // 256 words over pairwise-disjoint 2-char alphabets with strictly
    // decreasing frequencies: every round's ranked pair list is fully
    // disjoint, so each round admits a full batch
    val words = Seq.tabulate(256) { i =>
      val w = "" + (0x4E00 + 2 * i).toChar + (0x4E00 + 2 * i + 1).toChar
      (w, 300 - i)
    }
    val docs = words.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
    val wordCounts = words.map { case (w, n) => (w, n.toLong) }.toMap

    spark.sparkContext.setJobGroup("bpe-batch-spec", "batched bpe")
    val (merges, rounds) = Vocab.learnBpeMergesBatched(
      docs, "text", 256, batchSize = 64, maxLocalWords = 0)
    val jobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("bpe-batch-spec").length
    spark.sparkContext.clearJobGroup()

    assert(merges === refBpe(wordCounts, 256))   // exactness at scale
    assert(merges.size === 256)
    assert(rounds <= 4, s"expected <= 4 pair-count rounds, got $rounds")
    assert(jobs <= 20, s"expected <= 20 Spark jobs for 256 merges, got $jobs")
  }

  test("batched BPE stays exact when frequent pairs share symbols and tie") {
    // heavy symbol sharing ('a' everywhere) + exact frequency ties:
    // the disjoint-prefix + strict-boundary trim must degrade toward
    // sequential behavior, never emit a wrong merge
    val corpus = Seq("aa aa aa ab ab ba ba ac ca aaa aab abc abab banana")
    val docs = corpus.toDF("text")
    val wordCounts = corpus.flatMap(_.split("\\s+")).filterNot(_.isEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (b <- Seq(1, 2, 4, 16); k <- Seq(1, 4, 10)) {
      val (got, _) =
        Vocab.learnBpeMergesBatched(docs, "text", k, b, maxLocalWords = 0)
      assert(got === refBpe(wordCounts, k), s"batchSize=$b k=$k")
    }
  }

  test("driver-local BPE fast path equals the distributed learner") {
    // same adversarial corpora as the batched tests: ties, shared
    // symbols, overlapping occurrences (aaa/abab/banana), plus the
    // real table — the incremental-heap local loop must match the
    // distributed rounds merge for merge
    val corpora = Seq(
      Seq("aa aa aa ab ab ba ba ac ca aaa aab abc abab banana"),
      Seq("low low low lower lower newest newest newest newest widest widest"))
    for (c <- corpora; k <- Seq(1, 4, 10, 16)) {
      val docs = c.toDF("text")
      val (local, lr) = Vocab.learnBpeMergesBatched(docs, "text", k, 32)
      val (dist, _) =
        Vocab.learnBpeMergesBatched(docs, "text", k, 32, maxLocalWords = 0)
      assert(lr === 0, "small corpus must take the local path")
      assert(local === dist, s"corpus=${c.head.take(20)} k=$k")
    }
    val real = sf("sf0.001", "documents")
    val (local, _) = Vocab.learnBpeMergesBatched(real, "text", 24, 32)
    val (dist, _) =
      Vocab.learnBpeMergesBatched(real, "text", 24, 32, maxLocalWords = 0)
    assert(local === dist)
  }

  test("pruned unigram model: hapaxes stay out of the broadcast, scores unchanged") {
    // heavy-tail corpus: 5 common tokens + 2000 hapaxes
    val common = Seq.fill(200)("the quick brown fox jumps").mkString(" ")
    val hapaxes = Seq.tabulate(2000)(i => s"hapax$i").grouped(50)
      .map(_.mkString(" ")).toSeq
    val docs = ((common +: hapaxes).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")

    val (countMap, total) = Vocab.prunedUnigramModel(docs, "text")
    assert(countMap.size === 5)                  // only the non-hapax tokens
    assert(countMap.values.forall(_ >= 2L))
    assert(total === (200 * 5 + 2000).toDouble)  // total counts EVERY occurrence

    // scores must equal the unpruned full-map computation
    val fullMap = docs.select(F.explode(F.filter(
        F.split(F.col("text"), "\\s+"), t => F.length(t) > 0)).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val got = Vocab.unigramLogLoss(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    docs.as[(Long, String)].collect().foreach { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val exp = BigDecimal(toks.map(w =>
          -math.log(fullMap.getOrElse(w, 1L).toDouble / total)).sum / toks.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === ((toks.length.toLong, exp)), s"doc $id")
    }
  }

  test("bigramLogLoss scores fluency against corpus bigram statistics") {
    // "a b" always follows the pattern; doc 3 is the same words scrambled
    val d = Seq(
      (1L, "a b c a b c a b c"), (2L, "a b c a b c"),
      (3L, "c a c b b a"), (4L, "solo"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Vocab.bigramLogLoss(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === 8L)
    assert(!out.contains(4L) && !out.contains(5L))   // <2 tokens → omitted
    // scrambled word salad scores strictly worse than the fluent docs
    assert(out(3L)._2 > out(1L)._2 && out(3L)._2 > out(2L)._2)

    // the join-based form reproduces the sequential reference exactly
    // (4-dp rounding absorbs groupBy summation-order noise)
    val full = {
      val toks = (t: String) => t.split("\\s+").filter(_.nonEmpty)
      val all = d.as[(Long, Option[String])].collect()
        .collect { case (id, Some(t)) => id -> toks(t) }
      val bgs = all.flatMap(_._2.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      val cb = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val cl = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      all.filter(_._2.length >= 2).map { case (id, w) =>
        val pairs = w.sliding(2).filter(_.length == 2).toSeq
        val s = pairs.map(p => -math.log(
          cb((p(0), p(1))).toDouble / cl(p(0)).toDouble)).sum
        id -> BigDecimal(s / pairs.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    full.foreach { case (id, exp) => assert(out(id)._2 === exp, s"doc $id") }
  }

  test("bigramLogLoss is join-based: no driver-collected model in the plan") {
    // the bigram model must stay distributed (non-hapax bigram types
    // grow near-linearly with corpus size, so a broadcast map is an
    // unbounded driver footprint) — pin the scoring joins and the
    // absence of any collected-literal table in the plan
    val d = sf("sf0.001", "documents")
    val plan = Vocab.bigramLogLoss(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-side model table in plan:\n$plan")
    assert("Join".r.findAllIn(plan).length >= 2,
      s"expected the two scoring joins, plan:\n$plan")
  }

  test("topDistinctiveTermsJoined equals the broadcast form row-for-row, join-based plan") {
    val d = Seq(
      (1L, "cat cat cat shared shared unique1"),
      (2L, "dog dog shared unique2 unique2 unique2"),
      (3L, "shared other"),
      (4L, null.asInstanceOf[String]),
      (9L, "zebra apple"))                       // score tie → term ASC
      .toDF("doc_id", "text")
    val bcast = Vocab.topDistinctiveTerms(d, "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val joined = Vocab.topDistinctiveTermsJoined(d, "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(joined === bcast)

    // and on a real corpus slice (hapax default-df path exercised at volume)
    val real = sf("sf0.001", "documents")
    val b2 = Vocab.topDistinctiveTerms(real, "doc_id", "text", 3)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val j2 = Vocab.topDistinctiveTermsJoined(real, "doc_id", "text", 3)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(j2 === b2)

    // no driver-collected df map in the plan — the scale form collects
    // nothing (plan over the parquet corpus: a Seq fixture is itself a
    // LocalTableScan)
    val plan = Vocab.topDistinctiveTermsJoined(real, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-side model table in plan:\n$plan")
    assert(plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("unigramLogLossJoined equals the broadcast form at the 4-dp contract") {
    val d = Seq(
      (1L, "a a b"), (2L, "b"), (3L, ""), (4L, null.asInstanceOf[String]),
      (5L, "hapax a b b a"))
      .toDF("doc_id", "text")
    val bcast = Vocab.unigramLogLoss(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val joined = Vocab.unigramLogLossJoined(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(joined === bcast)
    assert(!joined.contains(3L) && !joined.contains(4L))

    // full-corpus equality at sf0.001 (summation-order noise sits ~9
    // orders below the 4-dp rounding; same pin as bigramLogLoss)
    val real = sf("sf0.001", "documents")
    val b2 = Vocab.unigramLogLoss(real, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val j2 = Vocab.unigramLogLossJoined(real, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(j2 === b2)

    // nothing collected in the scoring plan (parquet corpus — a Seq
    // fixture is itself a LocalTableScan)
    val plan = Vocab.unigramLogLossJoined(real, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-side model table in plan:\n$plan")
    assert(plan.contains("Join"), plan)
  }

  test("applyBpeRanked is equivalent to sequential applyBpe, at any merge-table size") {
    // tricky corpora: self-pairs, chained merges, shared symbols
    val corpora = Seq(
      Seq("aaaa aaa aa banana bandana abab abc"),
      Seq("low low low lower lower newest newest newest newest widest widest"))
    corpora.foreach { corpus =>
      val merges = Vocab.learnBpeMerges(corpus.toDF("text"), "text", 12)
        .map(m => (m._1, m._2))
      val ranks = merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
      val words = corpus.flatMap(_.split("\\s+")) ++
        Seq("unseen", "ba", "aaaaa", "bananaband", "")
      words.foreach { w =>
        assert(Vocab.applyBpeRanked(ranks, w) === Vocab.applyBpe(merges, w), s"word=$w")
      }
    }
    // and over the real corpus vocabulary
    val real = sf("sf0.001", "documents")
    val merges = Vocab.learnBpeMerges(real, "text", 24).map(m => (m._1, m._2))
    val ranks = merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val vocab = real.select(F.explode(F.filter(
        F.split(F.col("text"), "\\s+"), t => F.length(t) > 0)).as("w"))
      .distinct().limit(500).as[String].collect()
    vocab.foreach { w =>
      assert(Vocab.applyBpeRanked(ranks, w) === Vocab.applyBpe(merges, w), s"word=$w")
    }
  }

  test("tokenizeBpe tokenizes the corpus map-only, matching per-word segmentation") {
    val docs = Seq((1L, "banana bandana"), (2L, "banana banana banana"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val merges = Vocab.learnBpeMerges(
      Seq("banana banana bandana").toDF("text"), "text", 4).map(m => (m._1, m._2))
    val out = Vocab.tokenizeBpe(docs, "text", merges)
    val got = out.select("doc_id", "tokens")
      .as[(Long, Option[Seq[String]])].collect().toMap
    val exp1 = Vocab.applyBpe(merges, "banana") ++ Vocab.applyBpe(merges, "bandana")
    assert(got(1L) === Some(exp1))
    assert(got(2L) === Some(Seq.fill(3)(Vocab.applyBpe(merges, "banana")).flatten))
    assert(got(3L) === Some(Seq.empty))          // empty text → empty tokens
    assert(got(4L) === None)                     // NULL text → NULL
    // map-only: no exchange in the tokenization plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    // re-joining tokens reproduces the text's words
    assert(got(1L).get.mkString === "bananabandana")
  }

  test("applyBpe segments words with the learned merge table") {
    val docs = Seq("banana banana bandana").toDF("text")
    val merges = Vocab.learnBpeMerges(docs, "text", 4).map(m => (m._1, m._2))
    // applying the merges must reproduce each word when re-joined
    Seq("banana", "bandana", "unseen").foreach { w =>
      assert(Vocab.applyBpe(merges, w).mkString === w)
    }
    // learned merges compress the training words
    assert(Vocab.applyBpe(merges, "banana").length < "banana".length)
  }

  test("top-V is a TakeOrdered, OOV joins by broadcast") {
    val v = Vocab.buildVocabulary(sf("sf0.001", "documents"), F.col("text"), 100)
    assert(v.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val o = Vocab.oovStats(sf("sf0.001", "documents"), F.col("text"), v)
    assert(o.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("applyBpeDropout: p=0 == ranked apply; dropout reconstructs and varies") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("c", "d"), ("abc", "cd"))
    val ranks = merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val word = "abccdabcd"
    assert(Vocab.applyBpeDropout(ranks, word, 0.0, () => fail("p=0 must not draw"))
      === Vocab.applyBpeRanked(ranks, word))
    // a deterministic draw sequence replays the same segmentation
    def src(seed: Long): () => Double = {
      var i = 0L
      () => {
        val h = TextFunctions.mix64(seed + i * 0xC2B2AE3D27D4EB4FL)
        i += 1
        (h >>> 11).toDouble / (1L << 53).toDouble
      }
    }
    val s1 = Vocab.applyBpeDropout(ranks, word, 0.3, src(5))
    val s2 = Vocab.applyBpeDropout(ranks, word, 0.3, src(5))
    assert(s1 === s2)
    assert(s1.mkString("") === word) // any dropout path reconstructs
    // over many seeds, dropout produces > 1 distinct segmentation and
    // every one reconstructs; all-dropped rounds terminate via redraw
    val segs = (0 until 64).map(s =>
      Vocab.applyBpeDropout(ranks, word, 0.5, src(s))).toSet
    assert(segs.size > 1, "dropout never varied the segmentation")
    segs.foreach(seg => assert(seg.mkString("") === word))
    // dropout never invents symbols outside the merge closure + chars
    val closure = Set("a","b","c","d","ab","abc","cd","abccd")
    segs.flatten.foreach(p => assert(closure.contains(p), s"alien piece $p"))
  }

  test("tokenizeBpeDropout: seeded determinism, reconstruction, p=0 fast path") {
    val session = spark
    import session.implicits._
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(5)("abcd").mkString(" ") + s" tail$i"))
      .toDF("id", "text")
    val merges = Vocab.learnBpeMerges(docs, "text", 12).map(m => (m._1, m._2))
    def run(seed: Long, p: Double) = Vocab.tokenizeBpeDropout(
        docs, "id", "text", merges, p, seed)
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    val a = run(3L, 0.2)
    assert(a === run(3L, 0.2))
    assert(a !== run(4L, 0.2))
    val texts = docs.orderBy("id").as[(Long, String)].collect()
    a.zip(texts).foreach { case (toks, (_, t)) =>
      assert(toks.mkString("") === t.replace(" ", "")) }
    // p=0 rides the memoized plain path and equals tokenizeBpe
    val p0 = run(9L, 0.0)
    val plain = Vocab.tokenizeBpe(docs, "text", merges)
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    assert(p0 === plain)
    // dropout leaves the argmax somewhere (same word, repeated — the
    // position-seeded draws differ)
    assert(a !== plain)
  }
}
