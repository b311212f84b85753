package graft.pipeline

import graft.SparkTestBase

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  // Straight-scala interpolated KN reference (same formula) for exact
  // cross-checking of the join-based distributed path.
  private def localKn(corpus: Seq[(Long, String)]): (Double, Map[Long, (Long, Double)]) = {
    val toks = corpus.map { case (id, t) =>
      id -> Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
    }
    val bigrams = toks.flatMap { case (id, w) =>
      w.sliding(2).filter(_.size == 2).map(p => (id, p.head, p(1)))
    }
    val c = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val cl = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nl = c.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nr = c.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val t = c.size.toDouble
    val n1 = c.values.count(_ == 1L).toDouble
    val n2 = c.values.count(_ == 2L).toDouble
    val d = if (n1 == 0) 0.75 else n1 / (n1 + 2 * n2)
    val perDoc = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, l, r) =>
        val p = math.max(c((l, r)) - d, 0.0) / cl(l) + d * nl(l) / cl(l) * (nr(r) / t)
        -math.log(p)
      }.sum
      id -> (bs.size.toLong,
        BigDecimal(s / bs.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    (d, perDoc)
  }

  private val corpus = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the log",
    3L -> "a cat and a dog",
    4L -> "the cat the cat the cat",
    5L -> "",
    6L -> null.asInstanceOf[String],
    7L -> "single")

  test("kneserNeyLogLoss matches the local reference exactly; short/null docs absent") {
    val df = corpus.toDF("doc_id", "text")
    val (wantD, want) = localKn(corpus)
    val m = NgramLm.learnKneserNey(df, "text")
    assert(math.abs(m.discount - wantD) < 1e-15, s"discount ${m.discount} vs $wantD")
    val got = NgramLm.kneserNeyLogLoss(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bigrams"), r.getAs[Double]("score"))).toMap
    assert(got.keySet == want.keySet) // 5, 6, 7 absent (no bigrams)
    want.foreach { case (id, (n, s)) =>
      assert(got(id)._1 == n, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - s) < 5e-5, s"doc $id score ${got(id)._2} vs $s")
    }
  }

  test("probabilities over a left context sum to 1 (proper distribution)") {
    val df = corpus.toDF("doc_id", "text")
    val m = NgramLm.learnKneserNey(df, "text")
    // P(r | "the") over every observed right type + the discounted
    // mass spread over unseen continuations must total 1: verify
    // sum over ALL vocabulary words r of P(r | "the") == 1 when
    // Pcont sums to 1 over seen types. Reconstruct from the tables.
    val c = m.bigramCounts.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val (cl, nl) = m.leftStats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap.apply("the")
    val nrs = m.rightTypes.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = m.totalTypes.toDouble
    val d = m.discount
    // all words of the vocabulary as continuation candidates
    val vocab = nrs.keySet
    val total = vocab.toSeq.map { r =>
      math.max(c.getOrElse(("the", r), 0L) - d, 0.0) / cl + d * nl / cl * (nrs(r) / t)
    }.sum
    // Pcont sums to exactly 1 over the vocab, so the conditional does too
    assert(math.abs(total - 1.0) < 1e-12, s"sum P(r|the) = $total")
  }

  test("held-out scoring: unseen words take the backoff, never error or null") {
    val train = corpus.toDF("doc_id", "text")
    val m = NgramLm.learnKneserNey(train, "text")
    val held = Seq(
      10L -> "the cat sat quietly",    // "sat quietly": unseen bigram, seen words
      11L -> "zebra quagga zebra",     // fully out-of-model
      12L -> "unknownleft the"         // unseen left context, seen right
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreKneserNey(held, "doc_id", "text", m).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    got.values.foreach(s => assert(!s.isNaN && !s.isInfinite && s > 0))
    // the fully-OOV doc must score strictly worse than the in-domain one
    assert(got(11L) > got(10L))
  }

  test("degenerate corpora: no bigrams at all, and all-singleton counts") {
    val empty = Seq(1L -> "one", 2L -> "").toDF("doc_id", "text")
    assert(NgramLm.kneserNeyLogLoss(empty, "doc_id", "text").collect().isEmpty)
    // every bigram unique -> n1 = T, n2 = 0 -> D = 1: max(c-D,0) = 0 and
    // the whole mass is continuation; scores stay finite
    val uniq = Seq(1L -> "a b c d", 2L -> "e f g h").toDF("doc_id", "text")
    val m = NgramLm.learnKneserNey(uniq, "text")
    assert(math.abs(m.discount - 1.0) < 1e-15)
    val got = NgramLm.kneserNeyLogLoss(uniq, "doc_id", "text").collect()
    assert(got.length == 2)
    got.foreach(r => assert(!r.getAs[Double]("score").isNaN))
  }

  // Local trigram interpolated-KN reference (same hierarchy).
  private def localKn3(corpus: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val toks = corpus.map { case (id, t) =>
      id -> Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
    }
    val tris = toks.flatMap { case (id, w) =>
      w.sliding(3).filter(_.size == 3).map(x => (id, x.head, x(1), x(2)))
    }
    val bigs = toks.flatMap { case (_, w) =>
      w.sliding(2).filter(_.size == 2).map(x => (x.head, x(1)))
    }.distinct
    val c3 = tris.groupBy(x => (x._2, x._3, x._4)).view.mapValues(_.size.toLong).toMap
    val c2 = c3.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.values.sum).toMap
    val n3l = c3.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.size.toLong).toMap
    val nvw = c3.keys.groupBy(k => (k._2, k._3)).view.mapValues(g => g.map(_._1).toSet.size.toLong).toMap
    val nv = nvw.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nvr = nvw.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nw = bigs.groupBy(_._2).view.mapValues(g => g.map(_._1).toSet.size.toLong).toMap
    val t = bigs.size.toDouble
    def disc(cnts: Iterable[Long]): Double = {
      val n1 = cnts.count(_ == 1L).toDouble
      val n2 = cnts.count(_ == 2L).toDouble
      if (n1 == 0) 0.75 else n1 / (n1 + 2 * n2)
    }
    val d3 = disc(c3.values)
    val d2 = disc(nvw.values)
    tris.groupBy(_._1).map { case (id, ts) =>
      val s = ts.map { case (_, u, v, w) =>
        val pw = nw.getOrElse(w, 0L).toDouble match {
          case 0.0 => 0.5 / t
          case x => x / t
        }
        val p2 = nv.get(v) match {
          case None => pw
          case Some(nvv) =>
            math.max(nvw.getOrElse((v, w), 0L) - d2, 0.0) / nvv +
              d2 * nvr(v) / nvv * pw
        }
        val p3 = c2.get((u, v)) match {
          case None => p2
          case Some(c2v) =>
            math.max(c3.getOrElse((u, v, w), 0L) - d3, 0.0) / c2v +
              d3 * n3l((u, v)) / c2v * p2
        }
        -math.log(p3)
      }.sum
      id -> (ts.size.toLong,
        BigDecimal(s / ts.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("trigram KN matches the local reference; <3-token docs absent") {
    val df = corpus.toDF("doc_id", "text")
    val want = localKn3(corpus)
    val got = NgramLm.kneserNey3LogLoss(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("trigrams"), r.getAs[Double]("score"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, s)) =>
      assert(got(id)._1 == n, s"doc $id trigram count")
      assert(math.abs(got(id)._2 - s) < 5e-5, s"doc $id: ${got(id)._2} vs $s")
    }
  }

  test("trigram conditional sums to 1 over the vocabulary") {
    val df = corpus.toDF("doc_id", "text")
    val m = NgramLm.learnKneserNey3(df, "text")
    val c3 = m.triCounts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val (c2v, n3lv) = m.triCtx.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap.apply(("the", "cat"))
    val nvwM = m.contBi.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val (nvV, nvrV) = m.midCtx.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap.apply("cat")
    val nwM = m.uniCont.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = m.totalBigramTypes.toDouble
    val vocab = nwM.keySet
    val total = vocab.toSeq.map { w =>
      val pw = nwM(w) / t
      val p2 = math.max(nvwM.getOrElse(("cat", w), 0L) - m.d2, 0.0) / nvV +
        m.d2 * nvrV / nvV * pw
      math.max(c3.getOrElse(("the", "cat", w), 0L) - m.d3, 0.0) / c2v +
        m.d3 * n3lv / c2v * p2
    }.sum
    assert(math.abs(total - 1.0) < 1e-12, s"sum P3(w|the,cat) = $total")
  }

  test("trigram held-out: OOV backoff chain never errors; OOV scores worse") {
    val m = NgramLm.learnKneserNey3(corpus.toDF("doc_id", "text"), "text")
    val held = Seq(
      20L -> "the cat sat on a mat",   // mixed seen/unseen trigrams
      21L -> "zz qq zz qq zz"          // fully out-of-model
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreKneserNey3(held, "doc_id", "text", m).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got.keySet == Set(20L, 21L))
    got.values.foreach(s => assert(!s.isNaN && !s.isInfinite && s > 0))
    assert(got(21L) > got(20L))
  }

  test("testdata sf0.001: distributed path is deterministic across runs") {
    val d = sf("sf0.001", "documents")
    val a = NgramLm.kneserNeyLogLoss(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = NgramLm.kneserNeyLogLoss(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.length > 0 && a.sameElements(b))
  }
}
