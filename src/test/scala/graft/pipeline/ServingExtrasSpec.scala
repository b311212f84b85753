package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class HybridFusionSpec extends SparkTestBase {
  import spark.implicits._

  test("min-max normalization, weighting, and missing-list zeros") {
    val lex = Seq((1L, 1, 10.0), (2L, 2, 6.0), (3L, 3, 2.0))
      .toDF("id", "rank", "score")
    val sem = Seq((2L, 1, 0.9), (4L, 2, 0.5), (3L, 3, 0.1))
      .toDF("id", "rank", "score")
    val fused = Retrieval.fuseScoresMinMax(Seq(lex -> 0.6, sem -> 0.4), 10)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("fused_score"),
          r.getAs[Long]("n_lists"))).toMap
    // lex norms: 1.0, 0.5, 0.0; sem norms: 1.0, 0.5, 0.0
    assert(math.abs(fused(1L)._2 - 0.6) < 1e-12)          // lex only
    assert(math.abs(fused(2L)._2 - (0.3 + 0.4)) < 1e-12)  // both
    assert(math.abs(fused(3L)._2 - 0.0) < 1e-12)
    assert(math.abs(fused(4L)._2 - 0.2) < 1e-12)          // sem only
    assert(fused(2L)._1 == 1 && fused(1L)._1 == 2 && fused(4L)._1 == 3)
    assert(fused(2L)._3 == 2L && fused(1L)._3 == 1L)
  }

  test("degenerate all-equal list normalizes to 1.0") {
    val a = Seq((1L, 1, 5.0), (2L, 2, 5.0)).toDF("id", "rank", "score")
    val f = Retrieval.fuseScoresMinMax(Seq(a -> 1.0), 10)
      .select("fused_score").as[Double].collect()
    assert(f.forall(x => math.abs(x - 1.0) < 1e-12))
  }
}

class InterleaveSpec extends SparkTestBase {
  import spark.implicits._

  private def ranked(ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) => (i + 1, id) }.toDF("rank", "id")

  test("team-draft: disjoint lists draft alternately in coin order") {
    val a = ranked(Seq(1L, 3L, 5L, 7L))
    val b = ranked(Seq(2L, 4L, 6L, 8L))
    val out = Eval.teamDraftInterleave(a, b, 8, "s1")
      .collect().map(r => (r.getAs[Int]("pos"), r.getAs[Long]("id"),
        r.getAs[String]("team"))).sortBy(_._1)
    assert(out.length == 8)
    // each round r drafts A[r] and B[r] in coin order
    (1 to 4).foreach { r =>
      val pair = out.slice(2 * r - 2, 2 * r)
      val (aFirst) = Eval.draftCoin("s1", r)
      val expect =
        if (aFirst) Seq((2L * r - 1, "a"), (2L * r, "b"))
        else Seq((2L * r, "b"), (2L * r - 1, "a"))
      assert(pair.map(p => (p._2, p._3)).toSeq == expect, s"round $r")
    }
    // teams are balanced on disjoint lists
    assert(out.count(_._3 == "a") == 4 && out.count(_._3 == "b") == 4)
  }

  test("overlap: an already-drafted doc is skipped, not re-credited") {
    val a = ranked(Seq(1L, 2L, 3L))
    val b = ranked(Seq(2L, 1L, 9L))
    val out = Eval.teamDraftInterleave(a, b, 6, "s2")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("team")))
    assert(out.map(_._1).distinct.length == out.length) // no dup ids
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 9L))
  }

  test("exhaustion stops cleanly below k; determinism across calls") {
    val a = ranked(Seq(1L))
    val b = ranked(Seq(2L))
    val out = Eval.teamDraftInterleave(a, b, 10, "s3").collect()
    assert(out.length == 2)
    val r1 = Eval.teamDraftInterleave(ranked(Seq(1L, 3L)), ranked(Seq(2L)),
      3, "s4").collect().map(_.toSeq).toSeq
    val r2 = Eval.teamDraftInterleave(ranked(Seq(1L, 3L)), ranked(Seq(2L)),
      3, "s4").collect().map(_.toSeq).toSeq
    assert(r1 == r2)
  }
}

class SpellingSpec extends SparkTestBase {
  import spark.implicits._

  test("levenshteinAt: exact distances with the k cutoff") {
    assert(Spelling.levenshteinAt("merge", "merge", 2) == 0)
    assert(Spelling.levenshteinAt("mergi", "merge", 2) == 1)
    assert(Spelling.levenshteinAt("mrge", "merge", 2) == 1)   // deletion
    assert(Spelling.levenshteinAt("meerge", "merge", 2) == 1) // insertion
    assert(Spelling.levenshteinAt("mirgi", "merge", 2) == 2)
    assert(Spelling.levenshteinAt("window", "merge", 2) == -1)
    assert(Spelling.levenshteinAt("ab", "ba", 2) == 2)        // no transposition
  }

  test("deletions: all <= k-deletion variants including the term itself") {
    val d = Spelling.deletions("abc", 1)
    assert(d == Set("abc", "bc", "ac", "ab"))
    val d2 = Spelling.deletions("abc", 2)
    assert(d2 == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("suggestBatch: never misses a within-k term, exact integer ranking") {
    val docs = Seq(
      (1L, "merge merge merge window"),
      (2L, "merge window batch"),
      (3L, "marge window"),
      (4L, "verge")
    ).toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(docs, "doc_id", "text")
    val dict = Spelling.termDictionary(idx)
    val sidx = Spelling.buildSpellIndex(dict, 2)
    val out = Spelling.suggestBatch(sidx, Seq("mergi"), 2, 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("term"),
        r.getAs[Int]("distance"), r.getAs[Long]("df"))).sortBy(_._1)
    // within 2 of "mergi": merge(1), marge(2), verge(2)
    assert(out.map(_._2).toSeq == Seq("merge", "marge", "verge"))
    assert(out.map(_._3).toSeq == Seq(1, 2, 2))
    // distance-0 self-match ranks first when the term exists
    val self = Spelling.suggest(sidx, "window", 2, 3).collect()
    assert(self.head.getAs[String]("term") == "window" &&
      self.head.getAs[Int]("distance") == 0)
    // brute-force cross-check: candidates == all dictionary terms
    // within k (the SymSpell superset identity, verified)
    val allTerms = dict.select("term").as[String].collect()
    val brute = allTerms.filter(t =>
      Spelling.levenshteinAt("mergi", t, 2) >= 0).toSet
    assert(out.map(_._2).toSet == brute)
  }
}

class QuerylikelihoodSpec extends SparkTestBase {
  import spark.implicits._

  test("QL Dirichlet matches a straight-scala reference; indexed == one-shot") {
    val corpus = Seq(
      1L -> "merge merge window fast",
      2L -> "merge slow slow",
      3L -> "window window window merge slow",
      4L -> "other words entirely")
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq("merge", "slow")
    val mu = 300.0
    // reference
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val cTotal = toks.values.map(_.size).sum.toDouble
    val cf = q.map(t => t -> toks.values.map(_.count(_ == t)).sum.toDouble).toMap
    val want = toks.flatMap { case (id, ts) =>
      val matched = q.filter(t => ts.contains(t))
      if (matched.isEmpty) None
      else Some(id -> (matched.map { t =>
        math.log(1 + ts.count(_ == t) / (mu * cf(t) / cTotal))
      }.sum + q.length * math.log(mu / (ts.size + mu))))
    }
    val got = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text", q, 10)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, s) => assert(math.abs(got(id) - s) < 1e-12, s"id $id") }
    val probed = Retrieval.queryLikelihoodTopKIndexed(
      Retrieval.buildTextIndex(docs, "doc_id", "text", 4), q, 10)
      .select("id", "score").as[(Long, Double)].collect().toMap
    want.foreach { case (id, s) => assert(math.abs(probed(id) - s) < 1e-12) }
    // longer doc with the same matched profile scores lower (dl prior)
    assert(got(2L) > got(3L) || toks(2L).size >= toks(3L).size)
  }

  test("QL drops out-of-corpus query terms from the dl prior") {
    val docs = Seq(1L -> "merge window", 2L -> "merge tools here today")
      .toDF("doc_id", "text")
    // "zzoov" matches nothing: scores must equal the 1-term query
    val withOov = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("merge", "zzoov"), 10)
      .select("id", "score").as[(Long, Double)].collect().toMap
    val without = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("merge"), 10)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(withOov.keySet == without.keySet)
    withOov.foreach { case (id, s) =>
      assert(math.abs(s - without(id)) < 1e-12, s"id $id")
    }
  }
}

class StructuredQuerySpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "slow merge window fast"),
    (2L, "merge window hash"),
    (3L, "slow window window"),
    (4L, "merge slow things"),
    (5L, "window alone here"),
    (6L, "slow merge again slow merge")
  ).toDF("doc_id", "text")

  private def idx = Retrieval.buildTextIndex(docs, "doc_id", "text", 4)

  test("search_after: pages partition the full ranking exactly") {
    val q = Seq("slow", "merge", "window")
    val all = Retrieval.bm25TopKIndexed(idx, q, 100)
      .collect().sortBy(_.getInt(0))
    val page1 = all.take(2)
    val cur = page1.last
    val page2 = Retrieval.bm25TopKAfter(idx, q, 2,
      cur.getDouble(2), cur.getLong(1))
      .collect().sortBy(_.getInt(0))
    assert(page2.map(_.getLong(1)).toSeq == all.slice(2, 4).map(_.getLong(1)).toSeq)
    // a cursor mid-tie must not drop or duplicate the tied sibling
    val page3 = Retrieval.bm25TopKAfter(idx, q, 100,
      page2.last.getDouble(2), page2.last.getLong(1))
      .collect().sortBy(_.getInt(0))
    assert((page1 ++ page2 ++ page3).map(_.getLong(1)).toSeq ==
      all.map(_.getLong(1)).toSeq)
  }

  test("boolean: must requires ALL terms, mustNot excludes, should scores") {
    val out = Retrieval.bm25TopKBoolean(idx,
      should = Seq("window"), must = Seq("slow", "merge"),
      mustNot = Seq("hash"), 10)
      .select("id").as[Long].collect().toSet
    // must slow AND merge: docs 1, 4, 6; mustNot hash removes none of
    // those; doc 2 (merge, hash, no slow) excluded twice over
    assert(out == Set(1L, 4L, 6L))
    // mustNot alone
    val out2 = Retrieval.bm25TopKBoolean(idx,
      should = Seq("window"), must = Nil, mustNot = Seq("merge"), 10)
      .select("id").as[Long].collect().toSet
    assert(out2 == Set(3L, 5L))
  }

  test("phrase filter: adjacency required, ranking unchanged otherwise") {
    val out = Retrieval.bm25TopKPhraseFiltered(idx,
      Seq("slow", "merge", "window"), phrase = Seq("slow", "merge"), 10)
      .select("id").as[Long].collect().toSet
    // "slow merge" adjacent: docs 1 and 6 only (doc 4 has "merge slow")
    assert(out == Set(1L, 6L))
    // the kept docs rank exactly as in the unfiltered ranking order
    val full = Retrieval.bm25TopKIndexed(idx,
      Seq("slow", "merge", "window"), 10)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1)).filter(out)
    val got = Retrieval.bm25TopKPhraseFiltered(idx,
      Seq("slow", "merge", "window"), Seq("slow", "merge"), 10)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    assert(got.toSeq == full.toSeq)
  }
}

class FacetsSpec extends SparkTestBase {
  import spark.implicits._

  test("facetCounts: exact matched-set counts, ordered, topN-capped") {
    val docs = Seq(
      (1L, "merge conflicts", "web", "en"),
      (2L, "merge tools", "web", "de"),
      (3L, "window functions", "wiki", "en"),
      (4L, "nothing relevant", "wiki", "en"),
      (5L, null.asInstanceOf[String], "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val idx = Retrieval.buildTextIndex(docs, "doc_id", "text", 8)
    val out = Retrieval.facetCounts(idx, Seq("merge", "window"), docs,
      "doc_id", "source", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // matched: 1, 2 (web), 3 (wiki); doc 4 unmatched, doc 5 null text
    assert(out == Seq("web" -> 2L, "wiki" -> 1L))
    val top1 = Retrieval.facetCounts(idx, Seq("merge", "window"), docs,
      "doc_id", "lang", 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "en")
  }
}

class MaxSimSpec extends SparkTestBase {
  import spark.implicits._

  test("MaxSim: per-query-vector best match, summed; planted identity wins") {
    // 2-D unit vectors by angle; doc 10 = {0deg, 90deg}, doc 20 =
    // {45deg, 180deg}, doc 30 = {10deg, 100deg}
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val docVecs = Seq(
      (10L, 0L, v(0)), (10L, 1L, v(90)),
      (20L, 0L, v(45)), (20L, 1L, v(180)),
      (30L, 0L, v(10)), (30L, 1L, v(100))
    ).toDF("doc_id", "vec_id", "embedding")
    // the query IS doc 10's vector set
    val qVecs = Seq((0L, 0L, v(0)), (0L, 1L, v(90)))
      .toDF("query_id", "vec_id", "embedding")
    val cand = Seq((0L, 10L), (0L, 20L), (0L, 30L))
      .toDF("query_id", "doc_id")
    val out = Similarity.maxSimRerank(cand, qVecs, docVecs, 3)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(10L, 30L, 20L))
    assert(math.abs(out(0)._3 - 2.0) < 1e-6)           // exact self-match
    // doc 30: cos(10deg) + cos(10deg) (90 vs 100)
    assert(math.abs(out(1)._3 - 2 * math.cos(math.toRadians(10))) < 1e-6)
    // doc 20: cos(45) for q0 (45 beats 180) + cos(45) for q1 (90 vs 45
    // = 45deg apart beats 90-vs-180)
    assert(math.abs(out(2)._3 - 2 * math.cos(math.toRadians(45))) < 1e-6)
  }

  test("candidates bound the interaction: absent pairs never score") {
    val docVecs = Seq((1L, 0L, Seq(1f, 0f)), (2L, 0L, Seq(1f, 0f)))
      .toDF("doc_id", "vec_id", "embedding")
    val qVecs = Seq((0L, 0L, Seq(1f, 0f))).toDF("query_id", "vec_id", "embedding")
    val cand = Seq((0L, 1L)).toDF("query_id", "doc_id")
    val ids = Similarity.maxSimRerank(cand, qVecs, docVecs, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
