package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  test("binaryAuc matches the hand-computed tie-aware value") {
    val df = Seq(
      (0.9, true), (0.8, false), (0.8, true), (0.5, false),
      (0.5, true), (0.5, false), (0.1, false)
    ).toDF("s", "y")
    val r = Eval.binaryAuc(df, F.col("s"), F.col("y")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    // pairs: 9.5 of 12 -> 0.7916666...
    assert(math.abs(r.getDouble(3) - 9.5 / 12.0) < 1e-12)
  }

  test("binaryAuc equals the brute-force pairwise probability") {
    val df = (0 until 400).map { i =>
      val y = i % 3 == 0
      // integer arithmetic then ONE division, so decimal-equal scores are
      // the same double in both classes (a two-step double sum can land
      // 1 ulp apart and turn a true tie into a phantom win)
      val s = (((i * 1103515245L + 12345L) % 1000L) + (if (y) 250L else 0L)) / 1000.0
      (s, y)
    }.toDF("s", "y")
    val pos = df.filter($"y").select($"s".as("sp"))
    val neg = df.filter(!$"y").select($"s".as("sn"))
    val brute = pos.crossJoin(neg)
      .agg((F.sum(F.when($"sp" > $"sn", 1.0).when($"sp" === $"sn", 0.5)
        .otherwise(0.0)) / F.count(F.lit(1))).as("auc"))
      .collect().head.getDouble(0)
    val got = Eval.binaryAuc(df, $"s", $"y").collect().head.getDouble(3)
    assert(math.abs(got - brute) < 1e-12, s"$got vs $brute")
  }

  test("binaryAuc: perfect separation is 1.0, inverted is 0.0, degenerate is NULL") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("s", "y")
    assert(Eval.binaryAuc(perfect, $"s", $"y").collect().head.getDouble(3) == 1.0)
    val inverted = Seq((0.1, true), (0.8, false)).toDF("s", "y")
    assert(Eval.binaryAuc(inverted, $"s", $"y").collect().head.getDouble(3) == 0.0)
    val onlyPos = Seq((0.5, true)).toDF("s", "y")
    assert(Eval.binaryAuc(onlyPos, $"s", $"y").collect().head.isNullAt(3))
  }

  test("binaryAuc excludes NULL scores and labels") {
    val df = Seq[(Option[Double], Option[Boolean])](
      (Some(0.9), Some(true)), (Some(0.1), Some(false)),
      (None, Some(true)), (Some(0.99), None)
    ).toDF("s", "y")
    val r = Eval.binaryAuc(df, $"s", $"y").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getDouble(3) == 1.0)
  }

  test("rocPoints: cumulative counts high-to-low with exact endpoints") {
    val df = Seq(
      (0.9, true), (0.7, false), (0.7, true), (0.3, false)
    ).toDF("s", "y")
    val pts = Eval.rocPoints(df, $"s", $"y").orderBy($"threshold".desc).collect()
    assert(pts.length == 3)
    assert(pts(0).getLong(1) == 1L && pts(0).getLong(2) == 0L) // >= 0.9
    assert(pts(1).getLong(1) == 2L && pts(1).getLong(2) == 1L) // >= 0.7
    assert(pts(2).getLong(1) == 2L && pts(2).getLong(2) == 2L) // >= 0.3
    assert(pts(2).getDouble(3) == 1.0 && pts(2).getDouble(4) == 1.0)
  }

  test("confusionAt computes exact counts and derived metrics") {
    val df = Seq(
      (0.9, true), (0.8, false), (0.4, true), (0.2, false), (0.6, true)
    ).toDF("s", "y")
    val r = Eval.confusionAt(df, $"s", $"y", 0.5).collect().head
    // pred>=0.5: 0.9T 0.8F 0.6T -> tp=2 fp=1; below: 0.4T fn=1, 0.2F tn=1
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 1L, 1L)))
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(r.getDouble(5) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(r.getDouble(6) - 2.0 / 3.0) < 1e-15) // f1 of equal p,r
  }

  test("calibrationBins: per-bin exact means and rates; edge scores clamp") {
    val df = Seq(
      (0.05, false), (0.15, true), (0.15, false), (1.0, true), (-0.2, false)
    ).toDF("s", "y")
    val bins = Eval.calibrationBins(df, $"s", $"y", bins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(0, 1, 9))
    val b0 = bins(0) // scores 0.05 and clamped -0.2
    assert(b0.getLong(1) == 2L)
    val b1 = bins(1)
    assert(b1.getLong(1) == 2L && math.abs(b1.getDouble(2) - 0.15) < 1e-12
      && b1.getDouble(3) == 0.5)
    assert(bins(2).getDouble(3) == 1.0)
  }

  test("metrics reduce per-score before the cumulative pass (one small window input)") {
    val df = (0 until 1000).map(i => ((i % 7) / 10.0, i % 2 == 0)).toDF("s", "y")
    val plan = Eval.binaryAuc(df, $"s", $"y").queryExecution.executedPlan.toString
    // the window runs over the 7-row per-score table; aggregation below it
    assert(plan.contains("Window"))
    assert("(?i)hashaggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("rankingMetrics matches hand-computed values at k=3") {
    // q1: rel at ranks 1 and 3 of 5 total relevant
    // q2: rel at rank 2 of 1 total relevant
    // q3: no relevant in top-k, 2 total relevant
    val ranked = Seq(
      ("q1", 1L, true), ("q1", 2L, false), ("q1", 3L, true), ("q1", 4L, true),
      ("q2", 1L, false), ("q2", 2L, true), ("q2", 3L, false),
      ("q3", 1L, false), ("q3", 2L, false), ("q3", 3L, false)
    ).toDF("q", "rank", "rel")
    val totals = Seq(("q1", 5L), ("q2", 1L), ("q3", 2L), ("q4", 3L)).toDF("q", "nr")
    val m = Eval.rankingMetrics(ranked, "q", "rank", "rel", totals, "nr", k = 3)
      .orderBy("q").collect()
    def log2(x: Double) = math.log(x) / math.log(2.0)

    val q1 = m(0)
    assert(q1.getLong(2) === 2L)                            // hits
    assert(q1.getLong(3) === 1L)                            // first_rank
    assert(q1.getDouble(4) === 2.0 / 3.0)                   // precision (exact)
    assert(q1.getDouble(5) === 2.0 / 5.0)                   // recall (exact)
    assert(q1.getDouble(6) === 1.0)                         // rr
    val dcg1 = 1.0 / log2(2.0) + 1.0 / log2(4.0)
    val idcg1 = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(q1.getDouble(7) - dcg1) < 1e-12)
    assert(math.abs(q1.getDouble(8) -
      BigDecimal(dcg1 / idcg1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)

    val q2 = m(1)
    assert(q2.getLong(2) === 1L && q2.getLong(3) === 2L)
    assert(q2.getDouble(6) === 0.5)
    // dcg = 1/log2(3), idcg = 1/log2(2) = 1
    assert(q2.getDouble(8) === 0.6309)

    val q3 = m(2)
    assert(q3.getLong(2) === 0L && q3.isNullAt(3))
    assert(q3.getDouble(4) === 0.0 && q3.getDouble(5) === 0.0)
    assert(q3.getDouble(6) === 0.0 && q3.getDouble(8) === 0.0)

    // q4 never appeared in the ranked list: a full row of zeros
    val q4 = m(3)
    assert(q4.getLong(1) === 3L && q4.getLong(2) === 0L && q4.isNullAt(3))
    assert(q4.getDouble(4) === 0.0 && q4.getDouble(7) === 0.0 && q4.getDouble(8) === 0.0)
  }

  test("rankingMetrics: n_rel capping in ideal DCG and perfect ranking gives ndcg 1") {
    // 2 relevant total, both at the top of k=5: dcg == idcg
    val ranked = Seq(
      ("q", 1L, true), ("q", 2L, true), ("q", 3L, false),
      ("q", 4L, false), ("q", 5L, false)).toDF("q", "rank", "rel")
    val totals = Seq(("q", 2L)).toDF("q", "nr")
    val m = Eval.rankingMetrics(ranked, "q", "rank", "rel", totals, "nr", 5).collect().head
    assert(m.getDouble(8) === 1.0)
    assert(m.getDouble(5) === 1.0)    // recall: both found
  }

  test("textOverlap: hand-computed BLEU-4 and ROUGE on the classic clipping case") {
    // candidate "the the the the the the the" vs "the cat is on the mat":
    // m1 clips to 2 (ref has two "the"), every higher-order match is 0
    val df = Seq(
      (1L, "the the the the the the the", "the cat is on the mat"),
      (2L, "the cat is on the mat", "the cat is on the mat"), // identical
      (3L, "completely different words here", "the cat is on the mat"),
      (4L, null.asInstanceOf[String], "x"), (5L, "x", null.asInstanceOf[String]))
      .toDF("id", "cand", "ref")
    val out = Eval.textOverlap(df, "id", "cand", "ref").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L) && !out.contains(5L))
    val r1 = out(1L)
    assert(r1.getLong(1) === 7L && r1.getLong(2) === 6L)     // token counts
    assert(r1.getLong(3) === 2L)                              // m1 clipped
    assert(r1.getLong(4) === 0L && r1.getLong(5) === 0L && r1.getLong(6) === 0L)
    assert(r1.getDouble(7) === 0.0)                           // bleu: a zero precision
    assert(math.abs(r1.getAs[Double]("rouge1_p") - 2.0 / 7.0) < 1e-15)
    assert(math.abs(r1.getAs[Double]("rouge1_r") - 2.0 / 6.0) < 1e-15)
    val r2 = out(2L)
    assert(r2.getDouble(7) === 1.0)                           // identical => BLEU 1
    assert(r2.getAs[Double]("rouge1_f1") === 1.0 && r2.getAs[Double]("rouge2_f1") === 1.0)
    val r3 = out(3L)
    assert(r3.getLong(3) === 0L && r3.getDouble(7) === 0.0)
    assert(r3.getAs[Double]("rouge1_f1") === 0.0)
  }

  test("textOverlap: brevity penalty and partial precisions match the formula") {
    // candidate = first 4 tokens of a 6-token reference
    val df = Seq((1L, "a b c d", "a b c d e f")).toDF("id", "cand", "ref")
    val r = Eval.textOverlap(df, "id", "cand", "ref").collect().head
    // matches: 4/4 unigrams, 3/3 bigrams, 2/2 trigrams, 1/1 4-grams
    assert((3 to 6).map(r.getLong) === Seq(4L, 3L, 2L, 1L))
    val bleu = math.min(1.0, math.exp(1.0 - 6.0 / 4.0)) *
      math.exp((math.log(1.0) * 4) / 4.0)
    assert(math.abs(r.getDouble(7) - bleu) < 1e-15)
    assert(math.abs(r.getAs[Double]("rouge2_r") - 3.0 / 5.0) < 1e-15)
  }

  test("rankCorrelation: hand-computed Pearson/Spearman, ties averaged, NaN -> NULL") {
    // y = x^2 on positive x: monotone (spearman 1) but not linear
    val df = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0), (5.0, 25.0))
      .toDF("x", "y")
    val r = Eval.rankCorrelation(df, "x", "y").collect().head
    assert(r.getLong(0) === 5L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)              // spearman exact 1
    assert(r.getDouble(1) > 0.95 && r.getDouble(1) < 1.0)       // pearson < 1

    // ties: x = (1,2,2,3), y = (10,20,20,40); fractional ranks make
    // spearman exactly 1 (both orderings identical incl. tie group)
    val t = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)).toDF("x", "y")
    val rt = Eval.rankCorrelation(t, "x", "y").collect().head
    assert(math.abs(rt.getDouble(2) - 1.0) < 1e-12)

    // zero variance -> NULL, not NaN; NULL/NaN inputs drop
    val z = Seq((1.0, 5.0), (2.0, 5.0), (Double.NaN, 7.0)).toDF("x", "y")
    val rz = Eval.rankCorrelation(z, "x", "y").collect().head
    assert(rz.getLong(0) === 2L)
    assert(rz.isNullAt(1) && rz.isNullAt(2))

    // anti-monotone: spearman exactly -1
    val a = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 2.0)).toDF("x", "y")
    assert(math.abs(Eval.rankCorrelation(a, "x", "y")
      .collect().head.getDouble(2) + 1.0) < 1e-12)
  }

  test("rankCorrelation groups plan a single exchange") {
    val docs = sf("sf0.001", "documents")
      .select(F.col("source"), F.col("n_chars"),
        F.size(F.split(F.col("text"), "\\s+")).as("toks"))
    val out = Eval.rankCorrelation(docs, "n_chars", "toks", Seq("source"))
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    // chars and token counts are strongly positively correlated
    out.collect().foreach { r =>
      assert(r.getDouble(2) > 0.5, s"source ${r.get(0)} spearman ${r.getDouble(2)}")
    }
  }

  test("textOverlap plans map-only (zero exchanges)") {
    val docs = sf("sf0.001", "documents")
      .select(F.col("doc_id"), F.col("text").as("cand"), F.col("text").as("ref"))
    val plan = Eval.textOverlap(docs, "doc_id", "cand", "ref")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
