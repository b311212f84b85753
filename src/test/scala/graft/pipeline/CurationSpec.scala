package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------- deterministic shuffle

  test("deterministicShuffle: stable permutation, seed-sensitive, balanced ranges") {
    val df = spark.range(5000).toDF("id")
    val once = Sampling.deterministicShuffle(df, F.col("id"), 42L)
      .select("id").collect().map(_.getLong(0)).toSeq
    val again = Sampling.deterministicShuffle(df, F.col("id"), 42L)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(once == again)
    assert(once.sorted == (0L until 5000L))          // a permutation
    assert(once != (0L until 5000L))                 // actually shuffled
    val other = Sampling.deterministicShuffle(df, F.col("id"), 43L)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(other != once)                            // seed matters
  }

  test("deterministicShuffle plans a range exchange + sort, no single-partition funnel") {
    val df = spark.range(10000).toDF("id")
    val plan = Sampling.deterministicShuffle(df, F.col("id"), 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  // ------------------------------------------------------- hash split

  test("splitByHash assigns every key to exactly one split, stable and exhaustive") {
    val df = spark.range(20000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitByHash(df, F.col("id"), splits)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))   // fractions sum to 1: no "rest"
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train") - 16000L) < 500)
    assert(math.abs(counts("val") - 2000L) < 300)
    assert(math.abs(counts("test") - 2000L) < 300)
    // deterministic: same assignment on re-evaluation and re-partitioning
    val again = Sampling.splitByHash(df.repartition(7), F.col("id"), splits)
      .as[(Long, String)].collect().toMap
    val first = out.as[(Long, String)].collect().toMap
    assert(again === first)
  }

  test("splitByHash train split matches deterministicSample at the same fraction") {
    val df = spark.range(5000).toDF("id")
    val sampled = Sampling.deterministicSample(df, F.col("id"), 0.3)
      .as[Long].collect().toSet
    val train = Sampling.splitByHash(df, F.col("id"), Seq("a" -> 0.3, "b" -> 0.7))
      .filter($"split" === "a").select("id").as[Long].collect().toSet
    assert(train === sampled)
  }

  test("splitByHash remainder falls into otherName") {
    val df = spark.range(2000).toDF("id")
    val out = Sampling.splitByHash(df, F.col("id"), Seq("train" -> 0.5), otherName = "holdout")
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "holdout"))
    assert(counts.values.sum === 2000L)
  }

  // ---------------------------------------------------------- packing

  test("packSequences cuts contiguous budget-bounded packs in order") {
    val docs = Seq(
      ("s", 1L, 40L), ("s", 2L, 40L), ("s", 3L, 40L),   // pack 0: 40+40 cum, 3rd starts at 80
      ("s", 4L, 40L), ("s", 5L, 40L),
      ("t", 1L, 250L),                                   // oversize: own packs, next doc skips
      ("t", 2L, 10L))
      .toDF("src", "id", "tokens").repartition(3)
    val out = Packing.packSequences(docs, F.col("src"), F.col("id"), F.col("tokens"), 100L)
      .select("src", "id", "pack_id", "pack_pos")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val s = out.filter(_._1 == "s").map(r => (r._3, r._4))
    // cumsums before: 0,40,80,120,160 -> packs 0,0,0,1,1
    assert(s.toSeq === Seq((0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L), (1L, 1L)))
    val tpacks = out.filter(_._1 == "t").map(r => (r._2, r._3, r._4))
    // t1 starts at 0 -> pack 0; t2 starts at 250 -> pack 2 (pack 1 skipped)
    assert(tpacks.toSeq === Seq((1L, 0L, 0L), (2L, 2L, 0L)))
  }

  test("packSequences NULL tokens get NULL pack and consume no budget") {
    val docs = Seq(
      (1L, Option(60L)), (2L, Option.empty[Long]), (3L, Option(60L)))
      .toDF("id", "tokens")
    val out = Packing.packSequences(docs, F.lit("x"), F.col("id"), F.col("tokens"), 100L)
      .select("id", "pack_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(0L))
    assert(out(2L) === None)
    assert(out(3L) === Some(0L))   // cumsum before = 60, not 120
  }

  test("packSequences on real documents: every non-final pack is near budget") {
    val docs = sf("sf0.001", "documents")
    val budget = 2000L
    val out = Packing.packSequences(docs, F.col("source"), F.col("doc_id"),
        F.col("n_chars"), budget)
      .groupBy("source", "pack_id")
      .agg(F.sum("n_chars").as("total"), F.count(F.lit(1)).as("n"))
    val maxDoc = docs.agg(F.max("n_chars")).as[Long].head()
    val lastPacks = out.groupBy("source").agg(F.max("pack_id").as("last"))
    val nonFinal = out.join(lastPacks, "source")
      .filter(F.col("pack_id") =!= F.col("last"))
      .select("total").as[Long].collect()
    assert(nonFinal.nonEmpty)
    nonFinal.foreach(t => assert(t >= budget - maxDoc && t <= budget + maxDoc))
  }

  test("packBestFit: FFD layout, hand-checked") {
    // lengths 70, 60, 50, 40, 30, 20 at budget 100:
    // FFD: p0=70+30, p1=60+40, p2=50+20 (3 packs; sequential cut = 3 too
    // but with different fill); oversize 250 gets a singleton pack
    val docs = Seq(
      ("s", 1L, 40L), ("s", 2L, 70L), ("s", 3L, 30L),
      ("s", 4L, 60L), ("s", 5L, 50L), ("s", 6L, 20L),
      ("t", 7L, 250L), ("t", 8L, 10L))
      .toDF("src", "id", "tokens").repartition(3)
    val out = Packing.packBestFit(docs, "src", "id", "tokens", 100L)
      .select("src", "id", "pack_id", "pack_pos")
      .as[(String, Long, Long, Long)].collect()
    val s = out.filter(_._1 == "s").map(r => r._2 -> ((r._3, r._4))).toMap
    assert(s(2L) === ((0L, 0L)))   // 70 opens pack 0
    assert(s(4L) === ((1L, 0L)))   // 60 opens pack 1
    assert(s(5L) === ((2L, 0L)))   // 50 opens pack 2
    assert(s(1L) === ((1L, 1L)))   // 40 fits pack 1 (100-60)
    assert(s(3L) === ((0L, 1L)))   // 30 fits pack 0 (100-70)
    assert(s(6L) === ((2L, 1L)))   // 20 fits pack 2 (and pack 0/1 are full-ish: 0 rem 0, 1 rem 0)
    val tp = out.filter(_._1 == "t").map(r => r._2 -> r._3).toMap
    assert(tp(7L) === 0L && tp(8L) === 1L)  // oversize singleton, next opens its own
  }

  test("packBestFit: NULL tokens unpacked; budget, lower-bound and first-fit guarantees") {
    val withNull = Seq((1L, Option(60L)), (2L, Option.empty[Long]), (3L, Option(50L)))
      .toDF("id", "tokens").withColumn("src", F.lit("x"))
    val n = Packing.packBestFit(withNull, "src", "id", "tokens", 100L)
      .select("id", "pack_id").as[(Long, Option[Long])].collect().toMap
    assert(n(2L) === None && n(1L).isDefined && n(3L).isDefined)

    val docs = sf("sf0.001", "documents")
    val budget = 2000L
    val ffd = Packing.packBestFit(docs, "source", "doc_id", "n_chars", budget)
    // every pack fits the budget unless it is an oversize singleton
    val bad = ffd.groupBy("source", "pack_id")
      .agg(F.sum("n_chars").as("total"), F.count(F.lit(1)).as("n"))
      .filter(F.col("total") > budget && F.col("n") > 1)
      .count()
    assert(bad === 0L)
    // every doc packed exactly once
    assert(ffd.filter(F.col("pack_id").isNotNull).count() === docs.count())
    // pack count per source >= the ceil(total/budget) lower bound, and
    // the first-fit guarantee holds: at most ONE pack per stratum is
    // half-empty or worse (a second could not have been opened)
    val perPack = ffd.groupBy("source", "pack_id")
      .agg(F.sum("n_chars").as("total"))
    val counts = perPack.groupBy("source")
      .agg(F.count(F.lit(1)).as("fp"), F.sum("total").as("tok"),
        F.sum(F.when(F.col("total") * 2 <= budget, 1L).otherwise(0L)).as("halfEmpty"))
      .as[(String, Long, Long, Long)].collect()
    counts.foreach { case (src, fp, tok, halfEmpty) =>
      assert(fp >= (tok + budget - 1) / budget, s"$src below lower bound")
      assert(halfEmpty <= 1L, s"$src has $halfEmpty half-empty packs")
    }
  }

  // ------------------------------------------------ duplicate clusters

  test("duplicateClusters labels transitive components with their min id") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),            // chain -> component {1,2,3}
      (10L, 11L),                    // separate pair
      (20L, 21L), (21L, 22L), (20L, 22L))  // clique
      .toDF("id_a", "id_b").repartition(3)
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateClusters converges on a long path (diameter stress)") {
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect()
    assert(out.length === 16)   // nodes 0..15
    assert(out.forall(_._2 === 0L))
  }

  test("hybrid falls back to star on a 300-node path past the propagation budget") {
    // diameter 300 >> default maxIterations: min-label propagation
    // would silently mislabel here; the hybrid detects the blown
    // budget and re-solves with star contraction (O(log) rounds)
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .repartition(5)
    val out = Dedup.duplicateClusters(pairs, maxIterations = 8)
      .as[(Long, Long)].collect()
    assert(out.length === 301)
    assert(out.forall(_._2 === 0L))
    val star = Dedup.duplicateClustersStar(pairs).as[(Long, Long)].collect()
    assert(star.length === 301)
    assert(star.forall(_._2 === 0L))
  }

  test("star contraction equals min-label propagation on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 80
      val pairs = (1 to 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.toDF("id_a", "id_b").repartition(4)
      val star = Dedup.duplicateClustersStar(pairs)
        .as[(Long, Long)].collect().toMap
      val prop = Dedup.duplicateClustersPropagate(pairs, maxIterations = 100)
        .as[(Long, Long)].collect().toMap
      assert(star === prop, s"trial $trial diverged")
    }
  }

  test("self-pairs label themselves under both algorithms") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
    assert(out === Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    val star = Dedup.duplicateClustersStar(pairs).as[(Long, Long)].collect().toMap
    assert(star === Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("withSequentialIds equals the local sort index at any partitioning") {
    val keys = Seq(42L, 7L, 99L, 1L, 63L, 12L, 88L, 3L, 55L, 21L)
    val df = keys.toDF("k").repartition(4)
    val got = Sampling.withSequentialIds(df, F.col("k"))
      .as[(Long, Long)].collect().toMap
    val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
    assert(got === want)
    val offset = Sampling.withSequentialIds(df, F.col("k"), startAt = 100L)
      .as[(Long, Long)].collect().toMap
    assert(offset === want.view.mapValues(_ + 100L).toMap)
  }

  test("duplicateClusters on empty pairs yields empty labels") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.duplicateClusters(pairs).count() === 0L)
  }

  test("dropNearDuplicatesClustered keeps one representative per transitive cluster") {
    // B bridges A and C (A~B, B~C above threshold; A~C below): the
    // direct-pair rule would keep A and C; clustering keeps only A
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val mid = ((1 to 24).map(i => s"tok$i") ++ (31 to 36).map(i => s"tok$i")).mkString(" ")
    val far = ((1 to 18).map(i => s"tok$i") ++ (31 to 42).map(i => s"tok$i")).mkString(" ")
    val docs = Seq((1L, base), (2L, mid), (3L, far), (9L, "entirely different content here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
        shingleSize = 5, threshold = 0.6, bands = 16, rowsPerBand = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L)))   // the bridge shape is real
    val kept = Dedup.dropNearDuplicatesClustered(docs, "doc_id", "text",
        shingleSize = 5, threshold = 0.6, bands = 16, rowsPerBand = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 9L))
  }

  // ------------------------------------------------------- repetition

  test("repetitionScore measures the repeated-n-gram fraction") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),   // 5 bigrams, 1 distinct -> 0.8
      (2L, "the quick brown fox jumps high"),  // all distinct -> 0.0
      (3L, "one two"),                         // single bigram -> 0.0
      (4L, null.asInstanceOf[String]),
      (5L, "ha"))                              // < n words -> 0.0
      .toDF("id", "text")
    val out = df.select($"id", TextFunctions.repetitionScore($"text", 2).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 0.8) < 1e-12)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.0)
    assert(out(4L) === 0.0)
    assert(out(5L) === 0.0)
  }

  test("compressionRatio orders redundancy correctly and obeys NULL discipline") {
    val fluent = "the quick brown fox jumps over a lazy dog while birds sing nearby"
    val df = Seq(
      (1L, fluent),
      (2L, Seq.fill(8)(fluent).mkString(" ")),       // repeated -> lower ratio
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (4L, null.asInstanceOf[String]),
      (5L, ""))
      .toDF("id", "text")
    val out = df.select($"id", TextFunctions.compressionRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(2L).get < out(1L).get)   // repetition compresses better
    assert(out(3L).get < out(1L).get)   // token spam compresses better
    assert(out(1L).get > 0.0 && out(1L).get < 1.5)
    assert(out(4L).isEmpty && out(5L).isEmpty)
  }

  // --------------------------------------------------- decontamination

  test("wordNgrams builds distinct lowercase n-grams, empty for short/NULL docs") {
    val df = Seq(
      (1L, "The quick brown fox the QUICK brown"),
      (2L, "two words"),
      (3L, null.asInstanceOf[String]),
      (4L, "   "))
      .toDF("id", "text")
    val out = df.select($"id", Decontaminate.wordNgrams($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).toSet === Set(
      "the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
    assert(out(1L).length === 4)   // "the quick brown" deduped
    assert(out(2L) === Seq.empty)
    assert(out(3L) === Seq.empty)
    assert(out(4L) === Seq.empty)
  }

  test("ngramHashKernel gram boundaries match the wordNgrams reference form") {
    val texts = Seq(
      "The quick brown fox the QUICK brown",
      "two words",
      null.asInstanceOf[String],
      "   ",
      "a\tb\nc  de\ff\rg h i j",
      " leading and trailing  ",
      "repeat repeat repeat repeat repeat repeat")
    for (t <- texts; n <- Seq(1, 3, 5)) {
      val ref = Option(t).toSeq.toDF("text")
        .select(Decontaminate.wordNgrams($"text", n).as("g"))
        .as[Seq[String]].collect().headOption.getOrElse(Seq.empty)
      val kernel = Decontaminate.ngramHashKernel(t, n)
      // same number of DISTINCT grams, and distinct hashes stay distinct
      assert(kernel.length === ref.distinct.length, s"text=$t n=$n")
      assert(kernel.toSet.size === kernel.length, s"text=$t n=$n")
    }
  }

  test("contaminationFlags counts benchmark overlaps and dropContaminated removes them") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // contains bench 3-grams
      (2L, "completely unrelated text here now"),
      (3L, "alpha beta gamma unrelated tail"),     // one overlapping 3-gram
      (4L, "xx"))                                  // too short
      .toDF("doc_id", "text")
    val bench = Seq("ALPHA beta GAMMA delta prompt").toDF("text")
    val flags = Decontaminate
      .contaminationFlags(docs, "doc_id", "text", bench, "text", n = 3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // bench 3-grams: {alpha beta gamma, beta gamma delta, gamma delta prompt}
    assert(flags(1L) === ((2L, true)))
    assert(flags(2L) === ((0L, false)))
    assert(flags(3L) === ((1L, true)))
    assert(flags(4L) === ((0L, false)))

    val kept = Decontaminate
      .dropContaminated(docs, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))

    // minOverlap raises the bar
    val strict = Decontaminate
      .contaminationFlags(docs, "doc_id", "text", bench, "text", n = 3, minOverlap = 2)
      .filter($"contaminated").select("doc_id").as[Long].collect().toSet
    assert(strict === Set(1L))
  }

  test("contaminationFlags is map-only (no shuffle, no join in the corpus scan)") {
    val docs = sf("sf0.001", "documents")
    val bench = docs.filter(F.col("doc_id") % 17 === 0).select(F.col("text"))
    val flags = Decontaminate.contaminationFlags(docs, "doc_id", "text", bench, "text", n = 5)
    val plan = flags.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    // benchmark docs are in the corpus: every one must self-flag
    val benchIds = docs.filter(F.col("doc_id") % 17 === 0)
      .filter(F.size(Decontaminate.wordNgrams(F.col("text"), 5)) > 0)
      .select("doc_id").as[Long].collect().toSet
    val flagged = flags.filter($"contaminated").select("doc_id").as[Long].collect().toSet
    assert(benchIds.subsetOf(flagged))
  }

  test("stratifiedFixedK takes exactly k per stratum, deterministic, small strata whole") {
    val df = (1L to 1000L).map(i => (s"s${i % 3}", i)) ++ Seq(("tiny", 2000L))
    val data = df.toDF("src", "id")
    val out = Sampling.stratifiedFixedK(data, F.col("src"), F.col("id"), 50)
      .as[(String, Long)].collect()
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc === Map("s0" -> 50, "s1" -> 50, "s2" -> 50, "tiny" -> 1))
    // deterministic under repartition
    val again = Sampling.stratifiedFixedK(data.repartition(7), F.col("src"), F.col("id"), 50)
      .as[(String, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq === out.sortBy(r => (r._1, r._2)).toSeq)
  }

  // ------------------------------------------- boilerplate stripping

  test("stripBoilerplate removes frequent lines, preserves order, keeps NULLs") {
    val docs = Seq(
      (1L, "©2024 ACME\nreal content one\nall rights reserved"),
      (2L, "©2024 ACME\nreal content two\n\nall rights reserved"),
      (3L, "©2024 ACME\nall rights reserved"),                    // all boilerplate
      (4L, "unique document\nnothing shared"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val freq = Boilerplate.frequentSegments(docs, "text", "\n", 3L)
      .as[(String, Long)].collect().toMap
    assert(freq === Map("©2024 ACME" -> 3L, "all rights reserved" -> 3L))

    val out = Boilerplate.stripBoilerplate(docs, "text", "\n", "\n", 3L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "real content one")
    assert(out(2L) === "real content two")   // blank line dropped too
    assert(out(3L) === "")                   // all-boilerplate → empty, row kept
    assert(out(4L) === "unique document\nnothing shared")
    assert(out(5L) === null)

    // rewrite is map-only: no shuffle, no join in the executed plan
    val plan = Boilerplate.stripBoilerplate(docs, "text", "\n", "\n", 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("stripBoilerplateJoined equals the broadcast form row-for-row") {
    val docs = Seq(
      (1L, "©2024 ACME\nreal content one\nall rights reserved"),
      (2L, "©2024 ACME\nreal content two\n\nall rights reserved"),
      (3L, "©2024 ACME\nall rights reserved"),                    // all boilerplate
      (4L, "unique document\nnothing shared"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bcast = Boilerplate.stripBoilerplate(docs, "text", "\n", "\n", 3L)
      .as[(Long, String)].collect().toMap
    val joined = Boilerplate.stripBoilerplateJoined(
      docs, "doc_id", "text", "\n", "\n", 3L)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(joined === bcast)
    assert(joined(3L) === "")               // all-boilerplate → empty, row kept
    assert(joined(5L) === null)             // NULL stays NULL

    // and on a real corpus slice, word-separated (stresses ordering:
    // many segments per doc, reassembly must be position-exact)
    val real = sf("sf0.001", "documents").limit(200)
    val b2 = Boilerplate.stripBoilerplate(real, "text", "\\s+", " ", 20L)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val j2 = Boilerplate.stripBoilerplateJoined(real, "doc_id", "text", "\\s+", " ", 20L)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(j2 === b2)

    // nothing collected: the joined form's plan has no driver-side
    // literal segment table (plan over the parquet corpus — a Seq
    // fixture is itself a LocalTableScan)
    val plan = Boilerplate.stripBoilerplateJoined(real, "doc_id", "text", "\\s+", " ", 20L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("frequentSegmentSetCapped keeps the freq-desc prefix and counts truncation") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "a b"), (4L, "a z"))
      .toDF("doc_id", "text")
    // doc freqs: a=4, b=3, c=2, d=1, z=1 → qualifying at minDocFreq=2: a,b,c
    val (all, dropped0) = Boilerplate.frequentSegmentSetCapped(
      docs, "text", "\\s+", 2L, maxSegments = 10)
    assert(all === Set("a", "b", "c") && dropped0 === 0L)
    val (top2, dropped1) = Boilerplate.frequentSegmentSetCapped(
      docs, "text", "\\s+", 2L, maxSegments = 2)
    assert(top2 === Set("a", "b") && dropped1 === 1L)
    // cap boundary tie breaks by segment ASC: freq-2 tie between c and
    // a planted peer
    val docs2 = Seq(
      (1L, "a c"), (2L, "a b"), (3L, "b c"))
      .toDF("doc_id", "text")  // a=2, b=2, c=2
    val (topTie, droppedTie) = Boilerplate.frequentSegmentSetCapped(
      docs2, "text", "\\s+", 2L, maxSegments = 2)
    assert(topTie === Set("a", "b") && droppedTie === 1L)
  }

  test("frequentSegments counts document frequency, not occurrence frequency") {
    val docs = Seq(
      (1L, "dup dup dup other"),
      (2L, "dup something"),
      (3L, "unrelated words here"))
      .toDF("doc_id", "text")
    // "dup" occurs 4 times but in only 2 documents
    val freq = Boilerplate.frequentSegments(docs, "text", "\\s+", 2L)
      .as[(String, Long)].collect().toMap
    assert(freq === Map("dup" -> 2L))
  }

  test("map-only and join-based contamination flags agree on real documents") {
    val docs = sf("sf0.001", "documents")
    val bench = docs.filter(F.col("doc_id") % 17 === 0).select(F.col("text"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val fast = toMap(Decontaminate
      .contaminationFlags(docs, "doc_id", "text", bench, "text", n = 5))
    val lazyJ = toMap(Decontaminate
      .contaminationFlagsJoin(docs, "doc_id", "text", bench, "text", n = 5))
    assert(fast === lazyJ)
  }

  test("semantic decontamination flags exact and near copies, spares the rest") {
    import spark.implicits._
    // corpus: 3 well-separated directions, plus a near-copy of the
    // benchmark vector (cos ~0.99995) and an exact copy
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.999f, 0.001f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(0f, 0f, 1f)),
      (5L, Array(0.7f, 0.7f, 0f))).toDF("vec_id", "embedding")
    val bench = Seq(Tuple1(Array(1f, 0f, 0f))).toDF("embedding")
    val flags = Decontaminate.semanticContaminationFlags(
      corpus, "vec_id", "embedding", bench, "embedding",
      threshold = 0.999, nlist = 2, probeMass = 1.0)
      .as[(Long, Boolean)].collect().toMap
    assert(flags === Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> false))
    val kept = Decontaminate.dropSemanticContaminated(
      corpus, "vec_id", "embedding", bench, "embedding",
      threshold = 0.999, nlist = 2, probeMass = 1.0)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 5L))
    // NULL embeddings are never flagged, never dropped
    val withNull = corpus.unionByName(
      Seq((9L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val f2 = Decontaminate.semanticContaminationFlags(
      withNull, "vec_id", "embedding", bench, "embedding",
      threshold = 0.999, nlist = 2, probeMass = 1.0)
      .as[(Long, Boolean)].collect().toMap
    assert(f2(9L) === false)
  }

  test("ivfRadiusPairs at full probe mass equals the brute-force radius set") {
    import spark.implicits._
    val n = 60
    val vecs = (0 until n).map { i =>
      val a = i * 0.21
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(4)
    val idx = Similarity.buildIvfIndex(df, "vec_id", "embedding", 4)
    val got = Similarity
      .ivfRadiusPairs(idx, df, "vec_id", "embedding", 0.9, probeMass = 1.0)
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val want = (for {
      (qi, qv) <- vecs; (ni, nv) <- vecs
      if qi != ni && cos(qv, nv) >= 0.9
    } yield (qi, ni)).toSet
    assert(got === want)
  }
}
