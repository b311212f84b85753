package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val goodWords = Seq("insightful", "analysis", "thorough", "evidence", "clear")
  private val badWords = Seq("spam", "click", "winner", "casino", "pills")

  private def synth(n: Int, words: Seq[String], label: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val text = Seq.fill(8 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" ")
      (i.toLong, text, label)
    }
  }

  test("separates synthetic corpora; exported model matches MLlib scoring exactly") {
    val rows = synth(200, goodWords, 1, 1) ++ synth(200, badWords, 0, 2)
    val df = rows.toDF("id", "text", "label").repartition(4)
    val model = QualityClassifier.train(df, "text", "label", dim = 1 << 12, maxIter = 25)
    assert(model.coefficients.length === (1 << 12))

    val scored = QualityClassifier.score(df, "text", model)
    val acc = scored.filter(
      (F.col("quality_prob") >= 0.5 && F.col("label") === 1) ||
      (F.col("quality_prob") < 0.5 && F.col("label") === 0)).count()
    assert(acc === 400L)                       // fully separable vocabulary

    // the broadcast-dot-product scorer must agree with MLlib's own
    // transform to float precision — pins the murmur3/seed-42/mod
    // hashing replication
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol("features").setNumFeatures(1 << 12)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(25).setRegParam(1e-4)
      .setFeaturesCol("features").setLabelCol("label")
    val feats = tf.transform(df.select(
      F.col("id"),
      F.filter(F.split(F.col("text"), "\\s+"), t => F.length(t) > 0).as("__toks"),
      F.col("label").cast("double").as("label")))
    val mlModel = lr.fit(feats)
    val mlProbs = mlModel.transform(feats)
      .select(F.col("id"), F.element_at(
        org.apache.spark.ml.functions.vector_to_array(F.col("probability")), 2))
      .as[(Long, Double)].collect().toMap
    val ourProbs = scored.select("id", "quality_prob")
      .as[(Long, Double)].collect().toMap
    ourProbs.foreach { case (id, p) =>
      assert(math.abs(p - mlProbs(id)) < 1e-9, s"doc $id: $p vs ${mlProbs(id)}")
    }
  }

  test("NULL discipline and held-out generalization on unseen mixtures") {
    val train = synth(150, goodWords, 1, 3) ++ synth(150, badWords, 0, 4)
    val df = train.toDF("id", "text", "label")
    val model = QualityClassifier.train(df, "text", "label", dim = 1 << 12)
    // held-out docs mixing known vocabulary in fresh combinations
    val holdout = synth(50, goodWords, 1, 5) ++ synth(50, badWords, 0, 6)
    val scored = QualityClassifier.score(
      holdout.toDF("id", "text", "label"), "text", model)
    val acc = scored.filter(
      (F.col("quality_prob") >= 0.5 && F.col("label") === 1) ||
      (F.col("quality_prob") < 0.5 && F.col("label") === 0)).count()
    assert(acc >= 95L, s"held-out accuracy $acc/100")
    // NULL text scores NULL, never errors
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    assert(QualityClassifier.score(nulls, "text", model)
      .filter(F.col("quality_prob").isNull).count() === 1L)
  }

  test("non-power-of-two dim trains and scores consistently") {
    val rows = synth(100, goodWords, 1, 7) ++ synth(100, badWords, 0, 8)
    val df = rows.toDF("id", "text", "label")
    // HashingTF's nonNegativeMod works for any positive dim; the
    // broadcast scorer must use the same plain mod (no pow2 mask)
    val model = QualityClassifier.train(df, "text", "label", dim = 1000, maxIter = 25)
    assert(model.dim === 1000 && model.coefficients.length === 1000)
    val scored = QualityClassifier.score(df, "text", model)
    val acc = scored.filter(
      (F.col("quality_prob") >= 0.5 && F.col("label") === 1) ||
      (F.col("quality_prob") < 0.5 && F.col("label") === 0)).count()
    assert(acc === 200L)
  }
}
