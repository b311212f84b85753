package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class EmbeddingsSpec extends SparkTestBase {
  import spark.implicits._

  test("l2Normalize: unit norm, zero and NULL vectors -> NULL") {
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),
      (3L, None)
    ).toDF("id", "v")
    val out = df.select($"id", Embeddings.l2Normalize($"v").as("n"))
      .orderBy("id").collect()
    val n1 = out(0).getSeq[Double](1)
    assert(math.abs(n1(0) - 0.6) < 1e-12 && math.abs(n1(1) - 0.8) < 1e-12)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("truncateNormalize keeps the prefix and renormalizes; short input -> NULL") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 100.0f)),
      (2L, Seq(1.0f))
    ).toDF("id", "v")
    val out = df.select($"id", Embeddings.truncateNormalize($"v", 2).as("n"))
      .orderBy("id").collect()
    val n1 = out(0).getSeq[Double](1)
    assert(n1.length == 2 && math.abs(n1(0) - 0.6) < 1e-12)
    assert(out(1).isNullAt(1))
  }

  test("quantizeInt8 round-trips within scale/2 per element; zero vector is stable") {
    val df = Seq(
      (1L, Seq(0.5f, -1.27f, 0.001f, 1.27f)),
      (2L, Seq(0.0f, 0.0f))
    ).toDF("id", "v")
    val q = df.select($"id", $"v", Embeddings.quantizeInt8($"v").as("q"))
    val out = q.select($"id", $"v", $"q.scale".as("scale"),
        Embeddings.dequantInt8($"q").as("deq"))
      .orderBy("id").collect()
    val r1 = out(0)
    val v = r1.getSeq[Float](1)
    val scale = r1.getDouble(2)
    val deq = r1.getSeq[Double](3)
    assert(math.abs(scale - 1.27 / 127.0) < 1e-9)
    v.indices.foreach { i =>
      assert(math.abs(deq(i) - v(i)) <= scale / 2 + 1e-12,
        s"elem $i: ${deq(i)} vs ${v(i)}")
    }
    val r2 = out(1)
    assert(r2.getDouble(2) == 0.0 && r2.getSeq[Double](3).forall(_ == 0.0))
  }

  test("quantizeInt8 codes stay within [-127, 127]") {
    val emb = sf("sf0.001", "embeddings")
    val bad = emb.select(Embeddings.quantizeInt8($"embedding").as("q"))
      .select(F.explode($"q.codes").as("c"))
      .filter($"c" > 127 || $"c" < -127)
    assert(bad.isEmpty)
  }

  test("jacobiEigen recovers a known spectrum") {
    // A = Q diag(5, 2, 1) Q^T with a hand-rolled orthogonal Q
    val m = Array(
      Array(3.38, 1.38, 0.16),
      Array(1.38, 3.38, 0.16),
      Array(0.16, 0.16, 3.24))
    // symmetric with eigenvalues ~ {2.0, 4.84..., 3.16...}: verify
    // round-trip instead of hand-computed values: V diag(e) V^T == A
    val (evals, evecs) = Embeddings.jacobiEigen(m)
    val d = 3
    for (i <- 0 until d; j <- 0 until d) {
      val recon = (0 until d).map(k => evecs(k)(i) * evals(k) * evecs(k)(j)).sum
      assert(math.abs(recon - m(i)(j)) < 1e-9, s"($i,$j): $recon vs ${m(i)(j)}")
      val dot = (0 until d).map(t => evecs(i)(t) * evecs(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("fitPca finds the dominant axis of an anisotropic cloud") {
    // points along (1,1,0)/sqrt(2) with small noise on other axes
    val rows = (0 until 600).map { i =>
      val t = ((i * 37) % 200 - 100) / 10.0          // in [-10, 10]
      val n1 = ((i * 53) % 21 - 10) / 100.0          // [-0.1, 0.1]
      val n2 = ((i * 71) % 21 - 10) / 100.0
      Tuple1(Seq((t / math.sqrt(2) + n1).toFloat,
        (t / math.sqrt(2) - n1).toFloat, n2.toFloat))
    }
    val df = rows.toDF("v")
    val model = Embeddings.fitPca(df, $"v", 2)
    assert(model.k == 2 && model.dim == 3)
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    val c0 = model.components(0)
    val along = math.abs(c0(0) / math.sqrt(2) + c0(1) / math.sqrt(2))
    assert(along > 0.999, s"dominant axis ${c0.toSeq}")
    // projection de-correlates: sample covariance of the 2 projected
    // coords matches diag(eigenvalues)
    val proj = df.select(Embeddings.pcaProject($"v", model).as("p"))
      .select($"p".getItem(0).as("a"), $"p".getItem(1).as("b"))
    val stats = proj.agg(
      F.count(F.lit(1)), F.sum($"a"), F.sum($"b"),
      F.sum($"a" * $"a"), F.sum($"b" * $"b"), F.sum($"a" * $"b"))
      .collect().head
    val n = stats.getLong(0).toDouble
    val va = stats.getDouble(3) / n - math.pow(stats.getDouble(1) / n, 2)
    val vb = stats.getDouble(4) / n - math.pow(stats.getDouble(2) / n, 2)
    val cab = stats.getDouble(5) / n -
      (stats.getDouble(1) / n) * (stats.getDouble(2) / n)
    assert(math.abs(va - model.eigenvalues(0)) < 1e-6 * math.max(1, va))
    assert(math.abs(vb - model.eigenvalues(1)) < 1e-6 * math.max(1, vb))
    assert(math.abs(cab) < 1e-8)
  }

  test("pca save/load round-trips the model") {
    val df = sf("sf0.001", "embeddings")
    val model = Embeddings.fitPca(df, $"embedding", 8)
    val path = System.getProperty("java.io.tmpdir") + "/graft_pca_rt"
    model.save(spark, path)
    val back = Embeddings.loadPca(spark, path)
    assert(back.mean.toSeq == model.mean.toSeq)
    assert(back.eigenvalues.toSeq == model.eigenvalues.toSeq)
    assert(back.components.map(_.toSeq).toSeq ==
      model.components.map(_.toSeq).toSeq)
  }

  test("fitPca on real embeddings: descending nonnegative spectrum, orthonormal basis") {
    val df = sf("sf0.001", "embeddings")
    val model = Embeddings.fitPca(df, $"embedding", 16)
    assert(model.eigenvalues.toSeq == model.eigenvalues.sorted(Ordering[Double].reverse).toSeq)
    assert(model.eigenvalues.forall(_ >= 0.0))
    for (i <- 0 until model.k; j <- i until model.k) {
      val dot = model.components(i).zip(model.components(j)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"($i,$j) dot=$dot")
    }
  }

  test("projection is map-only: no exchange in the plan") {
    val df = sf("sf0.001", "embeddings")
    val model = Embeddings.fitPca(df, $"embedding", 4)
    val plan = df.select(Embeddings.pcaProject($"embedding", model).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pcaWhiten decorrelates a planted correlated cloud to unit variance") {
    // y = 2x + bounded deterministic noise: strongly correlated dims
    val pts = (0 until 200).map { i =>
      val x = (i % 40) / 10.0
      val noise = ((i * 37) % 11 - 5) / 25.0
      (i.toLong, Array(x.toFloat, (2.0 * x + noise).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding").repartition(4)
    val model = Embeddings.fitPca(df, $"embedding", 2)
    val w = df.select(Embeddings.pcaWhiten($"embedding", model).as("w"))
      .as[Seq[Double]].collect()
    val n = w.length.toDouble
    (0 until 2).foreach { j =>
      val mean = w.map(_(j)).sum / n
      val variance = w.map(v => v(j) * v(j)).sum / n - mean * mean
      assert(math.abs(mean) < 1e-9, s"dim $j mean $mean")
      assert(math.abs(variance - 1.0) < 1e-6, s"dim $j var $variance")
    }
    val cov = w.map(v => v(0) * v(1)).sum / n
    assert(math.abs(cov) < 1e-9, s"cross-cov $cov")
    // NULL and wrong-width vectors whiten to NULL
    val bad = Seq((1L, null.asInstanceOf[Array[Float]]), (2L, Array(1f)))
      .toDF("vec_id", "embedding")
      .select(Embeddings.pcaWhiten($"embedding", model).as("w"))
      .collect()
    assert(bad.forall(_.isNullAt(0)))
  }
}
