package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class PackTokenStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq(10, 11, 12)),          // 3 tokens + EOS -> [0,3]
    (2L, Seq(20)),                  // [4,5]
    (3L, Seq(30, 31, 32, 33, 34)),  // [6,11]
    (4L, Seq.empty[Int]),           // EOS only [12,12]
    (5L, Seq(50, 51)))              // [13,15]

  test("packTokenStream: offsets and sequence spans match the driver layout") {
    val layout = Packing.packTokenStream(
        docs.toDF("id", "ids"), "id", F.size(F.col("ids")), seqLen = 4L)
      .orderBy("id")
      .select("id", "n_tokens", "token_offset", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(layout == Seq(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 1L, 4L, 1L, 1L),
      (3L, 5L, 6L, 1L, 2L),
      (4L, 0L, 12L, 3L, 3L),
      (5L, 2L, 13L, 3L, 3L)))
  }

  test("packedSequenceStats: every sequence full except the last; totals add up") {
    val layout = Packing.packTokenStream(
      docs.toDF("id", "ids"), "id", F.size(F.col("ids")), seqLen = 4L)
    val stats = Packing.packedSequenceStats(layout, 4L).orderBy("seq_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(stats == Seq((0L, 1L, 4L), (1L, 2L, 4L), (2L, 1L, 4L), (3L, 2L, 4L)))
    assert(stats.map(_._3).sum == docs.map(_._2.size + 1).sum)
  }

  test("packTokenIds: flattening the sequences reconstructs the EOS-joined stream") {
    val expected = docs.sortBy(_._1).flatMap { case (_, ids) => ids :+ -1 }
    for (seqLen <- Seq(3L, 4L, 7L, 100L)) {
      val seqs = Packing.packTokenIds(
          docs.toDF("id", "ids"), "id", F.col("ids"), seqLen, eosId = -1)
        .orderBy("seq_id").as[(Long, Seq[Int])].collect().toSeq
      assert(seqs.map(_._1) == seqs.indices.map(_.toLong), s"seqLen=$seqLen")
      assert(seqs.flatMap(_._2) == expected, s"seqLen=$seqLen")
      seqs.dropRight(1).foreach { case (_, ids) =>
        assert(ids.size == seqLen, s"seqLen=$seqLen")
      }
    }
  }

  test("packTokenStream on a larger randomized corpus stays consistent") {
    val rnd = new scala.util.Random(11)
    val big = (1L to 500L).map(i => (i, Seq.fill(rnd.nextInt(30))(1)))
    val layout = Packing.packTokenStream(
      big.toDF("id", "ids"), "id", F.size(F.col("ids")), seqLen = 64L)
    val rows = layout.orderBy("id")
      .select("n_tokens", "token_offset").as[(Long, Long)].collect().toSeq
    var off = 0L
    big.foreach { case (i, ids) =>
      val (n, o) = rows((i - 1).toInt)
      assert(n == ids.size && o == off, s"id=$i")
      off += ids.size + 1
    }
  }

  test("packedDocSpans: hand-checked within-sequence spans, gapless tiling") {
    val layout = Packing.packTokenStream(
      docs.toDF("id", "ids"), "id", F.size(F.col("ids")), seqLen = 4L)
    val spans = Packing.packedDocSpans(layout, "id", 4L)
      .orderBy("seq_id")
      .select(F.col("seq_id"),
        F.expr("transform(spans, sp -> array(sp.start, sp.`end`, CAST(sp.id AS INT)))"))
      .as[(Long, Seq[Seq[Int]])].collect().toSeq
    // global stream: doc1 [0,3] doc2 [4,5] doc3 [6,11] doc4 [12,12] doc5 [13,15]
    assert(spans === Seq(
      (0L, Seq(Seq(0, 3, 1))),                       // seq 0 = doc1
      (1L, Seq(Seq(0, 1, 2), Seq(2, 3, 3))),         // doc2 tail, doc3 head
      (2L, Seq(Seq(0, 3, 3))),                       // doc3 middle
      (3L, Seq(Seq(0, 0, 4), Seq(1, 3, 5)))))        // doc4 EOS, doc5
  }

  test("semanticOrder: cells contiguous, csim monotone within cell, adjacency gain") {
    import spark.implicits._
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val so = Packing.semanticOrder(emb, "vec_id", "embedding", idx)
      .select(F.col("vec_id"), F.col("__cell"), F.col("__csim"), F.col("ord"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._4)
    // ord unique; every doc present
    assert(so.map(_._4).distinct.length === so.length)
    assert(so.length === emb.count().toInt)
    // ascending ord never returns to a previous cell; csim non-increasing in cell
    so.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2)
        if (a._2 == b._2) assert(a._3 >= b._3 || (a._3 == b._3 && a._1 < b._1))
      case _ =>
    }
    // the point of the op: mean adjacent-pair cosine beats the id order
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def meanAdj(order: Seq[Long]): Double =
      order.sliding(2).collect { case Seq(x, y) => cos(vecs(x), vecs(y)) }
        .toSeq.sum / (order.length - 1)
    val semantic = meanAdj(so.map(_._1).toSeq)
    val byId = meanAdj(vecs.keys.toSeq.sorted)
    assert(semantic > byId + 0.05,
      s"semantic adjacency $semantic vs id-order $byId")
    // NULL vectors are dropped, not erred
    val withNull = emb.unionByName(Seq((999999L,
      null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    assert(Packing.semanticOrder(withNull, "vec_id", "embedding", idx)
      .filter(F.col("vec_id") === 999999L).count() === 0L)
    // and the ord key feeds packTokenStream directly
    val layout = Packing.packTokenStream(
      Packing.semanticOrder(emb, "vec_id", "embedding", idx)
        .withColumn("n_tokens", F.lit(7L)),
      "ord", F.col("n_tokens"), 64L)
    assert(layout.agg(F.max(F.col("token_offset") + F.col("n_tokens") + 1L))
      .head().getLong(0) === emb.count() * 8L)
  }

  test("lengthBucketBatches: deterministic batches, waste accounting exact, sorted <= arrival") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 100L), (3L, 12L), (4L, 98L), (5L, 11L), (6L, 99L))
      .toDF("id", "len0")
    val b = Packing.lengthBucketBatches(rows, "id", F.col("len0"), 3)
      .select("id", "batch", "batch_pos")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // length-desc order: 2(100), 6(99), 4(98) | 3(12), 5(11), 1(10)
    assert(b(2L) == ((0L, 0)) && b(6L) == ((0L, 1)) && b(4L) == ((0L, 2)))
    assert(b(3L) == ((1L, 0)) && b(5L) == ((1L, 1)) && b(1L) == ((1L, 2)))
    val rep = Packing.paddingWasteReport(
        Packing.lengthBucketBatches(rows, "id", F.col("len0"), 3))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    // batch 0: 100*3 - 297 = 3; batch 1: 12*3 - 33 = 3
    assert(rep(0L) == 3L && rep(1L) == 3L)
    // arrival order (1,2,3 | 4,5,6): 100*3-122=178, 99*3-208=89 -> worse
    val arrival = Seq((10L, 0L), (100L, 0L), (12L, 0L), (98L, 1L), (11L, 1L), (99L, 1L))
      .toDF("len", "batch")
    val wa = Packing.paddingWasteReport(arrival)
      .agg(F.sum($"padding_waste")).as[Long].head()
    assert(wa == 178L + 89L && 6L <= wa)
  }
}
