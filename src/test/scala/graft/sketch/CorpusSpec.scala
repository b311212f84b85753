package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/**
 * Production corpus: 6,235 (expected_sum, expected_count, hex) tuples
 * auto-generated from a production parquet file, ported as a TSV resource
 * (reference: src/sketch_test_data.rs:1-6239; tests
 * src/datadog_encoding.rs:1374-1523).
 */
class CorpusSpec extends AnyFunSuite {

  private lazy val corpus: Seq[(Double, Double, String)] = {
    val src = Source.fromResource("graft/sketch_corpus.tsv")
    try src.getLines().map { line =>
      val parts = line.split('\t')
      (parts(0).toDouble, parts(1).toDouble, if (parts.length > 2) parts(2) else "")
    }.toVector
    finally src.close()
  }

  test("corpus has 6235 sketches") {
    assert(corpus.size == 6235)
  }

  test("decode all: count exact, sum within 5%") {
    var failures = 0
    corpus.zipWithIndex.foreach { case ((expSum, expCount, hex), i) =>
      val s = DataDogCodec.decode(DataDogCodec.hexToBytes(hex))
      assert(s.count == expCount, s"count mismatch at $i")
      if (expSum != 0.0) {
        val relErr = math.abs(s.sum - expSum) / math.abs(expSum)
        if (relErr > 0.05) failures += 1
      }
    }
    assert(failures == 0, s"$failures sketches with sum error > 5%")
  }

  test("merge entire corpus into one sketch") {
    val total = DDSketch(0.01)
    var expCount = 0.0
    corpus.foreach { case (_, c, hex) =>
      val s = DataDogCodec.decode(DataDogCodec.hexToBytes(hex))
      total.merge(s)
      expCount += c
    }
    assert(total.count == expCount)
    // encode/decode the merged giant and confirm count survives exactly
    val rt = DataDogCodec.decode(DataDogCodec.encode(total))
    assert(rt.count == expCount)
  }

  test("merge corpus in batches of 100, then merge the batches") {
    val batches = corpus.grouped(100).map { group =>
      val b = DDSketch(0.01)
      group.foreach { case (_, _, hex) =>
        b.merge(DataDogCodec.decode(DataDogCodec.hexToBytes(hex)))
      }
      b
    }.toSeq
    val total = DDSketch(0.01)
    batches.foreach(total.merge)
    assert(total.count == corpus.map(_._2).sum)
  }
}
