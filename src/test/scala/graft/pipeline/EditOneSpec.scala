package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class EditOneSpec extends SparkTestBase {
  import spark.implicits._
  import Dedup.{editDistanceLeOne, editOnePairs}

  test("editDistanceLeOne decides all edit classes") {
    assert(editDistanceLeOne("abc", "abc"))
    assert(editDistanceLeOne("abc", "abd"))   // substitution
    assert(editDistanceLeOne("abc", "abcd"))  // append
    assert(editDistanceLeOne("abc", "xabc"))  // prepend
    assert(editDistanceLeOne("abc", "ac"))    // delete middle
    assert(editDistanceLeOne("", "a"))
    assert(editDistanceLeOne("", ""))
    assert(!editDistanceLeOne("abc", "axc".replace('x', 'y') + "z")) // dist 2
    assert(!editDistanceLeOne("abc", "abcde")) // length gap 2
    assert(!editDistanceLeOne("ab", "ba"))     // transposition is dist 2
    assert(!editDistanceLeOne("abcd", "axyd")) // two substitutions
  }

  test("editOnePairs equals brute force on random short strings") {
    val rnd = new scala.util.Random(11)
    val strs = (0L until 120L).map { i =>
      val base = Array.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar)
      (i, new String(base))
    }
    val df = strs.toDF("id", "s").repartition(4)
    val got = editOnePairs(df, "id", "s")
      .as[(Long, Long)].collect().toSet
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && editDistanceLeOne(sa, sb)
    } yield (ia, ib)).toSet
    assert(got === want)
    assert(want.nonEmpty) // the tiny alphabet guarantees real pairs
  }

  test("incremental probe vs persisted index equals the self-join restricted to cross pairs") {
    val rnd = new scala.util.Random(23)
    def mk(n: Int, off: Long) = (0 until n).map { i =>
      (off + i, new String(Array.fill(3 + rnd.nextInt(3))(('a' + rnd.nextInt(3)).toChar)))
    }
    val hist = mk(60, 0L)
    val batch = mk(25, 1000L)
    val dir = java.nio.file.Files.createTempDirectory("editidx").toString
    Dedup.buildEditOneIndex(hist.toDF("id", "s"), "id", "s")
      .write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val got = Dedup.incrementalEditOnePairs(idx, batch.toDF("id", "s"), "id", "s")
      .as[(Long, Long)].collect().toSet
    val want = (for {
      (ib, sb) <- batch; (ih, sh) <- hist
      if Dedup.editDistanceLeOne(sb, sh)
    } yield (ib, ih)).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("rows above maxLen emit no keys; NULLs skipped") {
    val df = Seq((1L, "short"), (2L, "shorts"), (3L, "x" * 300),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val got = editOnePairs(df, "id", "s", maxLen = 100)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }
}
