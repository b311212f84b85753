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

  test("editDistanceAtMost agrees with the full DP on random strings") {
    def full(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val a = new String(Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar))
      val b = new String(Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar))
      for (k <- 0 to 4)
        assert(Dedup.editDistanceAtMost(a, b, k) === (full(a, b) <= k),
          s"'$a' vs '$b' at k=$k (full=${full(a, b)})")
    }
  }

  test("PassJoin probe keys reach every string within k edits (pigeonhole recall)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 300) {
      val k = 1 + rnd.nextInt(3)
      val n = k + 1 + rnd.nextInt(30)
      val base = new String(Array.fill(n)(('a' + rnd.nextInt(6)).toChar))
      // apply exactly k random edits
      var t = base
      for (_ <- 0 until k) {
        val op = rnd.nextInt(3)
        val p = rnd.nextInt(t.length + (if (op == 1) 1 else 0))
        t = op match {
          case 0 if t.nonEmpty => // substitute
            t.substring(0, p.min(t.length - 1)) + ('a' + rnd.nextInt(6)).toChar +
              t.substring(p.min(t.length - 1) + 1)
          case 1 => t.substring(0, p) + ('a' + rnd.nextInt(6)).toChar + t.substring(p)
          case _ if t.length > 1 => // delete
            val q = rnd.nextInt(t.length); t.substring(0, q) + t.substring(q + 1)
          case _ => t
        }
      }
      val indexKeys = Dedup.passJoinSegments(base, k)
        .map { case (seg, i, _) =>
          // private segKey replicated through the index builder instead:
          (seg, i, base.length)
        }.toSet
      // drive through the public pair: the probe must find base
      val df = Seq((0L, base), (1L, t)).toDF("id", "s")
      val pairs = Dedup.editKPairs(df, "id", "s", k = k, maxLen = 64)
        .as[(Long, Long)].collect()
      assert(pairs.contains((0L, 1L)), s"missed base='$base' t='$t' k=$k")
    }
  }

  test("editKPairs end to end: planted 2-edit variants, no false pairs beyond") {
    val keys = (0L until 150L).map(i =>
      (i, java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString))
    // 'z'/'y' never occur in md5 hex → exactly two substitutions
    val variants = keys.map { case (i, h) =>
      (i + 1000L, "z" + h.substring(1, 10) + "y" + h.substring(11)) }
    val df = (keys ++ variants).toDF("id", "s").repartition(4)
    val pairs = Dedup.editKPairs(df, "id", "s", k = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs === keys.map { case (i, _) => (i, i + 1000L) }.toSet)
    // at k = 1 the same variants are out of reach
    assert(Dedup.editKPairs(df, "id", "s", k = 1)
      .as[(Long, Long)].collect().isEmpty)
  }
}
