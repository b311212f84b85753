package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  test("scrubPii redacts emails, IPs, and phone-shaped runs, leaves prose alone") {
    val df = Seq(
      (1L, "write to jane.doe+x@sub.example.co.uk or bob@ex.io today"),
      (2L, "server at 192.168.001.1 port 8080"),
      (3L, "call +1 555-123-4567 or (020) 7946 0958 now"),
      (4L, "released in 2024, version 1.2.3, about 10 000 items"))
      .toDF("id", "text")
    val out = df.select($"id", Scrub.scrubPii($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "write to <EMAIL> or <EMAIL> today")
    assert(out(2L) === "server at <IP> port 8080")
    assert(out(3L).contains("<PHONE>") && !out(3L).exists(_.isDigit))
    // no false positives on years/versions (1.2.3 is not a dotted quad)
    assert(out(4L) === "released in 2024, version 1.2.3, about 10 000 items")
  }

  test("piiCounts tallies per kind without double-counting IPs as phones") {
    val df = Seq(("a@b.io c@d.io at 10.0.0.1 call 555-123-4567", 1)).toDF("text", "x")
    val r = df.select(Scrub.piiCounts($"text").as("p"))
      .select("p.emails", "p.ips", "p.phones").as[(Int, Int, Int)].head()
    assert(r === ((2, 1, 1)))
  }

  test("chunkWords covers every word with the right overlap and bounds") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")   // 10 words
    val df = Seq((7L, text)).toDF("id", "text")
    val chunks = Scrub.chunkWords(df, $"text", chunkWords = 4, overlapWords = 1)
      .select("chunk_idx", "chunk_text").as[(Int, String)].collect().sortBy(_._1)
    // stride 3: starts 1, 4, 7 -> [w1-w4], [w4-w7], [w7-w10]
    assert(chunks.toSeq === Seq(
      (0, "w1 w2 w3 w4"), (1, "w4 w5 w6 w7"), (2, "w7 w8 w9 w10")))
  }

  test("chunkWords edge cases: short, exact, empty, NULL") {
    val df = Seq(
      (1L, Option("a b")),            // shorter than chunk: 1 chunk
      (2L, Option("a b c d")),        // exactly one chunk
      (3L, Option("")),               // empty: 1 empty chunk
      (4L, Option.empty[String]))     // NULL: 1 empty chunk
      .toDF("id", "text")
    val out = Scrub.chunkWords(df, $"text", chunkWords = 4)
      .groupBy("id").agg(F.count(F.lit(1)).as("n"),
        F.min("chunk_text").as("t"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((1L, "a b")))
    assert(out(2L) === ((1L, "a b c d")))
    assert(out(3L) === ((1L, "")))
    assert(out(4L) === ((1L, "")))
  }

  test("chunkWords without overlap partitions the words exactly") {
    val docs = sf("sf0.001", "documents")
    val chunked = Scrub.chunkWords(docs, F.col("text"), chunkWords = 40)
    val wordTotal = docs.select(
        F.size(F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), "\\s+"),
          w => F.length(w) > 0)).as("n"))
      .agg(F.sum("n")).as[Long].head()
    val chunkWordTotal = chunked.select(
        F.size(F.filter(F.split(F.col("chunk_text"), "\\s+"),
          w => F.length(w) > 0)).as("n"))
      .agg(F.sum("n")).as[Long].head()
    assert(chunkWordTotal === wordTotal)   // no word lost, none duplicated
  }

  test("luhnValid: checksum accepts the test numbers, rejects the off-by-ones") {
    assert(Scrub.luhnValid("4111111111111111"))    // Visa test number
    assert(Scrub.luhnValid("5500000000000004"))    // MC test number
    assert(Scrub.luhnValid("378282246310005"))     // 15-digit Amex
    assert(!Scrub.luhnValid("4111111111111112"))
    assert(!Scrub.luhnValid("5500000000000005"))
    assert(Scrub.luhnValid("0000000000000"))       // degenerate but checksum-true
  }

  test("scrubCreditCards: Luhn gate, separators, digit-run boundaries") {
    def sc(s: String) = Scrub.scrubCardsKernel(s, "<CC>")
    assert(sc("pay 4111 1111 1111 1111 now") == "pay <CC> now")
    assert(sc("pay 4111-1111-1111-1111 now") == "pay <CC> now")
    assert(sc("pay 4111111111111111 now") == "pay <CC> now")
    assert(sc("amex 378282246310005.") == "amex <CC>.")
    // Luhn-invalid: left alone (order ids are content, not PII)
    assert(sc("order 4111111111111112 shipped") == "order 4111111111111112 shipped")
    // out of card range: 12 and 21 digits
    assert(sc("id 123456789012 x") == "id 123456789012 x")
    assert(sc("acct 123456789012345678901 x") == "acct 123456789012345678901 x")
    // two cards in one text
    assert(sc("a 4111111111111111 b 5500000000000004 c") == "a <CC> b <CC> c")
    assert(sc("no digits here") == "no digits here")
    assert(sc(null) == null)
    assert(sc("") == "")
  }

  test("scrubPiiAll scrubs cards before phone-shaped runs eat the separators") {
    val out = Seq(("card 4111-1111-1111-1111 tel 555-123-4567 ip 10.0.0.1 m a@b.io", 1))
      .toDF("text", "x")
      .select(Scrub.scrubPiiAll(F.col("text")).as("t")).as[String].head()
    assert(out.contains("<CC>") && out.contains("<PHONE>") &&
      out.contains("<IP>") && out.contains("<EMAIL>"))
    assert(!out.exists(_.isDigit))
  }
}
