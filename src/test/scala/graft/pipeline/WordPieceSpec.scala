package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  test("segment is greedy longest-match-first with ## continuations") {
    val m = WordPiece.Model(Set("un", "##able", "##abl", "##e", "u", "##n",
      "##a", "##b", "##l", "w"))
    assert(WordPiece.segment(m, "unable").toSeq == Seq("un", "##able"))
    // greedy: "##abl" never chosen because "##able" is longer
    assert(WordPiece.segment(m, "unabl").toSeq == Seq("un", "##abl"))
    // word-initial pieces never match mid-word and vice versa
    assert(WordPiece.segment(m, "u").toSeq == Seq("u"))
    assert(WordPiece.segment(m, "nn").toSeq == Seq(m.unk)) // no initial "n"
    assert(WordPiece.segment(m, "ux").toSeq == Seq(m.unk)) // unknown char
    assert(WordPiece.segment(m, "").toSeq == Seq.empty)
    val long = "w" * 300
    assert(WordPiece.segment(m, long).toSeq == Seq(m.unk)) // maxInputChars guard
  }

  test("learn guarantees zero UNK and exact reconstruction on its corpus") {
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest widest")
      .toDF("text")
    for (v <- Seq(1, 16, 40)) {
      val m = WordPiece.learn(docs, "text", v)
      val toks = WordPiece.tokenize(docs, "text", m)
        .select(F.col("tokens")).as[Seq[String]].collect().head
      assert(!toks.contains(m.unk), s"v=$v: $toks")
      // strip ## and re-join continuations: must reconstruct the words
      val rebuilt = toks.foldLeft(Vector.empty[String]) { (acc, p) =>
        if (p.startsWith("##")) acc.init :+ (acc.last + p.drop(2))
        else acc :+ p
      }
      assert(rebuilt ==
        "low low low lower lower newest newest newest newest widest widest"
          .split(" ").toVector, s"v=$v")
    }
    // a generous budget learns multi-char pieces (the 'est' family)
    val m = WordPiece.learn(docs, "text", 60)
    assert(m.pieces.exists(p => p.length > 3 && p.startsWith("##")), m.pieces)
  }

  test("words with unseen characters degrade to UNK; NULL text passes through") {
    val train = Seq("abc abc bca").toDF("text")
    val m = WordPiece.learn(train, "text", 20)
    val probe = Seq((1L, "abc xyz"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = WordPiece.tokenize(probe, "text", m)
      .select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(1L).get.last == m.unk)
    assert(!out(1L).get.init.contains(m.unk))
    assert(out(2L).isEmpty)
  }
}
