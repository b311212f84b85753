package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class MegatronIdxSpec extends SparkTestBase {
  import MegatronIdx._

  test("encodeShard golden header: magic, version, dtype, counts, sizes, pointers") {
    val (idx, bin) = encodeShard(Array(Array(1, 2, 3), Array(65535)), DtypeInt32)
    // magic
    assert(new String(idx.slice(0, 7), "ISO-8859-1") === "MMIDIDX")
    assert(idx(7) === 0.toByte && idx(8) === 0.toByte)
    def le(at: Int, n: Int): Long =
      (0 until n).map(i => (idx(at + i) & 0xffL) << (8 * i)).sum
    assert(le(9, 8) === 1L)        // version
    assert((idx(17) & 0xff) === 4) // dtype int32
    assert(le(18, 8) === 2L)       // sequences
    assert(le(26, 8) === 3L)       // doc_idx length = n + 1
    assert(le(34, 4) === 3L && le(38, 4) === 1L)   // sizes
    assert(le(42, 8) === 0L && le(50, 8) === 12L)  // byte pointers
    assert(le(58, 8) === 0L && le(66, 8) === 1L && le(74, 8) === 2L) // doc_idx
    assert(bin.length === 16)
    // int32 LE payload: 1,2,3,65535
    assert((bin(0) & 0xff) === 1 && (bin(4) & 0xff) === 2 && (bin(8) & 0xff) === 3)
    assert((bin(12) & 0xff) === 0xff && (bin(13) & 0xff) === 0xff && bin(14) === 0)
  }

  test("uint16 halves the payload; out-of-range ids rejected") {
    val (_, bin) = encodeShard(Array(Array(7, 65535)), DtypeUint16)
    assert(bin.length === 4)
    assertThrows[IllegalArgumentException] {
      encodeShard(Array(Array(65536)), DtypeUint16)
    }
    assertThrows[IllegalArgumentException] {
      encodeShard(Array(Array(-1)), DtypeUint16)
    }
  }

  test("decodeShard inverts encodeShard for both dtypes") {
    val seqs = Array(Array(0, 1, 2, 3), Array.empty[Int], Array(42))
    for (dt <- Seq(DtypeInt32, DtypeUint16)) {
      val (idx, bin) = encodeShard(seqs, dt)
      val back = decodeShard(idx, bin)
      assert(back.map(_.toSeq).toSeq === seqs.map(_.toSeq).toSeq, s"dtype $dt")
    }
    // int32 round-trips negatives (special tokens use them)
    val neg = Array(Array(-3, Int.MaxValue))
    val (i2, b2) = encodeShard(neg, DtypeInt32)
    assert(decodeShard(i2, b2).head.toSeq === Seq(-3, Int.MaxValue))
  }

  test("decodeShard reads every integral external dtype: u8, i8, i16, i64") {
    // hand-build .idx/.bin pairs in the external dtypes the write path
    // never emits (public Megatron table: 1=u8, 2=i8, 3=i16, 5=i64)
    def build(dtype: Int, itemSize: Int,
              put: (java.io.ByteArrayOutputStream, Long) => Unit,
              seqs: Seq[Seq[Long]]): (Array[Byte], Array[Byte]) = {
      val bin = new java.io.ByteArrayOutputStream()
      val sizes = seqs.map(_.length)
      val pointers = sizes.scanLeft(0L)((a, s) => a + s.toLong * itemSize).init
      seqs.flatten.foreach(v => put(bin, v))
      val idx = new java.io.ByteArrayOutputStream()
      idx.write("MMIDIDX".getBytes("US-ASCII")); idx.write(0); idx.write(0)
      def le(v: Long, n: Int): Unit = {
        var x = v; (0 until n).foreach { _ => idx.write((x & 0xff).toInt); x >>>= 8 }
      }
      le(1L, 8); idx.write(dtype); le(seqs.length.toLong, 8)
      le(seqs.length.toLong + 1, 8)
      sizes.foreach(s => le(s.toLong, 4))
      pointers.foreach(p => le(p, 8))
      (0 to seqs.length).foreach(d => le(d.toLong, 8))
      (idx.toByteArray, bin.toByteArray)
    }
    def putLe(n: Int)(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      var x = v; (0 until n).foreach { _ => o.write((x & 0xff).toInt); x >>>= 8 }
    }
    // u8: zero-extended
    val (i1, b1) = build(1, 1, putLe(1), Seq(Seq(0L, 127L, 255L)))
    assert(decodeShard(i1, b1).map(_.toSeq).toSeq === Seq(Seq(0, 127, 255)))
    // i8: sign-extended
    val (i2, b2) = build(2, 1, putLe(1), Seq(Seq(-1L & 0xff, 5L)))
    assert(decodeShard(i2, b2).map(_.toSeq).toSeq === Seq(Seq(-1, 5)))
    // i16: sign-extended
    val (i3, b3) = build(3, 2, putLe(2), Seq(Seq(-2L & 0xffff, 32767L)))
    assert(decodeShard(i3, b3).map(_.toSeq).toSeq === Seq(Seq(-2, 32767)))
    // i64: exact within Int range, loud outside it
    val (i5, b5) = build(5, 8, putLe(8), Seq(Seq(123456789L, -7L)))
    assert(decodeShard(i5, b5).map(_.toSeq).toSeq === Seq(Seq(123456789, -7)))
    val (i5b, b5b) = build(5, 8, putLe(8), Seq(Seq(1L << 40)))
    assertThrows[IllegalArgumentException] { decodeShard(i5b, b5b) }
    // float codes rejected
    val (i6, b6) = build(6, 4, putLe(4), Seq(Seq(0L)))
    assertThrows[IllegalArgumentException] { decodeShard(i6, b6) }
  }

  test("sharded write/read round-trips a DataFrame, NULL rows skipped") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (0L until 57L).map(i =>
      (i, Array.tabulate((i % 5).toInt + 1)(j => (i + j).toInt))) :+
      (99L, null.asInstanceOf[Array[Int]])
    val df = rows.toDF("id", "ids").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("megatron").toString
    val n = MegatronIdx.write(df, F.col("ids"), dir)
    assert(n === 57L)
    val back = MegatronIdx.read(spark, dir)
    assert(back.count() === 57L)
    // multiset equality of the sequences
    val a = back.select(F.col("ids")).groupBy(F.col("ids")).count()
    val b = df.filter(F.col("ids").isNotNull).select(F.col("ids"))
      .groupBy(F.col("ids")).count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // within-shard order preserved: seq_idx strictly increasing per shard
    val bad = back.groupBy(F.col("shard"))
      .agg(F.max(F.col("seq_idx")).as("mx"), F.count(F.lit(1)).as("c"))
      .filter(F.col("mx") =!= F.col("c") - 1)
    assert(bad.isEmpty)
  }

  test("seek-based read matches the buffered decodeShard path byte-identically") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0L until 41L).map(i =>
      Array.tabulate((i % 7).toInt)(j => (i * 31 + j).toInt)).toDF("ids")
    val dir = java.nio.file.Files.createTempDirectory("megatron_seek").toString
    MegatronIdx.write(df.repartition(3), F.col("ids"), dir, DtypeUint16)
    // buffered reference: decode every shard pair fully in memory
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def slurp(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val len = fs.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0L, b) finally in.close()
      b
    }
    val expected = fs
      .globStatus(new org.apache.hadoop.fs.Path(dir, "*.idx"))
      .map(_.getPath.toString.stripSuffix(".idx")).sorted
      .flatMap { stem =>
        decodeShard(
          slurp(new org.apache.hadoop.fs.Path(stem + ".idx")),
          slurp(new org.apache.hadoop.fs.Path(stem + ".bin")))
          .zipWithIndex.map { case (ids, i) => (stem, i.toLong, ids.toSeq) }
      }.sortBy(r => (r._1, r._2)).toSeq
    val got = MegatronIdx.read(spark, dir)
      .as[(String, Long, Seq[Int])].collect()
      .map { case (s, i, ids) =>
        (s.stripPrefix("file:").stripPrefix("//"), i, ids) }
      .sortBy(r => (r._1, r._2)).toSeq
    val exp = expected.map { case (s, i, ids) =>
      (s.stripPrefix("file:").stripPrefix("//"), i, ids) }
    assert(got === exp)
  }

  test("write drops NULL elements inside an ids array instead of NPE-ing") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Integer](1, null, 3)),
      (2L, Seq[java.lang.Integer](null))).toDF("id", "ids")
    val dir = java.nio.file.Files.createTempDirectory("megatron_null").toString
    val n = MegatronIdx.write(df, F.col("ids"), dir)
    assert(n === 2L) // both rows written; NULL elements dropped
    val back = MegatronIdx.read(spark, dir)
      .select(F.col("ids")).as[Seq[Int]].collect().map(_.toList).sortBy(_.length)
    assert(back.toSeq === Seq(List(), List(1, 3)))
  }
}
