package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F, Row}
import org.apache.spark.sql.types._

class TfRecordSpec extends SparkTestBase {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("masked CRC32C applies the published mask to the CRC32C KAT") {
    // crc32c("123456789") = 0xE3069283 — the public known-answer test
    val c = new java.util.zip.CRC32C()
    val kat = "123456789".getBytes("US-ASCII")
    c.update(kat, 0, kat.length)
    assert(c.getValue.toInt == 0xE3069283)
    val crc = 0xE3069283
    val expected = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    assert(TfRecord.maskedCrc(kat, 0, kat.length) == expected)
  }

  test("Example proto golden bytes: {'a': int64 [1]}") {
    // field-by-field hand encoding of tf.train.Example
    val got = TfRecord.encodeExample(Seq("a" -> TfRecord.Int64Feature(Seq(1L))))
    assert(hex(got) == "0a0c0a0a0a016112051a030a0101")
    val back = TfRecord.decodeExample(got).get
    assert(back == Map("a" -> TfRecord.Int64Feature(Seq(1L))))
  }

  test("Example roundtrip across all feature kinds, multi-value and empty") {
    val feats = Seq(
      "ids" -> TfRecord.Int64Feature(Seq(-1L, 0L, Long.MaxValue, 300L)),
      "emb" -> TfRecord.FloatFeature(Seq(1.5f, -0.25f, Float.MinPositiveValue)),
      "txt" -> TfRecord.BytesFeature(Seq("héllo".getBytes("UTF-8"),
        Array[Byte](0, 1, 2))),
      "nil" -> TfRecord.BytesFeature(Seq.empty))
    val back = TfRecord.decodeExample(TfRecord.encodeExample(feats)).get
    assert(back("ids") == TfRecord.Int64Feature(Seq(-1L, 0L, Long.MaxValue, 300L)))
    assert(back("emb") == TfRecord.FloatFeature(Seq(1.5f, -0.25f,
      Float.MinPositiveValue)))
    val TfRecord.BytesFeature(bs) = back("txt")
    assert(bs.map(new String(_, "UTF-8")) == Seq("héllo", new String(
      Array[Byte](0, 1, 2), "UTF-8")))
    assert(back("nil") == TfRecord.BytesFeature(Seq.empty))
  }

  test("decoder accepts UNPACKED repeated int64 and float") {
    // Feature{int64_list{value: 5 (unpacked tag 0x08)}}
    val unpackedInt = Array[Byte](0x1a, 0x02, 0x08, 0x05)
    // wrap as Example: features{ entry{ key 'x', value Feature } }
    def example(feature: Array[Byte]): Array[Byte] = {
      val entry = Array[Byte](0x0a, 0x01, 0x78, 0x12,
        feature.length.toByte) ++ feature
      val fm = Array[Byte](0x0a, entry.length.toByte) ++ entry
      Array[Byte](0x0a, fm.length.toByte) ++ fm
    }
    assert(TfRecord.decodeExample(example(unpackedInt)).get("x") ==
      TfRecord.Int64Feature(Seq(5L)))
    // Feature{float_list{value: 1.0f unpacked (tag 0x0d + 4 LE bytes)}}
    val unpackedFloat = Array[Byte](0x12, 0x05, 0x0d, 0x00, 0x00,
      0x80.toByte, 0x3f)
    assert(TfRecord.decodeExample(example(unpackedFloat)).get("x") ==
      TfRecord.FloatFeature(Seq(1.0f)))
  }

  test("framing roundtrip; corruption truncates; garbage yields empty") {
    val payloads = Seq("one", "two", "three").map(_.getBytes("UTF-8"))
    val file = payloads.flatMap(p => TfRecord.frame(p).toSeq).toArray
    assert(TfRecord.readFramed(file).map(new String(_, "UTF-8")) ==
      Seq("one", "two", "three"))
    // flip a payload byte in record 2: record 1 survives, rest truncates
    val r1 = TfRecord.frame(payloads(0))
    val corrupt = file.clone()
    corrupt(r1.length + 13) = (corrupt(r1.length + 13) ^ 0x40).toByte
    assert(TfRecord.readFramed(corrupt).map(new String(_, "UTF-8")) == Seq("one"))
    // flip a length byte: nothing after the flip point parses
    val corrupt2 = file.clone()
    corrupt2(r1.length + 2) = 0x7f
    assert(TfRecord.readFramed(corrupt2).map(new String(_, "UTF-8")) == Seq("one"))
    assert(TfRecord.readFramed(Array.fill[Byte](64)(0x5a)) == Seq.empty)
    assert(TfRecord.readFramed(null) == Seq.empty)
    assert(TfRecord.readFramed(Array.emptyByteArray) == Seq.empty)
  }

  test("Spark write/read roundtrip: scalars, arrays, nulls, float32 loss") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec").toString
    val df = Seq(
      (1L, "alpha", 1.75, Seq(1.5f, 2.5f), Seq(10L, 11L), true),
      (2L, null.asInstanceOf[String], 0.1, Seq.empty[Float], Seq(20L), false),
      (3L, "gamma", -2.0, Seq(3.25f), Seq.empty[Long], true))
      .toDF("id", "name", "score", "emb", "toks", "keep")
    val n = TfRecord.write(df.repartition(3), dir)
    assert(n == 3L)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tfrecord")).sorted
    assert(files.length == 3 && files.forall(_.matches("part-\\d{5}\\.tfrecord")))
    val schema = new StructType()
      .add("id", LongType).add("name", StringType).add("score", DoubleType)
      .add("emb", ArrayType(FloatType)).add("toks", ArrayType(LongType))
      .add("keep", BooleanType)
    val back = TfRecord.read(spark, dir, schema)
      .as[(Long, String, Double, Seq[Float], Seq[Long], Boolean)]
      .collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(back.map(_._2).toSeq == Seq("alpha", null, "gamma"))
    // doubles ride as float32: equal after the float cast, not exactly
    assert(back.map(_._3).toSeq == Seq(1.75, 0.1f.toDouble, -2.0))
    assert(back.map(_._4).toSeq == Seq(Seq(1.5f, 2.5f), Seq.empty, Seq(3.25f)))
    assert(back.map(_._5).toSeq == Seq(Seq(10L, 11L), Seq(20L), Seq.empty))
    assert(back.map(_._6).toSeq == Seq(true, false, true))
  }

  test("read projects missing and mistyped features to NULL") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec2").toString
    TfRecord.write(Seq((7L, "x")).toDF("id", "name").repartition(1), dir)
    val schema = new StructType()
      .add("id", StringType)      // mistyped: int64 feature, string ask
      .add("name", StringType)
      .add("absent", LongType)    // not in the file
    val got = TfRecord.read(spark, dir, schema).collect()
    assert(got.toSeq == Seq(Row(null, "x", null)))
  }
}
