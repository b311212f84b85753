package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class WebDatasetSpec extends SparkTestBase {
  import WebDataset._

  test("ustar header: octal fields, POSIX magic, valid checksum") {
    val h = tarHeader("sample0.txt", 1234L)
    assert(h.length === 512)
    assert(new String(h, 0, 11, "UTF-8") === "sample0.txt")
    assert(new String(h, 257, 5, "US-ASCII") === "ustar")
    assert(h(262) === 0.toByte)
    assert(new String(h, 263, 2, "US-ASCII") === "00")
    // size field: 11 octal digits, NUL-terminated
    assert(new String(h, 124, 11, "US-ASCII") === "00000002322") // 1234 octal
    assert(h(156) === '0'.toByte)
    // checksum recomputes: replace field with spaces, sum, compare
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xff).sum
    val stored = java.lang.Long.parseLong(
      new String(h, 148, 6, "US-ASCII"), 8)
    assert(stored === sum)
  }

  test("tarBytes/untar round-trip incl. 512-boundary and empty payloads") {
    val members = Seq(
      "a.txt" -> Array.fill[Byte](512)(7),   // exact block
      "a.json" -> Array[Byte](1, 2, 3),
      "b.txt" -> Array.empty[Byte],
      "b.bin" -> Array.tabulate[Byte](1000)(_.toByte))
    val tar = tarBytes(members.iterator)
    assert(tar.length % 512 === 0)
    val back = untar(tar)
    assert(back.map(_._1) === members.map(_._1))
    back.zip(members).foreach { case ((_, got), (_, want)) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("sharded write/read regroups samples by key") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (0L until 23L).map { i =>
      (s"doc$i", Map(
        "txt" -> s"text $i".getBytes("UTF-8"),
        "cls" -> s"${i % 3}".getBytes("UTF-8")))
    }
    val df = rows.toDF("key", "members").repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("wds").toString
    val n = WebDataset.write(df, F.col("key"), F.col("members"), dir)
    assert(n === 23L)
    val back = WebDataset.read(spark, dir)
    assert(back.count() === 23L)
    val got = back.select("key", "members")
      .as[(String, Map[String, Array[Byte]])].collect()
      .map { case (k, m) => k -> m.view.mapValues(new String(_, "UTF-8")).toMap }
      .toMap
    rows.foreach { case (k, m) =>
      assert(got(k) === m.view.mapValues(new String(_, "UTF-8")).toMap, k)
    }
  }

  test("seek-based read matches the buffered untar path byte-identically") {
    val spark0 = spark
    import spark0.implicits._
    // payloads straddling 512-byte boundaries and an empty member
    val rows = (0L until 17L).map { i =>
      (s"s$i", Map(
        "bin" -> Array.tabulate((i * 97 % 1300).toInt)(j => (i + j).toByte),
        "txt" -> s"row $i".getBytes("UTF-8")))
    }
    val dir = java.nio.file.Files.createTempDirectory("wds_seek").toString
    WebDataset.write(rows.toDF("key", "members").repartition(2),
      F.col("key"), F.col("members"), dir)
    // buffered reference: untar each whole shard in memory
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val expected = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "*.tar"))
      .flatMap { st =>
        val len = st.getLen.toInt
        val b = new Array[Byte](len)
        val in = fs.open(st.getPath)
        try in.readFully(0L, b) finally in.close()
        untar(b).groupBy { case (name, _) =>
          name.substring(0, name.lastIndexOf('.')) }
          .map { case (k, files) =>
            k -> files.map { case (n2, d) =>
              n2.substring(n2.lastIndexOf('.') + 1) -> d.toSeq }.toMap }
      }.toMap
    val got = WebDataset.read(spark, dir)
      .select("key", "members")
      .as[(String, Map[String, Array[Byte]])].collect()
      .map { case (k, m) => k -> m.view.mapValues(_.toSeq).toMap }.toMap
    assert(got === expected)
  }

  test("reader accepts external tars: GNU longname, PAX path override, ustar prefix") {
    import scala.sys.process._
    val base = java.nio.file.Files.createTempDirectory("wds_ext")
    val longKey = "k" * 120 // member basename over the 100-byte field
    val deepDir = "d" * 90  // forces the POSIX prefix split
    java.nio.file.Files.write(
      base.resolve(s"$longKey.txt"),
      "long-name payload".getBytes("UTF-8"))
    val deep = java.nio.file.Files.createDirectory(base.resolve(deepDir))
    java.nio.file.Files.write(
      deep.resolve("sample0.txt"), "prefix payload".getBytes("UTF-8"))

    def members(tarPath: String): Map[String, String] = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(tarPath)
      val len = fs.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0L, b) finally in.close()
      WebDataset.untar(b)
        .map { case (n, d) => n -> new String(d, "UTF-8") }.toMap
    }

    for (fmt <- Seq("gnu", "pax")) {
      val tarP = s"$base/ext_$fmt.tar"
      val rc = Seq("tar", s"--format=$fmt", "-cf", tarP,
        "-C", base.toString, s"$longKey.txt").!
      assert(rc === 0, s"system tar --format=$fmt failed")
      val m = members(tarP)
      assert(m === Map(s"$longKey.txt" -> "long-name payload"), fmt)
    }
    val uP = s"$base/ext_ustar.tar"
    assert(Seq("tar", "--format=ustar", "-cf", uP,
      "-C", base.toString, s"$deepDir/sample0.txt").! === 0)
    assert(members(uP) === Map(s"$deepDir/sample0.txt" -> "prefix payload"))

    // the Spark reader regroups a long-keyed external shard by key
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wds_ext_read").toString
    assert(Seq("tar", "--format=gnu", "-cf", s"$dir/part-00000.tar",
      "-C", base.toString, s"$longKey.txt").! === 0)
    val back = WebDataset.read(spark, dir)
      .select("key", "members")
      .as[(String, Map[String, Array[Byte]])].collect()
    assert(back.length === 1)
    assert(back.head._1 === longKey)
    assert(new String(back.head._2("txt"), "UTF-8") === "long-name payload")
  }

  test("write counts only rows that emitted at least one tar member") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      ("a", Map("txt" -> "x".getBytes("UTF-8"))),
      ("b", Map.empty[String, Array[Byte]]),
      ("c", Map("txt" -> null.asInstanceOf[Array[Byte]]))).toDF("key", "members")
    val dir = java.nio.file.Files.createTempDirectory("wds_count").toString
    val n = WebDataset.write(df.repartition(1), F.col("key"), F.col("members"), dir)
    assert(n === 1L) // b wrote nothing, c's only payload was NULL
    assert(WebDataset.read(spark, dir).count() === n)
  }

  test("sequentialReader survives a stream whose skip() always returns 0") {
    val payload = Array.tabulate(2048)(_.toByte)
    // some FS streams legitimately return 0 from skip() without EOF —
    // the reader must fall back to read-and-discard, not abort
    val noSkip = new java.io.ByteArrayInputStream(payload) {
      override def skip(n: Long): Long = 0L
    }
    val r = WebDataset.sequentialReader(noSkip, payload.length.toLong)
    val buf = new Array[Byte](16)
    r.readFully(1000L, buf) // forces a 1000-byte gap skipped via read()
    assert(buf.toSeq === payload.slice(1000, 1016).toSeq)
    // true EOF mid-gap still errors
    val short = new java.io.ByteArrayInputStream(payload.take(10)) {
      override def skip(n: Long): Long = 0L
    }
    val r2 = WebDataset.sequentialReader(short, 10L)
    intercept[IllegalArgumentException](r2.readFully(500L, buf))
  }
}
