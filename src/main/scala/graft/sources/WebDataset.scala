package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * WebDataset tar-shard interchange — the sample-per-key tar layout
 * multimodal dataloaders stream (`{key}.{ext}` members, samples
 * grouped by key, shards consumed independently). Tars are plain
 * POSIX ustar written/parsed here in pure JVM: 512-byte headers
 * (octal size, space-padded checksum, `ustar\0 00` magic), data
 * rounded up to 512, two zero blocks at the end.
 *
 * One `.tar` per partition; members of one sample are written
 * contiguously in the caller's map order, which is what streaming
 * readers require (a sample must not straddle shards — partition by
 * key upstream and that holds by construction).
 */
object WebDataset {

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** One ustar header block for a regular file. */
  private[sources] def tarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar member name too long: $name")
    val b = new Array[Byte](512)
    def put(at: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, b, at, bytes.length)
    put(0, name.getBytes("UTF-8"))
    put(100, octal(420, 8))            // mode 0644
    put(108, octal(0, 8))              // uid
    put(116, octal(0, 8))              // gid
    put(124, octal(size, 12))          // size
    put(136, octal(0, 12))             // mtime
    java.util.Arrays.fill(b, 148, 156, ' '.toByte) // chksum spaces for sum
    b(156) = '0'                       // typeflag: regular file
    put(257, "ustar\u0000".getBytes("US-ASCII"))
    put(263, "00".getBytes("US-ASCII"))
    var sum = 0L
    var i = 0
    while (i < 512) { sum += b(i) & 0xff; i += 1 }
    val chk = java.lang.Long.toOctalString(sum)
    val chkPad = "0" * (6 - chk.length) + chk
    put(148, (chkPad + "\u0000 ").getBytes("US-ASCII"))
    b
  }

  /** Serialize (name, bytes) members into one tar archive. */
  private[sources] def tarBytes(
      members: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      out.write(tarHeader(name, data.length.toLong))
      out.write(data)
      val rem = data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  /** Random-access byte source the tar walker reads from — one
    * implementation over `FSDataInputStream` (streaming shards), one
    * over an in-memory array (specs, small shards). */
  private[sources] trait ByteRangeReader {
    def length: Long
    def readFully(pos: Long, buf: Array[Byte]): Unit
  }

  private[sources] def arrayReader(b: Array[Byte]): ByteRangeReader =
    new ByteRangeReader {
      def length: Long = b.length.toLong
      def readFully(pos: Long, buf: Array[Byte]): Unit =
        System.arraycopy(b, pos.toInt, buf, 0, buf.length)
    }

  /** Sequential [[ByteRangeReader]] over one open stream. The tar walk
    * is strictly FORWARD (header, payload, skipped padding, next
    * header), so a single buffered pass serves it — one OS read per
    * 64 KiB instead of one positioned read per 512-byte header and one
    * per member payload, while still holding only the current member
    * resident. Positions must be monotone non-decreasing (they are,
    * by the walker's construction); gaps (padding, skipped member
    * types) are skipped, never buffered. */
  private[sources] def sequentialReader(
      in: java.io.InputStream, len: Long): ByteRangeReader =
    new ByteRangeReader {
      private val din = new java.io.DataInputStream(
        new java.io.BufferedInputStream(in, 1 << 16))
      private var at = 0L
      def length: Long = len
      def readFully(pos: Long, buf: Array[Byte]): Unit = {
        require(pos >= at,
          s"sequential tar reader can't seek backwards ($pos < $at)")
        var gap = pos - at
        while (gap > 0) {
          val skipped = din.skip(gap)
          if (skipped > 0) gap -= skipped
          else {
            // skip() may return 0 without EOF on some stream impls —
            // only read() == -1 is authoritative for end-of-stream
            require(din.read() != -1, s"unexpected EOF skipping to $pos")
            gap -= 1
          }
        }
        din.readFully(buf)
        at = pos + buf.length
      }
    }

  /** Parse a tar archive back to (name, bytes) members. */
  private[sources] def untar(tar: Array[Byte]): Seq[(String, Array[Byte])] =
    tarMemberIterator(arrayReader(tar), "<memory>").toSeq

  /**
   * Write WebDataset shards: `df` must have a string `keyCol` and a
   * map<string, binary> `membersCol` (extension → payload; NULL map
   * or NULL payloads skipped). One `part-XXXXX.tar` per partition.
   * Returns the sample count written.
   */
  def write(
      df: DataFrame,
      keyCol: Column,
      membersCol: Column,
      path: String): Long = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    base.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(base)
    val baseStr = base.toString
    val counts = df
      .select(keyCol.cast("string").as("__k"),
        membersCol.cast("map<string,binary>").as("__m"))
      .filter(F.col("__k").isNotNull && F.col("__m").isNotNull)
      .mapPartitions { it =>
        // STREAM the tar member-by-member — a shard is never
        // materialized in executor memory (only one member's payload
        // at a time, which the row already holds)
        if (!it.hasNext) Iterator.single(0L)
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new org.apache.hadoop.fs.Path(baseStr, f"part-$pid%05d.tar")
          val fs = p.getFileSystem(hconf.value.conf)
          val o = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
          var n = 0L
          try {
            it.foreach { r =>
              val k = r.getString(0)
              var wrote = false
              r.getMap[String, Array[Byte]](1).foreach {
                case (ext, bytes) if bytes != null =>
                  o.write(tarHeader(s"$k.$ext", bytes.length.toLong))
                  o.write(bytes)
                  val rem = bytes.length % 512
                  if (rem != 0) o.write(new Array[Byte](512 - rem))
                  wrote = true
                case _ => ()
              }
              // count RECOVERABLE samples: a row whose members were all
              // NULL (or the map empty) wrote zero tar entries and must
              // not inflate the returned count past what read() sees
              if (wrote) n += 1
            }
            o.write(new Array[Byte](1024)) // end-of-archive
          } finally o.close()
          Iterator.single(n)
        }
      }(Encoders.scalaLong)
    counts.collect().sum
  }

  /**
   * Read WebDataset shards under `path` back to one row per sample:
   * (shard STRING, key STRING, members MAP<STRING, BINARY>). Members
   * regroup by the name's last-dot split, so multi-dot extensions
   * stay with the extension side only if written that way — keys with
   * dots round-trip as long as extensions are dot-free (the
   * WebDataset convention). Parallelism = shard count.
   *
   * Streaming, never whole-shard-buffered: tar headers are
   * self-delimiting, so each task walks its shard through one
   * `FSDataInputStream`, holding only the CURRENT SAMPLE's member
   * payloads — 1–4 GiB+ trainer shards read fine (the old `binaryFile`
   * path carried a hard 2 GiB `Array[Byte]` ceiling and a shard-sized
   * allocation). Samples group as CONTIGUOUS same-key member runs —
   * the WebDataset streaming convention, which [[write]] produces by
   * construction (one row's members are written adjacently).
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // driver-side listing: bounded by shard count
    val tarPaths = fs0.globStatus(new org.apache.hadoop.fs.Path(base, "*.tar"))
      .map(_.getPath.toString).sorted.toSeq
    val session = spark
    import session.implicits._
    spark.createDataset(tarPaths)
      .repartition(math.max(1, tarPaths.length)) // one shard per task
      .flatMap { shard =>
        val p = new org.apache.hadoop.fs.Path(shard)
        val fs = p.getFileSystem(hconf.value.conf)
        val len = fs.getFileStatus(p).getLen
        val in = fs.open(p)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        val members = tarMemberIterator(sequentialReader(in, len), shard)
        groupContiguous(members).map { case (key, files) =>
          val m = files.map { case (name, bytes) =>
            val dot = name.lastIndexOf('.')
            (if (dot < 0) "" else name.substring(dot + 1)) -> bytes
          }.toMap
          (shard, key, m)
        }
      }
      .toDF("shard", "key", "members")
  }

  /** NUL-terminated string field. */
  private def hdrString(hdr: Array[Byte], at: Int, max: Int): String = {
    var end = at
    while (end < at + max && hdr(end) != 0) end += 1
    new String(hdr, at, end - at, "UTF-8")
  }

  /** PAX extended-header records are `"<len> key=value\n"`; return the
    * `path` override when present. */
  private def paxPath(data: Array[Byte]): Option[String] = {
    val s = new String(data, java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var found: Option[String] = None
    while (i < s.length && found.isEmpty) {
      val sp = s.indexOf(' ', i)
      if (sp < 0) return found
      val recLen = s.substring(i, sp).trim.toInt
      require(recLen > 0 && i + recLen <= s.length + 1,
        s"malformed PAX record length $recLen")
      val rec = s.substring(sp + 1, math.min(i + recLen, s.length))
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path")
        found = Some(rec.substring(eq + 1).stripSuffix("\n"))
      i += recLen
    }
    found
  }

  /**
   * Walk one tar member by member — only one member's payload is ever
   * resident. Stops at the first zero header block (end of archive) or
   * EOF. Beyond the POSIX ustar entries [[write]] emits, the walker
   * reads EXTERNALLY-produced WebDataset shards: the ustar `prefix`
   * field (names over 100 bytes, POSIX split form), GNU `L` longname
   * entries (the data block carries the next member's name), PAX `x`
   * extended headers (a `path=` record overrides the next member's
   * name; other records ignored), and PAX `g` / GNU `K` entries are
   * skipped. Octal size fields tolerate leading spaces (GNU tar).
   */
  private[sources] def tarMemberIterator(
      in: ByteRangeReader,
      shard: String): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val len = in.length
      private var at = 0L
      private val hdr = new Array[Byte](512)
      private var nextMember: (String, Array[Byte]) = _
      private var done = false
      private var pendingName: String = null // from 'L' or PAX path=

      private def readData(dataAt: Long, size: Long, what: String): Array[Byte] = {
        require(size <= Int.MaxValue - 8,
          s"tar member $what over 2 GiB — split members upstream")
        val data = new Array[Byte](size.toInt)
        in.readFully(dataAt, data)
        data
      }

      private def advance(): Unit = {
        nextMember = null
        while (nextMember == null && !done) {
          if (at + 512 > len) { done = true; return }
          in.readFully(at, hdr)
          if (hdr.forall(_ == 0)) { done = true; return } // end-of-archive
          val rawName = hdrString(hdr, 0, 100)
          val sizeStr = new String(hdr, 124, 12, "US-ASCII")
            .trim.takeWhile(c => c >= '0' && c <= '7')
          val size =
            if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
          val typeflag = hdr(156)
          val dataAt = at + 512
          require(dataAt + size <= len,
            s"tar member $rawName spans past the $len-byte shard $shard")
          typeflag match {
            case 'L' => // GNU longname: data = next member's name
              pendingName = new String(readData(dataAt, size, rawName), "UTF-8")
                .takeWhile(_ != 0)
            case 'x' => // PAX extended header: path= overrides next name
              paxPath(readData(dataAt, size, rawName)).foreach(pendingName = _)
            case 'g' | 'K' => () // PAX global / GNU longlink: skip
            case '0' | 0 =>
              val name =
                if (pendingName != null) pendingName
                else {
                  // POSIX ustar prefix field (magic "ustar\0", version
                  // "00"): full name = prefix + "/" + name. GNU magic
                  // ("ustar  ") reuses those bytes for other fields.
                  val posix = hdr(257) == 'u' && hdr(258) == 's' &&
                    hdr(259) == 't' && hdr(260) == 'a' && hdr(261) == 'r' &&
                    hdr(262) == 0
                  val prefix = if (posix) hdrString(hdr, 345, 155) else ""
                  if (prefix.isEmpty) rawName else s"$prefix/$rawName"
                }
              pendingName = null
              nextMember = (name, readData(dataAt, size, name))
            case _ => pendingName = null // dirs/links: skip, drop overrides
          }
          at = dataAt + ((size + 511) / 512) * 512 // skip data + padding
        }
      }

      advance()
      def hasNext: Boolean = nextMember != null
      def next(): (String, Array[Byte]) = {
        val out = nextMember
        advance()
        out
      }
    }

  /** Group a member stream into samples: maximal contiguous runs
    * sharing the key prefix (name up to the last dot). Lazy — holds
    * one sample's members at a time. */
  private[sources] def groupContiguous(
      members: Iterator[(String, Array[Byte])])
      : Iterator[(String, Seq[(String, Array[Byte])])] =
    new Iterator[(String, Seq[(String, Array[Byte])])] {
      private val it = members.buffered
      private def keyOf(name: String): String = {
        val dot = name.lastIndexOf('.')
        if (dot < 0) name else name.substring(0, dot)
      }
      def hasNext: Boolean = it.hasNext
      def next(): (String, Seq[(String, Array[Byte])]) = {
        val key = keyOf(it.head._1)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
        while (it.hasNext && keyOf(it.head._1) == key) buf += it.next()
        (key, buf.toSeq)
      }
    }
}
