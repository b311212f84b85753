package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Megatron-LM "mmap" indexed-dataset interchange — the `.bin`/`.idx`
 * shard pair Megatron / GPT-NeoX trainers memory-map for pretraining.
 * Layout per the public Megatron-LM `indexed_dataset.py`
 * (`MMapIndexedDataset.Index`), all little-endian:
 *
 *   .idx: magic `MMIDIDX\0\0` (9 bytes), version u64 = 1, dtype code
 *         u8 (4 = int32, 8 = uint16), sequence count u64, doc-index
 *         length u64, sizes i32[n], pointers i64[n] (BYTE offsets
 *         into .bin), doc_idx i64[m] (sequence indices of document
 *         starts; one-doc-per-sequence writes 0..n).
 *   .bin: raw concatenation of the token arrays in dtype.
 *
 * One (.bin, .idx) pair per partition: shard-parallel write and read.
 * Memory-mapping trainers consume shards independently, so sharding
 * is the format's native layout, not a compromise — merge shards with
 * the trainer-side tooling if a single pair is required.
 */
object MegatronIdx {

  val DtypeInt32: Int = 4
  val DtypeUint16: Int = 8

  private val Magic: Array[Byte] =
    Array('M', 'M', 'I', 'D', 'I', 'D', 'X', 0, 0).map(_.toByte)

  private def putLE(out: java.io.OutputStream, v: Long, bytes: Int): Unit = {
    var x = v
    var i = 0
    while (i < bytes) { out.write((x & 0xff).toInt); x >>>= 8; i += 1 }
  }

  /** Serialize one shard's sequences to (.idx bytes, .bin bytes). */
  private[sources] def encodeShard(
      seqs: Array[Array[Int]], dtype: Int): (Array[Byte], Array[Byte]) = {
    require(dtype == DtypeInt32 || dtype == DtypeUint16,
      s"unsupported dtype code $dtype")
    val itemSize = if (dtype == DtypeInt32) 4 else 2
    val bin = new java.io.ByteArrayOutputStream()
    val n = seqs.length
    val sizes = new Array[Int](n)
    val pointers = new Array[Long](n)
    var off = 0L
    var i = 0
    while (i < n) {
      sizes(i) = seqs(i).length
      pointers(i) = off
      seqs(i).foreach { t =>
        if (dtype == DtypeUint16) {
          require(t >= 0 && t <= 0xffff,
            s"token id $t out of uint16 range; use DtypeInt32")
          putLE(bin, t.toLong, 2)
        } else putLE(bin, t.toLong, 4)
      }
      off += sizes(i).toLong * itemSize
      i += 1
    }
    val idx = new java.io.ByteArrayOutputStream()
    idx.write(Magic, 0, Magic.length)
    putLE(idx, 1L, 8)                    // version
    idx.write(dtype)                     // dtype code u8
    putLE(idx, n.toLong, 8)              // sequence count
    putLE(idx, (n + 1).toLong, 8)        // doc_idx length
    sizes.foreach(sz => putLE(idx, sz.toLong, 4))
    pointers.foreach(p => putLE(idx, p, 8))
    var d = 0
    while (d <= n) { putLE(idx, d.toLong, 8); d += 1 } // doc starts 0..n
    (idx.toByteArray, bin.toByteArray)
  }

  private def getLE(b: Array[Byte], at: Int, bytes: Int): Long = {
    var v = 0L
    var i = bytes - 1
    while (i >= 0) { v = (v << 8) | (b(at + i) & 0xffL); i -= 1 }
    v
  }

  /** Item widths for every INTEGRAL Megatron dtype code (the public
    * `indexed_dataset.py` table: 1=u8, 2=i8, 3=i16, 4=i32, 5=i64,
    * 8=u16). The WRITE path emits i32/u16 only; the read path accepts
    * all six so externally-produced shards load (6=f32 / 7=f64 are
    * rejected — token ids are integral). */
  private val ItemSizes: Map[Int, Int] =
    Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 8 -> 2)

  /** Decode one token at `at` in dtype's width: sign-extended for the
    * signed codes, zero-extended for u8/u16; i64 values outside Int
    * range fail loudly instead of truncating. */
  private def decodeToken(buf: Array[Byte], at: Int, dtype: Int): Int =
    dtype match {
      case 1 => buf(at) & 0xff
      case 2 => buf(at).toInt
      case 3 => getLE(buf, at, 2).toShort.toInt
      case 4 => getLE(buf, at, 4).toInt
      case 5 =>
        val v = getLE(buf, at, 8)
        require(v >= Int.MinValue && v <= Int.MaxValue,
          s"int64 token id $v does not fit a 32-bit id column")
        v.toInt
      case 8 => getLE(buf, at, 2).toInt
      case other => throw new IllegalArgumentException(
        s"unsupported dtype code $other")
    }

  /** Parsed .idx header: dtype code plus per-sequence sizes and BYTE
    * pointers into the .bin. 12 bytes of driver/task state per
    * sequence — bounded by sequence count, never token count. */
  private[sources] final case class IdxHeader(
      dtype: Int, sizes: Array[Int], pointers: Array[Long]) {
    def itemSize: Int = ItemSizes(dtype)
  }

  private[sources] def parseIdx(idx: Array[Byte]): IdxHeader = {
    require(idx.length >= Magic.length + 8 + 1 + 16, "idx too short")
    require(Magic.indices.forall(i => idx(i) == Magic(i)),
      "bad magic: not a Megatron mmap index")
    require(getLE(idx, 9, 8) == 1L, "unsupported index version")
    val dtype = idx(17) & 0xff
    require(ItemSizes.contains(dtype),
      s"unsupported dtype code $dtype (integral codes 1,2,3,4,5,8 only)")
    val n64 = getLE(idx, 18, 8)
    require(n64 >= 0 && n64 <= Int.MaxValue, s"sequence count $n64 out of range")
    val n = n64.toInt
    val sizesAt = 34
    val pointersAt = sizesAt + 4 * n
    IdxHeader(dtype,
      Array.tabulate(n)(i => getLE(idx, sizesAt + 4 * i, 4).toInt),
      Array.tabulate(n)(i => getLE(idx, pointersAt + 8 * i, 8)))
  }

  /** Parse one fully-buffered shard pair back to its sequences —
    * bounded in-memory helper (specs, small shards). Pointer math is
    * Long end-to-end; a pointer past Int range fails loudly instead of
    * silently truncating (a buffered Array[Byte] can't address past
    * 2 GiB anyway — the seek-based [[read]] path has no such ceiling). */
  private[sources] def decodeShard(
      idx: Array[Byte], bin: Array[Byte]): Array[Array[Int]] = {
    val h = parseIdx(idx)
    val itemSize = h.itemSize
    Array.tabulate(h.sizes.length) { i =>
      val sz = h.sizes(i)
      val ptr = h.pointers(i)
      val end = ptr + sz.toLong * itemSize
      require(ptr >= 0 && end <= bin.length,
        s"sequence $i spans [$ptr, $end) outside the ${bin.length}-byte .bin")
      Array.tabulate(sz) { j =>
        decodeToken(bin, (ptr + j.toLong * itemSize).toInt, h.dtype)
      }
    }
  }

  /**
   * Write `idsCol` (array<int>, NULL rows skipped) as sharded
   * Megatron pairs under `path`: `part-XXXXX.bin` / `part-XXXXX.idx`,
   * one pair per partition, sequences in partition order. Returns the
   * sequence count written. Repartition/sort upstream to control
   * shard count and order (e.g. `repartitionByRange(k, id)` +
   * `sortWithinPartitions(id)` for a deterministic global layout).
   */
  def write(
      df: DataFrame,
      idsCol: Column,
      path: String,
      dtype: Int = DtypeInt32): Long = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.mkdirs(base)
    val baseStr = base.toString
    // NULL elements inside an ids array are dropped (malformed-input →
    // NULL discipline: a NULL token id has no byte encoding, and
    // letting it NPE mid-write would torch the whole shard)
    val counts = df
      .select(F.filter(idsCol.cast("array<int>"), e => e.isNotNull).as("__ids"))
      .filter(F.col("__ids").isNotNull)
      .mapPartitions { it =>
        // STREAM the .bin: a shard's token bytes never sit in executor
        // memory; only the (size, pointer) tables do — 12 bytes per
        // SEQUENCE, bounded by row count, not token count
        if (!it.hasNext) Iterator.single(0L)
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val fs = new org.apache.hadoop.fs.Path(baseStr)
            .getFileSystem(hconf.value.conf)
          val binP = new org.apache.hadoop.fs.Path(baseStr, f"part-$pid%05d.bin")
          val idxP = new org.apache.hadoop.fs.Path(baseStr, f"part-$pid%05d.idx")
          val itemSize = if (dtype == DtypeInt32) 4 else 2
          val sizes = new scala.collection.mutable.ArrayBuffer[Int]()
          val pointers = new scala.collection.mutable.ArrayBuffer[Long]()
          var off = 0L
          val o1 = new java.io.BufferedOutputStream(fs.create(binP, true), 1 << 16)
          try {
            it.foreach { row =>
              val ids = row.getSeq[Int](0)
              sizes += ids.length
              pointers += off
              ids.foreach { t =>
                if (dtype == DtypeUint16) {
                  require(t >= 0 && t <= 0xffff,
                    s"token id $t out of uint16 range; use DtypeInt32")
                  putLE(o1, t.toLong, 2)
                } else putLE(o1, t.toLong, 4)
              }
              off += ids.length.toLong * itemSize
            }
          } finally o1.close()
          val n = sizes.length
          val o2 = new java.io.BufferedOutputStream(fs.create(idxP, true), 1 << 16)
          try {
            o2.write(Magic, 0, Magic.length)
            putLE(o2, 1L, 8)
            o2.write(dtype)
            putLE(o2, n.toLong, 8)
            putLE(o2, (n + 1).toLong, 8)
            sizes.foreach(sz => putLE(o2, sz.toLong, 4))
            pointers.foreach(p => putLE(o2, p, 8))
            var d = 0
            while (d <= n) { putLE(o2, d.toLong, 8); d += 1 }
          } finally o2.close()
          Iterator.single(n.toLong)
        }
      }(Encoders.scalaLong)
    counts.collect().sum
  }

  /**
   * Read sharded Megatron pairs under `path` back into
   * (shard STRING, seq_idx LONG, ids ARRAY<INT>). Parallelism = shard
   * count; each task pairs its own .idx with its .bin by name — the
   * pairing never shuffles.
   *
   * Seek-based, never whole-shard-buffered: the task reads the .idx
   * (12 bytes of size/pointer state per sequence), then streams the
   * .bin through `FSDataInputStream` range reads — executor memory per
   * task is one sequence's bytes plus the pointer tables, so 1–4 GiB+
   * trainer shards read fine (the old `binaryFile` path carried a hard
   * 2 GiB `Array[Byte]` ceiling and a shard-sized allocation).
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // driver-side listing: bounded by shard count (one status per file)
    val idxPaths = fs0.globStatus(new org.apache.hadoop.fs.Path(base, "*.idx"))
      .map(_.getPath.toString).sorted
    val session = spark
    import session.implicits._
    val stems = idxPaths.map(_.stripSuffix(".idx")).toSeq
    spark.createDataset(stems)
      .repartition(math.max(1, stems.length)) // one shard per task
      .flatMap { stem =>
        val fs = new org.apache.hadoop.fs.Path(stem)
          .getFileSystem(hconf.value.conf)
        val idxP = new org.apache.hadoop.fs.Path(stem + ".idx")
        val binP = new org.apache.hadoop.fs.Path(stem + ".bin")
        require(fs.exists(binP), s"unpaired Megatron shard at $stem")
        val idxLen = fs.getFileStatus(idxP).getLen
        require(idxLen <= Int.MaxValue, s"idx over 2 GiB at $stem")
        val idxBytes = new Array[Byte](idxLen.toInt)
        val idxIn = fs.open(idxP)
        try idxIn.readFully(0L, idxBytes) finally idxIn.close()
        val h = parseIdx(idxBytes)
        val itemSize = h.itemSize
        val binLen = fs.getFileStatus(binP).getLen
        val in = fs.open(binP)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        new Iterator[(String, Long, Array[Int])] {
          private var i = 0
          def hasNext: Boolean = {
            val more = i < h.sizes.length
            if (!more && tc == null) in.close()
            more
          }
          def next(): (String, Long, Array[Int]) = {
            val sz = h.sizes(i)
            val ptr = h.pointers(i)
            require(ptr >= 0 && ptr + sz.toLong * itemSize <= binLen,
              s"sequence $i spans past the $binLen-byte .bin at $stem")
            val buf = new Array[Byte](sz * itemSize)
            in.readFully(ptr, buf) // positioned read: safe at any Long offset
            val ids = Array.tabulate(sz)(j => decodeToken(buf, j * itemSize, h.dtype))
            val out = (stem, i.toLong, ids)
            i += 1
            out
          }
        }
      }
      .toDF("shard", "seq_idx", "ids")
  }
}
