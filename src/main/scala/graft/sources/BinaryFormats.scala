package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers/writers for the reference's binary interchange formats. Parquet is
  * this engine's canonical storage; these exist so a user of the reference can
  * ingest its files directly.
  *
  * - spmat sparse CSR: header int64×3 (nrow, ncol, nnz), then
  *   indptr int64[nrow+1], indices int32[nnz], data float32[nnz] — all
  *   little-endian (numpy defaults). Reference reader:
  *   /root/reference/filter/faiss/faiss.py:63-95 (plain + mmap variants).
  * - dense bin (.fbin/.u8bin style): int32 nrows, int32 dim, row-major
  *   payload. Reference writer: /root/reference/streaming/clustered_data_gen.py:83-86.
  *
  * Scale design: reads are RANGE-SPLIT — the driver reads only the fixed-size
  * header (plus, for CSR, the indptr array, O(nrow) — the same footprint the
  * reference accepts by materializing indptr in RAM), then each of
  * `numPartitions` tasks seeks into its own byte range and emits rows.
  * No task ever holds more than its slice; adding executors splits the file
  * further. Writers produce a foreign single-stream file format, so they
  * funnel through the driver via toLocalIterator (constant driver memory);
  * they are export utilities, not the storage path.
  */
object BinaryFormats {

  // ---- dense: int32 nrows, int32 dim, row-major float32 ------------------

  def writeDenseF32(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val rows = df.select(col(idCol), col(vecCol)).orderBy(col(idCol))
    val n = rows.count().toInt
    val first = rows.select(size(col(vecCol))).head().getInt(0)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try {
      val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(n).putInt(first)
      out.write(hdr.array())
      val it = rows.toLocalIterator()
      while (it.hasNext) {
        val vec = it.next().getSeq[Float](1)
        require(vec.length == first, s"ragged row: ${vec.length} != $first")
        val bb = ByteBuffer.allocate(4 * first).order(ByteOrder.LITTLE_ENDIAN)
        vec.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }

  /** Distributed dense read: fixed-size rows make byte offsets exact, so each
    * partition seeks straight to `8 + 4L*dim*rowStart` — zero shuffle, zero
    * driver payload. Returns (id, vec). */
  def readDenseF32(spark: SparkSession, path: String, numPartitions: Int = 32): DataFrame = {
    val (n, dim) = {
      val raf = new RandomAccessFile(path, "r")
      try {
        val hdr = new Array[Byte](8)
        raf.readFully(hdr)
        val bb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getInt(), bb.getInt())
      } finally raf.close()
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = spark.sparkContext
      .parallelize(0 until numPartitions, numPartitions)
      .flatMap { p =>
        val start = (n.toLong * p / numPartitions).toInt
        val end = (n.toLong * (p + 1) / numPartitions).toInt
        if (start >= end) Iterator.empty
        else {
          val raf = new RandomAccessFile(path, "r")
          closeOnTaskEnd(raf)
          raf.seek(8L + 4L * dim * start)
          val buf = new Array[Byte](4 * dim)
          (start until end).iterator.map { i =>
            raf.readFully(buf)
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            val vec = Array.ofDim[Float](dim)
            var j = 0
            while (j < dim) { vec(j) = bb.getFloat(); j += 1 }
            Row(i.toLong, vec.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- dense uint8: int32 nrows, int32 dim, row-major uint8 ---------------
  // (the reference's .u8bin layout — yfcc-10M's native dtype:
  //  /root/reference/streaming/base.py:13 allows 'uint8'; writer layout
  //  /root/reference/streaming/clustered_data_gen.py:83-86)

  /** Write (id, vec ARRAY<SHORT> with values 0–255) as .u8bin. Spark has no
    * unsigned types, so uint8 components travel as shorts and serialize as
    * single bytes. Export utility: single-stream foreign format, funneled
    * through the driver at O(1 row) memory like [[writeDenseF32]]. */
  def writeDenseU8(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val rows = df.select(col(idCol), col(vecCol)).orderBy(col(idCol))
    val n = rows.count().toInt
    val first = rows.select(size(col(vecCol))).head().getInt(0)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try {
      val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(n).putInt(first)
      out.write(hdr.array())
      val it = rows.toLocalIterator()
      while (it.hasNext) {
        val vec = it.next().getSeq[Short](1)
        require(vec.length == first, s"ragged row: ${vec.length} != $first")
        val bb = new Array[Byte](first)
        var j = 0
        while (j < first) {
          val v = vec(j)
          require(v >= 0 && v <= 255, s"u8 component out of range: $v")
          bb(j) = v.toByte
          j += 1
        }
        out.write(bb)
      }
    } finally out.close()
  }

  /** Distributed uint8 dense read: like [[readDenseF32]] but 1 byte per
    * component, decoded unsigned into ARRAY<SHORT>. Returns (id, vec). */
  def readDenseU8(spark: SparkSession, path: String, numPartitions: Int = 32): DataFrame = {
    val (n, dim) = {
      val raf = new RandomAccessFile(path, "r")
      try {
        val hdr = new Array[Byte](8)
        raf.readFully(hdr)
        val bb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getInt(), bb.getInt())
      } finally raf.close()
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(ShortType, containsNull = false), nullable = false)))
    val rdd = spark.sparkContext
      .parallelize(0 until numPartitions, numPartitions)
      .flatMap { p =>
        val start = (n.toLong * p / numPartitions).toInt
        val end = (n.toLong * (p + 1) / numPartitions).toInt
        if (start >= end) Iterator.empty
        else {
          val raf = new RandomAccessFile(path, "r")
          closeOnTaskEnd(raf)
          raf.seek(8L + 1L * dim * start)
          val buf = new Array[Byte](dim)
          (start until end).iterator.map { i =>
            raf.readFully(buf)
            val vec = Array.ofDim[Short](dim)
            var j = 0
            while (j < dim) { vec(j) = (buf(j) & 0xFF).toShort; j += 1 }
            Row(i.toLong, vec.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Close a file handle when the task completes — covers partial iterator
    * consumption (limit, take, task failure), where a close-on-exhaust
    * iterator would leak the descriptor. No-op outside a task (driver-side
    * unit tests). RandomAccessFile.close is idempotent, so pairing this
    * with an explicit close is safe. */
  private def closeOnTaskEnd(raf: RandomAccessFile): Unit =
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))

  // ---- spmat sparse CSR ----------------------------------------------------

  /** Write CSR spmat. `ncol` is the true matrix width; the default −1
    * derives it as max(indices)+1, which UNDERSTATES the width when
    * trailing columns are empty — pass it explicitly when the consumer
    * reads the header's ncol (the reference's loaders do,
    * faiss.py:63-73). */
  def writeSpmat(df: DataFrame, path: String, ncol: Int = -1): Unit = {
    // rows: (id, indices ARRAY<INT>, values ARRAY<FLOAT>); ids must be a
    // contiguous 0-based range (CSR row index is positional)
    val rows = df.select(col("id"), col("indices"), col("values")).orderBy(col("id"))
    val nrow = rows.count().toInt
    val agg = df.agg(
      coalesce(max(expr("array_max(indices)")), lit(-1)).cast("int"),
      coalesce(sum(size(col("indices"))), lit(0)).cast("long")).head()
    val derivedNcol = agg.getInt(0) + 1
    require(ncol < 0 || ncol >= derivedNcol,
      s"explicit ncol $ncol smaller than max index + 1 = $derivedNcol")
    val effNcol = if (ncol < 0) derivedNcol else ncol
    val nnz = agg.getLong(1)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try {
      val hdr = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putLong(nrow.toLong).putLong(effNcol.toLong).putLong(nnz)
      out.write(hdr.array())
      // pass 1: indptr (cumulative nnz); pass 2: indices; pass 3: data.
      // Three toLocalIterator passes keep driver memory at O(1 row).
      var cum = 0L
      val ip = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      def putLongLE(v: Long): Unit = { ip.clear(); ip.putLong(v); out.write(ip.array()) }
      putLongLE(0L)
      var it = rows.toLocalIterator()
      var expect = 0L
      while (it.hasNext) {
        val r = it.next()
        require(r.getLong(0) == expect, s"ids must be contiguous 0-based, got ${r.getLong(0)} want $expect")
        expect += 1
        cum += r.getSeq[Int](1).length
        putLongLE(cum)
      }
      require(expect == nrow)
      it = rows.toLocalIterator()
      while (it.hasNext) {
        val idx = it.next().getSeq[Int](1)
        val bb = ByteBuffer.allocate(4 * idx.length).order(ByteOrder.LITTLE_ENDIAN)
        idx.foreach(bb.putInt)
        out.write(bb.array())
      }
      it = rows.toLocalIterator()
      while (it.hasNext) {
        val vs = it.next().getSeq[Float](2)
        val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }

  /** Distributed CSR read. The driver materializes only the indptr array
    * (8 bytes/row — the reference holds the same in RAM, faiss.py:88-95);
    * row ranges are then split so each partition gets ~equal NNZ (not equal
    * rows — skewed rows would otherwise unbalance tasks), and every task
    * seeks directly to its indices/data slices. Returns (id, indices, values). */
  def readSpmat(spark: SparkSession, path: String, numPartitions: Int = 32): DataFrame = {
    val (nrow, nnz, indptr) = {
      val raf = new RandomAccessFile(path, "r")
      try {
        val hdr = new Array[Byte](24)
        raf.readFully(hdr)
        val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
        val nr = hb.getLong().toInt; hb.getLong(); val nz = hb.getLong()
        val ipb = new Array[Byte](8 * (nr + 1))
        raf.readFully(ipb)
        val bb = ByteBuffer.wrap(ipb).order(ByteOrder.LITTLE_ENDIAN)
        val ip = Array.ofDim[Long](nr + 1)
        var i = 0
        while (i <= nr) { ip(i) = bb.getLong(); i += 1 }
        (nr, nz, ip)
      } finally raf.close()
    }
    // equal-nnz row-range boundaries (0 and nrow forced so trailing/leading
    // empty rows are never dropped)
    val mids = (1 until numPartitions).map { p =>
      val target = nnz * p / numPartitions
      val i = java.util.Arrays.binarySearch(indptr, target)
      if (i >= 0) i else math.min(nrow, -i - 1)
    }
    val bounds = (0 +: mids :+ nrow).distinct.sorted
    val indicesBase = 24L + 8L * (nrow + 1)
    val dataBase = indicesBase + 4L * nnz
    val ranges = bounds.zip(bounds.tail).map { case (s, e) => (s, e, indptr(s), indptr(e)) }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("indices", ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField("values", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(1, ranges.length))
      .flatMap { case (rs, re, ps, pe) =>
        if (rs >= re) Iterator.empty
        else {
          val raf = new RandomAccessFile(path, "r")
          closeOnTaskEnd(raf) // covers failure between open and close below
          val sliceNnz = (pe - ps).toInt
          val ib = new Array[Byte](4 * sliceNnz)
          raf.seek(indicesBase + 4L * ps); raf.readFully(ib)
          val db = new Array[Byte](4 * sliceNnz)
          raf.seek(dataBase + 4L * ps); raf.readFully(db)
          // per-row offsets relative to ps; re-derive from a local indptr
          // slice read once more (cheap: 8 bytes/row of this range only)
          val ipb = new Array[Byte](8 * (re - rs + 1))
          raf.seek(24L + 8L * rs); raf.readFully(ipb)
          raf.close()
          val ibb = ByteBuffer.wrap(ib).order(ByteOrder.LITTLE_ENDIAN)
          val dbb = ByteBuffer.wrap(db).order(ByteOrder.LITTLE_ENDIAN)
          val ipbb = ByteBuffer.wrap(ipb).order(ByteOrder.LITTLE_ENDIAN)
          val localIp = Array.ofDim[Long](re - rs + 1)
          var i = 0
          while (i <= re - rs) { localIp(i) = ipbb.getLong(); i += 1 }
          (rs until re).iterator.map { r =>
            val len = (localIp(r - rs + 1) - localIp(r - rs)).toInt
            val idx = Array.ofDim[Int](len)
            val vs = Array.ofDim[Float](len)
            var j = 0
            while (j < len) { idx(j) = ibb.getInt(); vs(j) = dbb.getFloat(); j += 1 }
            Row(r.toLong, idx.toSeq, vs.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
