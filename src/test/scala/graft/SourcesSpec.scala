package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.sources.BinaryFormats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-src").resolve(name).toString

  test("dense f32 round-trip: write, range-split read, exact equality") {
    val path = tmp("dense.fbin")
    val src = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
      .where($"vec_id" < 100)
    BinaryFormats.writeDenseF32(src, "id", "vec", path)
    val back = BinaryFormats.readDenseF32(spark, path, numPartitions = 7)
    assert(back.count() === 100)
    val a = src.as[(Long, Array[Float])].collect().toMap
    val b = back.as[(Long, Array[Float])].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (id, vec) => assert(vec.toSeq === b(id).toSeq, s"row $id differs") }
  }

  test("dense header layout is numpy-compatible little-endian int32 pair") {
    val path = tmp("hdr.fbin")
    BinaryFormats.writeDenseF32(
      Seq((0L, Array(1.5f, -2f)), (1L, Array(0f, 3f))).toDF("id", "vec"), "id", "vec", path)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() === 2)
    assert(bb.getInt() === 2)
    assert(bb.getFloat() === 1.5f)
    assert(bb.getFloat() === -2f)
    assert(bytes.length === 8 + 4 * 4)
  }

  test("u8bin round-trip: full 0-255 range, range-split read, exact equality") {
    val path = tmp("dense.u8bin")
    val src = (0L until 300L).map { i =>
      (i, Array.tabulate(7)(j => (((i + j * 37) % 256)).toShort))
    }
    val df = src.toDF("id", "vec")
    BinaryFormats.writeDenseU8(df, "id", "vec", path)
    val back = BinaryFormats.readDenseU8(spark, path, numPartitions = 5)
      .as[(Long, Array[Short])].collect().toMap
    assert(back.size === 300)
    src.foreach { case (id, vec) =>
      assert(back(id).toSeq === vec.toSeq, s"row $id differs")
    }
    // header + 1 byte/component payload, reference layout
    // (streaming/clustered_data_gen.py:83-86 with uint8 dtype)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() === 300)
    assert(bb.getInt() === 7)
    assert(bytes.length === 8 + 300 * 7)
    assert((bytes(8) & 0xFF) === 0 && (bytes(9) & 0xFF) === 37)
  }

  test("u8bin writer rejects out-of-range components") {
    val path = tmp("bad.u8bin")
    val df = Seq((0L, Array(300.toShort))).toDF("id", "vec")
    assertThrows[Exception](BinaryFormats.writeDenseU8(df, "id", "vec", path))
  }

  test("spmat writer honors an explicit ncol wider than the data") {
    val path = tmp("wide.spmat")
    val src = Seq((0L, Array(1, 3), Array(1f, 2f))).toDF("id", "indices", "values")
    BinaryFormats.writeSpmat(src, path, ncol = 100)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getLong() === 1)   // nrow
    assert(bb.getLong() === 100) // ncol from the caller, not max(indices)+1
    assert(bb.getLong() === 2)   // nnz
    // too-small explicit ncol is rejected
    assertThrows[Exception](BinaryFormats.writeSpmat(src, tmp("bad.spmat"), ncol = 2))
  }

  test("spmat CSR round-trip with empty rows and skewed nnz") {
    val path = tmp("m.spmat")
    val rows = Seq(
      (0L, Array(1, 5, 9), Array(0.5f, 1f, 2f)),
      (1L, Array.empty[Int], Array.empty[Float]),          // empty row
      (2L, (0 until 50).toArray, (0 until 50).map(_.toFloat).toArray), // fat row
      (3L, Array(2), Array(7f)),
      (4L, Array.empty[Int], Array.empty[Float]))          // trailing empty
    val src = rows.toDF("id", "indices", "values")
    BinaryFormats.writeSpmat(src, path)
    val back = BinaryFormats.readSpmat(spark, path, numPartitions = 3)
      .as[(Long, Array[Int], Array[Float])].collect().sortBy(_._1)
    assert(back.length === 5)
    back.zip(rows).foreach { case ((gid, gi, gv), (id, i, v)) =>
      assert(gid === id); assert(gi.toSeq === i.toSeq); assert(gv.toSeq === v.toSeq)
    }
  }

  test("spmat reader parses a handcrafted reference-format file") {
    // reference layout (filter/faiss/faiss.py:63-73): int64 nrow, ncol, nnz;
    // indptr int64[nrow+1]; indices int32[nnz]; data float32[nnz]
    val path = tmp("hand.spmat")
    val out = new DataOutputStream(new FileOutputStream(path))
    val bb = ByteBuffer.allocate(24 + 8 * 3 + 4 * 3 + 4 * 3).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(2).putLong(10).putLong(3)     // 2 rows, 10 cols, 3 nnz
    bb.putLong(0).putLong(2).putLong(3)      // indptr
    bb.putInt(1).putInt(7).putInt(4)         // indices
    bb.putFloat(0.25f).putFloat(2f).putFloat(-1f)
    out.write(bb.array()); out.close()
    val got = BinaryFormats.readSpmat(spark, path, numPartitions = 2)
      .as[(Long, Array[Int], Array[Float])].collect().sortBy(_._1)
    assert(got(0)._2.toSeq === Seq(1, 7) && got(0)._3.toSeq === Seq(0.25f, 2f))
    assert(got(1)._2.toSeq === Seq(4) && got(1)._3.toSeq === Seq(-1f))
  }
}
