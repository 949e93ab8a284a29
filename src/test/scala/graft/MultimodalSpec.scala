package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkSuite._

  test("binary payload length equals n_chars (ascii corpus)") {
    val f = Multimodal.decodeFeatures(spark, Sf)
    val d = Tables.documents(spark, Sf).select(col("doc_id"), col("n_chars"))
    val bad = f.join(d, "doc_id").filter(col("byte_len") =!= col("n_chars")).count()
    assert(bad === 0)
  }

  test("decode is deterministic and batched") {
    val a = Multimodal.decodeFeatures(spark, Sf).orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(spark, Sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getAs[Long]("n_batch") <= Multimodal.BatchSize))
    assert(a.exists(_.getAs[Long]("n_batch") > 1), "batching never exercised")
  }

  test("WAV codec: encode→decode round-trips the PCM exactly, LIST chunk and all") {
    val samples = Multimodal.wavSamples(7L)
    for (withList <- Seq(false, true)) {
      val bytes = Multimodal.encodeWav(samples, Multimodal.WavSampleRate, withList)
      val (rate, decoded) = Multimodal.decodeWav(bytes)
      assert(rate === Multimodal.WavSampleRate)
      assert(decoded === samples, s"withList=$withList")
    }
    // the LIST payload's data is NOT at byte 44 — a header-seek "parser"
    // would read the LIST chunk as samples; only chunk-walking decodes it
    val listed = Multimodal.encodeWav(samples, Multimodal.WavSampleRate, true)
    assert(new String(listed.slice(36, 40), "US-ASCII") === "LIST")
    // an odd-size unknown chunk exercises the RIFF pad-byte rule
    val padded = {
      val buf = java.nio.ByteBuffer.allocate(listed.length + 10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(listed, 0, 36) // header + fmt
      buf.put("junk".getBytes("US-ASCII")).putInt(1).put(9.toByte).put(0.toByte)
      buf.put(listed, 36, listed.length - 36)
      // fix the RIFF size for the inserted chunk
      val out = buf.array()
      java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(4, out.length - 8)
      out
    }
    assert(Multimodal.decodeWav(padded)._2 === samples)
    // garbage fails loudly, never decodes to something plausible
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII"))
    }
  }

  test("wavEnergyQuery output is partitioning-invariant and window math checks out") {
    val rows = Multimodal.wavEnergyQuery(spark, Sf).orderBy("doc_id").collect()
    assert(rows.length === Tables.documents(spark, Sf).count())
    // spot-check one doc against direct arithmetic
    val id = rows.head.getLong(0)
    val ss = Multimodal.wavSamples(id).map(v => v.toLong * v)
    val rms = math.sqrt(ss.sum.toDouble / ss.length)
    assert(math.abs(rows.head.getAs[Double]("rms") - rms) < 1e-5)
    assert(rows.head.getLong(2) === ss.length) // n_samples
    assert(rows.head.getLong(3) === (ss.length + 63) / 64) // n_windows
  }

  test("BMP codec: encode→decode round-trips pixels through every trap variant") {
    import graft.multimodal.Multimodal._
    // bottom-up / top-down × gap / no-gap × padded / unpadded widths:
    // ids 0..44 cover all 9 widths (8..16 — stride padding differs),
    // both row orders (id parity) and both offsets (id % 3)
    (0L until 45L).foreach { id =>
      val (w, h) = bmpDims(id)
      for (topDown <- Seq(false, true); gap <- Seq(0, 4)) {
        val (dw, dh, lum) = decodeBmp(encodeBmp(id, topDown, gap))
        assert((dw, dh) === (w, h), s"id=$id topDown=$topDown gap=$gap")
        val want = Array.tabulate(h * w) { pos =>
          val (x, y) = (pos % w, pos / w)
          val (b, g, r) = bmpChannels(id, x, y)
          299 * r + 587 * g + 114 * b
        }
        assert(lum.toSeq === want.toSeq, s"id=$id topDown=$topDown gap=$gap")
      }
    }
  }

  test("BMP parser rejects corrupt inputs loudly") {
    import graft.multimodal.Multimodal._
    val good = encodeBmp(7L, topDown = false, gapBytes = 0)
    // wrong magic
    val bad1 = good.clone(); bad1(0) = 'X'.toByte
    intercept[IllegalArgumentException](decodeBmp(bad1))
    // unsupported bpp (offset 28 in the DIB header)
    val bad2 = good.clone(); bad2(28) = 8.toByte
    intercept[IllegalArgumentException](decodeBmp(bad2))
    // truncated pixel array
    intercept[IllegalArgumentException](decodeBmp(good.take(good.length - 8)))
    // oversized claimed offset
    val bad3 = good.clone()
    java.nio.ByteBuffer.wrap(bad3).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, Int.MaxValue)
    intercept[IllegalArgumentException](decodeBmp(bad3))
  }
}
