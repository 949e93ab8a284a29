package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2-G): treat media as opaque
  * `binary` payloads with typed metadata, and run the (stubbed) decoder
  * batch-wise per partition — the exact shape a real image/audio model
  * UDF needs (schema, partitioning, batch size), with the model call
  * replaced by a deterministic fake since no media libs ship in this
  * environment.
  *
  * Scale: the payload column is only materialized inside the decode
  * stage (never shuffled wide); metadata filters prune at the parquet
  * scan before bytes are read.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long, height: Long,
      feat_sum: Long, n_batch: Long)

  val BatchSize = 64

  /** mm_bmp_resample's fixed target grid — shared constants with the
    * oracle SQL, which hard-codes the checksum weights (gy·GridW+gx+1)
    * and dhash stride (gy·(GridW−1)+gx) for exactly this shape.
    */
  val ResampleGridW = 8
  val ResampleGridH = 6

  /** Attach a binary payload + typed metadata to each document (stand-in
    * for reading real image bytes; deterministic).
    */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("n_chars") % 64) * 10 + 10).cast("int").as("width"),
      ((col("n_chars") % 48) * 10 + 10).cast("int").as("height"))

  /** STUB decoder: a real implementation would decode image bytes and
    * run a vision model per batch; here it derives deterministic
    * features from the raw bytes. The batching shape (partition iterator
    * → fixed-size batches → per-batch "model call") is real.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val head = r.payload.take(16)
      MediaFeatures(r.doc_id, r.payload.length.toLong, r.width.toLong, r.height.toLong,
        head.map(_.toLong & 0xff).sum, batch.size.toLong)
    }

  /** Batched partition-wise feature extraction over the binary column. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = withBinary(Tables.documents(spark, dir)).as[MediaRow]
    media.mapPartitions(it => it.grouped(BatchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** Perceptual-hash near-duplicate detection over the binary payload
    * (the image-dedup pipeline shape): "decode" the payload (stub —
    * bytes back to text here; a real pipeline would decode pixels),
    * hash fixed 4-byte blocks into a 64-bit SimHash signature (r8; was
    * 32 — the narrow signature saturated its banding at scale),
    * generate candidates by 16-bit-block banding (pigeonhole-exhaustive
    * for hamming ≤ 3 blocks, same as Dedup.simhashBlocks — never
    * all-pairs), and keep pairs at hamming ≤ `maxHamming`.
    *
    * Unlike `decodeFeatures` (whose model stub keeps it rows-only),
    * the block hashing is fully relational, so this multimodal entry IS
    * oracle-checked.
    */
  def phashDedup(spark: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    import org.apache.spark.sql.Column
    val decoded = decode(col("payload"), "UTF-8")
    val nBlocks = ((length(decoded) + lit(3)) / lit(4)).cast("int")
    val idx = when(nBlocks > 0, sequence(lit(1), nBlocks))
      .otherwise(array().cast("array<int>"))
    val blocks = transform(idx, (i: Column) =>
      decoded.substr((i - lit(1)) * lit(4) + lit(1), lit(4)))
    val sigs = graft.Tables.fanOut(withBinary(Tables.documents(spark, dir)))
      // zero-length payloads: the oracle's unnest drops them (no token
      // rows), so drop them here too rather than emitting a sig=0 row
      // that could band-match other low-bit signatures (ADVICE r4)
      .filter(length(decoded) > 0)
      .select(col("doc_id"), graft.functions.TextExprs.simhash(blocks).as("sig"))
    val blkArr = array((0 until 4).map(b => struct(lit(b).as("blk"),
      shiftright(col("sig"), 16 * b).bitwiseAND(lit(65535L)).as("bval"))): _*)
    val blks = sigs
      .select(col("doc_id"), col("sig"), explode(blkArr).as("e"))
      .select(col("doc_id"), col("sig"), col("e.blk").as("blk"), col("e.bval").as("bval"))
      .transform(graft.plans.ScanShare.shared)
    blks.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("blk"), col("bval"))
      .join(blks.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("blk"), col("bval")), Seq("blk", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Metadata-level resize: recompute target dimensions preserving
    * aspect ratio, payload untouched (a real pipeline would hand the
    * (payload, target) pairs to the decoder batch). Pure column math —
    * no bytes move until the decode stage consumes them.
    */
  def resize(media: DataFrame, maxSide: Int = 128): DataFrame = {
    val scaleNum = lit(maxSide)
    val longSide = greatest(col("width"), col("height"))
    media
      .withColumn("scale_num", scaleNum)
      .withColumn("rs_width", ((col("width") * scaleNum) / longSide).cast("int"))
      .withColumn("rs_height", ((col("height") * scaleNum) / longSide).cast("int"))
      .drop("scale_num")
  }

  /** Graded frame-sampling query: every 4th 32-byte frame of each
    * payload with its content hash — the video/audio ingest shape
    * (explode → pruned payload slices → per-frame fingerprints). The
    * payload is ASCII-encoded text, so the oracle mirrors the byte
    * slices as char slices and DuckDB's md5(varchar) equals Spark's
    * md5(binary) on the UTF-8 bytes.
    */
  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    frameSample(graft.Tables.fanOut(withBinary(Tables.documents(spark, dir))))
      .select(col("doc_id"), col("frame_idx"), col("frame_len"),
        md5(col("frame")).as("frame_hash"))

  /** Graded resize query: aspect-preserving target dimensions for every
    * payload (pure per-row integer math, zero shuffle; the payload
    * bytes never move).
    */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resize(graft.Tables.fanOut(withBinary(Tables.documents(spark, dir))))
      .select(col("doc_id"), col("width"), col("height"),
        col("rs_width"), col("rs_height"))

  /** Graded energy-profile query: per-window mean CODEPOINT value over
    * the payload decoded as UTF-8 text (the RMS-energy shape of an
    * audio pipeline — silence trimming, clipping detection — with the
    * stub codec's characters standing in for samples): per-doc window
    * count, peak-window mean and overall mean. Note the stub operates
    * on CHARACTERS, not raw bytes — `substr`/`ascii` on the decoded
    * string yield codepoints, so `windowChars` counts characters and
    * the energies are codepoint means (identical for the ASCII test
    * payloads; a real codec would fold raw sample bytes instead). The
    * Spark-side plumbing (windowed slices, per-window fold, per-asset
    * rollup) is the real thing; a sample decoder would replace the
    * ascii fold. Zero joins; one explode scan + a per-doc partial agg.
    */
  def energyQuery(spark: SparkSession, dir: String, windowChars: Int = 32): DataFrame = {
    val media = graft.Tables.fanOut(withBinary(Tables.documents(spark, dir)))
      .withColumn("s", decode(col("payload"), "UTF-8"))
    val nWin = ceil(length(col("s")) / lit(windowChars.toDouble)).cast("int")
    val idx = when(nWin > 0, sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    media
      .withColumn("widx", explode(idx))
      .select(col("doc_id"), col("widx"),
        expr(s"substr(s, widx * $windowChars + 1, $windowChars)").as("w"))
      .withColumn("sum_codes", expr(
        "aggregate(transform(sequence(1, length(w)), i -> ascii(substr(w, i, 1))), 0L, (a, x) -> a + x)"))
      .withColumn("wlen", length(col("w")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        graft.functions.VectorFunctions
          .r6(max(col("sum_codes") / (lit(1.0) * col("wlen")))).as("peak_energy"),
        graft.functions.VectorFunctions
          .r6(sum(col("sum_codes")) / (lit(1.0) * sum(col("wlen")))).as("mean_energy"))
  }

  // ---- real WAV codec (r9): ONE modality's decoder is genuine ----
  // Everything below runs actual RIFF/WAVE bytes through the batched
  // decode seam — no ASCII stand-in. The PCM content is a closed-form
  // series of (doc_id, i), which is what makes the END of the pipeline
  // oracle-checkable while the MIDDLE is a real binary round trip.

  case class WavRow(doc_id: Long, payload: Array[Byte])
  case class WavDecoded(doc_id: Long, sample_rate: Int, samples: Array[Int])

  val WavSampleRate = 8000

  /** Closed-form 16-bit PCM samples for a doc (the oracle mirrors this
    * arithmetic): 160–256 samples of ((id·31 + i·7) mod 65536) − 32768.
    */
  def wavSamples(id: Long): Array[Int] = {
    val n = (160 + (id % 7) * 16).toInt
    Array.tabulate(n)(i => (((id * 31 + i.toLong * 7) % 65536) - 32768).toInt)
  }

  /** Real RIFF/WAVE writer: canonical fmt chunk (PCM, mono, 16-bit,
    * little-endian). With `withListChunk` a LIST/INFO chunk sits
    * between fmt and data — so a "decoder" that blindly seeks byte 44
    * reads garbage; only a chunk-walking parser decodes every payload.
    */
  def encodeWav(samples: Array[Int], sampleRate: Int,
      withListChunk: Boolean): Array[Byte] = {
    val dataSize = samples.length * 2
    val listSize = if (withListChunk) 12 else 0 // "LIST" + size + "INFO"
    val buf = java.nio.ByteBuffer.allocate(44 + listSize + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + listSize + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
    if (withListChunk)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Real RIFF/WAVE parser: validates the RIFF/WAVE magic, walks the
    * chunk list (skipping unknown chunks, honoring the RIFF word-align
    * padding rule), reads fmt (requires PCM mono 16-bit) and decodes
    * the data chunk as little-endian s16.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    buf.getInt() // riff size
    require(fourcc() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Int] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = fourcc()
      val size = buf.getInt()
      // the size field is attacker-controlled bytes: a negative value
      // would move position() BACKWARD (an infinite re-parse loop, not
      // a loud failure), and an oversized one past the buffer
      require(size >= 0 && size <= buf.remaining(),
        s"corrupt chunk '$id': size=$size with ${buf.remaining()} bytes left")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val fmt = buf.getShort(); val ch = buf.getShort()
          sampleRate = buf.getInt(); buf.getInt(); buf.getShort()
          val bits = buf.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV flavor: fmt=$fmt channels=$ch bits=$bits")
          buf.position(buf.position() + (size - 16))
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          samples = Array.fill(size / 2)(buf.getShort().toInt)
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // skip + pad byte
      }
    }
    require(samples != null, "no data chunk")
    (sampleRate, samples)
  }

  /** Graded audio-energy query over REAL WAV bytes: encode each doc's
    * PCM series as a genuine RIFF/WAVE payload, decode it back through
    * the batched partition-wise seam (the mapPartitions shape every
    * media decoder here uses), then windowed RMS — per-doc window
    * count, peak-window RMS and overall RMS. The byte stage is real
    * (odd docs carry an extra LIST chunk the parser must skip); the
    * oracle recomputes the closed-form PCM arithmetic.
    */
  def wavEnergyQuery(spark: SparkSession, dir: String,
      windowSamples: Int = 64): DataFrame = {
    import spark.implicits._
    val sr = WavSampleRate
    val media: Dataset[WavRow] = graft.Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .map(id => WavRow(id, encodeWav(wavSamples(id), sr, id % 2 == 1)))
    val decoded = media.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val (rate, ss) = decodeWav(r.payload)
      WavDecoded(r.doc_id, rate, ss)
    }))
    decoded.toDF()
      .select(col("doc_id"), col("sample_rate").cast("long").as("sample_rate"),
        posexplode(col("samples")).as(Seq("i", "v")))
      .groupBy(col("doc_id"), col("sample_rate"), expr(s"i div $windowSamples").as("widx"))
      .agg(sum(col("v").cast("long") * col("v")).as("ss"), count(lit(1)).as("n"))
      .groupBy(col("doc_id"), col("sample_rate"))
      .agg(sum(col("n")).as("n_samples"), count(lit(1)).as("n_windows"),
        graft.functions.VectorFunctions
          .r6(sqrt(max(col("ss") / (lit(1.0) * col("n"))))).as("peak_rms"),
        graft.functions.VectorFunctions
          .r6(sqrt(sum(col("ss")) / (lit(1.0) * sum(col("n"))))).as("rms"))
      .select("doc_id", "sample_rate", "n_samples", "n_windows", "peak_rms", "rms")
  }

  // ---- real BMP codec (r10): the image modality's decoder is genuine ----
  // The mm_wav pattern applied to images: each doc's closed-form 24-bit
  // BGR pixel grid is encoded as a genuine Windows BMP (BITMAPFILEHEADER
  // + BITMAPINFOHEADER) and decoded back through the batched seam. Three
  // header-seek poisons force a real parser: even docs store rows
  // BOTTOM-UP (the BMP default — positive biHeight), odd docs TOP-DOWN
  // (negative biHeight), rows pad to 4-byte boundaries (3·width is not a
  // multiple of 4 for most widths here), and every third doc inserts a
  // gap before the pixel array so the bfOffBits field must be honored,
  // not assumed 54.

  case class BmpRow(doc_id: Long, payload: Array[Byte])
  /** Decoded image: per-mille luminance (299r+587g+114b) per pixel,
    * row-major TOP-DOWN regardless of the file's row order.
    */
  case class BmpDecoded(doc_id: Long, width: Int, height: Int, lum: Array[Int])

  /** Closed-form image dims + channels (the oracle mirrors these):
    * width 8..16, height 6..10; b/g/r are independent mod-256 ramps
    * over (id, x, y) with y in TOP-DOWN image space.
    */
  def bmpDims(id: Long): (Int, Int) = ((8 + id % 9).toInt, (6 + id % 5).toInt)

  def bmpChannels(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + y * 17 + x * 7) % 256).toInt,  // b
    ((id * 13 + y * 5 + x * 3) % 256).toInt,   // g
    ((id * 7 + y * 11 + x * 13) % 256).toInt)  // r

  /** Real BMP writer: 24-bit uncompressed, rows padded to 4 bytes.
    * `topDown` writes a negative biHeight (rows in image order);
    * otherwise the canonical bottom-up layout. `gapBytes` pads between
    * the headers and the pixel array (bfOffBits honors it).
    */
  def encodeBmp(id: Long, topDown: Boolean, gapBytes: Int): Array[Byte] = {
    val (w, h) = bmpDims(id)
    val stride = ((3 * w + 3) / 4) * 4
    val offBits = 54 + gapBytes
    val buf = java.nio.ByteBuffer.allocate(offBits + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(offBits + stride * h)
      .putShort(0).putShort(0).putInt(offBits)
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until gapBytes).foreach(_ => buf.put(0.toByte))
    val rowOrder = if (topDown) 0 until h else (h - 1) to 0 by -1
    rowOrder.foreach { y =>
      (0 until w).foreach { x =>
        val (b, g, r) = bmpChannels(id, x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (3 * w until stride).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  /** Real BMP parser: validates the BM magic and the 24-bit
    * uncompressed flavor, honors bfOffBits, the row padding and the
    * biHeight sign, and emits per-mille luminance row-major top-down.
    */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP file")
    buf.getInt(); buf.getShort(); buf.getShort()
    val offBits = buf.getInt()
    val dibSize = buf.getInt()
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val w = buf.getInt()
    val hRaw = buf.getInt()
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = buf.getShort(); val bpp = buf.getShort()
    val compression = buf.getInt()
    require(planes == 1 && bpp == 24 && compression == 0,
      s"unsupported BMP flavor: planes=$planes bpp=$bpp compression=$compression")
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"corrupt dimensions ${w}x$hRaw")
    val stride = ((3 * w + 3) / 4) * 4
    require(offBits >= 54 && offBits.toLong + stride.toLong * h <= bytes.length,
      s"pixel array out of bounds: offBits=$offBits stride=$stride h=$h len=${bytes.length}")
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      var p = offBits + fileRow * stride
      var x = 0
      while (x < w) {
        val b = bytes(p) & 0xff; val g = bytes(p + 1) & 0xff; val r = bytes(p + 2) & 0xff
        lum(y * w + x) = 299 * r + 587 * g + 114 * b
        p += 3; x += 1
      }
      y += 1
    }
    (w, h, lum)
  }

  /** Graded image query over REAL BMP bytes: encode each doc's pixel
    * grid as a genuine BMP, decode it back through the batched
    * partition-wise seam, then the image-pipeline features off the
    * DECODED dimensions and pixels — aspect-preserving resize targets
    * (the mm_resize math on real dims), mean per-mille luminance, and
    * a 4×4 mean-grid perceptual hash (each cell's bit set iff its mean
    * beats the image mean, compared by integer cross-multiplication so
    * both engines decide bits exactly). The oracle recomputes the
    * closed-form channels; the byte stage must be lossless — including
    * the row order, padding and offset traps — for the hash to match.
    */
  def bmpFeaturesQuery(spark: SparkSession, dir: String, maxSide: Int = 128): DataFrame = {
    import spark.implicits._
    val media: Dataset[BmpRow] = graft.Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .map(id => BmpRow(id, encodeBmp(id, topDown = id % 2 == 1, gapBytes = if (id % 3 == 0) 4 else 0)))
    val decoded = media.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val (w, h, lum) = decodeBmp(r.payload)
      BmpDecoded(r.doc_id, w, h, lum)
    }))
    val px = decoded.toDF()
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("lum")).as(Seq("pos", "lum")))
      .select(col("doc_id"), col("width"), col("height"), col("lum"),
        (col("pos") % col("width")).as("x"), (col("pos") / col("width")).cast("int").as("y"))
    val cells = px
      .groupBy(col("doc_id"), col("width"), col("height"),
        expr("(x * 4) div width").as("gx"), expr("(y * 4) div height").as("gy"))
      .agg(sum(col("lum").cast("long")).as("cell_sum"), count(lit(1)).as("cell_n"))
    val totals = cells.groupBy(col("doc_id"), col("width"), col("height"))
      .agg(sum(col("cell_sum")).as("tot_sum"), sum(col("cell_n")).as("tot_n"))
    cells.join(totals, Seq("doc_id", "width", "height"))
      .withColumn("bit",
        when(col("cell_sum") * col("tot_n") > col("tot_sum") * col("cell_n"), 1L)
          .otherwise(0L))
      .groupBy(col("doc_id"), col("width"), col("height"),
        col("tot_sum"), col("tot_n"))
      .agg(sum(expr("bit << (gy * 4 + gx)")).as("phash"))
      .select(col("doc_id"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("tot_n").as("n_pixels"),
        floor(col("width") * lit(maxSide) / greatest(col("width"), col("height")))
          .cast("long").as("rs_width"),
        floor(col("height") * lit(maxSide) / greatest(col("width"), col("height")))
          .cast("long").as("rs_height"),
        graft.functions.VectorFunctions
          .r6(col("tot_sum") / (lit(1000.0) * col("tot_n"))).as("mean_lum"),
        col("phash"))
  }

  /** Graded RESAMPLE query over REAL BMP bytes (r11, r10 verdict #5 —
    * the operation users actually run on decoded images): encode each
    * doc's pixel grid as a genuine BMP, decode it back through the
    * batched seam, then box-filter resample the decoded luminance grid
    * to a fixed `gridW`×`gridH` target — each source pixel lands in
    * exactly one target cell via the integer bucket map
    * `gx = (x·gridW) div w` (the mm_bmp precedent; gridW ≤ min width
    * and gridH ≤ min height, so no cell is empty), and the resampled
    * pixel is the integer mean `cell_sum div cell_n` of its box.
    * Features off the RESAMPLED pixels: a position-weighted integer
    * checksum of the resampled values (pins the resample math itself,
    * not just a bit pattern) and a difference-hash — bit (gy,gx) set
    * iff the right-neighbor cell is strictly brighter, decided by
    * integer cross-multiplication (nsum·n > sum·nn, no division) —
    * the classic dHash a production image-dedup pipeline computes on
    * the resized image. The oracle recomputes the closed-form channels
    * and the same bucket sums; the byte stage (row order, stride
    * padding, bfOffBits) must be lossless for the checksum to match.
    *
    * Scale shape: decode is the batched map-side seam; the pixel
    * explode + cell aggregate is one partial-agg shuffle keyed by
    * (doc, cell); the neighbor compare is a lead() window over the
    * gridW·gridH cells of each doc — bounded per doc, never corpus-
    * wide.
    */
  def bmpResampleQuery(spark: SparkSession, dir: String): DataFrame = {
    // the 8×6 target grid is a CONSTANT shared with the oracle (r12,
    // ADVICE r11): the registered SQL hard-codes the gy·8+gx+1 checksum
    // weights and the gy·7+gx dhash stride, so a parameterized grid
    // would silently diverge from the graded query — pin it instead
    val gridW = ResampleGridW
    val gridH = ResampleGridH
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val media: Dataset[BmpRow] = graft.Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id")).as[Long]
      .map(id => BmpRow(id, encodeBmp(id, topDown = id % 2 == 1, gapBytes = if (id % 3 == 0) 4 else 0)))
    val decoded = media.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val (w, h, lum) = decodeBmp(r.payload)
      BmpDecoded(r.doc_id, w, h, lum)
    }))
    val px = decoded.toDF()
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("lum")).as(Seq("pos", "lum")))
      .select(col("doc_id"), col("width"), col("height"), col("lum"),
        (col("pos") % col("width")).as("x"), (col("pos") / col("width")).cast("int").as("y"))
    val cells = px
      .groupBy(col("doc_id"), col("width"), col("height"),
        expr(s"(x * $gridW) div width").as("gx"), expr(s"(y * $gridH) div height").as("gy"))
      .agg(sum(col("lum").cast("long")).as("cell_sum"), count(lit(1)).as("cell_n"))
      .withColumn("rpx", expr("cell_sum div cell_n"))
    val w = Window.partitionBy(col("doc_id"), col("gy")).orderBy(col("gx"))
    cells
      .withColumn("nsum", lead(col("cell_sum"), 1).over(w))
      .withColumn("nn", lead(col("cell_n"), 1).over(w))
      // a null neighbor (the row's last cell) decides to 0 via the
      // when's otherwise — no bit, matching the oracle's CASE
      .withColumn("bit",
        when(col("nsum") * col("cell_n") > col("cell_sum") * col("nn"), 1L)
          .otherwise(0L))
      .groupBy(col("doc_id"), col("width"), col("height"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("rpx") * (col("gy") * gridW + col("gx") + lit(1))).as("rs_checksum"),
        sum(expr(s"bit << cast(gy * ${gridW - 1} + gx as int)")).as("dhash"))
      .select(col("doc_id"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("n_cells"), col("rs_checksum"), col("dhash"))
  }

  /** Frame sampling for audio/video-like payloads: split the byte
    * stream into fixed-size frames and keep every `stride`-th one —
    * the Spark-side plumbing (explode with positional index, pruned
    * payload slices) is real; a codec would replace `substring`.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
    // sequence(0, -1) would DESCEND ([0,-1]) on an empty payload
    val idx = when(nFrames > 0, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    media
      .withColumn("frame_idx", explode(idx))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)")
          .as("frame"))
      .withColumn("frame_len", length(col("frame")).cast("long"))
  }
}
