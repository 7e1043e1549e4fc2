package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, decoded batch-wise per partition.
  *
  * The decode step itself is a STUB (this container has no image/audio
  * codecs — see the builder brief): `StubDecoder` derives deterministic
  * fake dimensions from the payload hash. Everything around it is real
  * and scale-shaped: binary column handling, partition-wise batched
  * iteration (`mapPartitions`, the Scala analog of `mapInPandas` batch
  * processing), explicit output schema, and a metadata projection that
  * never materializes payloads it doesn't need.
  */
object Multimodal {

  /** Decoded media features. A real deployment swaps StubDecoder for a
    * codec-backed implementation with the same signature.
    */
  final case class MediaMeta(
      path: String,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  trait BinaryDecoder extends Serializable {
    def decode(path: String, payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode: dimensions derived from payload bytes.
    * Marked stub: replaces `???` so the plumbing is testable end-to-end.
    */
  object StubDecoder extends BinaryDecoder {
    def decode(path: String, payload: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(payload)
      val fmt =
        if (payload.length >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
        else if (payload.length >= 4 && payload(0) == 0x89.toByte && payload(1) == 'P') "png"
        else "bin"
      MediaMeta(path, payload.length.toLong, fmt,
        width = 64 + math.floorMod(h, 1024),
        height = 64 + math.floorMod(h >> 10, 1024),
        n_frames = 1 + math.floorMod(h >> 20, 8))
    }
  }

  /** REAL image decode via `javax.imageio` (present in every JDK — no
    * extra dependency): PNG/GIF/JPEG/BMP/TIFF/WBMP headers are parsed
    * for true width/height/frame-count. Deliberately HEADER-ONLY —
    * `ImageReader.getWidth/getHeight(0)` read the IHDR/descriptor
    * without decoding pixel data, so metadata extraction over a 100 TB
    * binary corpus costs a few hundred bytes per payload, not a full
    * decode. Payloads whose format ImageIO cannot read fall back to
    * [[StubDecoder]], so mixed corpora (audio, video, raw) keep flowing
    * with sniffed-or-faked metadata instead of failing the batch.
    */
  object ImageIoDecoder extends BinaryDecoder {
    def decode(path: String, payload: Array[Byte]): MediaMeta = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(in)
            // allowSearch=true scans the stream for the true image count
            // (multi-frame GIF); single-frame formats answer instantly
            val frames =
              try r.getNumImages(true)
              catch { case _: java.io.IOException => 1 }
            MediaMeta(path, payload.length.toLong,
              r.getFormatName.toLowerCase(java.util.Locale.ROOT),
              width = r.getWidth(0), height = r.getHeight(0),
              n_frames = math.max(frames, 1))
          } catch {
            // truncated/corrupt header: sniffed stub metadata, not a crash
            case _: java.io.IOException => StubDecoder.decode(path, payload)
          } finally r.dispose()
        } else StubDecoder.decode(path, payload)
      } finally in.close()
    }
  }

  /** Deterministic REAL image fixture: a `width`×`height` image whose
    * pixels derive from `seed`, encoded with the JDK's own PNG/GIF/BMP
    * writer. Exists so the real-decoder path is verifiable end-to-end
    * without binary fixtures in testdata: encode(seed, w, h) then
    * [[ImageIoDecoder]].decode must return exactly (w, h) — and an
    * oracle that predicts (w, h) from the seed formula closes the loop.
    */
  def syntheticImage(seed: Long, width: Int, height: Int,
                     format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // cheap deterministic mix — pixel content is irrelevant to the
        // metadata contract, it just makes every payload distinct
        img.setRGB(x, y, (seed * 31 + y * width + x).toInt & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Decoded audio features — the audio analog of [[MediaMeta]].
    * duration_ms is integer arithmetic (n_samples·1000 / rate), so the
    * value is engine-independent.
    */
  final case class AudioMeta(
      path: String,
      n_bytes: Long,
      format: String,
      channels: Int,
      sample_rate: Int,
      bits_per_sample: Int,
      n_samples: Long,
      duration_ms: Long)

  /** REAL audio metadata decode: canonical RIFF/WAVE chunk walking in
    * pure byte arithmetic — WAV is an uncompressed container, so unlike
    * images no codec library is involved at all; channels, rate, bit
    * depth come from the `fmt ` chunk and the sample count from the
    * `data` chunk length. HEADER-ONLY like [[ImageIoDecoder]]: the walk
    * touches tens of bytes per payload regardless of audio length —
    * the 100 TB-scan-safe shape. Non-RIFF or truncated payloads yield
    * a zeroed row with a sniffed format instead of failing the batch.
    */
  def decodeWav(path: String, payload: Array[Byte]): AudioMeta = {
    def le16(o: Int): Int =
      (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def le32(o: Int): Long =
      (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
        ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    def tag(o: Int): String =
      if (o + 4 <= payload.length)
        new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    val bad = AudioMeta(path, payload.length.toLong, "bin", 0, 0, 0, 0L, 0L)
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") bad
    else {
      // walk in LONG arithmetic: a malformed length near 2^31 must end
      // the walk (→ zeroed row), never wrap Int and index negatively
      var off = 12L
      var ch = 0; var rate = 0; var bits = 0; var dataLen = -1L
      while (off + 8 <= payload.length && (ch == 0 || dataLen < 0)) {
        val id = tag(off.toInt); val len = le32(off.toInt + 4)
        // len >= 16: an undersized fmt chunk (declared shorter than
        // the PCM header fields) must degrade to the zeroed row, not
        // read channels/rate/bits from the NEXT chunk's bytes
        if (id == "fmt " && len >= 16 && off + 24 <= payload.length) {
          ch = le16(off.toInt + 10); rate = le32(off.toInt + 12).toInt
          bits = le16(off.toInt + 22)
        } else if (id == "data") {
          // a data chunk claiming more bytes than the payload holds is
          // a truncated file — zeroed row, not trusted metadata
          dataLen = if (off + 8 + len <= payload.length) len else -2L
        }
        // chunks are word-aligned: odd lengths carry a pad byte
        off += 8L + len + (len & 1L)
      }
      // sub-byte sample widths (4-bit ADPCM) are compressed audio this
      // header-only PCM walk cannot size — degrade, don't divide by 0
      if (ch <= 0 || rate <= 0 || bits < 8 || dataLen < 0) bad
      else {
        val n = dataLen / (ch.toLong * (bits / 8))
        AudioMeta(path, payload.length.toLong, "wav", ch, rate, bits, n,
          n * 1000L / rate)
      }
    }
  }

  /** One per-window feature row of [[audioFeatures]] — every field an
    * EXACT integer, so a SQL oracle reproduces the whole frame
    * bit-for-bit from the synthetic fixture's sample formula (floats
    * would make RMS order-dependent; sum-of-squares is RMS's exact
    * sufficient statistic, and mean-abs/peak/ZCR are integers
    * natively).
    */
  final case class AudioWindow(
      path: String,
      channel: Int,
      window_id: Int,
      n_samples: Int,
      sum_sq: Long,
      sum_abs: Long,
      peak: Int,
      zero_crossings: Int)

  /** REAL audio feature extraction over PCM16 WAV payloads: the walk
    * that [[decodeWav]] does for metadata, continued into the `data`
    * chunk — per channel (samples interleave frame-wise) and per fixed
    * window of `windowSamples`, exact-integer DSP: energy (Σv²), mean
    * amplitude numerator (Σ|v|), peak |v|, and zero crossings ((v<0)
    * xor (prev<0) between channel-consecutive samples; the pair
    * spanning a window boundary is charged to the LATER window). These
    * are the silence/clipping/activity gates an audio curation
    * pipeline actually filters on, and the windowing is the framing a
    * real feature chain (MFCC/fbank) starts from — the transform
    * kernel would slot into this loop; the Spark-side shape would not
    * change. mapPartitions is justified exactly like [[aHash]]'s: a
    * byte-level container walk + a tight short loop is a codec kernel,
    * not an expression; payloads never shuffle (features split at the
    * scan), and per-row state is one accumulator row per open window
    * per channel. Σv² ≤ 32768²·W — W ≤ 2^44 before Long risk; the
    * require keeps callers far inside. Non-RIFF / non-PCM16 /
    * truncated payloads emit no rows (the metadata twin [[audioMeta]]
    * is where malformed inputs surface as zeroed rows).
    */
  def audioFeatures(binaries: DataFrame, windowSamples: Int = 256): DataFrame = {
    require(windowSamples > 0 && windowSamples <= (1 << 20),
      s"windowSamples must be in (0, 2^20], got $windowSamples")
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        audioFeatureRows(p, bytes, windowSamples)
      })
      .toDF()
  }

  /** Audio curation DECISION layer over [[audioFeatures]] — the
    * keep/drop verdict a pipeline actually applies (the semanticDedup
    * pattern: machinery below, decision on top): per file, fold the
    * window stats to whole-file peak / total energy / sample count and
    * classify — `silent` (peak below `silentPeak`: no usable signal),
    * `clipped` (peak at or above `clipPeak`: driven into the rails;
    * 16-bit full scale is 32767), else `active`; keep = active. All
    * inputs and thresholds are exact integers, so the whole frame
    * cross-engine hash-checks. One windowed pass + one file-keyed
    * aggregation — payloads never shuffle, only fixed-width stats do.
    */
  def audioGate(binaries: DataFrame, windowSamples: Int = 256,
                silentPeak: Int = 512, clipPeak: Int = 32700): DataFrame = {
    require(silentPeak >= 0 && clipPeak > silentPeak,
      s"need 0 <= silentPeak < clipPeak, got $silentPeak/$clipPeak")
    audioFeatures(binaries, windowSamples)
      .groupBy(col("path"))
      .agg(max(col("peak")).as("peak"),
        sum(col("sum_sq")).as("sum_sq"),
        sum(col("n_samples")).cast("long").as("n_samples"),
        count(lit(1)).as("n_windows"))
      .withColumn("verdict",
        when(col("peak") < silentPeak, "silent")
          .when(col("peak") >= clipPeak, "clipped")
          .otherwise("active"))
      .withColumn("keep", col("verdict") === "active")
  }

  private[graft] def audioFeatureRows(path: String, payload: Array[Byte],
                                      w: Int): Seq[AudioWindow] = {
    val meta = decodeWav(path, payload)
    if (meta.format != "wav" || meta.bits_per_sample != 16 ||
        meta.channels <= 0 || meta.n_samples == 0L) return Seq.empty
    // re-walk to the data chunk's offset (decodeWav returns sizes only)
    def le32(o: Int): Long =
      (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
        ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    def tag(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var off = 12L
    var dataOff = -1L; var dataLen = 0L
    while (off + 8 <= payload.length && dataOff < 0) {
      val id = tag(off.toInt); val len = le32(off.toInt + 4)
      if (id == "data" && off + 8 + len <= payload.length) {
        dataOff = off + 8; dataLen = len
      }
      off += 8L + len + (len & 1L)
    }
    if (dataOff < 0) return Seq.empty
    val ch = meta.channels
    val nTotal = (dataLen / 2L).toInt // interleaved 16-bit samples
    // one open accumulator per channel; windows are channel-sequential,
    // so each flushes exactly when its channel's next window opens
    final class Acc(val c: Int, val wid: Int) {
      var n = 0; var sq = 0L; var abs = 0L; var peak = 0; var zc = 0
    }
    val open = new Array[Acc](ch)
    val prev = new Array[Int](ch)
    val hasPrev = new Array[Boolean](ch)
    val out = Seq.newBuilder[AudioWindow]
    def flush(a: Acc): Unit =
      out += AudioWindow(path, a.c, a.wid, a.n, a.sq, a.abs, a.peak, a.zc)
    var i = 0
    while (i < nTotal) {
      val o = (dataOff + 2L * i).toInt
      val v = ((payload(o) & 0xFF) | (payload(o + 1) << 8)).toShort.toInt
      val c = i % ch
      val wid = (i / ch) / w
      var a = open(c)
      if (a == null || a.wid != wid) {
        if (a != null) flush(a)
        a = new Acc(c, wid); open(c) = a
      }
      val av = math.abs(v)
      a.n += 1; a.sq += v.toLong * v; a.abs += av
      if (av > a.peak) a.peak = av
      if (hasPrev(c) && ((v < 0) != (prev(c) < 0))) a.zc += 1
      prev(c) = v; hasPrev(c) = true
      i += 1
    }
    open.foreach(a => if (a != null) flush(a))
    out.result()
  }

  /** Batched partition-wise audio metadata — same mapInPandas shape as
    * [[decodeMeta]]: one pass, payloads never shuffle.
    */
  def audioMeta(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) => decodeWav(p, bytes) })
      .toDF()
  }

  /** Deterministic REAL WAV fixture: canonical 44-byte PCM header +
    * seed-derived 16-bit samples. Every header field — and, because WAV
    * is uncompressed, the TOTAL byte length — is predictable from the
    * construction parameters, so the oracle can pin n_bytes too (the
    * PNG fixtures cannot: compressor-dependent).
    */
  def syntheticWav(seed: Long, channels: Int, sampleRate: Int,
                   nSamples: Long, shiftBits: Int = 0): Array[Byte] = {
    // shiftBits scales amplitude down by 2^shiftBits (arithmetic shift
    // of the signed sample — the oracle replicates it as floor
    // division by 2^k): 0 keeps full-scale noise, 6 a quiet track,
    // 12+ near-silence. Exists so amplitude-classifying ops (the
    // audio gate) get a fixture with every class represented.
    val dataLen = (nSamples * channels * 2).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen / 2) {
      buf.putShort(
        ((((seed * 31 + i) & 0xFFFF).toShort.toInt) >> shiftBits).toShort)
      i += 1
    }
    buf.array()
  }

  /** Batched partition-wise decode — the mapInPandas-shaped hot path:
    * one decoder instance per partition, payload bytes never shuffled.
    */
  def decodeMeta(binaries: DataFrame, decoder: BinaryDecoder = StubDecoder): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions { it => it.map { case (p, bytes) => decoder.decode(p, bytes) } }
      .toDF()
  }

  /** Metadata-only projection: length + magic sniff WITHOUT decode —
    * pure expressions, no payload leaves the scan.
    */
  def sniff(binaries: DataFrame): DataFrame =
    binaries.select(
      col("path"),
      octet_length(col("data")).cast("long").as("n_bytes"),
      hex(expr("substring(data, 1, 4)")).as("magic"))

  /** Frame sampling: one payload row → one row per sampled frame — the
    * flatMap shape a video pipeline needs. The frame EXTRACTION is the
    * honest part (every `stride`-th `frameSize`-byte window, pure
    * byte-level windowing, fully declarative: posexplode over the
    * window index sequence + substring, all codegen'd); for containers
    * the JDK can actually decode, [[videoFrames]] replaces the byte
    * window with REAL composed frames — this byte-window form remains
    * the total-function path for codec-less formats. Payloads split at
    * the scan — only frame-sized slices ever shuffle.
    */
  def frameSample(binaries: DataFrame, frameSize: Int = 1024,
                  stride: Int = 4): DataFrame =
    binaries
      .select(col("path"), col("data"),
        expr(s"CAST(ceil(octet_length(data) / CAST($frameSize AS DOUBLE)) AS INT)")
          .as("n_windows"))
      .filter(col("n_windows") > 0)
      .select(col("path"),
        posexplode(expr(s"sequence(0, CAST((n_windows - 1) / $stride AS INT))"))
          .as(Seq("frame_idx", "w")),
        col("data"))
      .select(col("path"), col("frame_idx"),
        expr(s"substring(data, w * $stride * $frameSize + 1, $frameSize)")
          .as("frame"))

  /** Resize: binary → binary with a deterministic stub transform (codec
    * absent in this container — see the builder brief). The plumbing is
    * the point: partition-wise batched map, one decoder instance per
    * partition, explicit (path, resized, n_bytes) output schema.
    */
  def resize(binaries: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    val target = targetW.toLong * targetH
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) =>
        // STUB: a real implementation decodes + rescales to exactly
        // targetW*targetH; this emits a deterministic projection of the
        // payload bytes at that size (no hidden cap — n_bytes always
        // honors the requested geometry)
        val out = Array.tabulate(target.toInt) { i =>
          if (bytes.isEmpty) 0.toByte else bytes(i % bytes.length)
        }
        (p, out, out.length.toLong)
      })
      .toDF("path", "resized", "n_bytes")
  }

  /** REAL resize: decode (ImageIO) → nearest-neighbor rescale to exactly
    * `targetW`×`targetH` → re-encode (lossless PNG by default, so the
    * output round-trips bit-identically through [[ImageIoDecoder]]).
    * Nearest-neighbor via explicit RenderingHints keeps the transform
    * deterministic across JVMs — no platform-dependent smoothing.
    * Payloads ImageIO cannot decode fall back to the stub byte
    * projection (format "bin"), so mixed corpora flow instead of
    * failing the batch. Same partition-wise batch shape as
    * [[decodeMeta]]: payloads never shuffle, one codec context per
    * partition.
    */
  def resizeImages(binaries: DataFrame, targetW: Int, targetH: Int,
                   format: String = "png"): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) =>
        val img = decodeOrNull(bytes)
        if (img == null) {
          // stub fallback — same deterministic projection as resize()
          val out = Array.tabulate(targetW * targetH) { i =>
            if (bytes.isEmpty) 0.toByte else bytes(i % bytes.length)
          }
          (p, out, "bin")
        } else {
          val dst = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, format, bos)
          (p, bos.toByteArray, format)
        }
      })
      .toDF("path", "resized", "format")
  }

  /** Decode-or-null: the ONE image-decode guard every pixel-path op
    * shares. Catches ALL non-fatal throwables, not just IOException —
    * the JDK decoders throw RuntimeExceptions (ArrayIndexOutOfBounds,
    * NegativeArraySize) on truncated/hostile payloads that merely
    * LOOK like a recognized format, and a corpus-scale job must drop
    * such a row, never die on it.
    */
  private def decodeOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }

  /** REAL feature extraction: decode (ImageIO) → per-cell channel sums
    * over a `grid`×`grid` partition of the image — one output row per
    * (path, cell) with exact integer r/g/b sums. Integer sums (not
    * float means) keep the features bit-reproducible across engines,
    * and the long format (row per cell) keeps the schema array-free.
    * Pivot + normalize to get an embedding for the Similarity ops.
    * Non-decodable payloads are dropped (they carry no pixel
    * statistics); use [[featureExtract]] for a total function.
    */
  def featureGrid(binaries: DataFrame, grid: Int = 2): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val img = decodeOrNull(bytes)
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth; val h = img.getHeight
          val r = Array.ofDim[Long](grid * grid)
          val g = Array.ofDim[Long](grid * grid)
          val b = Array.ofDim[Long](grid * grid)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cell = (y * grid / h) * grid + (x * grid / w)
              val v = img.getRGB(x, y) & 0xFFFFFF
              r(cell) += (v >> 16) & 255
              g(cell) += (v >> 8) & 255
              b(cell) += v & 255
              x += 1
            }
            y += 1
          }
          (0 until grid * grid).iterator.map(c => (p, c, r(c), g(c), b(c)))
        }
      })
      .toDF("path", "cell", "r_sum", "g_sum", "b_sum")
  }

  /** Deterministic STRUCTURED image — the aHash fixture generator: a
    * seed-keyed linear gradient pattern (per-pixel gray level
    * `(x·a + y·b + phase) mod 160 + shift`, channels equal) rendered
    * through the REAL ImageIO encode path. Same seed + same dims +
    * different `shift` is a uniform re-exposure (no clipping while
    * shift ≤ 95) — provably aHash-identical; different seeds give
    * different gradient directions/phases, i.e. different scenes.
    * Unlike [[syntheticImage]]'s hash noise (whose 8×8 cell means sit
    * at mid-gray everywhere), the gradient gives every cell a distinct
    * mean, which is what makes the hash discriminative.
    */
  def patternedImage(seed: Long, width: Int, height: Int,
                     shift: Int): Array[Byte] = {
    require(shift >= 0 && shift <= 95, "shift must stay clip-free")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = 1 + (seed % 7).toInt
    val b = 2 + (seed % 5).toInt
    val phase = (seed % 160).toInt
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = ((x * a + y * b + phase) % 160) + shift
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL perceptual average-hash (aHash) over the decode path — the
    * image dedup key: decode (ImageIO), partition into an 8×8 grid,
    * and set bit (row, col) when the cell's mean luminance exceeds the
    * image's mean. Every comparison is EXACT integer arithmetic — the
    * cell-vs-global mean test cross-multiplies sums and pixel counts
    * (cellSum·totalPx > totalSum·cellPx) instead of dividing, so no
    * rounding is involved and the hash is bit-reproducible anywhere.
    * The payoff is a PROVABLE invariance: a uniform brightness shift
    * adds the same per-pixel constant to both sides of the
    * cross-product (cellSum + c·cellPx vs totalSum + c·totalPx), so a
    * re-exposed copy of an image hashes IDENTICALLY while distinct
    * scenes differ — exact-groupBy dedup on the hash finds re-exposed
    * duplicates that byte-level sha/md5 can never connect. Bounds:
    * luminance sums ≤ 765·w·h, so Long cross-products are exact below
    * ~1.1e8 px; larger decodes switch to exact BigInt comparison.
    * One output row per decodable payload: (path, ahash).
    */
  def aHash(binaries: DataFrame): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val img = decodeOrNull(bytes)
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = Array.ofDim[Long](64)
          val counts = Array.ofDim[Long](64)
          var total = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cell = (y * 8 / h) * 8 + (x * 8 / w)
              val v = img.getRGB(x, y) & 0xFFFFFF
              val lum = ((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)
              sums(cell) += lum
              counts(cell) += 1
              total += lum
              x += 1
            }
            y += 1
          }
          val totalPx = w.toLong * h
          // cross-products reach 765·P² (P = w·h): exact in Long only
          // below ~1.1e8 px. Real corpora carry 100-200 MP photos, and
          // a wrapped product silently flips hash bits — corrupting
          // dedup groups with no error. Above the bound the 64
          // comparisons drop to exact BigInt (negligible next to the
          // 100M-pixel decode that preceded them); below it the Long
          // fast path is untouched.
          val exactBig = totalPx > 100000000L
          var hash = 0L
          var c = 0
          while (c < 64) {
            val gt =
              if (exactBig)
                BigInt(sums(c)) * totalPx > BigInt(total) * counts(c)
              else sums(c) * totalPx > total * counts(c)
            if (gt) hash |= (1L << c)
            c += 1
          }
          Iterator.single((p, hash))
        }
      })
      .toDF("path", "ahash")
  }

  /** REAL feature extraction: binary → Array[Float] embedding over the
    * actual decode path ([[featureGrid]]'s per-cell channel sums, fused
    * into one kernel so the corpus is decoded ONCE — no long-format
    * intermediate, no pivot shuffle). Component `cell·3 + ch` is the
    * MEAN-CENTERED exact-integer cross-product
    * `chSum(cell)·totalPx − chTotal·cellPx(cell)` cast to Float —
    * centering buys two properties a raw-sum embedding lacks:
    * (1) uniform re-exposure invariance, PROVABLY: a per-pixel +c adds
    * `c·cellPx·totalPx` to both products, so a brightness-shifted copy
    * embeds IDENTICALLY (the aHash argument, vector-valued) and ANN
    * recovers re-exposed duplicates at cosine exactly 1; (2) the
    * all-ones "average brightness" direction — which dominates raw
    * sums and crushes every image pair to cosine ≈ 1 — is projected
    * out, so cosine measures scene structure. The schema (path,
    * embedding Array[Float]) drops straight into the Similarity ops:
    * multimodal payloads join the ANN/near-dup machinery with no
    * friction. Exactness bound: products reach 255·P² (P = w·h), so
    * Long arithmetic is exact to ~1.9e8 px; above 150e6 px the
    * centering switches to exact BigInt (the [[aHash]] pattern —
    * real corpora carry 100–200 MP photos, and one big image must
    * embed correctly, not fail the whole corpus job; the BigInt cost
    * is negligible next to the decode).
    * Non-decodable payloads are dropped (no pixel statistics to
    * embed); [[decodeMeta]] + its stub fallback is the total-function
    * metadata path for mixed corpora.
    */
  def featureExtract(binaries: DataFrame, grid: Int = 4): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    val cells = grid * grid
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val img = decodeOrNull(bytes)
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth; val h = img.getHeight
          val totalPx = w.toLong * h
          val sums = Array.ofDim[Long](cells * 3)
          val cnt = Array.ofDim[Long](cells)
          val chTot = Array.ofDim[Long](3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cell = (y * grid / h) * grid + (x * grid / w)
              val v = img.getRGB(x, y) & 0xFFFFFF
              val r = (v >> 16) & 255; val g = (v >> 8) & 255; val b = v & 255
              sums(cell * 3) += r; sums(cell * 3 + 1) += g
              sums(cell * 3 + 2) += b
              chTot(0) += r; chTot(1) += g; chTot(2) += b
              cnt(cell) += 1
              x += 1
            }
            y += 1
          }
          val emb = Array.ofDim[Float](cells * 3)
          // Long cross-products are exact below 150e6 px (255·P² under
          // 2^63); huge decodes switch to BigInt, same values
          val exactLong = totalPx <= 150000000L
          var c = 0
          while (c < cells) {
            var ch = 0
            while (ch < 3) {
              emb(c * 3 + ch) =
                if (exactLong)
                  (sums(c * 3 + ch) * totalPx - chTot(ch) * cnt(c)).toFloat
                else
                  (BigInt(sums(c * 3 + ch)) * totalPx -
                    BigInt(chTot(ch)) * cnt(c)).toFloat
              ch += 1
            }
            c += 1
          }
          Iterator.single((p, emb))
        }
      })
      .toDF("path", "embedding")
  }

  // ── Video: real multi-frame decode ─────────────────────────────────

  /** REAL multi-frame video decode via the stock JDK — the last
    * modality off the stub path. `javax.imageio`'s GIF reader decodes
    * every frame of an animated GIF; frames are COMPOSED onto a
    * logical-screen canvas the way a player renders them (per-frame
    * left/top offsets from the ImageDescriptor, disposal from the
    * GraphicControlExtension: `restoreToBackgroundColor` clears the
    * frame rect, `restoreToPrevious` rolls the canvas back), so a
    * delta-encoded GIF — where frame N is a small dirty rectangle —
    * still yields N FULL frames, which is what every downstream frame
    * op expects. Output is one row per (path, frame): the composed
    * frame re-encoded as lossless PNG, so frames drop straight into
    * the image machinery ([[featureExtract]] → Similarity ANN,
    * [[aHash]] → frame-level dedup, [[resizeImages]]) with no special
    * casing — a video is just a path-sharing batch of images. Other
    * multi-image containers ImageIO can read (TIFF) take the same
    * loop with zero offsets. mapPartitions is the codec-kernel
    * justification ([[aHash]]): payloads never shuffle — they explode
    * into frame rows at the scan, and only frames move. Frame count
    * per payload is decoder-bounded (a GIF index walk), not trusted
    * metadata; `maxFrames` caps a hostile/broken payload loudly
    * rather than letting one file emit unbounded rows. Non-decodable
    * payloads emit no rows, the [[featureExtract]] convention.
    */
  def videoFrames(binaries: DataFrame, maxFrames: Int = 10000): DataFrame = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries
      .select(col("path"), col("data"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        decodeVideoFrames(bytes, maxFrames).map { case (i, img) =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (p, i, img.getWidth, img.getHeight, bos.toByteArray)
        }
      })
      .toDF("path", "frame_idx", "width", "height", "frame")
  }

  /** The frame compositor behind [[videoFrames]]: decode each image of
    * a multi-image stream and play it onto the logical-screen canvas.
    * Returns fully-composed RGB frames in presentation order. Exposed
    * package-private for the spec that pins delta-frame composition
    * against a hand-built offset GIF.
    */
  private[graft] def decodeVideoFrames(
      bytes: Array[Byte], maxFrames: Int = 10000)
      : Iterator[(Int, java.awt.image.BufferedImage)] = {
    import java.awt.image.BufferedImage
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, BufferedImage)]
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return Iterator.empty
      val r = readers.next()
      try {
        r.setInput(in)
        val isGif = r.getFormatName.equalsIgnoreCase("gif")
        val n = math.min(
          try r.getNumImages(true)
          catch { case _: java.io.IOException => 0 },
          maxFrames)
        if (n <= 0) return Iterator.empty
        // logical screen: GIF stream metadata when present, else the
        // first frame's geometry (TIFF and friends)
        val (screenW, screenH) =
          gifLogicalScreen(r).getOrElse((r.getWidth(0), r.getHeight(0)))
        val canvas = new BufferedImage(
          screenW, screenH, BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          var i = 0
          while (i < n) {
            val frame =
              try r.read(i)
              catch { case _: java.io.IOException => null }
            if (frame == null) return out.iterator // truncated tail
            val (left, top, disposal) =
              if (isGif) gifFrameGeometry(r, i) else (0, 0, "none")
            // Disposal 3 restores the canvas state *prior to rendering
            // this frame* (GIF89a spec), which differs from the previous
            // composed output whenever frame i-1 itself disposed — so
            // snapshot BEFORE drawing, not the last emitted frame.
            val preDraw: BufferedImage =
              if (disposal == "restoreToPrevious") {
                val s = new BufferedImage(
                  screenW, screenH, BufferedImage.TYPE_INT_RGB)
                s.createGraphics().drawImage(canvas, 0, 0, null)
                s
              } else null
            g.drawImage(frame, left, top, null)
            val snap = new BufferedImage(
              screenW, screenH, BufferedImage.TYPE_INT_RGB)
            snap.createGraphics().drawImage(canvas, 0, 0, null)
            out += ((i, snap))
            disposal match {
              case "restoreToBackgroundColor" =>
                // GIF89a: the logical screen's background palette index
                // (global color table + backgroundColorIndex) — resolved
                // once per stream; transparent/absent background falls
                // back to deterministic black (players render the
                // transparent background as whatever is behind the
                // image; black is the canonical opaque stand-in)
                val c = g.getColor
                g.setColor(if (isGif)
                  gifBackgroundColor(r).getOrElse(java.awt.Color.BLACK)
                else java.awt.Color.BLACK)
                g.fillRect(left, top, frame.getWidth, frame.getHeight)
                g.setColor(c)
              case "restoreToPrevious" =>
                g.drawImage(preDraw, 0, 0, null)
              case _ => () // none / doNotDispose: canvas carries over
            }
            i += 1
          }
        } finally g.dispose()
        out.iterator
      } finally r.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => out.iterator
    } finally in.close()
  }

  /** GIF logical screen size from stream metadata, when the reader
    * exposes it. */
  private def gifLogicalScreen(r: javax.imageio.ImageReader)
      : Option[(Int, Int)] =
    try {
      val sm = r.getStreamMetadata
      if (sm == null) None
      else {
        val root = sm.getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
        if (lsd.getLength == 0) None
        else {
          val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
          Some((e.getAttribute("logicalScreenWidth").toInt,
            e.getAttribute("logicalScreenHeight").toInt))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The stream's background color: the global color table entry named
    * by the logical screen descriptor's backgroundColorIndex — the
    * color disposal-2 restores (GIF89a §18/§20). None when the stream
    * has no global palette, no background index, or the index is the
    * transparent one (per-frame GCE transparency can only make the
    * background MORE transparent, never a different opaque color, so
    * stream-level resolution is sufficient); the caller falls back to
    * deterministic black.
    */
  private def gifBackgroundColor(r: javax.imageio.ImageReader)
      : Option[java.awt.Color] =
    try {
      val sm = r.getStreamMetadata
      if (sm == null) None
      else {
        val root = sm.getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val gcts = root.getElementsByTagName("GlobalColorTable")
        if (gcts.getLength == 0) None
        else {
          val gct = gcts.item(0).asInstanceOf[org.w3c.dom.Element]
          val bg = gct.getAttribute("backgroundColorIndex")
          if (bg.isEmpty) None
          else {
            val idx = bg.toInt
            val entries = gct.getElementsByTagName("ColorTableEntry")
            var found: Option[java.awt.Color] = None
            var i = 0
            while (found.isEmpty && i < entries.getLength) {
              val e = entries.item(i).asInstanceOf[org.w3c.dom.Element]
              if (e.getAttribute("index").toInt == idx)
                found = Some(new java.awt.Color(
                  e.getAttribute("red").toInt,
                  e.getAttribute("green").toInt,
                  e.getAttribute("blue").toInt))
              i += 1
            }
            found
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame GIF placement + disposal from image metadata:
    * (imageLeftPosition, imageTopPosition, disposalMethod). */
  private def gifFrameGeometry(r: javax.imageio.ImageReader, i: Int)
      : (Int, Int, String) =
    try {
      val root = r.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      def attr(tag: String, name: String, dflt: String): String = {
        val nl = root.getElementsByTagName(tag)
        if (nl.getLength == 0) dflt
        else {
          val v = nl.item(0).asInstanceOf[org.w3c.dom.Element]
            .getAttribute(name)
          if (v.isEmpty) dflt else v
        }
      }
      (attr("ImageDescriptor", "imageLeftPosition", "0").toInt,
        attr("ImageDescriptor", "imageTopPosition", "0").toInt,
        attr("GraphicControlExtension", "disposalMethod", "none"))
    } catch { case scala.util.control.NonFatal(_) => (0, 0, "none") }

  /** Deterministic REAL animated-GIF fixture: `nFrames` full-size
    * solid-gray frames (gray level `(seed·37 + f·53) mod 200` at frame
    * f) written through the JDK's own GIF sequence writer
    * (`writeToSequence`). Frames are TYPE_BYTE_INDEXED over an explicit
    * 256-gray palette, so the GIF encoder stores the exact levels —
    * no quantizer in the loop — and every decoded pixel is
    * SQL-predictable: frame f of video `seed` sums to
    * `gray(seed,f) · w · h` per channel, which is what lets a DuckDB
    * oracle check the whole decode→compose→re-encode→feature chain
    * from the construction formula alone ([[syntheticWav]]'s role, one
    * modality over). Offsets/disposal default to full-frame/none; the
    * delta-composition spec builds its own offset frames directly.
    */
  def syntheticGif(seed: Long, width: Int, height: Int,
                   nFrames: Int): Array[Byte] = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        w.writeToSequence(
          new javax.imageio.IIOImage(
            solidGrayFrame(width, height, grayLevel(seed, f)), null, null),
          null)
        f += 1
      }
      w.endWriteSequence()
    } finally {
      w.dispose(); ios.close()
    }
    bos.toByteArray
  }

  /** The fixture's per-frame gray formula — shared with specs/oracles. */
  private[graft] def grayLevel(seed: Long, frame: Int): Int =
    math.floorMod(seed * 37 + frame * 53L, 200L).toInt

  /** A solid-gray frame over an explicit 256-gray palette (exact GIF
    * round-trip; also the building block for the spec's offset deltas). */
  private[graft] def solidGrayFrame(width: Int, height: Int,
                                    gray: Int): java.awt.image.BufferedImage = {
    val levels = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(
      8, 256, levels, levels, levels)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, gray)
        x += 1
      }
      y += 1
    }
    img
  }
}
