package graft.util

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real media-format codecs built purely from the PUBLIC file-format
  * specifications (PNG RFC 2083 / ISO 15948, JPEG ISO 10918 JFIF marker
  * layout, GIF87a/89a, BMP BITMAPINFOHEADER, RIFF/WAVE) on `java.util.zip`
  * — no external libraries, which is the point: the container has no image
  * stack, yet the decode path the multimodal plumbing exercises is genuine
  * byte-level parsing, not a stand-in.
  *
  * Scope (documented, enforced with clear errors):
  *  - PNG: full ENCODE + DECODE for 8-bit grayscale non-interlaced images
  *    (chunk walk, zlib inflate, all five scanline filters: None/Sub/Up/
  *    Average/Paeth). Other color types/depths raise — the pipeline's
  *    payloads are single-channel.
  *  - JPEG/GIF/BMP/WAV: header parse only (dimensions / channel layout) —
  *    entropy-coded JPEG payload decode is out of scope.
  *
  * Everything is deterministic: the decoder's output depends only on the
  * bytes, and the encoder's pixel ROUND-TRIP is exact regardless of what
  * compressed representation Deflater emits.
  */
object MediaCodec {

  /** Parsed header: container format and its primary dimensions. For
    * raster formats (width, height) in pixels; for WAV, (sampleRate,
    * channels) — the audio analogue of a raster's dims.
    */
  final case class MediaHeader(format: String, width: Int, height: Int)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Sniff the container from magic bytes and parse its dimensions.
    * Unknown containers → `MediaHeader("raw", n_bytes, 1)` — the pipeline
    * treats them as opaque 8-bit payloads rather than failing the batch.
    */
  def parseHeader(b: Array[Byte]): MediaHeader =
    if (isPng(b)) {
      // first chunk must be IHDR at offset 8: len(4) type(4) data(13)
      require(b.length >= 33 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R',
        "PNG: missing IHDR")
      MediaHeader("png", beInt(b, 16), beInt(b, 20))
    } else if (isJpeg(b)) {
      // marker walk to the first SOFn (C0-CF except DHT C4, JPGext C8, DAC CC)
      var i = 2
      while (i + 3 < b.length) {
        require((b(i) & 0xff) == 0xff, s"JPEG: expected marker at $i")
        val m = b(i + 1) & 0xff
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m == 0xd9) i = b.length                  // EOI, no frame
        else {
          val len = beShort(b, i + 2)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            // SOF: precision(1) height(2) width(2) ncomp(1)
            return MediaHeader("jpeg", beShort(b, i + 7), beShort(b, i + 5))
          }
          i += 2 + len
        }
      }
      throw new IllegalArgumentException("JPEG: no SOF frame header found")
    } else if (isGif(b)) {
      MediaHeader("gif", leShort(b, 6), leShort(b, 8))
    } else if (isBmp(b)) {
      MediaHeader("bmp", leInt(b, 18), leInt(b, 22))
    } else if (isWav(b)) {
      // RIFF chunk walk for "fmt ": channels @+2 (LE u16), rate @+4 (LE u32)
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, "US-ASCII")
        val sz = leInt(b, i + 4)
        if (id == "fmt ") {
          require(i + 12 <= b.length, "WAV: truncated fmt chunk")
          return MediaHeader("wav", leInt(b, i + 12), leShort(b, i + 10))
        }
        i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      throw new IllegalArgumentException("WAV: no fmt chunk")
    } else MediaHeader("raw", b.length, 1)

  // --- WAV PCM encode/decode (canonical 44-byte header, 8-bit mono) ---------

  /** Encode unsigned 8-bit mono PCM samples as a canonical RIFF/WAVE file
    * (44-byte header: 16-byte fmt chunk + data chunk — the layout every
    * WAV reader expects; [[parseHeader]] and [[decodeWavPcm8]] both walk
    * it back).
    */
  def encodeWavPcm8(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44 + samples.length)
    def le32(v: Int): Unit =
      out.write(Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = out.write(Array[Byte](v.toByte, (v >>> 8).toByte))
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + samples.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1)           // PCM
    le16(1)           // mono
    le32(sampleRate)
    le32(sampleRate)  // byte rate (8-bit mono)
    le16(1)           // block align
    le16(8)           // bits per sample
    out.write("data".getBytes("US-ASCII")); le32(samples.length)
    out.write(samples)
    out.toByteArray
  }

  /** Decode a PCM WAV produced by [[encodeWavPcm8]] (or any 8-bit mono
    * RIFF/WAVE): chunk-walk to `fmt ` for the sample rate and to `data`
    * for the samples, returned as unsigned ints 0‥255.
    */
  def decodeWavPcm8(b: Array[Byte]): (Int, Array[Int]) = {
    require(isWav(b), "not a RIFF/WAVE stream")
    var rate = -1
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = leInt(b, i + 4)
      if (id == "fmt ") rate = leInt(b, i + 12)
      else if (id == "data") {
        require(rate > 0, "WAV: data chunk before fmt")
        val n = math.min(sz, b.length - i - 8)
        val s = new Array[Int](n)
        var j = 0
        while (j < n) { s(j) = b(i + 8 + j) & 0xff; j += 1 }
        return (rate, s)
      }
      i += 8 + sz + (sz & 1)
    }
    throw new IllegalArgumentException("WAV: no data chunk")
  }

  // --- PNG encode (8-bit grayscale, non-interlaced, filter 0) ---------------

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    val c = crc.getValue
    out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
  }

  /** Encode `pixels` (row-major 8-bit grayscale, length = width × height)
    * as a real, standard-compliant PNG. Any PNG reader decodes it; our own
    * [[decodePngGray8]] round-trips it exactly.
    */
  def encodePng(pixels: Array[Byte], width: Int): Array[Byte] = {
    require(width > 0 && pixels.length > 0 && pixels.length % width == 0,
      s"pixels (${pixels.length}) must be a positive multiple of width ($width)")
    val height = pixels.length / width
    val out = new java.io.ByteArrayOutputStream(pixels.length + 64)
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8   // bit depth
    ihdr(9) = 0   // color type: grayscale
    // compression=0, filter=0, interlace=0 already zero
    chunk(out, "IHDR", ihdr)
    // raw scanlines, filter byte 0 (None) per row
    val raw = new Array[Byte](height * (width + 1))
    var r = 0
    while (r < height) {
      System.arraycopy(pixels, r * width, raw, r * (width + 1) + 1, width)
      r += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    chunk(out, "IDAT", zbuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // --- PNG decode (8-bit grayscale, non-interlaced, all five filters) -------

  /** Decode an 8-bit grayscale non-interlaced PNG: chunk walk, zlib
    * inflate of the concatenated IDAT stream, and per-scanline reverse
    * filtering (None/Sub/Up/Average/Paeth — PNG spec §6). Returns
    * (width, height, row-major pixels 0-255).
    */
  def decodePngGray8(b: Array[Byte]): (Int, Int, Array[Int]) = {
    require(isPng(b), "not a PNG")
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = beInt(b, i)
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          width = beInt(b, i + 8)
          height = beInt(b, i + 12)
          val depth = b(i + 16) & 0xff
          val color = b(i + 17) & 0xff
          val interlace = b(i + 20) & 0xff
          require(depth == 8 && color == 0 && interlace == 0,
            s"unsupported PNG variant: depth=$depth color=$color interlace=$interlace " +
              "(decoder scope is 8-bit grayscale non-interlaced)")
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunk: skip
      }
      i += 12 + len
    }
    require(width > 0 && height > 0, "PNG: no IHDR")
    val raw = new Array[Byte](height * (width + 1))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(), "PNG: truncated IDAT stream")
      off += n
    }
    inflater.end()
    require(off == raw.length, s"PNG: inflated $off bytes, expected ${raw.length}")

    val px = new Array[Int](width * height)
    var r = 0
    while (r < height) {
      val filter = raw(r * (width + 1)) & 0xff
      val rowOff = r * (width + 1) + 1
      var c = 0
      while (c < width) {
        val x = raw(rowOff + c) & 0xff
        val left = if (c > 0) px(r * width + c - 1) else 0
        val up = if (r > 0) px((r - 1) * width + c) else 0
        val upLeft = if (r > 0 && c > 0) px((r - 1) * width + c - 1) else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => // Paeth predictor (PNG spec §6.6)
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            x + pred
          case f => throw new IllegalArgumentException(s"PNG: unknown filter $f in row $r")
        }
        px(r * width + c) = recon & 0xff
        c += 1
      }
      r += 1
    }
    (width, height, px)
  }

  // --- minimal header builders (fixture/test side) ---------------------------
  // Real byte layouts per each format's public spec — enough header for any
  // conforming parser to read the dimensions. Used to synthesize
  // deterministic fixture bytes; the parse side above is format-complete.

  /** SOI + JFIF APP0 + SOF0 carrying the dims + EOI. */
  def jpegHeaderBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    out.write(Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0, len 16
    out.write(Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8,
      (height >>> 8).toByte, height.toByte,
      (width >>> 8).toByte, width.toByte,
      1, 1, 0x11, 0)) // SOF0: 1 component
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  def gifHeaderBytes(width: Int, height: Int): Array[Byte] =
    Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      width.toByte, (width >>> 8).toByte, height.toByte, (height >>> 8).toByte,
      0, 0, 0, 0x3b)

  def bmpHeaderBytes(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](26)
    b(0) = 'B'; b(1) = 'M'
    b(14) = 12 // header size stub
    b(18) = width.toByte; b(19) = (width >>> 8).toByte
    b(20) = (width >>> 16).toByte; b(21) = (width >>> 24).toByte
    b(22) = height.toByte; b(23) = (height >>> 8).toByte
    b(24) = (height >>> 16).toByte; b(25) = (height >>> 24).toByte
    b
  }

  def wavHeaderBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val b = new Array[Byte](28)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    b(4) = 20 // RIFF size stub
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    b(16) = 8 // fmt chunk size (we carry the first 8 payload bytes)
    b(20) = 1 // PCM
    b(22) = channels.toByte; b(23) = (channels >>> 8).toByte
    b(24) = sampleRate.toByte; b(25) = (sampleRate >>> 8).toByte
    b(26) = (sampleRate >>> 16).toByte; b(27) = (sampleRate >>> 24).toByte
    b
  }
}
