package graft

import graft.sources.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val media = Multimodal.fromBytes(spark, Seq(
    (1L, "image", Array[Byte](1, 2, 3), Map("w" -> "64", "h" -> "64")),
    (2L, "audio", Array[Byte](4, 5), Map("sr" -> "16000")),
    (3L, "video", Array[Byte](6), Map("n_frames" -> "10")),
    (4L, "image", null, Map.empty[String, String])))

  test("MediaCorpus: every generated fixture parses to its declared contract") {
    import graft.sources.MediaCorpus
    val dir = MediaCorpus.ensure()
    MediaCorpus.expected.foreach { e =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, e.fileName))
      e.kind match {
        case "image" => assert(Multimodal.imageDims(bytes)
          .contains((e.format, e.width.get, e.height.get)), e.fileName)
        case "audio" => assert(Multimodal.audioMeta(bytes)
          .contains((e.format, e.sampleRate.get, e.channels.get, e.durationMs.get)),
          e.fileName)
        case "video" => assert(Multimodal.videoMeta(bytes)
          .contains((e.format, e.durationMs.get)), e.fileName)
      }
    }
  }

  test("media table has the canonical schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "modality", "bytes", "meta"))
    assert(media.count() == 4)
  }

  test("feature extraction: fixed dim, deterministic, null bytes → null") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](2))).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](2))).toMap
    assert(f1 == f2)
    assert(f1(1L).get.size == 8)
    assert(f1(4L).isEmpty)
    assert(f1(1L) != f1(2L))
  }

  test("frame sampling: every-Nth frames for video, single row otherwise") {
    val frames = Multimodal.sampleFrames(media, everyNth = 3, dim = 4)
      .collect().groupBy(_.getLong(0))
    assert(frames(3L).map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(frames(1L).map(_.getInt(1)).toSeq == Seq(0))
    // per-frame features differ (frame index is part of the stub decode)
    val fv = frames(3L).map(_.getSeq[Float](2)).toSeq
    assert(fv.distinct.size == fv.size)
  }
}

class ImageHeaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    Array(0xFF.toByte, 0xD8.toByte) ++                       // SOI
      (Array(0xFF.toByte, 0xE0.toByte) ++ be16(16) ++ Array.fill[Byte](14)(0)) ++ // APP0
      (Array(0xFF.toByte, 0xC0.toByte) ++ be16(11) ++        // SOF0
        Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 0x11, 0, 0))
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ Array((w & 0xFF).toByte, (w >> 8).toByte,
      (h & 0xFF).toByte, (h >> 8).toByte) ++ Array[Byte](0, 0, 0)

  private def bmp(w: Int, h: Int): Array[Byte] = {
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(40) ++ le32(w) ++ le32(h) ++ Array[Byte](0, 0)
  }

  private def riffWebp(chunk: String, body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++ "WEBP".getBytes ++
      chunk.getBytes ++ Array.fill[Byte](4)(0) ++ body

  private def webpX(w: Int, h: Int): Array[Byte] = {
    def le24(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    riffWebp("VP8X", Array.fill[Byte](4)(0) ++ le24(w - 1) ++ le24(h - 1))
  }

  private def webpL(w: Int, h: Int): Array[Byte] = {
    val b = (w - 1) | ((h - 1) << 14)
    riffWebp("VP8L", Array(0x2F.toByte, b.toByte, (b >> 8).toByte,
      (b >> 16).toByte, (b >> 24).toByte) ++ Array.fill[Byte](5)(0))
  }

  private def webpLossy(w: Int, h: Int): Array[Byte] =
    riffWebp("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
      w.toByte, (w >> 8).toByte, h.toByte, (h >> 8).toByte))

  test("header parsing recovers format and dimensions for all five containers") {
    assert(Multimodal.imageDims(png(320, 240)).contains(("png", 320, 240)))
    assert(Multimodal.imageDims(jpeg(320, 240)).contains(("jpeg", 320, 240)))
    assert(Multimodal.imageDims(gif(320, 240)).contains(("gif", 320, 240)))
    assert(Multimodal.imageDims(bmp(320, 240)).contains(("bmp", 320, 240)))
    assert(Multimodal.imageDims(webpX(320, 240)).contains(("webp", 320, 240)))
    assert(Multimodal.imageDims(webpL(320, 240)).contains(("webp", 320, 240)))
    assert(Multimodal.imageDims(webpLossy(320, 240)).contains(("webp", 320, 240)))
  }

  test("WEBP with a bad VP8L signature or missing VP8 sync code parses to None") {
    val badL = webpL(320, 240).patch(20, Array(0x00.toByte), 1)
    assert(Multimodal.imageDims(badL).isEmpty)
    val badSync = webpLossy(320, 240).patch(23, Array(0x00.toByte), 1)
    assert(Multimodal.imageDims(badSync).isEmpty)
  }

  test("JPEG 0xFF fill bytes before a marker are skipped (T.81 B.1.1.2)") {
    val j = jpeg(320, 240)
    val padded = j.take(2) ++ Array(0xFF.toByte, 0xFF.toByte) ++ j.drop(2)
    assert(Multimodal.imageDims(padded).contains(("jpeg", 320, 240)))
  }

  test("top-down BMP (negative signed height) yields the magnitude") {
    val b = bmp(320, 240)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val topDown = b.patch(22, le32(-240), 4)
    assert(Multimodal.imageDims(topDown).contains(("bmp", 320, 240)))
  }

  test("garbage, truncated, and null bytes parse to None") {
    assert(Multimodal.imageDims(null).isEmpty)
    assert(Multimodal.imageDims(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.imageDims(png(320, 240).take(12)).isEmpty)
    assert(Multimodal.imageDims(jpeg(320, 240).take(6)).isEmpty)
    assert(Multimodal.imageDims("not an image at all".getBytes).isEmpty)
  }

  private def wav(rate: Int, channels: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val byteRate = rate * channels * bits / 8
    "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(byteRate) ++ le16(channels * bits / 8) ++ le16(bits) ++
      "data".getBytes ++ le32(dataBytes)
  }

  private def flac(rate: Int, channels: Int, bits: Int, totalSamples: Long): Array[Byte] = {
    val b18 = (rate >> 12) & 0xFF
    val b19 = (rate >> 4) & 0xFF
    val b20 = ((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)
    val b21 = (((bits - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF).toInt
    "fLaC".getBytes ++ Array[Byte](0x00, 0, 0, 34) ++ // STREAMINFO header
      Array.fill[Byte](10)(0) ++ // block/frame size fields
      Array(b18.toByte, b19.toByte, b20.toByte, b21.toByte,
        ((totalSamples >> 24) & 0xFF).toByte, ((totalSamples >> 16) & 0xFF).toByte,
        ((totalSamples >> 8) & 0xFF).toByte, (totalSamples & 0xFF).toByte) ++
      Array.fill[Byte](16)(0) // md5 signature
  }

  private def oggPage(granule: Long, nSegs: Int, body: Array[Byte],
      serial: Int = 0): Array[Byte] = {
    def le64(v: Long) = Array.tabulate[Byte](8)(k => (v >> (8 * k)).toByte)
    def le32(v: Int) = Array.tabulate[Byte](4)(k => (v >> (8 * k)).toByte)
    "OggS".getBytes ++ Array[Byte](0, 0) ++ le64(granule) ++
      le32(serial) ++ Array.fill[Byte](8)(0) ++ Array(nSegs.toByte) ++
      Array.fill[Byte](nSegs)(body.length.toByte) ++ body
  }

  private def opus(rate: Int, channels: Int, preSkip: Int, granule: Long): Array[Byte] = {
    val head = "OpusHead".getBytes ++ Array[Byte](1, channels.toByte,
      preSkip.toByte, (preSkip >> 8).toByte,
      rate.toByte, (rate >> 8).toByte, (rate >> 16).toByte, (rate >> 24).toByte,
      0, 0, 0) // output gain + mapping family
    oggPage(0L, 1, head) ++ oggPage(granule, 1, Array[Byte](1, 2, 3))
  }

  test("OGG/Opus parsing recovers rate, channels, and granule-based duration") {
    // 48000 granules - 312 preskip at the fixed 48 kHz tick → 993 ms
    assert(Multimodal.audioMeta(opus(48000, 2, 312, 48312L))
      .contains(("opus", 48000, 2, 1000L)))
    // headers-only file (single page, granule 0) → duration 0, not None
    assert(Multimodal.audioMeta(oggPage(0L, 1,
      "OpusHead".getBytes ++ Array[Byte](1, 1, 0, 0, 64, -62, 0, 0, 0, 0, 0)))
      .contains(("opus", 49728, 1, 0L)))
    // an OGG page whose first packet is not OpusHead (e.g. Vorbis) → None
    assert(Multimodal.audioMeta(oggPage(0L, 1, "NotOpus!".getBytes ++
      Array.fill[Byte](11)(0))).isEmpty)
    // version upper nibble != 0 → incompatible layout → None (RFC 7845)
    val v16 = opus(48000, 2, 312, 48312L)
    assert(Multimodal.audioMeta(v16.patch(36, Array(0x10.toByte), 1)).isEmpty)
    // input rate 0 legally means "unknown" → None like WAV/FLAC
    assert(Multimodal.audioMeta(opus(0, 2, 312, 48312L)).isEmpty)
  }

  test("Opus page walk is immune to 'OggS' bytes inside compressed payload") {
    // a payload containing the capture pattern + fake granule bytes: a
    // byte-scan parser would false-sync and read 0xFF.. as the granule;
    // the segment-table walk must step OVER the payload to the real page
    val trap = "OggS".getBytes ++ Array[Byte](0, 0) ++ Array.fill[Byte](8)(0x42) ++
      Array.fill[Byte](13)(0)
    val head = "OpusHead".getBytes ++ Array[Byte](1, 2, 56, 1, // preskip 312
      (48000 & 0xFF).toByte, (48000 >> 8).toByte, 0, 0, 0, 0, 0)
    val fixture = oggPage(0L, 1, head) ++ oggPage(48312L, 1, trap)
    assert(Multimodal.audioMeta(fixture).contains(("opus", 48000, 2, 1000L)))
  }

  test("Opus granule walk ignores pages of other logical streams (chained/muxed Ogg)") {
    // a chained file: after the Opus stream (serial 0, last granule
    // 48312) a second logical stream's page (serial 7) ends the file
    // with a huge granule on ITS clock — duration must come from the
    // Opus stream's last page, not whatever page ends last
    val head = "OpusHead".getBytes ++ Array[Byte](1, 2, 56, 1, // preskip 312
      (48000 & 0xFF).toByte, (48000 >> 8).toByte, 0, 0, 0, 0, 0)
    val chained = oggPage(0L, 1, head) ++
      oggPage(48312L, 1, Array[Byte](1, 2, 3)) ++
      oggPage(96000000L, 1, Array[Byte](4, 5, 6), serial = 7)
    assert(Multimodal.audioMeta(chained).contains(("opus", 48000, 2, 1000L)))
  }

  test("FLAC STREAMINFO parsing recovers rate, channels, and duration") {
    // 44.1 kHz stereo, 44100 samples → exactly 1000 ms
    assert(Multimodal.audioMeta(flac(44100, 2, 16, 44100L))
      .contains(("flac", 44100, 2, 1000L)))
    // first metadata block not STREAMINFO → None
    val wrongType = flac(44100, 2, 16, 44100L).patch(4, Array(0x04.toByte), 1)
    assert(Multimodal.audioMeta(wrongType).isEmpty)
    // total_samples=0 legally means "unknown length" → None, not 0 ms
    assert(Multimodal.audioMeta(flac(44100, 2, 16, 0L)).isEmpty)
  }

  test("WAV header parsing recovers rate, channels, and duration") {
    // 16 kHz mono 16-bit → 32000 B/s; 64000 data bytes → 2000 ms
    assert(Multimodal.audioMeta(wav(16000, 1, 16, 64000))
      .contains(("wav", 16000, 1, 2000L)))
    // 44.1 kHz stereo 16-bit → 176400 B/s; 88200 bytes → 500 ms
    assert(Multimodal.audioMeta(wav(44100, 2, 16, 88200))
      .contains(("wav", 44100, 2, 500L)))
  }

  test("WAV chunk walk skips unknown chunks before fmt/data") {
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val base = wav(8000, 1, 8, 4000) // 8000 B/s → 500 ms
    // splice a LIST chunk (odd size 5, padded to 6) between WAVE and fmt
    val spliced = base.take(12) ++
      ("LIST".getBytes ++ le32(5) ++ Array.fill[Byte](6)(0)) ++ base.drop(12)
    assert(Multimodal.audioMeta(spliced).contains(("wav", 8000, 1, 500L)))
  }

  test("garbage, truncated, and null audio bytes parse to None") {
    assert(Multimodal.audioMeta(null).isEmpty)
    assert(Multimodal.audioMeta("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(Multimodal.audioMeta(wav(16000, 1, 16, 64000).take(20)).isEmpty)
    assert(Multimodal.audioMeta(png(4, 4)).isEmpty)
  }

  test("hostile declared chunk size near 2^31 returns None instead of throwing") {
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // first chunk claims ~2 GiB: an Int offset would wrap negative and
    // the 4-byte id read would go out of bounds
    val hostile = "RIFF".getBytes ++ le32(0x7FFFFFF0L) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x7FFFFFF0L) ++ Array.fill[Byte](32)(0)
    assert(Multimodal.audioMeta(hostile).isEmpty)
    // and a 32-bit size over Int.MaxValue on the data chunk (field at
    // offset 40: 12 RIFF/WAVE + 24 fmt + 4 "data")
    val big = wav(8000, 1, 8, 4000).patch(40, le32(0xFFFFFFF0L), 4)
    assert(Multimodal.audioMeta(big).nonEmpty) // still parses fmt, huge data len
  }

  private def mp4(timescale: Int, duration: Long, v1: Boolean = false): Array[Byte] = {
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(512)
    val mvhdBody =
      if (v1) Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration) ++ Array.fill[Byte](76)(0)
      else Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++ Array.fill[Byte](76)(0)
    val mvhd = be32(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
    // an unrelated sibling box before mvhd exercises the walk
    val junk = be32(12) ++ "udta".getBytes ++ Array.fill[Byte](4)(0)
    val moov = be32(8 + junk.length + mvhd.length) ++ "moov".getBytes ++ junk ++ mvhd
    ftyp ++ moov
  }

  test("MP4 mvhd parsing recovers duration for v0 and v1 headers") {
    // timescale 600, duration 9000 ticks → 15000 ms
    assert(Multimodal.videoMeta(mp4(600, 9000)).contains(("mp4", 15000L)))
    assert(Multimodal.videoMeta(mp4(1000, 2500, v1 = true)).contains(("mp4", 2500L)))
    assert(Multimodal.videoMeta(wav(8000, 1, 8, 100)).isEmpty)
    assert(Multimodal.videoMeta(mp4(600, 9000).take(20)).isEmpty)
    assert(Multimodal.videoMeta(null).isEmpty)
  }

  test("withVideoMeta annotates video rows and leaves others NULL") {
    val media = Multimodal.fromBytes(spark, Seq(
      (1L, "video", mp4(600, 600 * 42), Map.empty[String, String]),
      (2L, "audio", wav(8000, 1, 8, 100), Map.empty[String, String])))
    val got = Multimodal.withVideoMeta(media).collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(1L) == (Some("mp4"), Some(42000L)))
    assert(got(2L) == (None, None))
  }

  test("withAudioMeta annotates audio rows and leaves others NULL") {
    val media = Multimodal.fromBytes(spark, Seq(
      (1L, "audio", wav(16000, 1, 16, 32000), Map.empty[String, String]),
      (2L, "image", png(8, 8), Map.empty[String, String]),
      (3L, "audio", Array[Byte](1, 2, 3, 4), Map.empty[String, String])))
    val got = Multimodal.withAudioMeta(media).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))).toMap
    assert(got(1L) == (Some("wav"), Some(16000), Some(1), Some(1000L)))
    assert(got(2L) == (None, None, None, None))
    assert(got(3L) == (None, None, None, None))
  }

  test("withImageMeta annotates image rows and leaves others NULL") {
    val media = Multimodal.fromBytes(spark, Seq(
      (1L, "image", png(64, 32), Map.empty[String, String]),
      (2L, "image", jpeg(100, 50), Map.empty[String, String]),
      (3L, "audio", Array[Byte](1, 2, 3, 4), Map.empty[String, String]),
      (4L, "image", Array[Byte](9, 9, 9), Map.empty[String, String])))
    val got = Multimodal.withImageMeta(media).collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))).toMap
    assert(got(1L) == (Some("png"), Some(64), Some(32)))
    assert(got(2L) == (Some("jpeg"), Some(100), Some(50)))
    assert(got(3L) == (None, None, None))
    assert(got(4L) == (None, None, None))
  }
}
