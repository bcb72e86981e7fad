package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sfTiny)

  test("featureExtract: one fixed-dim vector per document, deterministic") {
    val f1 = Multimodal.featureExtract(spark, media).cache()
    assert(f1.count() === media.count())
    assert(f1.filter(col("dim") =!= 8 || size(col("features")) =!= 8).count() === 0)
    // deterministic across runs
    val a = f1.collect().map(m => (m.doc_id, m.features.toSeq)).toMap
    val b = Multimodal.featureExtract(spark, media).collect()
      .map(m => (m.doc_id, m.features.toSeq)).toMap
    assert(a === b)
    f1.unpersist()
  }

  test("frameSample: stride-spaced frame indices, frame bytes come from the payload") {
    val frames = Multimodal.frameSample(spark, media, frameBytes = 64, stride = 4).cache()
    assert(frames.count() > 0)
    assert(frames.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() === 0)
    // spot check one document end-to-end
    val doc = media.orderBy("doc_id").head
    val payload = doc.getAs[Array[Byte]]("payload")
    val docFrames = frames.filter(col("doc_id") === doc.getLong(0))
      .orderBy("frame_idx").collect()
    assert(docFrames.length === (0 until payload.length / 64 by 4).size)
    assert(docFrames.head.frame.toSeq === payload.slice(0, 64).toSeq)
    frames.unpersist()
  }

  test("MediaCodec: real PNG/JPEG/GIF headers decode true dims+channels; non-images fall back") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import java.io.ByteArrayOutputStream
    import spark.implicits._
    def img(w: Int, h: Int, typ: Int, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(new BufferedImage(w, h, typ), fmt, bos),
        s"JDK cannot encode $fmt")
      bos.toByteArray
    }
    val rgbPng  = img(17, 9, BufferedImage.TYPE_INT_RGB, "png")
    val argbPng = img(5, 7, BufferedImage.TYPE_INT_ARGB, "png")
    val grayPng = img(11, 13, BufferedImage.TYPE_BYTE_GRAY, "png")
    val jpg     = img(33, 21, BufferedImage.TYPE_3BYTE_BGR, "jpg")
    val gif     = img(8, 6, BufferedImage.TYPE_INT_RGB, "gif")
    val text    = "just text, no image magic".getBytes("UTF-8")
    val rows = Seq(
      (1L, rgbPng), (2L, argbPng), (3L, grayPng), (4L, jpg), (5L, gif),
      (6L, text),
      (7L, rgbPng.take(12))) // PNG magic but truncated header
    val meta = Multimodal.decodeMeta(spark, rows.toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> ((m.width, m.height, m.channels))).toMap
    assert(meta(1L) === ((17, 9, 3)))
    assert(meta(2L) === ((5, 7, 4)), "alpha PNG must report 4 channels")
    assert(meta(3L) === ((11, 13, 1)), "grayscale PNG must report 1 channel")
    assert((meta(4L)._1, meta(4L)._2) === ((33, 21)))
    assert(meta(4L)._3 === 3)
    assert((meta(5L)._1, meta(5L)._2) === ((8, 6)))
    // no magic → deterministic stub dims
    assert(meta(6L) === ((text.length % 640 + 1, text.length % 480 + 1, 3)))
    // corrupt header → stub fallback, not a task failure
    assert(meta(7L) === ((12 % 640 + 1, 12 % 480 + 1, 3)))
    // text starting "BM" must NOT be routed to the BMP reader: the
    // reserved-bytes check (offsets 6-9 zero) rejects it → stub
    val bmText = "BMarker prose, definitely not a bitmap".getBytes("UTF-8")
    val bm = Multimodal.decodeMeta(spark,
      Seq((8L, bmText)).toDF("doc_id", "payload")).collect().head
    assert((bm.width, bm.height, bm.channels)
      === ((bmText.length % 640 + 1, bmText.length % 480 + 1, 3)))
  }

  test("multimodal_image_meta: real PNG roundtrip — decoded dims equal the generating arithmetic") {
    val out = Multimodal.multimodalImageMeta(spark, sfTiny).collect()
    assert(out.length === media.count())
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (id % 37 + 1).toInt, s"width drift at doc $id")
      assert(r.getInt(2) === (id % 23 + 1).toInt, s"height drift at doc $id")
      assert(r.getInt(3) === 3)
    }
    // the payloads really are PNGs (magic bytes), not stub passthroughs
    val first = Multimodal.imageTable(spark, sfTiny)
      .orderBy("doc_id").head.getAs[Array[Byte]]("payload")
    assert((first(0) & 0xFF) === 0x89 && first(1) === 'P'.toByte)
  }

  test("multimodal_blob_ingest: file dump -> binaryFile listing -> decode equals the in-memory path") {
    val viaBlobs = Multimodal.multimodalBlobIngest(spark, sfTiny)
    val inMemory = Multimodal.multimodalImageMeta(spark, sfTiny)
    assert(viaBlobs.count() === inMemory.count())
    assert(viaBlobs.exceptAll(inMemory).isEmpty &&
      inMemory.exceptAll(viaBlobs).isEmpty,
      "blob-directory round trip drifted from the in-memory decode")
    // repeated invocations reuse the completed dump (marker-gated):
    // file count stays bounded at docs + marker, result unchanged
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_blob_ingest_" + Integer.toHexString(sfTiny.hashCode))
    val filesBefore = java.nio.file.Files.list(dir).count()
    val again = Multimodal.multimodalBlobIngest(spark, sfTiny)
    assert(java.nio.file.Files.list(dir).count() === filesBefore,
      "second invocation re-dumped the corpus instead of reusing it")
    assert(again.exceptAll(viaBlobs).isEmpty, "reused dump drifted")
  }

  test("resize targets real decoded dimensions for image payloads") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import java.io.ByteArrayOutputStream
    import spark.implicits._
    val bos = new ByteArrayOutputStream()
    ImageIO.write(new BufferedImage(200, 100, BufferedImage.TYPE_INT_RGB), "png", bos)
    val out = Multimodal.resize(spark,
      Seq((1L, bos.toByteArray)).toDF("doc_id", "payload"),
      targetW = 64, targetH = 48).collect().head
    // scale = min(64/200, 48/100) = 0.32 → 64 × 32
    assert(out.width === 64 && out.height === 32)
  }

  test("resize: dims within target box, payload truncated proportionally") {
    val r = Multimodal.resize(spark, media, targetW = 64, targetH = 48).cache()
    assert(r.count() === media.count())
    assert(r.filter(col("width") > 64 || col("height") > 48).count() === 0)
    assert(r.filter(col("width") < 1 || col("height") < 1).count() === 0)
    r.unpersist()
  }

  test("dHash: invariant under uniform brightness shift; near-dup corpus bytes are ALL distinct") {
    import spark.implicits._
    val corpus = Multimodal.nearDupImageTable(spark, sfTiny).cache()
    try {
      val n = corpus.count()
      // the POINT of the perceptual corpus: a byte/md5 dedup finds
      // NOTHING (every payload distinct) ...
      val distinctBytes = corpus
        .select(md5(col("payload"))).distinct().count()
      assert(distinctBytes === n,
        s"corpus must be byte-distinct: $distinctBytes of $n")
      // ... while dHash recovers exactly the doc_id % 41 classes
      val pairs = corpus.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])].collect()
        .map { case (id, p) => (id, Multimodal.imageDHash(p).get) }
      val byClass = pairs.groupBy(_._1 % 41)
        .map { case (_, xs) => xs.map(_._2).distinct.length }
      assert(byClass.forall(_ === 1),
        "duplicates of one class must share ONE dHash")
      val classHashes = pairs.groupBy(_._1 % 41)
        .map { case (k, xs) => k -> xs.head._2 }
      assert(classHashes.values.toSeq.distinct.size === classHashes.size,
        "distinct patterns must not collide in dHash")
    } finally corpus.unpersist(): Unit
  }

  test("audio envelope fingerprint: volume-invariant; near-dup corpus bytes all distinct, classes recovered") {
    import spark.implicits._
    val corpus = Multimodal.nearDupAudioTable(spark, sfTiny).cache()
    try {
      val n = corpus.count()
      val distinctBytes = corpus
        .select(md5(col("payload"))).distinct().count()
      assert(distinctBytes === n,
        s"corpus must be byte-distinct: $distinctBytes of $n")
      val pairs = corpus.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])].collect()
        .map { case (id, p) =>
          (id, Multimodal.audioEnvelopeFingerprint(p).get) }
      val byClass = pairs.groupBy(_._1 % 29)
        .map { case (_, xs) => xs.map(_._2).distinct.length }
      assert(byClass.forall(_ === 1),
        "volume-scaled duplicates must share ONE fingerprint")
      val classFps = pairs.groupBy(_._1 % 29)
        .map { case (k, xs) => k -> xs.head._2 }
      assert(classFps.values.toSeq.distinct.size === classFps.size,
        "distinct waveform classes must not collide")
      // the trailer-bearing WAVs still parse as audio metadata
      val one = corpus.select(col("payload")).as[Array[Byte]].head()
      assert(Multimodal.AudioCodec.decode(0L, one).exists(_.container == "wav"))
    } finally corpus.unpersist(): Unit
  }

  test("video luma-envelope fingerprint: gain- and framerate-invariant; corpus bytes all distinct, classes recovered") {
    import spark.implicits._
    val corpus = Multimodal.nearDupVideoTable(spark, sfTiny).cache()
    try {
      val n = corpus.count()
      val distinctBytes = corpus
        .select(md5(col("payload"))).distinct().count()
      assert(distinctBytes === n,
        s"corpus must be byte-distinct: $distinctBytes of $n")
      val pairs = corpus.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])].collect()
        .map { case (id, p) =>
          (id, Multimodal.VideoCodec.lumaEnvelopeFingerprint(p).get) }
      val byClass = pairs.groupBy(_._1 % 23)
        .map { case (_, xs) => xs.map(_._2).distinct.length }
      assert(byClass.forall(_ === 1),
        "brightness-scaled, framerate-resampled duplicates must share ONE fingerprint")
      val classFps = pairs.groupBy(_._1 % 23)
        .map { case (k, xs) => k -> xs.head._2 }
      assert(classFps.values.toSeq.distinct.size === classFps.size,
        "distinct content classes must not collide")
      // the frame-bearing MP4s still parse as video metadata — the
      // mdat/free boxes ride the standard top-level walk
      val one = corpus.select(col("payload")).as[Array[Byte]].head()
      val meta = Multimodal.VideoCodec.decode(0L, one).get
      assert(meta.container === "mp4" && meta.width === 16 &&
        meta.height === 12)
    } finally corpus.unpersist(): Unit
  }

  test("video fingerprint: direct gain/framerate invariance and malformed refusal") {
    // one content class rendered three ways: base, 3x brightness,
    // 2x frame-repeat — one fingerprint
    def render(gain: Int, rep: Int): Array[Byte] = {
      val w = 16; val h = 12
      val frames = Array.tabulate(33 * rep * w * h) { idx =>
        val f = idx / (w * h); val pix = idx % (w * h); val j = f / rep
        val m = (5 * j * j + 10 * j) % 37 + 1
        ((m + pix % 3) * gain).toByte
      }
      Multimodal.mp4BytesWithFrames(w, h, 1000, 33L * rep, frames, 0L)
    }
    val base = Multimodal.VideoCodec.lumaEnvelopeFingerprint(render(1, 1))
    assert(base.isDefined)
    assert(Multimodal.VideoCodec.lumaEnvelopeFingerprint(render(3, 1)) === base)
    assert(Multimodal.VideoCodec.lumaEnvelopeFingerprint(render(1, 2)) === base)
    assert(Multimodal.VideoCodec.lumaEnvelopeFingerprint(render(4, 3)) === base)
    // header-only MP4 (no mdat) and garbage refuse with None
    assert(Multimodal.VideoCodec.lumaEnvelopeFingerprint(
      Multimodal.mp4Bytes(16, 12, 1000, 33L)) === None)
    assert(Multimodal.VideoCodec.lumaEnvelopeFingerprint(
      Array.fill[Byte](64)(0x41)) === None)
  }

  test("AudioCodec: WAV round-trip — synthesized RIFF bytes parse back to their parameters") {
    val p = Multimodal.wavBytes(sampleRate = 22050, channels = 2, nSamples = 441)
    val m = Multimodal.AudioCodec.decode(7L, p).get
    assert(m.container === "wav")
    assert(m.sample_rate === 22050 && m.channels === 2 && m.bit_depth === 16)
    // 441 samples at 22050 Hz = 20 ms
    assert(m.duration_ms === 20L)
    // the bytes are a REAL wav: the JDK's own sound framework agrees
    val af = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(p))
    assert(af.getFormat.getSampleRate === 22050.0f)
    assert(af.getFormat.getChannels === 2)
    assert(af.getFormat.getSampleSizeInBits === 16)
  }

  test("AudioCodec: MP3 first-frame fields decode against the MPEG-1 tables") {
    // bitrate index 9 = 128 kbps, samplerate index 0 = 44100, mode 3 = mono
    val p = Multimodal.mp3Bytes(bitrateIdx = 9, srIdx = 0, mode = 3,
      fillerLen = 1596)
    val m = Multimodal.AudioCodec.decode(11L, p).get
    assert(m.container === "mp3")
    assert(m.sample_rate === 44100 && m.channels === 1 && m.bit_depth === 0)
    // 1600 bytes at 128 kbps -> 1600*8*1000/128000 = 100 ms
    assert(m.duration_ms === 100L)
    // stereo mode
    val st = Multimodal.AudioCodec.decode(12L,
      Multimodal.mp3Bytes(1, 2, 0, 10)).get
    assert(st.channels === 2 && st.sample_rate === 32000)
  }

  test("VideoCodec: MP4 box walk recovers mvhd/tkhd fields; malformed boxes refuse") {
    val p = Multimodal.mp4Bytes(
      width = 1920, height = 1080, timescale = 90000, duration = 450000L)
    val m = Multimodal.VideoCodec.decode(5L, p).get
    assert(m.container === "mp4")
    assert(m.width === 1920 && m.height === 1080)
    assert(m.timescale === 90000)
    assert(m.duration_ms === 5000L) // 450000/90000 s
    // non-MP4 refuses
    assert(Multimodal.VideoCodec.decode(1L, "RIFFxxxxWAVE".getBytes).isEmpty)
    // a truncated moov (box size past the payload) refuses, never reads
    // out of bounds
    val torn = java.util.Arrays.copyOf(p, p.length - 40)
    assert(Multimodal.VideoCodec.decode(2L, torn).isEmpty)
    // zero timescale refuses (no division)
    val z = Multimodal.mp4Bytes(16, 16, 1, 1L)
    // timescale offset: ftyp(16) + moov hdr(8) + mvhd hdr(8) +
    // verflags(4) + ctime(4) + mtime(4) -> absolute 44..47
    z(44) = 0; z(45) = 0; z(46) = 0; z(47) = 0
    assert(Multimodal.VideoCodec.decode(3L, z).isEmpty)
  }

  test("AudioCodec: malformed payloads refuse (None), never fake metadata") {
    val codec = Multimodal.AudioCodec
    assert(codec.decode(1L, "not audio at all".getBytes).isEmpty)
    // RIFF magic but truncated before fmt
    assert(codec.decode(2L, "RIFFxxxxWAVE".getBytes).isEmpty)
    // non-PCM wav (audioFormat != 1) refuses
    val p = Multimodal.wavBytes(8000, 1, 10)
    p(20) = 3 // IEEE float format code
    assert(codec.decode(3L, p).isEmpty)
    // mp3 sync but reserved samplerate index (3) refuses
    val bad = Multimodal.mp3Bytes(9, 0, 0, 8)
    bad(2) = ((9 << 4) | (3 << 2)).toByte
    assert(codec.decode(4L, bad).isEmpty)
    // free-format bitrate (index 0) refuses — no duration estimate
    val free = Multimodal.mp3Bytes(1, 0, 0, 8)
    free(2) = 0.toByte
    assert(codec.decode(5L, free).isEmpty)
  }

  test("multimodal_audio_meta: decoded metadata equals the generating arithmetic") {
    val got = Multimodal.multimodalAudioMeta(spark, sfTiny)
    assert(got.count() > 0)
    // parser-vs-generator parity is the oracle's job at sf0.01; here
    // pin a couple of exact rows: even id -> wav with the id-derived
    // rate, odd id -> mp3 with the id-derived bitrate duration
    val byId = got.collect().map(r => r.getLong(0) -> r).toMap
    byId.get(2L).foreach { r =>
      assert(r.getString(1) === "wav")
      assert(r.getInt(2) === 16000) // (2/2) % 4 = 1
      assert(r.getInt(3) === 2)     // (2/2) % 2 + 1
    }
    byId.get(3L).foreach { r =>
      assert(r.getString(1) === "mp3")
      assert(r.getInt(2) === 44100) // 3 % 3 = 0
      assert(r.getInt(3) === 1)     // mode 3 % 4 = 3 -> mono
    }
  }
}
