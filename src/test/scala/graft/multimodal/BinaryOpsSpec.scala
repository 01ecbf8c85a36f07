package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BinaryOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text")

  test("stubFeatures samples strided bytes, zero past end") {
    val f = BinaryOps.stubFeatures("abcdefghij".getBytes("UTF-8"), dims = 4, stride = 3)
    assert(f.toSeq === Seq('a' / 255.0, 'd' / 255.0, 'g' / 255.0, 'j' / 255.0))
    val short = BinaryOps.stubFeatures("ab".getBytes("UTF-8"), dims = 3, stride = 2)
    assert(short.toSeq === Seq('a' / 255.0, 0.0, 0.0))
  }

  test("decodeFeatures runs the stub through mapPartitions with typed rows") {
    val withBin = BinaryOps.withPayload(docs, "text", "payload")
    val got = BinaryOps.decodeFeatures(spark, withBin, "doc_id", "payload", dims = 2, stride = 4)
      .collect().map(m => m.doc_id -> m.features.toSeq).toMap
    assert(got(1L) === Seq('a' / 255.0, 'e' / 255.0))
    assert(got(2L) === Seq('x' / 255.0, 0.0))
  }

  test("sampleFrames emits every k-th frame with offsets and bytes") {
    val withBin = BinaryOps.withPayload(docs, "text", "payload")
    val got = BinaryOps.sampleFrames(withBin, "doc_id", "payload", frameLen = 3, every = 2)
      .filter($"doc_id" === 1L)
      .select("frame_no", "byte_offset", "frame_bytes")
      .as[(Int, Long, Array[Byte])].collect().sortBy(_._1)
    // payload 10 bytes, step 6 → frames at offsets 0 and 6
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((0, 0L), (1, 6L)))
    assert(new String(got(0)._3, "UTF-8") === "abc")
    assert(new String(got(1)._3, "UTF-8") === "ghi")
  }

  test("encodePng produces a parseable PNG; decode round-trips dims and pixels") {
    val payload = "abcdefghij".getBytes("UTF-8")
    val png = BinaryOps.encodePng(payload, w = 4, h = 3)
    // real PNG container: magic bytes
    assert(png.take(8).toSeq ===
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert((img.getWidth, img.getHeight) === (4, 3))
    // pixel i = payload(i % len): 12 pixels over a 10-byte payload wraps
    val expected = (0 until 12).map(i => payload(i % payload.length) & 0xff)
    val got = for (y <- 0 until 3; x <- 0 until 4)
      yield img.getRaster.getSample(x, y, 0)
    assert(got === expected)
  }

  test("withPngPayload + decodePngMeta: distributed codec round-trip with checksums") {
    val src = docs.selectExpr("doc_id", "CAST(text AS BINARY) AS payload",
      "CAST(3 AS INT) AS w", "CAST(2 AS INT) AS h")
    val png = BinaryOps.withPngPayload(spark, src, "doc_id", "payload", "w", "h")
    val metas = BinaryOps.decodePngMeta(spark, png, "doc_id", "png")
      .collect().map(m => m.doc_id -> m).toMap
    // doc 1: "abcdef" → sum 597, xor a^b^c^d^e^f
    val bytes1 = "abcdef".getBytes("UTF-8").map(_ & 0xff)
    assert(metas(1L).width === 3 && metas(1L).height === 2)
    assert(metas(1L).px_sum === bytes1.map(_.toLong).sum)
    assert(metas(1L).px_xor === bytes1.map(_.toLong).reduce(_ ^ _))
    // doc 2: "xy" wraps → pixels x y x y x y
    val bytes2 = (0 until 6).map(i => "xy".getBytes("UTF-8")(i % 2) & 0xff)
    assert(metas(2L).px_sum === bytes2.map(_.toLong).sum)
    assert(metas(2L).px_xor === bytes2.map(_.toLong).reduce(_ ^ _))
  }

  test("lumaHistogram: 16-bin bucketing through the codec, empty bins absent") {
    import spark.implicits._
    // payload bytes 0,15,16,255 in a 2x2 image: bin 0 → {0,15} (2),
    // bin 1 → {16} (1), bin 15 → {255} (1); bins 2-14 must be ABSENT
    val src = Seq((7L, Array[Byte](0, 15, 16, -1), 2, 2))
      .toDF("doc_id", "payload", "w", "h")
    val png = BinaryOps.withPngPayload(spark, src, "doc_id", "payload", "w", "h")
    val got = BinaryOps.lumaHistogram(spark, png, "doc_id", "png", bins = 16)
      .collect().map(b => b.bin -> b.cnt).toMap
    assert(got === Map(0 -> 2L, 1 -> 1L, 15 -> 1L))
  }

  test("phashNearDupPairs: pigeonhole recall at Hamming 3, cap drops saturated bands") {
    import spark.implicits._
    // (1,2): Hamming 3 inside band 0 → found; (1,3): 4 set bits spread
    // over all four bands → no shared band, correctly outside the
    // guarantee; (2,3): differs in bits {0,1,2} vs {0,16,32,48} → ham 7
    val hashes = Seq(
      (1L, 0L), (2L, 7L),
      (3L, (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)))
      .toDF("doc_id", "phash")
    val got = BinaryOps.phashNearDupPairs(hashes, "doc_id", "phash")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 3)))
    // three identical hashes saturate every band at maxBucket = 2
    val sat = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("doc_id", "phash")
    assert(BinaryOps.phashNearDupPairs(sat, "doc_id", "phash",
      maxBucket = 2L).count() === 0L)
  }

  test("sampleFrames: empty payload yields zero frames, not a backwards sequence") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val withBin = BinaryOps.withPayload(empty, "text", "payload")
    assert(BinaryOps.sampleFrames(withBin, "doc_id", "payload",
      frameLen = 3, every = 2).count() === 0L)
  }

  test("phash63: bits follow raster-neighbor comparisons through the codec") {
    // 3×2 raster of "cabbed": pixels c a b b e d; bit i set iff
    // px[i mod 6] > px[(i+1) mod 6] → pattern (c>a, a>b, b>b, b>e, e>d,
    // d>c) = (1,0,0,0,1,1) repeating with period 6 over i ∈ [0, 63)
    val src = Seq((1L, "cabbed")).toDF("doc_id", "text")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS payload",
        "CAST(3 AS INT) AS w", "CAST(2 AS INT) AS h")
    val png = BinaryOps.withPngPayload(spark, src, "doc_id", "payload", "w", "h")
    val hash = BinaryOps.phash63(spark, png, "doc_id", "png")
      .collect().head.phash
    val base = Seq(true, false, false, false, true, true)
    val expected = (0 until 63).foldLeft(0L)((h, i) =>
      if (base(i % 6)) h | (1L << i) else h)
    assert(hash === expected)
  }

  test("phash63: constant raster hashes to zero") {
    val src = Seq((1L, "aaaa")).toDF("doc_id", "text")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS payload",
        "CAST(2 AS INT) AS w", "CAST(2 AS INT) AS h")
    val png = BinaryOps.withPngPayload(spark, src, "doc_id", "payload", "w", "h")
    assert(BinaryOps.phash63(spark, png, "doc_id", "png")
      .collect().head.phash === 0L)
  }

  test("resizeNearest: 2x1 source upsampled to 4x4 duplicates by halves") {
    // payload "ab", w=2, h=1: source raster = [97, 98]; every output row
    // samples sy=0 and sx = px*2/4 → a,a,b,b
    val src = Seq((1L, "ab")).toDF("doc_id", "text")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS payload",
        "CAST(2 AS INT) AS w", "CAST(1 AS INT) AS h")
    val png = BinaryOps.withPngPayload(spark, src, "doc_id", "payload", "w", "h")
    val out = BinaryOps.resizeNearest(spark, png, "doc_id", "png", 4, 4)
      .collect().map(p => (p.px, p.py) -> p.gray).toMap
    assert(out.size === 16)
    (0 until 4).foreach { py =>
      assert(out((0, py)) === 97 && out((1, py)) === 97)
      assert(out((2, py)) === 98 && out((3, py)) === 98)
    }
  }

  test("pcmFrameEnergy: signed int16 LE decode, framing, ragged tail") {
    // bytes (00 01)(00 FF)(10 00) → samples 256, -256, 16
    val src = Seq((7L, Array[Byte](0x00, 0x01, 0x00, 0xFF.toByte,
      0x10, 0x00))).toDF("doc_id", "payload")
    val out = BinaryOps.pcmFrameEnergy(spark, src, "doc_id", "payload",
        frameLen = 2)
      .collect().sortBy(_.frame)
    assert(out.length === 2)
    // frame 0: rms = sqrt((256² + 256²)/2) = 256 exactly
    assert(out(0).n_samples === 2 && out(0).rms === 256.0)
    // ragged tail frame: one sample of 16 → rms 16
    assert(out(1).n_samples === 1 && out(1).rms === 16.0)
  }

  test("resizeNearest at the source size is the identity raster") {
    val src = Seq((3L, "wxyz")).toDF("doc_id", "text")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS payload",
        "CAST(2 AS INT) AS w", "CAST(2 AS INT) AS h")
    val png = BinaryOps.withPngPayload(spark, src, "doc_id", "payload", "w", "h")
    val out = BinaryOps.resizeNearest(spark, png, "doc_id", "png", 2, 2)
      .collect().map(p => (p.px, p.py) -> p.gray).toMap
    // raster row-major = w,x,y,z
    assert(out === Map((0, 0) -> 'w'.toInt, (1, 0) -> 'x'.toInt,
      (0, 1) -> 'y'.toInt, (1, 1) -> 'z'.toInt))
  }

  test("pcmFrameEnergy matches a sequential reference on random bytes") {
    val rng = new scala.util.Random(5)
    val rows = (1L to 8L).map(i =>
      (i, Array.fill(rng.nextInt(40) + 2)(rng.nextInt(256).toByte)))
    val got = BinaryOps.pcmFrameEnergy(spark,
        rows.toDF("doc_id", "payload"), "doc_id", "payload", frameLen = 4)
      .collect().map(f => (f.doc_id, f.frame) -> ((f.n_samples, f.rms))).toMap
    rows.foreach { case (id, bytes) =>
      val samples = bytes.grouped(2).filter(_.length == 2)
        .map(p => ((p(1).toInt << 8) | (p(0) & 0xff))).toArray
      samples.grouped(4).zipWithIndex.foreach { case (fr, fi) =>
        val ss = fr.map(s => s.toLong * s).sum
        val rms = BigDecimal(math.sqrt(ss.toDouble / fr.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got((id, fi)) === ((fr.length, rms)), s"doc $id frame $fi")
      }
    }
  }

  test("pcmFrameEnergy: odd trailing byte is dropped, empty payload → no rows") {
    val src = Seq((1L, Array[Byte](0x03, 0x00, 0x7F)),
      (2L, Array.empty[Byte])).toDF("doc_id", "payload")
    val out = BinaryOps.pcmFrameEnergy(spark, src, "doc_id", "payload", 256)
      .collect()
    assert(out.length === 1)
    assert(out(0).doc_id === 1L && out(0).n_samples === 1 &&
      out(0).rms === 3.0)
  }

  test("pcmResampleEnergy at 1/1 is pcmFrameEnergy (identity resample)") {
    val rng = new scala.util.Random(11)
    val src = (1L to 6L).map(i =>
        (i, Array.fill(rng.nextInt(60) + 2)(rng.nextInt(256).toByte)))
      .toDF("doc_id", "payload")
    val base = BinaryOps.pcmFrameEnergy(spark, src, "doc_id", "payload", 5)
      .collect().map(f => (f.doc_id, f.frame) -> ((f.n_samples, f.rms)))
      .toMap
    val same = BinaryOps.pcmResampleEnergy(spark, src, "doc_id", "payload",
        upP = 1, downQ = 1, frameLen = 5)
      .collect().map(f => (f.doc_id, f.frame) -> ((f.n_samples, f.rms)))
      .toMap
    assert(same === base)
  }

  test("pcmResampleEnergy: 2x upsample interpolates exact midpoints") {
    // samples 100, 200 → out positions 0, 0.5, 1 → 100, 150, 200
    // (numerators 200, 300, 400 over upP=2)
    val src = Seq((1L, Array[Byte](100, 0x00, 200.toByte, 0x00)))
      .toDF("doc_id", "payload")
    val out = BinaryOps.pcmResampleEnergy(spark, src, "doc_id", "payload",
        upP = 2, downQ = 1, frameLen = 10).collect()
    assert(out.length === 1 && out(0).n_samples === 3)
    val want = BigDecimal(math.sqrt(
        (200L * 200 + 300L * 300 + 400L * 400).toDouble / (3.0 * 4)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).rms === want)
  }

  test("pcmResampleEnergy matches a sequential reference at 2/3 rate") {
    val rng = new scala.util.Random(17)
    val rows = (1L to 8L).map(i =>
      (i, Array.fill(rng.nextInt(80) + 2)(rng.nextInt(256).toByte)))
    val (p, q) = (2, 3)
    val got = BinaryOps.pcmResampleEnergy(spark,
        rows.toDF("doc_id", "payload"), "doc_id", "payload", p, q,
        frameLen = 4)
      .collect().map(f => (f.doc_id, f.frame) -> ((f.n_samples, f.rms)))
      .toMap
    var expected = 0
    rows.foreach { case (id, bytes) =>
      val s = bytes.grouped(2).filter(_.length == 2)
        .map(x => ((x(1).toInt << 8) | (x(0) & 0xff)).toLong).toArray
      val ns = s.length
      val outN = ((ns - 1).toLong * p / q + 1).toInt
      val nums = (0 until outN).map { k =>
        val pos = k.toLong * q
        val i = (pos / p).toInt
        val r = (pos % p).toInt
        s(i) * (p - r) + s(math.min(i + 1, ns - 1)) * r
      }
      nums.grouped(4).zipWithIndex.foreach { case (fr, fi) =>
        val ss = fr.map(n => n * n).sum
        val rms = BigDecimal(
            math.sqrt(ss.toDouble / (fr.length.toDouble * p * p)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got((id, fi)) === ((fr.length, rms)), s"doc $id frame $fi")
        expected += 1
      }
    }
    assert(got.size === expected)
  }

  test("encodeWav writes a valid RIFF container javax.sound can parse") {
    val payload = Array.tabulate[Byte](10)(i => (i * 7).toByte) // 5 samples
    val wav = BinaryOps.encodeWav(payload, 16000)
    assert(wav.length === 44 + 10)
    assert(new String(wav, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") === "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 16000f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(!fmt.isBigEndian)
    assert(ais.readAllBytes().toSeq === payload.toSeq) // lossless data chunk
  }

  test("encodeWav drops a trailing odd byte (whole int16 samples only)") {
    val wav = BinaryOps.encodeWav(Array[Byte](1, 2, 3), 8000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFrameLength === 1)
    assert(ais.readAllBytes().toSeq === Seq[Byte](1, 2))
  }

  test("wavFrameEnergy: container round-trip matches the raw PCM kernel") {
    val texts = Seq((1L, "abcdefghij" * 40), (2L, "xy"), (3L, "q")) // 3rd: 0 samples
    val df = BinaryOps.withPayload(texts.toDF("doc_id", "text"), "text", "payload")
    val viaWav = BinaryOps.wavFrameEnergy(spark,
        BinaryOps.withWavPayload(spark, df, "doc_id", "payload", 16000),
        "doc_id", "wav", frameLen = 64)
      .collect().map(w => (w.doc_id, w.frame) -> (w.n_samples, w.rms)).toMap
    val raw = BinaryOps.pcmFrameEnergy(spark, df, "doc_id", "payload", 64)
      .collect().map(e => (e.doc_id, e.frame) -> (e.n_samples, e.rms)).toMap
    assert(viaWav === raw)
    assert(!viaWav.keySet.exists(_._1 == 3L)) // zero-sample doc: no frames
    // metadata really comes from the decoded container
    val meta = BinaryOps.wavFrameEnergy(spark,
        BinaryOps.withWavPayload(spark, df, "doc_id", "payload", 22050),
        "doc_id", "wav", frameLen = 64).head()
    assert(meta.sample_rate === 22050)
    assert(meta.channels === 1)
    assert(meta.bits === 16)
  }
}
