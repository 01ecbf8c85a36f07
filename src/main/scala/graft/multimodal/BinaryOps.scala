package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-local batch transforms.
  *
  * The IMAGE path is a real codec: [[encodePng]] / [[decodePngMeta]] run
  * actual PNG compression/decompression through `javax.imageio` (pure JVM,
  * no native deps) inside `mapPartitions` — one decoder per partition, the
  * same batch shape a `mapInPandas` decode UDF takes in PySpark. Audio and
  * video codecs aren't in this container, so [[stubFeatures]] remains a
  * deterministic byte-sampling stand-in for those modalities; the plumbing
  * around it (binary column schema, typed Dataset batches, partition-local
  * init) is identical to the real PNG path.
  */
object BinaryOps {

  /** Row shape for decoded fixed-width feature batches. */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** Attach an opaque binary payload column (here: the utf-8 bytes of a text
    * column; in production: image/audio bytes read via `binaryFile` source).
    */
  def withPayload(df: DataFrame, textCol: String, name: String): DataFrame =
    df.withColumn(name, col(textCol).cast("binary"))

  /** STUB decode kernel — deterministic byte sampling in place of a real
    * image/audio decoder: feature j = byte[j * stride] / 255.0 (0.0 past
    * the end). Replace the body with a codec call; the batch plumbing
    * stays identical.
    */
  def stubFeatures(bytes: Array[Byte], dims: Int, stride: Int): Array[Double] =
    Array.tabulate(dims) { j =>
      val idx = j * stride
      if (idx < bytes.length) (bytes(idx) & 0xff) / 255.0 else 0.0
    }

  /** Partition-local "decode": binary payload in, fixed-width feature vector
    * out. mapPartitions so a real decoder initializes once per partition —
    * the Scala analogue of a Pandas `mapInPandas` batch UDF.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, id: String,
      payload: String, dims: Int, stride: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a real codec/model would go here
        it.map { case (docId, bytes) =>
          MediaFeatures(docId, stubFeatures(bytes, dims, stride))
        }
      }
  }

  /** Row shape for per-frame PCM energy. */
  case class FrameEnergy(doc_id: Long, frame: Int, n_samples: Int,
      rms: Double)

  /** Audio-shaped feature extraction on the REAL byte path: interpret the
    * payload as little-endian 16-bit PCM, window into `frameLen`-sample
    * frames (ragged tail kept with its true sample count), emit per-frame
    * RMS energy — the classic VAD/loudness front end. Σs² is an exact
    * Long per frame (≤ frameLen·2³⁰), the RMS is one sqrt + HALF_UP
    * 6-decimal round, so the result is bit-deterministic and
    * SQL-oracle-able over the same source bytes. Same mapPartitions batch
    * shape as the PNG decode path (a real audio codec would init per
    * partition here); rows out ≈ bytes/2/frameLen per doc — linear,
    * map-only, no shuffle.
    */
  def pcmFrameEnergy(spark: SparkSession, df: DataFrame, id: String,
      payload: String, frameLen: Int): Dataset[FrameEnergy] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val nSamp = if (bytes == null) 0 else bytes.length / 2
          val nFrames = (nSamp + frameLen - 1) / frameLen
          (0 until nFrames).iterator.map { f =>
            var k = f * frameLen
            val end = math.min(nSamp, k + frameLen)
            val n = end - k
            var ss = 0L
            while (k < end) {
              val lo = bytes(2 * k) & 0xff
              val hi = bytes(2 * k + 1).toInt // sign-extends: true int16
              val s = (hi << 8) | lo
              ss += s.toLong * s
              k += 1
            }
            FrameEnergy(docId, f, n,
              BigDecimal(math.sqrt(ss.toDouble / n))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
  }

  /** Row shape for per-frame energy of a RESAMPLED PCM stream. */
  case class ResampledFrame(doc_id: Long, frame: Int, n_samples: Int,
      rms: Double)

  /** Linear sample-rate conversion on the REAL PCM byte path (the audio
    * sibling of [[resizeNearest]]): interpret the payload as little-endian
    * int16 PCM, resample to `upP/downQ` of the source rate by linear
    * interpolation, then window the resampled stream into `frameLen`
    * frames and emit per-frame RMS — resample + the m06 energy front end
    * in one pass.
    *
    * Exactness: output sample k sits at source position t = k·downQ/upP;
    * with i = ⌊t⌋ and remainder r = (k·downQ) mod upP, the UN-normalized
    * value num = s[i]·(upP−r) + s[i+1]·r is an exact integer (the true
    * sample is num/upP), so Σnum² per frame is an exact Long and the
    * closing sqrt(Σnum²/(n·upP²)) + HALF_UP round is bit-deterministic —
    * the same closed-form-over-source-bytes oracle contract as m06/m07.
    * The last output lands exactly on the last input (outN = ⌊(ns−1)·
    * upP/downQ⌋ + 1), so i+1 is only read when it exists; the clamp is
    * belt-and-braces. Map-only, no shuffle; rows out ≈ outN/frameLen per
    * doc.
    */
  def pcmResampleEnergy(spark: SparkSession, df: DataFrame, id: String,
      payload: String, upP: Int, downQ: Int,
      frameLen: Int): Dataset[ResampledFrame] = {
    import spark.implicits._
    require(upP > 0 && downQ > 0 && frameLen > 0)
    df.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val ns = if (bytes == null) 0 else bytes.length / 2
          if (ns == 0) Iterator.empty
          else {
            def s(i: Int): Long = {
              val lo = bytes(2 * i) & 0xff
              val hi = bytes(2 * i + 1).toInt // sign-extends: true int16
              ((hi << 8) | lo).toLong
            }
            val outN = ((ns - 1).toLong * upP / downQ + 1).toInt
            val nFrames = (outN + frameLen - 1) / frameLen
            (0 until nFrames).iterator.map { f =>
              val start = f * frameLen
              val end = math.min(outN, start + frameLen)
              val n = end - start
              var ss = 0L
              var k = start
              while (k < end) {
                val pos = k.toLong * downQ
                val i = (pos / upP).toInt
                val r = (pos % upP).toInt
                val num = s(i) * (upP - r) + s(math.min(i + 1, ns - 1)) * r
                ss += num * num
                k += 1
              }
              ResampledFrame(docId, f, n,
                BigDecimal(math.sqrt(
                  ss.toDouble / (n.toDouble * upP * upP)))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
        }
      }
  }

  /** Row shape for per-frame mean-removed zero-crossing counts. */
  case class FrameZcr(doc_id: Long, frame: Int, n_samples: Int,
      crossings: Long, zcr: Option[Double])

  /** Per-frame zero-crossing rate on the REAL PCM byte path — the classic
    * voiced/unvoiced + pitch-proxy feature next to [[pcmFrameEnergy]]'s
    * loudness. ZCR is always taken after DC removal; with the frame mean
    * μ = S/n the sign test (s[k−1]−μ)(s[k]−μ) < 0 multiplies through by
    * n² to the EXACT integer test (n·s[k−1] − S)(n·s[k] − S) < 0 — no
    * float mean ever exists, so the count is bit-deterministic and the
    * closing rate is one division (crossings / (n−1), 6-decimal HALF_UP;
    * null for 1-sample tails). |n·s| ≤ 256·2¹⁵ and the product ≤ 2⁴⁷ —
    * comfortably exact in Long. Same map-only batch shape as m06; rows
    * out ≈ bytes/2/frameLen per doc.
    */
  def pcmFrameZcr(spark: SparkSession, df: DataFrame, id: String,
      payload: String, frameLen: Int): Dataset[FrameZcr] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val nSamp = if (bytes == null) 0 else bytes.length / 2
          val nFrames = (nSamp + frameLen - 1) / frameLen
          (0 until nFrames).iterator.map { f =>
            val start = f * frameLen
            val end = math.min(nSamp, start + frameLen)
            val n = end - start
            def s(i: Int): Long = {
              val lo = bytes(2 * i) & 0xff
              val hi = bytes(2 * i + 1).toInt // sign-extends: true int16
              ((hi << 8) | lo).toLong
            }
            var sum = 0L
            var k = start
            while (k < end) { sum += s(k); k += 1 }
            var crossings = 0L
            k = start + 1
            while (k < end) {
              if ((n * s(k - 1) - sum) * (n * s(k) - sum) < 0) crossings += 1
              k += 1
            }
            FrameZcr(docId, f, n, crossings,
              if (n < 2) None
              else Some(BigDecimal(crossings.toDouble / (n - 1))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
        }
      }
  }

  /** Row shape for decoded image metadata: dimensions plus two
    * order-insensitive pixel checksums (sum and xor of the 8-bit gray
    * samples) — the deterministic face of a lossy-looking pipeline stage.
    */
  case class PngMeta(doc_id: Long, width: Int, height: Int,
      px_sum: Long, px_xor: Long)

  /** Encode a `w`×`h` 8-bit grayscale PNG whose pixel at raster index `i`
    * is `payload(i % payload.length)` (0 for an empty payload) — a real,
    * losslessly-round-trippable image derived deterministically from the
    * payload bytes. Pure JVM (`javax.imageio`), no native codecs.
    */
  def encodePng(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    val n = payload.length
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, if (n == 0) 0 else payload(i % n) & 0xff)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a real PNG payload column: each row's `payloadCol` bytes are
    * rendered into a `wCol`×`hCol` grayscale image and PNG-compressed.
    * mapPartitions so the encoder warms once per partition.
    */
  def withPngPayload(spark: SparkSession, df: DataFrame, id: String,
      payload: String, wCol: String, hCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(payload), col(wCol).cast("int"),
        col(hCol).cast("int"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (docId, bytes, w, h) => (docId, encodePng(bytes, w, h)) }
      }
      .toDF(id, "png")
  }

  /** REAL image decode: parse the PNG byte stream (`javax.imageio`, full
    * inflate + defilter), read dimensions off the decoded image, and
    * checksum the raw raster samples. Raster access (`getSample`) reads the
    * stored gray values directly — no color-space conversion — so a
    * lossless 8-bit gray PNG round-trips bit-exactly and the checksums
    * admit a closed-form oracle over the source bytes.
    */
  def decodePngMeta(spark: SparkSession, df: DataFrame, id: String,
      png: String): Dataset[PngMeta] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(png))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: ImageIO's reader SPI lookup is amortized here
        it.map { case (docId, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var (sum, xor) = (0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0).toLong
              sum += v; xor ^= v
              x += 1
            }
            y += 1
          }
          PngMeta(docId, w, h, sum, xor)
        }
      }
  }

  case class LumaBin(doc_id: Long, bin: Int, cnt: Long)

  /** REAL decode → per-image luminance histogram (the exposure/contrast
    * profile an image-curation pipeline filters on): decoded gray samples
    * bucket into `bins` equal-width cells (8-bit range, bucket =
    * v·bins/256 by integer division). Each image folds to ≤`bins` rows
    * INSIDE the decode task (a bounded local array — never a per-pixel
    * shuffle row), so the operator is map-only and the output is
    * |images|·bins rows max. Lossless-gray PNG round-trip keeps the
    * closed-form source-byte oracle.
    */
  def lumaHistogram(spark: SparkSession, df: DataFrame, id: String,
      png: String, bins: Int = 16): Dataset[LumaBin] = {
    import spark.implicits._
    require(256 % bins == 0, s"lumaHistogram: bins=$bins must divide 256")
    df.select(col(id).cast("long"), col(png))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val counts = new Array[Long](bins)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              counts(raster.getSample(x, y, 0) * bins / 256) += 1L
              x += 1
            }
            y += 1
          }
          (0 until bins).iterator
            .filter(counts(_) > 0L)
            .map(b => LumaBin(docId, b, counts(b)))
        }
      }
  }

  case class ResizedPixel(doc_id: Long, px: Int, py: Int, gray: Int)

  /** REAL decode → nearest-neighbor resample to a fixed `outW`×`outH`
    * thumbnail (the resize stage of an image-preprocessing pipeline):
    * output pixel (px, py) reads source sample
    * (⌊px·w/outW⌋, ⌊py·h/outH⌋) off the decoded raster — pure integer
    * index arithmetic, so the lossless-gray PNG round-trip keeps a
    * closed-form oracle over the source bytes. One tall row per output
    * pixel; outW·outH rows per image regardless of source size —
    * map-only, shuffle-free.
    */
  def resizeNearest(spark: SparkSession, df: DataFrame, id: String,
      png: String, outW: Int, outH: Int): Dataset[ResizedPixel] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(png))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          for {
            py <- (0 until outH).iterator
            px <- 0 until outW
          } yield ResizedPixel(docId, px, py,
            raster.getSample(px * w / outW, py * h / outH, 0))
        }
      }
  }

  /** Image near-duplicate candidate pairs from 63-bit perceptual hashes
    * (the d03 LSH shape transplanted to the image modality): split each
    * hash into four 16-bit bands; by pigeonhole, any pair within Hamming
    * distance ≤ 3 collides on at least one band, so the band equi-join
    * finds every such pair with NO all-pairs scan; the exact
    * `bit_count(xor)` verify then drops the false positives.
    *
    * Scale shape: one |images|×4 banding projection, a hash equi-join on
    * (band, band_key), and the bounded verify — `maxBucket` drops
    * saturated bands (e.g. the all-black-thumbnail key) BEFORE the join,
    * the same loud quadratic-tail cap as the text LSH (`lshMaxBucket`).
    */
  def phashNearDupPairs(hashes: DataFrame, id: String, phash: String,
      maxHamming: Int = 3, maxBucket: Long = 1000L): DataFrame = {
    require(maxHamming <= 3,
      s"phashNearDupPairs: 4 bands only guarantee recall up to Hamming 3")
    // materialize (id, hash) once: 16 bytes/row, but the INPUT plan is
    // typically the decode+hash mapPartitions chain, and the four band
    // projections + the bucket-cap join would otherwise replay it ~12×
    val h = hashes.select(col(id), col(phash).as("__ph"))
      .localCheckpoint(false)
    val bands = (0 until 4).map { i =>
      h.select(col(id), col("__ph"), lit(i).as("__band"),
        (shiftrightunsigned(col("__ph"), i * 16) % 65536L).as("__key"))
    }.reduce(_ unionByName _)
    val keep = bands.groupBy(col("__band"), col("__key"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select(col("__band"), col("__key"))
    val capped = bands.join(keep, Seq("__band", "__key"))
    val cand = capped.alias("a").join(capped.alias("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__key") === col("b.__key") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        col("a.__ph").as("__pa"), col("b.__ph").as("__pb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("__pa").bitwiseXOR(col("__pb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  case class PngHash(doc_id: Long, phash: Long)

  /** Perceptual difference-hash over the DECODED raster — the image
    * near-dup fingerprint (the visual analogue of SimHash): bit i is set
    * iff pixel (i mod n) > pixel ((i+1) mod n) in row-major raster order,
    * i ∈ [0, 63) — 63 bits so the packed value stays non-negative and
    * cross-engine comparable as a plain BIGINT. Downstream near-dup
    * search reuses the SimHash machinery (bit-prefix banding + hamming
    * verify); this op is the decode→fingerprint kernel, and because the
    * PNG is lossless gray the hash has a closed form over the source
    * payload bytes — the oracle re-derives it without any codec.
    */
  def phash63(spark: SparkSession, df: DataFrame, id: String,
      png: String): Dataset[PngHash] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(png))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val n = w * h
          val px = new Array[Int](n)
          var i = 0
          while (i < n) {
            px(i) = raster.getSample(i % w, i / w, 0); i += 1
          }
          var hash = 0L
          i = 0
          while (i < 63) {
            if (px(i % n) > px((i + 1) % n)) hash |= 1L << i
            i += 1
          }
          PngHash(docId, hash)
        }
      }
  }

  /** "Frame sampling" over a binary payload: cut the byte stream into
    * `frameLen`-sized frames and keep every `every`-th one, with its offset —
    * the video-keyframe plumbing shape (explode to one row per kept frame).
    */
  def sampleFrames(df: DataFrame, id: String, payload: String,
      frameLen: Int, every: Int): DataFrame = {
    val step = frameLen * every
    // empty payloads yield zero frames — unguarded, sequence(0, -1) would
    // walk backwards and emit two bogus frame rows
    df.filter(length(col(payload)) > 0)
      .select(col(id), col(payload),
        explode(sequence(lit(0),
          floor((length(col(payload)) - 1) / step).cast("int"))).as("frame_no"))
      .select(col(id), col("frame_no"),
        (col("frame_no") * step).cast("long").as("byte_offset"),
        col(payload).substr(col("frame_no") * step + 1, lit(frameLen)).as("frame_bytes"))
  }

  /** Row shape for decoded WAV per-frame energy with container metadata. */
  case class WavFrame(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, frame: Int, n_samples: Int, rms: Double)

  /** Wrap little-endian int16 mono PCM bytes in a canonical 44-byte
    * RIFF/WAVE container (fmt chunk: PCM, 1 channel, 16 bits). Payload
    * bytes beyond the last complete sample are dropped (the data chunk is
    * 2·⌊len/2⌋ bytes), matching the m06 family's sample count. The audio
    * sibling of [[encodePng]]: a real container real corpora actually
    * carry, round-tripped losslessly.
    */
  def encodeWav(payload: Array[Byte], sampleRate: Int): Array[Byte] = {
    val dataLen = if (payload == null) 0 else payload.length / 2 * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(1.toShort) // PCM encoding, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2)
    bb.putShort(2.toShort).putShort(16.toShort) // block align, bit depth
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    if (dataLen > 0) bb.put(payload, 0, dataLen)
    bb.array()
  }

  /** Attach a real WAV payload column: each row's `payload` bytes become
    * the data chunk of a 16 kHz (configurable) PCM16 mono WAV.
    * mapPartitions so a real encoder would warm once per partition —
    * the [[withPngPayload]] batch shape.
    */
  def withWavPayload(spark: SparkSession, df: DataFrame, id: String,
      payload: String, sampleRate: Int): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) => (docId, encodeWav(bytes, sampleRate)) }
      }
      .toDF(id, "wav")
  }

  /** REAL audio-container decode: parse the RIFF/fmt/data chunks through
    * `javax.sound.sampled` (pure JVM — the audio analogue of the m02
    * `javax.imageio` precedent), read the format metadata off the decoded
    * stream, and run the [[pcmFrameEnergy]] RMS front end over the decoded
    * samples. PCM16 WAV round-trips bit-exactly, so the result admits the
    * same closed-form oracle over the source payload bytes as m06 — with
    * the sample rate / channel count / bit depth now coming from the
    * CONTAINER, asserting the decode really happened. Map-only, decoder
    * per partition, rows out ≈ samples/frameLen per doc.
    */
  def wavFrameEnergy(spark: SparkSession, df: DataFrame, id: String,
      wav: String, frameLen: Int): Dataset[WavFrame] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(wav))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: AudioSystem's file-reader SPI lookup amortizes here
        it.flatMap { case (docId, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val sr = fmt.getSampleRate.toInt
          val ch = fmt.getChannels
          val bits = fmt.getSampleSizeInBits
          val data = ais.readAllBytes()
          ais.close()
          val nSamp = data.length / 2
          val nFrames = (nSamp + frameLen - 1) / frameLen
          (0 until nFrames).iterator.map { f =>
            var k = f * frameLen
            val end = math.min(nSamp, k + frameLen)
            val n = end - k
            var ss = 0L
            while (k < end) {
              val lo = data(2 * k) & 0xff
              val hi = data(2 * k + 1).toInt // sign-extends: true int16
              val s = (hi << 8) | lo
              ss += s.toLong * s
              k += 1
            }
            WavFrame(docId, sr, ch, bits, f, n,
              BigDecimal(math.sqrt(ss.toDouble / n))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
  }
}
