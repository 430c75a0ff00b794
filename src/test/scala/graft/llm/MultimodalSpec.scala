package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multimodal plumbing contracts: schema, batch feature extraction
  * (moments computed from known bytes), frame sampling shape, and null
  * payload behavior. The decoder is a documented stub; these tests pin
  * the REAL parts — batching, schema, partition-parallel shape.
  */
class MultimodalSpec extends SparkSpec {

  private def media() = {
    import spark.implicits._
    Multimodal.synthesize(
      Seq((1L, "abcd"), (2L, ""), (3L, "zz")).toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("synthesize emits the canonical media schema") {
    val df = media()
    assert(df.schema("media_id").dataType.typeName === "long")
    assert(df.schema("payload").dataType.typeName === "binary")
    val meta = df.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ===
      Seq("mime", "width", "height", "duration_ms"))
  }

  test("extractFeatures computes byte moments exactly") {
    val out = Multimodal.extractFeatures(media())
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    // "abcd" = bytes 97,98,99,100: mean 98.5, pop std sqrt(1.25)
    val r1 = out(1L)
    assert(r1.getAs[Double]("byte_len") === 4.0)
    assert(math.abs(r1.getAs[Double]("byte_mean") - 98.5) < 1e-12)
    assert(math.abs(r1.getAs[Double]("byte_std") - math.sqrt(1.25)) < 1e-12)
    assert(r1.getAs[Double]("head_byte") === 97.0)
    // empty payload degrades to zeros, no crash
    val r2 = out(2L)
    assert(r2.getAs[Double]("byte_len") === 0.0)
    assert(r2.getAs[Double]("byte_mean") === 0.0)
  }

  test("resize caps the payload at width*height and stamps meta dims") {
    import spark.implicits._
    val long = "x" * 100
    val df = Multimodal.synthesize(
      Seq((1L, long), (2L, "ab"), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
    val out = Multimodal.resize(df, 4, 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    // schema round-trips: same canonical shape as the input media table
    val schema = Multimodal.resize(df, 4, 3).schema
    assert(schema.fieldNames.toSeq === Seq("media_id", "payload", "meta"))
    // 100 bytes resampled down to 12; short/empty payloads pass through
    assert(out(1L).getAs[Array[Byte]]("payload").length === 12)
    assert(out(2L).getAs[Array[Byte]]("payload").length === 2)
    assert(out(3L).getAs[Array[Byte]]("payload").length === 0)
    val meta = out(1L).getStruct(2)
    assert(meta.getAs[Int]("width") === 4)
    assert(meta.getAs[Int]("height") === 3)
    assert(meta.getAs[String]("mime") === "application/octet-stream")
  }

  // ---- real image decode path (javax.imageio, JDK built-in codecs) ----

  /** A 4x3 PNG with known pixels: row y is a flat gray level 10+40y. */
  private def knownPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4) {
      val v = 10 + 40 * y
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("sniffImageMime identifies PNG magic and rejects text") {
    assert(Multimodal.sniffImageMime(knownPng()) === Some("image/png"))
    assert(Multimodal.sniffImageMime("plain text".getBytes) === None)
    assert(Multimodal.sniffImageMime(null) === None)
    assert(Multimodal.sniffImageMime(Array[Byte](0x42, 0x4d, 0, 0)) ===
      Some("image/bmp"))
  }

  test("extractFeatures decodes a real PNG to dims + exact luma stats") {
    import spark.implicits._
    val df = Seq((9L, knownPng()), (10L, "not an image".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.extractFeatures(df)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val img = out(9L)
    assert(img.getAs[Boolean]("decoded"))
    assert(img.getAs[Int]("width") === 4)
    assert(img.getAs[Int]("height") === 3)
    // gray rows 10/50/90: luma == gray level, mean 50, pop std sqrt(3200/3)
    assert(math.abs(img.getAs[Double]("px_mean") - 50.0) < 1e-9)
    assert(math.abs(img.getAs[Double]("px_std") -
      math.sqrt(3200.0 / 3)) < 1e-9)
    // non-image payload: stub features, null image columns, decoded=false
    val txt = out(10L)
    assert(!txt.getAs[Boolean]("decoded"))
    assert(txt.isNullAt(txt.fieldIndex("width")))
    assert(txt.getAs[Double]("byte_len") === 12.0)
  }

  test("resize really resamples image pixels and re-encodes as PNG") {
    import spark.implicits._
    val df = Seq((1L, knownPng())).toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("image/png").as("mime"), lit(4).as("width"),
          lit(3).as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.resize(df, 2, 2).collect()(0)
    val meta = out.getStruct(out.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") === "image/png")
    assert(meta.getAs[Int]("width") === 2)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("payload")))
    assert(decoded.getWidth === 2 && decoded.getHeight === 2)
    // nearest-neighbor from 4x3: target rows 0,1 sample source rows 0,1
    assert((decoded.getRGB(0, 0) & 0xff) === 10)
    assert((decoded.getRGB(0, 1) & 0xff) === 50)
  }

  test("synthesizeImages emits decodable PNGs whose dims match meta") {
    import spark.implicits._
    val df = Multimodal.synthesizeImages(
      Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
    val feats = Multimodal.extractFeatures(df)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val metas = df.select(col("media_id"), col("meta.width"),
      col("meta.height")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    for (id <- Seq(1L, 2L)) {
      assert(feats(id).getAs[Boolean]("decoded"))
      assert(feats(id).getAs[Int]("width") === metas(id)._1)
      assert(feats(id).getAs[Int]("height") === metas(id)._2)
    }
    // "hello world" has 11 bytes -> 4+11%9=6 wide, 3+11%6=8 tall
    assert(metas(1L) === ((6, 8)))
  }

  test("decodeAudio recovers format and samples from a real WAV") {
    // hand-built 4-sample 16-bit mono WAV: samples +1000, -1000, 0, 500
    val samples = Array[Short](1000, -1000, 0, 500)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    assert(Multimodal.sniffAudioMime(wav) === Some("audio/wav"))
    val a = Multimodal.decodeAudio(wav).get
    assert(a.sampleRate === 8000)
    assert(a.channels === 1)
    assert(a.nSamples === 4L)
    assert(a.durationMs === 0L) // 4/8000 s rounds down
    // sum of squares = 1000² + 1000² + 0 + 500² = 2,250,000
    assert(math.abs(a.rms - math.sqrt(2250000.0 / 4)) < 1e-12)
    // sign runs: + - + + (0 counts non-negative) → 2 crossings
    assert(a.zcr === 2L)
    // non-audio payloads refuse to decode
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
  }

  test("synthesizeAudio round-trips through the JDK WAV codec exactly") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 799L, 800L, 1234L).toDF("doc_id")
    val feats = Multimodal.extractAudioFeatures(
        Multimodal.synthesizeAudio(ids, "doc_id"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    for (id <- Seq(0L, 1L, 799L, 800L, 1234L)) {
      val n = (800 + id % 800).toInt
      // reference features straight from the waveform formula
      val vs = (0 until n).map(i =>
        ((((id * 31 + i.toLong * 17) % 256).toInt) - 128) * 256)
      val sumSq = vs.map(v => v.toLong * v).sum
      var zcr = 0
      vs.sliding(2).foreach { case Seq(a, b) =>
        if ((a >= 0) != (b >= 0)) zcr += 1
      }
      val r = feats(id)
      assert(r.getAs[Boolean]("decoded"), s"id $id")
      assert(r.getAs[Int]("sample_rate") === 8000)
      assert(r.getAs[Int]("channels") === 1)
      assert(r.getAs[Long]("n_samples") === n.toLong)
      assert(r.getAs[Long]("duration_ms") === n.toLong * 1000 / 8000)
      assert(r.getAs[Double]("rms") === math.sqrt(sumSq.toDouble / n),
        s"id $id rms")
      assert(r.getAs[Long]("zcr") === zcr.toLong, s"id $id zcr")
    }
    // non-audio payloads flow through with decoded=false, null features
    val stub = Multimodal.extractAudioFeatures(Multimodal.synthesize(
      Seq((9L, "plain text")).toDF("doc_id", "text"), "doc_id", "text"))
      .collect().head
    assert(!stub.getAs[Boolean]("decoded"))
    assert(stub.isNullAt(stub.fieldIndex("rms")))
  }

  test("sampleFrames yields one bounded slice per frame index") {
    import spark.implicits._
    val df = Multimodal.synthesize(
      Seq((7L, "0123456789" * 10)).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.sampleFrames(df, frames = 4).collect()
    assert(frames.length === 4)
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq ===
      Seq(0, 1, 2, 3))
    frames.foreach { r =>
      val b = r.getAs[Array[Byte]]("frame_bytes")
      assert(b.nonEmpty && b.length <= 16)
    }
    // frame 0 starts at the payload head
    val f0 = frames.find(_.getAs[Int]("frame_idx") == 0).get
    assert(new String(f0.getAs[Array[Byte]]("frame_bytes")).startsWith("01234"))
  }

  test("splitMjpegFrames demuxes hand-concatenated real JPEGs exactly") {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    def jpeg(seed: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (seed * 37 + y * w + x) * 2654435761L.toInt)
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val parts = Seq(jpeg(1, 9, 7), jpeg(2, 5, 4), jpeg(3, 12, 3))
    val stream = parts.flatMap(_.toSeq).toArray
    assert(Multimodal.sniffMjpeg(stream), "3 concatenated JPEGs are MJPEG")
    assert(!Multimodal.sniffMjpeg(parts.head), "a single JPEG is not")
    val frames = Multimodal.splitMjpegFrames(stream)
    assert(frames.size === 3)
    assert(frames.map(_.toSeq) === parts.map(_.toSeq),
      "demux must recover the exact original frame byte ranges")
    val dims = frames.map { fb =>
      val img = ImageIO.read(new ByteArrayInputStream(fb))
      (img.getWidth, img.getHeight)
    }
    assert(dims === Seq((9, 7), (5, 4), (12, 3)))
  }

  test("video features come from really decoded frames; non-video is total") {
    import spark.implicits._
    val docs = Seq((0L, "movie zero"), (1L, "movie one"),
      (2L, "movie two")).toDF("doc_id", "text")
    val media = Multimodal.synthesizeVideo(docs, "doc_id", "text")
    val out = Multimodal.extractVideoFeatures(media)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    (0L to 2L).foreach { id =>
      val r = out(id)
      assert(r.getAs[Boolean]("decoded"))
      // synthesizeVideo contract: 2 + id mod 3 frames
      assert(r.getAs[Int]("n_frames") === (2 + id % 3).toInt)
      assert(r.getAs[Int]("width") > 0 && r.getAs[Int]("height") > 0)
      val lm = r.getAs[Double]("luma_mean")
      assert(lm > 0.0 && lm < 255.0)
      assert(r.getAs[Double]("motion") >= 0.0)
    }
    // frames differ by construction -> motion strictly positive
    assert(out(1L).getAs[Double]("motion") > 0.0)
    // a non-MJPEG payload flows through with decoded=false, null features
    val other = Multimodal.synthesize(
      Seq((9L, "not a video")).toDF("doc_id", "text"), "doc_id", "text")
    val row = Multimodal.extractVideoFeatures(other).collect().head
    assert(!row.getAs[Boolean]("decoded"))
    assert(row.isNullAt(row.fieldIndex("n_frames")))
  }

  test("synthesizeVideo is byte-deterministic across invocations") {
    import spark.implicits._
    val docs = Seq((5L, "same text")).toDF("doc_id", "text")
    def payload(): Seq[Byte] =
      Multimodal.synthesizeVideo(docs, "doc_id", "text")
        .select("payload").head().getAs[Array[Byte]](0).toSeq
    assert(payload() === payload())
  }

  test("q_mm_frames oracle invariant: fixture document text is pure ASCII") {
    // q_mm_frames' oracle equates Spark BYTE-substr over the UTF-8
    // payload with DuckDB CHAR-substr over text — valid only while every
    // character is single-byte. This fails loudly if multi-byte text
    // (e.g. real zh corpora) ever lands in the driver fixtures, instead
    // of letting the oracle gate silently diverge.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val bad =
        docs.filter(length(col("text")) =!= octet_length(col("text"))).count()
      assert(bad === 0L, s"$sf has non-ASCII document text: byte-substr " +
        "and char-substr no longer coincide for the q_mm_frames oracle")
    }
  }
}
