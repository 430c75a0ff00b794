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
}
