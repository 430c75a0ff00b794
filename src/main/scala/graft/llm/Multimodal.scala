package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch feature extraction via
  * mapPartitions (the Scala analogue of `mapInPandas` — batched,
  * schema-declared, partition-parallel).
  *
  * The DECODERS ARE STUBS (this container has no image/audio codecs —
  * builder brief): `decodeStub` derives deterministic fake features from
  * the bytes so the Spark-side plumbing (schema, batching, partitioning,
  * output shape) is real and testable; swap `decodeStub` for a codec
  * call in production.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))),
      nullable = true)))

  /** Wrap any table with a synthetic binary payload column (UTF-8 bytes
    * of a source column) — used by tests/queries since the driver data
    * has no real media; the downstream operators only see `binary`. */
  def synthesize(df: DataFrame, id: String, src: String): DataFrame =
    df.select(col(id).cast("long").as("media_id"),
      encode(col(src), "UTF-8").as("payload"),
      struct(lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** STUB decoder: deterministic pseudo-features from raw bytes (byte
    * length, simple moments, head/tail hash). Replace with a real codec
    * for production use — the signature and batch shape are the real
    * contract. */
  private def decodeStub(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
    else {
      val n = bytes.length
      var s = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) { val v = bytes(i) & 0xff; s += v; s2 += v * v; i += 1 }
      val mean = s / n
      Array(n.toDouble, mean, math.sqrt(math.max(s2 / n - mean * mean, 0)),
        (bytes(0) & 0xff).toDouble)
    }
  }

  /** Batch feature extraction: mapPartitions over the binary payloads,
    * emitting a fixed-width feature vector per media row. Partition-
    * parallel; no driver collection. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = decodeStub(bytes)
        (id, f(0), f(1), f(2), f(3))
      })
      .toDF("media_id", "byte_len", "byte_mean", "byte_std", "head_byte")
  }

  /** Resize plumbing: payload → payload' with the target dimensions
    * recorded in meta. STUB resampler (builder brief: no codecs in this
    * container): a deterministic stride subsample of the bytes stands in
    * for pixel resampling; the contract — batched mapPartitions, payload
    * out, meta carrying the new (width, height) — is the real part. */
  def resize(df: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val target = width * height
    df.select(col("media_id"), col("payload"), col("meta.mime").as("__mime"),
        col("meta.duration_ms").as("__dur"))
      .as[(Long, Array[Byte], String, Option[Long])]
      .mapPartitions(_.map { case (id, bytes, mime, dur) =>
        val out =
          if (bytes == null || bytes.isEmpty) Array.empty[Byte]
          else if (bytes.length <= target) bytes
          else {
            val stride = bytes.length.toDouble / target
            Array.tabulate(target)(i => bytes((i * stride).toInt))
          }
        (id, out, mime, dur)
      })
      .toDF("media_id", "payload", "__mime", "__dur")
      .select(col("media_id"), col("payload"),
        struct(col("__mime").as("mime"), lit(width).as("width"),
          lit(height).as("height"), col("__dur").as("duration_ms"))
          .as("meta"))
  }

  /** Frame sampling plumbing: slice the payload into `frames` fixed
    * windows (a video decoder would substitute real frame extraction);
    * output one row per (media_id, frame_idx, frame_bytes). */
  def sampleFrames(df: DataFrame, frames: Int): DataFrame = {
    val n = length(col("payload"))
    val step = greatest((n / frames).cast("int"), lit(1))
    val idx = sequence(lit(0), lit(frames - 1))
    df.select(col("media_id"), explode(idx).as("frame_idx"),
        col("payload"), step.as("__step"))
      .withColumn("frame_bytes",
        col("payload").substr((col("frame_idx") * col("__step") + 1)
          .cast("int"), lit(16)))
      .drop("payload", "__step")
      .filter(length(col("frame_bytes")) > 0)
  }
}
