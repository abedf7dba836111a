package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D12: multimodal columns — image/audio/video as opaque binary with
  * typed metadata (SURVEY.md §2.4). The Spark-side plumbing (schema,
  * partitioning, per-partition batch shape) is real and tested; only
  * the codec itself is a STUB — this container has no image/audio
  * libraries, so decode produces a deterministic fake "feature" from
  * the bytes. A real deployment swaps `decodeStub` for the actual
  * codec; nothing else changes.
  *
  * Decode runs via mapPartitions over an iterator — the per-partition
  * batch shape a vectorized (Arrow/pandas-style) decode UDF sees —
  * and is the ONE sanctioned mapPartitions in the engine: codecs are
  * genuinely imperative per-row work no Column expression expresses.
  */
object Multimodal {

  val Modalities = Seq("image", "audio", "video")

  val assetSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Synthesize an asset table from the documents corpus: the text
    * bytes stand in for an encoded payload; metadata is derived
    * deterministically from doc_id. Pure column expressions. */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(
      id,
      element_at(array(Modalities.map(lit): _*), (id % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      struct(
        (lit(64) + id % 512).cast("int").as("width"),
        (lit(64) + id % 256).cast("int").as("height"),
        (lit(8000) + (id % 5) * 8000).cast("int").as("sample_rate"),
        (lit(1) + id % 300).cast("int").as("n_frames")).as("meta"))
  }

  val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode + feature-extract. Deterministic fake: "features" are
    * byte-histogram statistics of the payload — stands in for e.g. a
    * resized image tensor or mel spectrogram. Batch shape, schema and
    * partitioning are exactly what the real codec path uses. */
  def decodeFeatures(assets: DataFrame, featureDim: Int = 8): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets.select("doc_id", "modality", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val feature = new Array[Float](featureDim)
        var i = 0
        while (i < bytes.length) {
          feature(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
          i += 1
        }
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("modality"),
          bytes.length, feature.toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real deployment decodes, resizes to (w, h) and
    * re-encodes; the stub deterministically truncates/pads the payload
    * to w*h BYTES — all operations stay in binary space (a string
    * round-trip would count characters, so any multi-byte UTF-8
    * payload would break the size contract). Plumbing (schema
    * evolution, pure column ops for metadata, binary passthrough) is
    * the real part. */
  def resizeStub(assets: DataFrame, w: Int, h: Int): DataFrame =
    assets
      .withColumn("content",
        substring(concat(col("content"), lit(Array.fill[Byte](w * h)(0x20))),
          1, w * h))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate"), col("meta.n_frames")))

  /** STUB frame sampling: select every `stride`-th frame index of a
    * video asset — the metadata/row-expansion shape of real frame
    * extraction (posexplode of a frame-index sequence), with the
    * per-frame payload left to the decode stub. */
  def sampleFrames(assets: DataFrame, stride: Int): DataFrame =
    assets.filter(col("modality") === "video")
      .select(col("doc_id"), col("meta.n_frames"),
        posexplode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)))
          .as(Seq("sample_idx", "frame_idx")))

  /** MM3: audio chunk scheduling — fixed-length overlapping windows
    * computed purely from metadata (sample rate + payload length; the
    * synthetic payload is 1 byte/sample), the deterministic scheduling
    * half of chunked audio decode exactly as [[sampleFrames]] is for
    * video: the schedule fans out map-side from O(1) metadata columns,
    * and only the scheduled chunks ever reach the (stubbed) codec — at
    * 100 TB you never decode whole assets to cut windows. Short clips
    * yield one partial chunk; empty payloads yield none; the last
    * chunk clamps to the clip end. All integer arithmetic. */
  def audioChunks(assets: DataFrame, winMs: Long = 2000L,
      hopMs: Long = 500L): DataFrame =
    assets.filter(col("modality") === "audio")
      .select(col("doc_id"), col("meta.sample_rate").as("sr"),
        length(col("content")).cast("long").as("n_samples"))
      // Column./ is true division: floor+cast = integer division
      // (exact — the numerators stay far below 2^53)
      .withColumn("duration_ms",
        floor(col("n_samples") * 1000L / col("sr")).cast("long"))
      .withColumn("n_chunks",
        when(col("duration_ms") <= 0, lit(0L))
          .when(col("duration_ms") < winMs, lit(1L))
          .otherwise(
            floor((col("duration_ms") - winMs) / hopMs).cast("long") + 1L))
      .filter(col("n_chunks") > 0)
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("ci"))
      .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
        (col("ci") * hopMs).as("start_ms"),
        least(col("ci") * hopMs + winMs, col("duration_ms")).as("end_ms"))

  /** MM5: audio-visual ALIGNMENT — for every sampled video frame
    * (the MM2 schedule), the audio chunk (the MM3 schedule of the
    * PAIRED audio asset — synthetic pairing: audio id = video id − 1,
    * the adjacent modality slot) whose window covers the frame's
    * timestamp. The step that turns two per-modality schedules into
    * training PAIRS; frames past the audio's end keep NULL chunk
    * columns and n_covering = 0 — the honest modality-length-mismatch
    * witness, not a dropped row. Overlapping windows (hop < win) cover
    * a frame up to win/hop times; the LATEST-starting covering chunk
    * is chosen, recovered exactly as max(start_ms) with
    * chunk_idx = start div hop — no struct argmax needed. Shape: an
    * equi join on the paired asset id with the interval test as a
    * residual, then one keyed aggregation — all integer arithmetic,
    * fully oracle-mirrorable. */
  def avAlign(assets: DataFrame, stride: Int, frameMs: Long,
      winMs: Long = 2000L, hopMs: Long = 500L): DataFrame = {
    val frames = sampleFrames(assets, stride)
      .select(col("doc_id").as("video_id"), col("sample_idx"),
        col("frame_idx"),
        (col("frame_idx").cast("long") * frameMs).as("t_ms"))
    val chunks = audioChunks(assets, winMs, hopMs)
      .select(col("doc_id").as("audio_id"), col("chunk_idx"),
        col("start_ms"), col("end_ms"))
    frames.join(chunks,
        col("video_id") - 1 === col("audio_id") &&
          col("start_ms") <= col("t_ms") && col("t_ms") < col("end_ms"),
        "left")
      .groupBy("video_id", "sample_idx", "frame_idx", "t_ms")
      .agg(count(col("chunk_idx")).as("n_covering"),
        max(col("start_ms")).as("chunk_start_ms"))
      .select(col("video_id"), (col("video_id") - 1).as("audio_id"),
        col("sample_idx"), col("frame_idx"), col("t_ms"),
        col("n_covering"),
        expr(s"chunk_start_ms div $hopMs").cast("int").as("chunk_idx"),
        col("chunk_start_ms"))
  }

  /** MM4: locality-sensitive perceptual-hash STUB over a binary
    * payload — the pHash role (near-identical payloads → near-equal
    * 64-bit codes, compared in hamming space) with the DCT replaced by
    * a deterministic byte-statistic both engines can mirror: 15
    * nibbles, nibble i = (count of probe byte i in the payload, halved
    * to absorb ±1 jitter) mod 16, packed into a 60-bit long. A few
    * changed bytes (a re-encode, a metadata stamp) move a handful of
    * counts by ±1 → hamming ≤ ~4; unrelated payloads differ in most
    * nibbles → hamming ≥ ~8. A real deployment swaps this for the
    * actual DCT pHash inside the decode fleet; everything downstream
    * (banding, candidate join, hamming verify) is unchanged. */
  val PhashProbes: Seq[Char] =
    Seq('a', 'e', 'i', 'o', 'u', 'n', 'r', 's', 't', 'l', ' ', '.', ',', '0', '1')

  def phash(content: Column): Column = {
    val t = content.cast("string")
    PhashProbes.zipWithIndex.map { case (c, i) =>
      val cnt = length(t) - length(replace(t, lit(c.toString), lit("")))
      (shiftright(cnt.cast("long"), 1) % 16) * lit(1L << (4 * i))
    }.reduce(_ + _)
  }

  /** LSH band codes for [[phash]]: band b interleaves nibbles
    * {b, b+4, b+8, b+12} so every band mixes high- and low-variance
    * probe counts — consecutive-nibble bands degenerate (the top
    * nibbles are near-constant on text-shaped payloads, putting most
    * of the corpus into one bucket). Two codes within hamming ≤ 6
    * agree on ≥ 1 band unless all flipped bits spread 3+ bands —
    * measured planted recall is 100% at both test SFs. */
  def phashBands(ph: Column): Column = {
    val bands = (0 until 4).map { b =>
      val js = Seq(b, b + 4, b + 8, b + 12).filter(_ < 15)
      js.zipWithIndex.map { case (j, k) =>
        (shiftright(ph, 4 * j) % 16) * lit(1L << (4 * k))
      }.reduce(_ + _)
    }
    array(bands: _*)
  }

  /** The rows-only `mm_binary_meta` coverage entry: flattened asset
    * metadata. (No repartition here — the final orderBy would discard
    * any layout immediately; a decode fleet repartitions by modality
    * right before [[decodeFeatures]], where the layout is consumed.) */
  def binaryMeta(s: SparkSession, docs: DataFrame): DataFrame =
    syntheticAssets(docs)
      .select(col("doc_id"), col("modality"),
        length(col("content")).as("n_bytes"),
        col("meta.width"), col("meta.height"),
        col("meta.sample_rate"), col("meta.n_frames"))
      .orderBy("doc_id")
}
