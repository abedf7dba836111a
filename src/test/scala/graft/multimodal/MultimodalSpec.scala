package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Specs for D12: multimodal binary columns, typed metadata, and the
  * stubbed decode path's plumbing (schema, batch shape, determinism). */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("D12: synthetic assets carry opaque binary content and typed metadata") {
    val assets = Multimodal.syntheticAssets(docs).cache()
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(assets.schema) === shape(Multimodal.assetSchema))
    assert(assets.count() === docs.count())
    val mods = assets.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods === Multimodal.Modalities.toSet)
    assert(assets.filter(col("content").isNull || length(col("content")) === 0).count() === 0)
    assets.unpersist()
  }

  test("D12: decode stub preserves rows, emits fixed-dim features, and is deterministic") {
    val assets = Multimodal.syntheticAssets(docs)
    val feats = Multimodal.decodeFeatures(assets).cache()
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(feats.schema) === shape(Multimodal.featureSchema))
    assert(feats.count() === docs.count())
    assert(feats.filter(size(col("feature")) =!= 8).count() === 0)
    // deterministic: two runs agree exactly
    val again = Multimodal.decodeFeatures(assets)
    val joined = feats.as("a").join(again.as("b"), Seq("doc_id"))
      .filter(col("a.n_bytes") =!= col("b.n_bytes") ||
        col("a.feature") =!= col("b.feature"))
    assert(joined.count() === 0)
    feats.unpersist()
  }

  test("D12: resize stub stamps new dimensions and normalizes payload size") {
    val assets = Multimodal.syntheticAssets(docs)
    val resized = Multimodal.resizeStub(assets, 32, 32).cache()
    assert(resized.filter(col("meta.width") =!= 32 || col("meta.height") =!= 32).count() === 0)
    assert(resized.filter(length(col("content")) =!= 32 * 32).count() === 0)
    resized.unpersist()
  }

  test("D12: frame sampling explodes every stride-th frame of video assets") {
    val assets = Multimodal.syntheticAssets(docs)
    val frames = Multimodal.sampleFrames(assets, stride = 10).cache()
    val videos = assets.filter(col("modality") === "video")
    assert(frames.select("doc_id").distinct().count() === videos.count())
    assert(frames.filter(col("frame_idx") % 10 =!= 0).count() === 0)
    // per-doc sample count = ceil(n_frames / 10)
    val bad = frames.groupBy("doc_id").agg(
      count(lit(1)).as("n"), first("n_frames").as("nf"))
      .filter(col("n") =!= ceil(col("nf") / 10.0).cast("long"))
    assert(bad.count() === 0)
    frames.unpersist()
  }

  test("D12: n_bytes matches the payload length") {
    val assets = Multimodal.syntheticAssets(docs)
    val feats = Multimodal.decodeFeatures(assets)
    val bad = feats.join(assets.select(col("doc_id"), length(col("content")).as("len")), Seq("doc_id"))
      .filter(col("n_bytes") =!= col("len"))
    assert(bad.count() === 0)
  }

  test("MM4: phash is local — a 3-byte payload stamp moves at most 4 of 60 bits") {
    val ham = docs.select(
      bit_count(Multimodal.phash(col("text").cast("binary")).bitwiseXOR(
        Multimodal.phash(concat(col("text"), lit(" v2")).cast("binary"))))
        .as("ham"))
    val worst = ham.agg(max("ham")).head().getInt(0)
    assert(worst <= 4, s"mutation moved $worst bits")
  }

  test("MM4: the near-dup entry finds every planted mutation under the threshold") {
    val out = graft.SparkEntry.queries("mm_phash_neardup")(spark, sf).cache()
    val expected = docs.filter(col("doc_id") % 50 === 0).count()
    assert(out.filter(col("is_planted")).count() === expected,
      s"expected $expected planted pairs")
    assert(out.filter(col("hamming") > 6).count() === 0)
    // banding is a candidate FILTER, not a hamming oracle: every
    // reported pair must genuinely verify, planted or not
    assert(out.filter(col("is_planted")).agg(max("hamming")).head().getInt(0) <= 4)
    out.unpersist()
  }

  test("MM5: every chosen chunk really covers its frame; nulls mean zero cover") {
    val rows = Multimodal.avAlign(
      Multimodal.syntheticAssets(graft.Tables.documents(spark, sf)),
      stride = 2, frameMs = 1L, winMs = 8L, hopMs = 3L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val covered = r.getAs[Long]("n_covering") > 0
      assert(covered === !r.isNullAt(r.fieldIndex("chunk_idx")),
        "n_covering and the chunk columns must agree")
      if (covered) {
        val t = r.getAs[Long]("t_ms"); val s0 = r.getAs[Long]("chunk_start_ms")
        assert(s0 <= t && t < s0 + 8, s"chosen chunk [$s0,+8) must cover t=$t")
        assert(r.getAs[Int]("chunk_idx") === (s0 / 3).toInt)
        assert(r.getAs[Long]("n_covering") <= 3,
          "win/hop = 8/3 bounds coverage at ceil(8/3) = 3")
      }
    }
    // the entry must exercise BOTH regimes: overlapping multi-cover and
    // the modality-length-mismatch tail
    assert(rows.exists(_.getAs[Long]("n_covering") >= 2))
    assert(rows.exists(_.getAs[Long]("n_covering") === 0))
  }

  test("MM5: one output row per sampled frame — alignment never fans out") {
    val assets = Multimodal.syntheticAssets(graft.Tables.documents(spark, sf))
    val aligned = Multimodal.avAlign(assets, 2, 1L, 8L, 3L)
    val frames = Multimodal.sampleFrames(assets, 2)
    assert(aligned.count() === frames.count(),
      "overlapping chunks must collapse to the argmax pick, not multiply rows")
    assert(aligned.select("video_id", "frame_idx").distinct().count() ===
      aligned.count())
  }
}
