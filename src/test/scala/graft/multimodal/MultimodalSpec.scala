package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // binary payloads synthesized from text (no media files in testdata)
  private lazy val media = graft.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .limit(50)
    .select($"doc_id", encode($"text", "UTF-8").as("payload"))

  test("withMeta attaches kind/bytes/content_id struct") {
    val out = Multimodal.withMeta(media, "payload", "image")
    assert(out.schema("media_meta").dataType == Multimodal.metaSchema)
    val r = out.select("media_meta.kind", "media_meta.n_bytes").head()
    assert(r.getString(0) == "image" && r.getLong(1) > 0)
  }

  test("stub image decode: schema, determinism, feature shape") {
    val out = Multimodal.stubDecodeImage(media, "payload", dim = 16)
    val rows = out.select("doc_id", "width", "height", "channels", "features")
      .collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getInt(3) == 3))
    assert(rows.forall(_.getSeq[Float](4).length == 16))
    // determinism: same payload → same features
    val again = Multimodal.stubDecodeImage(media, "payload", dim = 16)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Float](4)))
  }

  test("stub resize clamps the longest side") {
    val out = Multimodal.stubResize(
      Multimodal.stubDecodeImage(media, "payload"), maxSide = 128)
    assert(out.select(greatest($"width", $"height")).collect()
      .forall(_.getInt(0) <= 128))
  }

  test("frame sampling explodes n rows per video with stable ids") {
    val out = Multimodal.stubFrameSample(media, "payload", n = 4)
    assert(out.count() == 200)
    val perDoc = out.groupBy("doc_id").agg(
      countDistinct("frame_idx").as("n"),
      countDistinct("frame_id").as("ids")).collect()
    assert(perDoc.forall(r => r.getLong(1) == 4L && r.getLong(2) == 4L))
  }

  test("decoded media features feed similarity search end-to-end") {
    val feats = Multimodal.stubDecodeImage(media, "payload", dim = 16)
      .select($"doc_id", $"features")
    val q = feats.filter($"doc_id" === feats.select(min($"doc_id")).head().getLong(0))
      .select($"features".cast("array<double>")).head().getSeq[Double](0)
    val topk = graft.operators.Similarity.cosineTopK(
      feats, "doc_id", "features", q, 5).collect()
    assert(topk.length == 5)
    // the query image itself ranks first with similarity 1.0
    assert(math.abs(topk.head.getDouble(1) - 1.0) < 1e-12)
  }
}
