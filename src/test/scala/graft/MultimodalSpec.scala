package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.fromText(
    Tables.table(spark, TestSpark.Sf, "documents"), "doc_id", "text", "source").persist()

  test("fromText: canonical schema, byte_len matches payload size") {
    assert(media.schema == Multimodal.MediaSchema)
    val bad = media.filter(length($"payload") =!= $"meta.byte_len").count()
    assert(bad == 0)
  }

  test("decodeStub: deterministic, fixed dim, values in [0,1]") {
    val a = Multimodal.decodeStub(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Multimodal.decodeStub(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "stub decode must be deterministic")
    assert(a.values.forall(_.length == 8))
    assert(a.values.forall(_.forall(f => f >= 0.0 && f <= 1.0)))
    // partition count must not change results
    val c = Multimodal.decodeStub(media.repartition(7), dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == c, "stub decode must be partitioning-invariant")
  }

  test("sampleFrames: stride-1 frames reassemble the payload") {
    val one = media.limit(1).persist()
    val orig = new String(one.select($"payload").as[Array[Byte]].head())
    val frames = Multimodal.sampleFrames(one, frameBytes = 32, stride = 1)
      .orderBy($"frame_idx")
      .select($"frame").as[Array[Byte]].collect()
    assert(frames.map(new String(_)).mkString == orig)
  }
}
