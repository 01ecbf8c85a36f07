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

  test("sampleFrames: empty payload yields zero frames, not a backwards sequence") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val withBin = BinaryOps.withPayload(empty, "text", "payload")
    assert(BinaryOps.sampleFrames(withBin, "doc_id", "payload",
      frameLen = 3, every = 2).count() === 0L)
  }
}
