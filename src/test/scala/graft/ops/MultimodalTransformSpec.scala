package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Multimodal.Media

/** Byte-level multimodal transforms (resize decimation, frame sampling):
  * exact output geometry and content, small payloads untouched.
  */
class MultimodalTransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(id: Long, n: Int): Media =
    Media(id, Array.tabulate(n)(i => (i % 251).toByte), "bin")

  test("resize decimates to at most targetBytes with the exact stride bytes") {
    val ds = Seq(media(1L, 1000), media(2L, 64), media(3L, 0)).toDS()
    val out = Multimodal.resize(ds, targetBytes = 100)
      .collect().map(m => m.id -> m.payload).toMap
    // n=1000, target=100 -> stride 10 -> bytes 0,10,20,...,990
    assert(out(1L).length === 100)
    assert(out(1L).toSeq === (0 until 1000 by 10).map(i => (i % 251).toByte))
    // already small payloads pass through untouched
    assert(out(2L).toSeq === media(2L, 64).payload.toSeq)
    assert(out(3L).isEmpty)
  }

  test("sampleFrames emits every k-th frame incl. the short tail") {
    val ds = Seq(media(7L, 1000)).toDS() // 10 full frames of 96 + tail of 40
    val frames = Multimodal.sampleFrames(ds, frameBytes = 96, everyK = 3)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq === Seq(0, 3, 6, 9))
    frames.foreach { f =>
      val from = f.frameIdx * 96
      val until = math.min(from + 96, 1000)
      assert(f.payload.toSeq ===
        (from until until).map(i => (i % 251).toByte), s"frame ${f.frameIdx}")
    }
    // tail frame (idx 10, 40 bytes) is not on the k-grid here; with k=5 it is
    val withTail = Multimodal.sampleFrames(ds, frameBytes = 96, everyK = 5)
      .collect().sortBy(_.frameIdx)
    assert(withTail.map(_.frameIdx).toSeq === Seq(0, 5, 10))
    assert(withTail.last.payload.length === 1000 - 10 * 96)
  }

  test("sampled bytes are 1/k of the input (the downstream-cost contract)") {
    val ds = (1L to 50L).map(i => media(i, 9600)).toDS()
    val total = Multimodal.sampleFrames(ds, frameBytes = 96, everyK = 4)
      .collect().map(_.payload.length.toLong).sum
    assert(total === 50L * 9600 / 4)
  }
}
