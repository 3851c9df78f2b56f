package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Spec for `mm_batch_pipeline` (SURVEY §2.6): the batching contract —
  * decode sees batches of ≤ BatchSize, every row is processed exactly
  * once, features are a deterministic function of the payload.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batch pipeline: every row processed once, batches bounded by BatchSize") {
    val media = Multimodal.mediaDataset(Tables.documents(spark, TestSpark.sf))
      .repartition(3)
    val out = Multimodal.batchPipeline(media).collect()
    assert(out.length == 500)
    assert(out.map(_.media_id).distinct.length == 500)
    assert(out.forall(f => f.batch_size > 0 && f.batch_size <= Multimodal.BatchSize))
    // full batches dominate: rows per partition >> BatchSize
    assert(out.count(_.batch_size == Multimodal.BatchSize) > out.length / 2)
  }

  test("stub decode is deterministic and byte-exact") {
    val payload = "hello".getBytes("UTF-8")
    val row = graft.operators.MediaRow(7L, "image", payload, 64, 64, 0)
    val f = Multimodal.stubDecode(Seq(row)).head
    val expectedSum = payload.map(_ & 0xff).sum.toLong // h+e+l+l+o = 532
    assert(f.n_bytes == 5L && f.byte_sum == expectedSum)
    assert(f.f0 == (expectedSum % 1000) / 1000.0)
    assert(f.f1 == expectedSum.toDouble / 5)
    assert(Multimodal.stubDecode(Seq(row)).head == f)
  }

  test("decoder seam: a second decoder drops into the same plumbing unchanged") {
    // proves the injection point is real: a different (still
    // deterministic) decode kernel rides the identical batching/
    // partitioning and only the FEATURES change — what swapping in a
    // JNI/ONNX codec would look like
    object XorDecoder extends Multimodal.MediaDecoder {
      def decode(batch: Seq[graft.operators.MediaRow]): Seq[graft.operators.MediaFeatures] =
        batch.map { m =>
          var x = 0L; var i = 0
          while (i < m.payload.length) { x ^= (m.payload(i) & 0xffL) << (i % 48); i += 1 }
          graft.operators.MediaFeatures(m.media_id, m.kind, batch.size,
            m.payload.length.toLong, x, f0 = (x % 7919) / 7919.0, f1 = -1.0)
        }
    }
    val media = Multimodal.mediaDataset(Tables.documents(spark, TestSpark.sf)).repartition(3)
    val out = Multimodal.batchPipeline(media, XorDecoder).collect()
    // same batching contract as the stub path...
    assert(out.length == 500 && out.map(_.media_id).distinct.length == 500)
    assert(out.forall(f => f.batch_size > 0 && f.batch_size <= Multimodal.BatchSize))
    // ...but the features are THIS decoder's, computed inside the executors
    assert(out.forall(_.f1 == -1.0))
    val one = out.find(_.n_bytes > 0).get
    val local = media.filter(_.media_id == one.media_id).head()
    assert(XorDecoder.decode(Seq(local)).head.byte_sum == one.byte_sum)
    // frame pipeline takes the same seam
    val frames = Multimodal.framePipeline(media, framesPerVideo = 4, XorDecoder)
    assert(frames.take(5).forall(_.f1 == -1.0))
  }

  test("stub resize is deterministic and honors the thumbnail byte budget") {
    val m = graft.operators.MediaRow(1L, "image", Array.tabulate[Byte](1000)(_.toByte), 640, 480, 0)
    val r = Multimodal.stubResize(m, 64, 64)
    assert(r.width == 64 && r.height == 64)
    assert(r.payload.length <= m.payload.length)
    assert(Multimodal.stubResize(m, 64, 64).payload.toSeq == r.payload.toSeq)
  }

  test("frame pipeline expands videos to n frames, passes others through") {
    val media = Multimodal.mediaDataset(Tables.documents(spark, TestSpark.sf))
    val videos = media.filter(_.kind == "video").count()
    val others = media.filter(_.kind != "video").count()
    val frames = Multimodal.framePipeline(media, framesPerVideo = 4).count()
    assert(frames == videos * 4 + others)
  }

  test("binary metadata: byte length equals UTF-8 length, kinds cycle") {
    val meta = Multimodal.binaryMeta(Tables.documents(spark, TestSpark.sf)).collect()
    assert(meta.map(_.getString(1)).toSet == Set("image", "audio", "video"))
    // audio rows (doc_id % 3 == 1) carry a sample rate, others don't
    meta.foreach { r =>
      val isAudio = r.getLong(0) % 3 == 1
      assert(r.getInt(5) == (if (isAudio) 16000 else 0))
    }
  }
}
