package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image of a cat"), (1L, "some audio transcript"),
    (2L, "a video with frames"), (3L, "another longer document text payload here")
  ).toDF("doc_id", "text")

  test("binary payload plumbing: decode stub is deterministic and typed") {
    val media = MultimodalOps.mediaFromDocs(docs, "doc_id", "text")
    val meta1 = MultimodalOps.decodeMeta(media).collect().sortBy(_.media_id)
    val meta2 = MultimodalOps.decodeMeta(media).collect().sortBy(_.media_id)
    assert(meta1.toSeq == meta2.toSeq) // deterministic
    meta1.foreach { m =>
      assert(m.byte_len > 0 && m.width >= 16 && m.height >= 16 && m.n_frames >= 1)
    }
    // payload length equals utf8 byte length of the source text
    val lens = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    meta1.foreach(m => assert(m.byte_len == lens(m.media_id)))
  }

  test("frame sampling explodes only video rows, after decode") {
    val media = MultimodalOps.mediaFromDocs(docs, "doc_id", "text")
    val meta = MultimodalOps.decodeMeta(media)
    val frames = MultimodalOps.sampleFrames(meta, stride = 10)
    val perKind = meta.toDF().select("media_id", "kind", "n_frames").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val videos = perKind.filter(_._2 == "video")
    val got = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == videos.map(_._1).toSet)
    videos.foreach { case (id, _, nf) =>
      assert(got(id) == (nf + 9) / 10) // ceil(n_frames / stride)
    }
  }
}
