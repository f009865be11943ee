package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("imageFeatures: deterministic stub decode with typed schema") {
    val df = Seq((1L, "abcd"), (2L, "a" * 100)).toDF("id", "txt")
      .select($"id", encode($"txt", "UTF-8").as("bin"))
    val feats = Multimodal.imageFeatures(df, "id", "bin").collect().sortBy(_.media_id)
    assert(feats.length == 2)
    val f1 = feats(0)
    assert(f1.media_id == 1L && f1.width == 2 && f1.height == 2 && f1.channels == 1)
    assert(f1.mean_intensity == ('a' + 'b' + 'c' + 'd').toDouble / 4.0)
    assert(f1.histogram.sum == 4)
    val f2 = feats(1)
    assert(f2.width == 10 && f2.height == 10)
    assert(f2.mean_intensity == 'a'.toDouble)
  }

  test("frameSample: strided fixed-size frames") {
    val df = Seq((7L, "x" * 300)).toDF("id", "txt")
      .select($"id", encode($"txt", "UTF-8").as("bin"))
    // 300 bytes -> frames of 64: [64,64,64,64,44]; stride 2 -> frames 0,2,4
    val frames = Multimodal.frameSample(df, "id", "bin", frameSize = 64, stride = 2)
      .select($"frame_no", length($"frame_bytes")).as[(Int, Int)].collect().sorted
    assert(frames.toSeq == Seq((0, 64), (2, 64), (4, 44)))
  }
}
