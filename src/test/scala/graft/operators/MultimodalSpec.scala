package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Edge cases the mm-series oracles can't reach: the stub codec never
  * returns zero frames and the oracle corpus has no null media. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("sampleFrames: zero-frame media emits zero rows instead of crashing on inverted sequence bounds") {
    val meta = Seq((1L, 0), (2L, 5), (3L, 1))
      .toDF("doc_id", "n_frames")
    val out = Multimodal.sampleFrames(meta, "doc_id", stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(!out.map(_._1).contains(1L), "zero-frame doc must emit no rows")
    assert(out.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0, 2, 4))
    assert(out.filter(_._1 == 3L).map(_._2).toSeq == Seq(0))
  }

  test("decodeMeta: null media drops before the codec instead of NPE-ing the partition") {
    val df = Seq(
      (1L, Option("abc".getBytes("UTF-8"))),
      (2L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = Multimodal.decodeMeta(df, "doc_id", "media")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }
}
