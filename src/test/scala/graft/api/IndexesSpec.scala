package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.Encoders

/** Direct ports of the reference's index-layer unit tests against the
  * local backend (`/root/reference/arcon/src/index/value/mod.rs:98-143`
  * value put/get/take/clear/rmw; `arcon/src/index/appender/mod.rs:106+`
  * append/consume/len; hash-table ops
  * `arcon/src/index/hash_table/mod.rs`). The transformWithState backend
  * is exercised end-to-end by IndexOperatorSpec. */
class IndexesSpec extends SparkTestBase {

  private def state = new LocalIndexState

  test("value index: put/get/take/clear/rmw (index/value/mod.rs)") {
    val v = state.value[Long]("v")(Encoders.scalaLong)
    assert(v.get.isEmpty)
    v.put(10L)
    assert(v.get.contains(10L))
    assert(v.take().contains(10L)) // take = get + clear
    assert(v.get.isEmpty)
    // rmw from empty uses the default, then mutates in place
    assert(v.rmw(0L)(_ + 5L) == 5L)
    assert(v.rmw(0L)(_ + 5L) == 10L)
    assert(v.get.contains(10L))
    v.clear()
    assert(v.get.isEmpty)
  }

  test("appender index: append/get/len/consume (index/appender/mod.rs)") {
    val a = state.appender[Long]("a")(Encoders.scalaLong)
    assert(a.get.isEmpty && a.length == 0)
    (1L to 5L).foreach(a.append)
    assert(a.length == 5)
    assert(a.get == Seq(1L, 2L, 3L, 4L, 5L)) // insertion order
    assert(a.consume() == Seq(1L, 2L, 3L, 4L, 5L)) // drain
    assert(a.get.isEmpty && a.length == 0)
  }

  test("map index: put/get/remove/contains/entries (index/hash_table)") {
    val m = state.map[String, Long]("m")(Encoders.STRING, Encoders.scalaLong)
    assert(m.get("x").isEmpty && !m.contains("x"))
    m.put("x", 1L)
    m.put("y", 2L)
    m.put("x", 3L) // overwrite
    assert(m.get("x").contains(3L) && m.contains("y"))
    assert(m.entries.toMap == Map("x" -> 3L, "y" -> 2L))
    m.remove("x")
    assert(m.get("x").isEmpty)
    m.clear()
    assert(m.entries.isEmpty)
  }
}
