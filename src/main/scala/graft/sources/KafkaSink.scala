package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K6 Kafka sink serialization — the analog of the reference's
  * `KafkaSink`, which JSON-serializes each element into the record value
  * (`/root/reference/arcon/src/stream/operator/sink/kafka.rs:15-94`,
  * serde_json at :72-80). Spark's kafka writer consumes a frame with
  * `key`/`value` binary (or string) columns; this object builds that
  * projection declaratively so it is unit-testable without a broker and
  * stays inside whole-stage codegen (`to_json` is a native expression).
  */
object KafkaSink {

  /** Serialize every column of `df` into a JSON `value`; `key` is the
    * given column (stringified) or null — matching the reference sink,
    * which produces unkeyed JSON records. */
  def projection(df: DataFrame, keyCol: Option[Column] = None): DataFrame = {
    val value = to_json(struct(df.columns.map(col): _*)).as("value")
    keyCol match {
      case Some(k) => df.select(k.cast("string").as("key"), value)
      case None    => df.select(lit(null).cast("string").as("key"), value)
    }
  }
}
