package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Byte→record decoding for byte-oriented sources (Kafka `value` columns)
  * — the analog of the reference's `SourceSchema` implementations
  * (`/root/reference/arcon/src/stream/source/schema.rs:4-104`):
  * `JsonSchema` ≙ `from_json`, `ProtoSchema` ≙ spark-protobuf's
  * `from_protobuf` (not bundled in this build; the JSON path carries the
  * contract). Decode failures yield null records, which [[decoded]] drops
  * — matching the reference's report-not-fail source behavior
  * (`arcon/src/stream/source/local_file.rs`).
  */
object SourceSchemas {

  /** JSON value decode: binary/string column → struct of `schema`. */
  def jsonValue(value: Column, schema: StructType): Column =
    from_json(value.cast("string"), schema)

  /** Kafka frame → typed rows: decode `value` as JSON, drop undecodable
    * records, flatten the struct to top-level columns. PERMISSIVE
    * `from_json` yields an all-null-fields struct (not a null struct)
    * for malformed input, so "undecodable" = null struct OR no field
    * decoded; a record whose every field is genuinely null is
    * indistinguishable from garbage and is dropped too. */
  def decoded(kafkaFrame: DataFrame, schema: StructType): DataFrame =
    kafkaFrame
      .select(jsonValue(col("value"), schema).as("r"))
      .filter(col("r").isNotNull &&
        schema.fieldNames.map(f => col("r").getField(f).isNotNull)
          .reduce(_ || _))
      .select(col("r.*"))

  /** CSV-ish single-line decode via from_csv (bonus surface). */
  def csvValue(value: Column, schema: StructType): Column =
    from_csv(value.cast("string"), schema, Map.empty[String, String])

  /** Protobuf value decode (`ProtoSchema` analog): flat proto3 message
    * bytes → struct via [[ProtoDecode.protoValue]]. */
  def protoValue(value: Column, fields: Seq[ProtoField]): Column =
    ProtoDecode.protoValue(value, fields)

  /** Kafka frame → typed rows via protobuf decode; malformed messages
    * (null struct) are dropped — the report-not-fail contract. */
  def decodedProto(kafkaFrame: DataFrame, fields: Seq[ProtoField]): DataFrame =
    kafkaFrame
      .select(protoValue(col("value"), fields).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))
}
