package graft.operators

import org.apache.spark.sql.DataFrame

/** Co-located (bucketed) joins — the 100 TB technique for repeated
  * equi-joins on the same key: persist both sides hash-bucketed (and
  * bucket-sorted) on the join key, and every subsequent join between
  * them runs with ZERO exchange — each task reads matching bucket files
  * from both tables and merges. The shuffle is paid once at write time
  * and amortized over every join that follows, which is exactly the
  * shape of a fact table joined nightly against the same dimensions.
  *
  * (The reference keeps state pre-partitioned by key hash for the same
  * reason — `max_key` sharding in `arcon/src/dataflow/conf.rs` — this is
  * the storage-layer expression of that idea.)
  */
object CoLocate {

  /** Persist `df` as a parquet table bucketed AND bucket-sorted on
    * `key` into `nBuckets` buckets, registered as `table` in the session
    * catalog. Joins between tables written with the same (key, nBuckets)
    * need no exchange and no per-task sort. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)
}
