package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Lookup join — point lookups into an external keyed table per input
  * row (reference StreamExecLookupJoin.java:43 / LookupJoinRunner with
  * sync lookup + LRU cache).
  *
  * Two strategies, chosen by the caller:
  *  - [[broadcastLookup]]: when the dimension fits in memory, a plain
  *    broadcast-hash join — Spark-first and nearly always right.
  *  - [[partitionedLookup]]: when it doesn't, co-partition both sides
  *    on the key (one shuffle each) so each partition only holds its
  *    slice of the dimension in a hash map — the distributed analog of
  *    the reference's per-task lookup cache. No driver collection at
  *    any size.
  */
object LookupJoin {

  def broadcastLookup(input: DataFrame, dim: DataFrame, key: String): DataFrame =
    input.join(broadcast(dim), Seq(key), "left")

  /** Per-partition cached lookup against an external point-lookup
    * function (the reference's sync LookupJoinRunner + LRU cache):
    * each partition keeps an LRU of `cacheSize` keys so repeated keys
    * hit the cache instead of the external system. `fetch` runs on
    * executors — it must construct its own connection (per partition).
    */
  def cachedLookup[T, K, V, U](
      ds: org.apache.spark.sql.Dataset[T],
      keyFn: T => K,
      fetch: K => V,
      cacheSize: Int
  )(combine: (T, V) => U)(implicit enc: org.apache.spark.sql.Encoder[U]): org.apache.spark.sql.Dataset[U] =
    ds.mapPartitions { rows =>
      // per-partition connection/cache init happens here
      val lru = new java.util.LinkedHashMap[K, V](cacheSize, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > cacheSize
      }
      rows.map { t =>
        val k = keyFn(t)
        val v = lru.get(k) match {
          case null =>
            val fetched = fetch(k)
            lru.put(k, fetched)
            fetched
          case hit => hit
        }
        combine(t, v)
      }
    }

  def partitionedLookup(
      input: DataFrame,
      dim: DataFrame,
      key: String,
      numPartitions: Int
  ): DataFrame = {
    val in = input.repartition(numPartitions, col(key))
    val dm = dim.repartition(numPartitions, col(key))
    // zipped per-partition hash lookup via cogroup on the keyed rows
    val joinedSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields ++ dm.schema.fields.filter(_.name != key)
    )
    val dimCols = dm.schema.fieldNames.filter(_ != key)
    val keyIdxIn = in.schema.fieldIndex(key)
    val keyIdxDim = dm.schema.fieldIndex(key)
    val dimIdxs = dimCols.map(dm.schema.fieldIndex)
    val rdd = in.rdd
      .keyBy(_.get(keyIdxIn))
      .cogroup(dm.rdd.keyBy(_.get(keyIdxDim)), numPartitions)
      .flatMap { case (_, (inputRows, dimRows)) =>
        val dimVals = dimRows.headOption.map(r => dimIdxs.map(r.get))
        inputRows.map { r =>
          val extra = dimVals.getOrElse(dimIdxs.map(_ => null))
          Row.fromSeq(r.toSeq ++ extra)
        }
      }
    input.sparkSession.createDataFrame(rdd, joinedSchema)
  }
}
