package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-relevant properties of the corpus-prep operators that the
  * row-level oracle can't express:
  *  - the global shuffle must emit an exact permutation 1..N and be
  *    bit-identical across input partitionings (a re-run on a
  *    different cluster layout must produce the same training order);
  *  - hash sampling must be partitioning-invariant for the same reason;
  *  - sequence packing must conserve tokens and emit contiguous
  *    sequence ids per shard (no lost or duplicated documents when
  *    shards are processed independently).
  */
class PipelineSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.get

  test("global shuffle is a permutation and invariant to input partitioning") {
    val base = CacheScope.scoped {
      SparkEntry.queries("q_shuffle_global")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
    }
    val n = base.length
    assert(base.map(_._2).sorted.toSeq == (1L to n).toSeq, "pos must be 1..N")

    // same query over a deliberately different partitioning of the
    // same rows: the hash keys don't change, so neither may the order
    val docs = Engine.Tables(spark, dir).documents.repartition(7, col("lang"))
    val mix = pmod(
      pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L) + lit(12345L),
      lit(1000003L))
    val again = CacheScope.scoped {
      val keyed = docs.withColumn("m", mix).select(col("doc_id"), col("m"))
      val (ranked, _) =
        plans.DistributedRank.globalRank(keyed, "pos", col("m"), col("doc_id"))
      ranked.select(col("doc_id"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(again.toMap == base.toMap,
      "shuffle order changed under a different input partitioning")
  }

  test("hash sampling keeps the same rows under repartitioning") {
    val a = CacheScope.scoped {
      SparkEntry.queries("q_sample_bernoulli")(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val mix = pmod(
      pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L) + lit(12345L),
      lit(1000003L))
    val b = Engine.Tables(spark, dir).documents
      .repartition(13)
      .filter(mix % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample membership must be a pure function of the key")
  }

  test("sequence packing conserves tokens and emits contiguous seq ids") {
    val t = Engine.Tables(spark, dir)
    val perSource = t.documents
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val packed = CacheScope.scoped {
      SparkEntry.queries("q_pack_sequences")(spark, dir).collect()
    }
    val bySource = packed.groupBy(_.getString(0))
    assert(bySource.keySet == perSource.keySet)
    bySource.foreach { case (src, rows) =>
      val tokens = rows.map(_.getLong(3)).sum
      assert(tokens == perSource(src), s"$src lost/duplicated tokens")
      val ids = rows.map(_.getLong(1)).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"$src seq ids not contiguous: $ids")
      rows.foreach(r => assert(r.getLong(2) >= 1, "every sequence holds >= 1 doc"))
    }
  }

  test("DSIR importance ratios prefer target-like documents") {
    // the selector's purpose, not its arithmetic (the oracle pins
    // that): docs FROM the target slice must score higher on average
    // than raw docs, and the keep set must be en-enriched vs the corpus
    val t = Engine.Tables(spark, dir)
    val scored = CacheScope.scoped {
      SparkEntry.queries("q_select_dsir")(spark, dir)
        .join(t.documents.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("lang"), col("avg_logratio"), col("keep"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    }
    val (en, rest) = scored.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._2).sum / en.length
    val restMean = rest.map(_._2).sum / rest.length
    assert(enMean > restMean,
      s"target slice must score higher: en=$enMean rest=$restMean")
    val keepEnFrac = {
      val k = scored.filter(_._3); k.count(_._1 == "en").toDouble / k.length
    }
    val corpusEnFrac = en.length.toDouble / scored.length
    assert(keepEnFrac > corpusEnFrac,
      s"keep set must be en-enriched: $keepEnFrac vs corpus $corpusEnFrac")
  }
}
