package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the
  * tokenizer-training pass every LLM data pipeline runs before
  * tokenizing a corpus).
  *
  * Scale shape: BPE statistics live on the WORD VOCABULARY, not the
  * corpus — one full-corpus pass aggregates (word → count), collapsing
  * 100 TB of text to the distinct-word table, and every merge round
  * after that touches only the vocab. Each round is one distributed
  * pair-count aggregation (flatMap adjacent pairs weighted by word
  * count → groupBy → 1-row argmax collect — the same size-independent
  * driver scalar as the IVF codebook) followed by a vocab-wide map
  * that applies the merge. Lineage is truncated with localCheckpoint
  * every few rounds (the Iterations pattern) so k rounds never
  * re-execute round 1.
  *
  * Determinism: the argmax tie-break is total (freq DESC, left ASC,
  * right ASC), so the merge table is a pure function of the corpus —
  * independent of partitioning and cluster size (BpeSpec pins both
  * against a sequential reference implementation).
  */
object Bpe {

  final case class VocabWord(symbols: Seq[String], count: Long)
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Greedy left-to-right application of one merge to a symbol
    * sequence — the standard BPE replacement rule.
    */
  def applyMerge(sym: Seq[String], l: String, r: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` BPE merges from a (word, cnt) vocabulary
    * DataFrame. Words are split to character symbols (no end-of-word
    * marker — documented choice, same statistics either way for the
    * merge ranking). Stops early when no adjacent pair remains.
    */
  def train(vocabDf: DataFrame, numMerges: Int): Seq[Merge] = {
    val spark = vocabDf.sparkSession
    import spark.implicits._
    implicit val vwEnc = Encoders.product[VocabWord]

    var vocab: Dataset[VocabWord] = vocabDf
      .select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => VocabWord(w.map(_.toString), c) }
    vocab = vocab.localCheckpoint()

    val merges = ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = vocab
        .flatMap { v =>
          if (v.symbols.length < 2) Iterator.empty
          else v.symbols.iterator.zip(v.symbols.iterator.drop(1))
            .map { case (a, b) => (a, b, v.count) }
        }
        .toDF("left", "right", "w")
        .groupBy(col("left"), col("right"))
        .agg(sum(col("w")).as("freq"))
        .orderBy(col("freq").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, f)
        vocab = vocab.map(v => VocabWord(applyMerge(v.symbols, l, r), v.count))
        // truncate lineage so round k doesn't replay rounds 0..k-1
        if ((rank + 1) % 4 == 0) vocab = vocab.localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Sequential reference implementation over an in-memory vocab — the
    * spec's ground truth (identical rules, no Spark).
    */
  def trainReference(vocab: Map[String, Long], numMerges: Int): Seq[Merge] = {
    var v: Map[Seq[String], Long] =
      vocab.groupMapReduce { case (w, _) => w.map(_.toString): Seq[String] } {
        case (_, c) => c
      }(_ + _)
    val merges = ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (sym, c) =>
        sym.iterator.zip(sym.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, l, r, f)
        v = v.groupMapReduce { case (sym, _) => applyMerge(sym, l, r) } {
          case (_, c) => c
        }(_ + _)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** The full operator: corpus → word counts → merge table DataFrame
    * (rank, left, right, freq).
    */
  def trainFromDocuments(spark: SparkSession, documents: DataFrame,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    val words = documents
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    train(words, numMerges)
      .toDF()
      .select(col("rank"), col("left"), col("right"), col("freq"))
  }

  /** Encode a word with a learned merge table: apply each rule in rank
    * order (the standard BPE encode; one left-to-right pass per rule
    * reaches that rule's fixpoint because a merged token can never
    * re-match its own rule).
    */
  def applyMerges(word: String, rules: Seq[(String, String)]): Seq[String] = {
    var sym: Seq[String] = word.map(_.toString)
    rules.foreach { case (l, r) => sym = applyMerge(sym, l, r) }
    sym
  }

  /** Tokenize the corpus with a learned merge table — the companion
    * encode pass. The rules ride the UDF closure (broadcast to every
    * executor once); the scan stays a single shuffle-on-doc_id
    * aggregation, so the pass is embarrassingly parallel at 100 TB.
    * The UDF is justified: rank-ordered merge application is
    * inherently procedural (no Column-algebra equivalent).
    */
  def tokenize(documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val rules = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val nTok = udf((w: String) => applyMerges(w, rules).length)
    documents
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(col("doc_id"), nTok(col("word")).as("n_tok"),
        length(col("word")).as("n_sym"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n_tok")).as("n_bpe_tokens"),
        sum(col("n_sym")).as("n_char_symbols"))
  }
}
