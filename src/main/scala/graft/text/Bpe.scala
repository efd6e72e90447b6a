package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftColumnAccess}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, BpeTable}

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909 §3.2): learn `nMerges` symbol merges from the
  * corpus, then segment every word greedily with the learned table.
  * This completes the tokenizer-training story whose round-1 statistic
  * is `Curation.topNgrams` (the most frequent adjacent pair IS merge
  * #1 at the word level).
  *
  * Scale design, exactly the published algorithm's split: BPE training
  * operates on the WORD-FREQUENCY DICTIONARY, not the corpus — so the
  * only corpus-scale work is one map-side-combinable word-count
  * aggregate; the dictionary (vocabulary-sized, cardinality-guarded
  * like Encode's distinct guard) is collected and the merge loop runs
  * driver-side over it (each of the nMerges rounds is O(dict) — the
  * corpus is never touched again). Application is scan-local: the
  * merge table broadcasts inside the native `bpe_encode` expression
  * (codegen reference object), so segmentation runs at read bandwidth
  * with zero shuffle.
  */
object Bpe {

  /** End-of-word marker, Sennrich's `</w>`. */
  val EndOfWord = "</w>"

  /** Learn `nMerges` merges from the corpus's word-frequency
    * dictionary. Deterministic: the best pair maximizes summed word
    * frequency, ties break on the lexicographically smallest (left,
    * right). Stops early when no adjacent pair remains. `maxVocab`
    * guards the driver-side dictionary collect. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 200000): BpeTable = {
    val dictDf = df
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = dictDf.count()
    require(n <= maxVocab,
      s"word dictionary has $n entries > maxVocab $maxVocab; " +
        "raise maxVocab or pre-normalize the corpus")
    val dict = dictDf.collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnDict(dict, nMerges)
  }

  /** The driver-side merge loop over a (word, count) dictionary —
    * public so specs can replay the classic hand example. */
  def trainOnDict(dict: Array[(String, Long)], nMerges: Int): BpeTable = {
    // each word as its current symbol sequence (chars + </w>)
    val words = dict.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val merges = Vector.newBuilder[(String, String)]
    var cur = words
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (bl, br) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += ((bl, br))
        cur = cur.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
                out += bl + br; i += 2
              } else {
                out += syms(i); i += 1
              }
            }
            (out.result(), c)
          }
        }
        round += 1
      }
    }
    new BpeTable(merges.result().toArray)
  }

  /** The learned merges as a frame: (rank, left, right) — the
    * dump-replay artifact (rank order IS application priority). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
      table: BpeTable): DataFrame = {
    import spark.implicits._
    table.pairs.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }.toSeq
      .toDF("rank", "left", "right")
  }

  /** BPE segmentation of one word column via the native expression. */
  def bpeEncode(word: Column, table: BpeTable): Column =
    GraftColumnAccess.column(
      BpeEncode(GraftColumnAccess.expression(word), table))

  /** Per-document segmentation: every token's BPE pieces, flattened in
    * order. Scan-local (one codegen'd transform over the token array;
    * the table is a broadcast-by-reference codegen object). */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
      table: BpeTable): DataFrame = {
    val tok = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
    tok.select(col(idCol),
      flatten(transform(col("__w"), w => bpeEncode(w, table))).as("pieces"))
  }

  /** Per-document BPE statistics: whitespace-token count, BPE-piece
    * count, the implied fertility (pieces per word), all from one
    * scan-local projection. */
  def pieceStats(df: DataFrame, idCol: String, textCol: String,
      table: BpeTable): DataFrame = {
    // exactly one piece per word carries the terminal </w> (the marker
    // only ever merges rightward), so counting them recovers n_words
    val words = size(filter(col("pieces"), p => p.endsWith(EndOfWord)))
    encodeDocs(df, idCol, textCol, table)
      .select(col(idCol),
        words.cast("long").as("n_words"),
        size(col("pieces")).cast("long").as("n_pieces"),
        round(size(col("pieces")) / words, 6).as("fertility"))
  }
}
