package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINING at corpus scale — the learn
  * side of the tokenization story ([[TextSearch.buildVocab]] counts
  * whole tokens, [[TextSearch.encodeWithVocab]] applies an id map; this
  * learns the subword merge table itself, Sennrich et al. 2016).
  *
  * The 100 TB shape is the one production BPE trainers use: the corpus is
  * touched EXACTLY ONCE (tokenize → word-frequency table, one hash-agg
  * shuffle); every merge iteration then runs over the WORD TABLE — whose
  * size is the distinct-word vocabulary, not the corpus — as (1) an
  * adjacent-symbol-pair count weighted by word frequency, (2) a 1-row
  * collect of the argmax pair, (3) an in-row fold rewriting each word's
  * symbol array. Nothing after the first pass scales with corpus bytes;
  * driver traffic is one (pair, count) row per merge.
  *
  * Determinism: ties on pair count break lexicographically, the fold
  * merges leftmost-first within a word (the reference algorithm's
  * single-pass non-overlapping replacement), and nothing depends on
  * partitioning — byte-identical merges across cluster sizes. The word
  * table is `localCheckpoint`ed per iteration (the connectedComponents
  * lineage-truncation pattern) so plan depth stays constant. */
object Bpe {

  /** One merge step: rewrite `syms` replacing each non-overlapping,
    * leftmost-first adjacent `(a, b)` with the concatenation. The fold
    * carries (output-so-far, pending symbol); a pending `a` followed by
    * `b` flushes as the merged symbol, anything else flushes as itself.
    *
    * A terminator symbol (never a real symbol) is appended so the last
    * pending symbol flushes INSIDE the fold and the finish lambda can
    * project `out` alone — the fold result is referenced exactly once,
    * which keeps `merges.size`-deep [[segment]] chains LINEAR in tree
    * size (a multi-reference finish multiplies the tree per level and
    * blows up analysis). */
  private[operators] def mergePair(syms: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(
      concat(syms, array(lit(Terminator))),
      struct(empty.as("out"), lit(null).cast("string").as("prev")),
      (acc, x) => {
        val out = acc.getField("out"); val prev = acc.getField("prev")
        when(prev.isNotNull && prev === lit(a) && x === lit(b),
          struct(array_append(out, lit(a + b)).as("out"),
            lit(null).cast("string").as("prev")))
          .otherwise(struct(
            when(prev.isNull, out).otherwise(array_append(out, prev)).as("out"),
            x.as("prev")))
      },
      acc => acc.getField("out"))
  }

  /** Appended sentinel that flushes the fold's pending symbol; U+0000
    * cannot appear as a learned symbol (words come from `split` on
    * whitespace of real text). */
  private val Terminator = "\u0000"

  /** The corpus pass: lowercase whitespace words → frequency table with
    * each word as its character-symbol array: `(word, syms, freq)`. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))

  /** The per-iteration workhorse: adjacent-symbol pairs of the current
    * segmentation, weighted by word frequency — `(a, b, n)`. Runs over the
    * word table (vocabulary-sized), never the corpus. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("a"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("b"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("n"))

  /** Learn `numMerges` merges. Returns the ordered merge table and the
    * final symbolized word table `(word, syms, freq)` (the segmentation
    * every word ends with — join it back to encode a corpus). Stops early
    * when no adjacent pair occurs at least `minPairFreq` times. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairFreq: Long = 2L): (Seq[(String, String)], DataFrame) = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(minPairFreq >= 1L, "minPairFreq must be positive")
    var words = wordFrequencies(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = numMerges > 0
    while (continue) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minPairFreq) match {
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          words = words
            .withColumn("syms", mergePair(col("syms"), a, b))
            .localCheckpoint()
          continue = merges.size < numMerges
        case None => continue = false
      }
    }
    (merges.toSeq, words)
  }

  /** Segment arbitrary words with a learned merge table (applies every
    * merge in learned order — exactly the trainer's rewriting, so a word
    * seen in training segments identically). Column-level; intended for
    * WORD-grain frames (apply after a word-frequency collapse, not per
    * corpus row — the merge chain is `merges.size` nested folds). */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, ""): Column) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Encode a corpus into subword tokens with a trained table: words the
    * trainer saw join their stored segmentation; UNSEEN words are first
    * collapsed to the distinct-word grain and segmented there with
    * [[segment]] (the merge chain runs once per new word, never per
    * corpus occurrence). Output one row per subword:
    * `(id, word_pos, sub_pos, subword)` — both positions 0-based, so
    * (word_pos, sub_pos) orders the stream within a document.
    *
    * The segmentation table is vocabulary-sized; Spark broadcasts it when
    * it fits, and the join key is the word either way — no corpus-grain
    * shuffle beyond the word explode itself. */
  def encodeCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      wordTable: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
      posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0)
    val unseen = words.select("word").distinct()
      .join(wordTable.select("word"), Seq("word"), "left_anti")
      .withColumn("syms", segment(col("word"), merges))
    val segs = wordTable.select("word", "syms").unionByName(unseen)
    words.join(segs, Seq("word"))
      .select(col("id"), col("word_pos"),
        posexplode(col("syms")).as(Seq("sub_pos", "subword")))
  }
}
