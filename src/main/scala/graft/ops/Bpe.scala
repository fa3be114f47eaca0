package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training + application.
  *
  * The training-data pipelines the reference's users run feed a
  * tokenizer; training one is itself a corpus-scale aggregation
  * problem. Spark-first shape:
  *
  *  - TRAIN iterates on the WORD-FREQUENCY table, not the corpus: the
  *    corpus collapses once into (word, freq) — vocabulary is orders of
  *    magnitude smaller than the corpus and bounded by content, so each
  *    merge round is one cheap aggregation over the vocab frame plus a
  *    driver-side top-1 read (a 1-row control-plane collect, same
  *    pattern as k-means centroids). The corpus is touched exactly
  *    once.
  *  - APPLY is pure per-row codegen: a word becomes a
  *    DOUBLE-delimiter-separated symbol string and each learned merge
  *    is ONE `replace` call whose pattern consumes only the inner half
  *    of each boundary — left-to-right non-overlapping replacement
  *    then IS the greedy BPE merge scan, including adjacent disjoint
  *    occurrences ("a a a a" + merge (a,a) → "aa aa"; see
  *    [[toSymbols]]). k merges = k nested replaces, zero shuffle, and
  *    the SQL oracle can run the identical replace chain.
  *
  * Reference analogue: none (the reference is a CDC tool) — this is
  * part of the brief's first-class LLM-data-pipeline surface (token
  * counting's big sibling).
  */
object Bpe {

  /** Symbol delimiter. Never appears in tokenized text (tokens come
    * from splitting on whitespace;  is not whitespace and the
    * corpus fixtures are printable text).
    */
  val Delim = ""

  /** `word` → `␁␁c␁␁h␁␁a␁␁r␁␁`: every symbol bracketed by DOUBLE
    * delimiters. The merge pattern `␁a␁␁b␁` then consumes only the
    * INNER half of each boundary, so two adjacent disjoint occurrences
    * — which share a boundary — both match in one left-to-right pass:
    * "a a a a" + merge (a,a) → "aa aa", exactly the greedy scan. (A
    * single-delimiter encoding gets this wrong: the first match eats
    * the shared delimiter and every second occurrence is skipped.)
    * Alignment is unique because symbol text never contains the
    * delimiter: the pattern's single leading ␁ can only bind to the
    * second char of a `␁␁` separator.
    */
  def toSymbols(word: Column): Column =
    concat(lit(Delim + Delim), regexp_replace(word, "(.)", "$1" + Delim + Delim))

  /** Apply one learned merge (a, b) → ab to a symbol string. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    regexp_replace(syms,
      java.util.regex.Pattern.quote(Delim + a + Delim + Delim + b + Delim),
      java.util.regex.Matcher.quoteReplacement(Delim + a + b + Delim))

  /** Apply an ordered merge list to a symbol string (k nested
    * replaces; plan depth k, all codegen).
    */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => applyMerge(c, a, b) }

  /** Token count of a symbol string: n symbols have n+1 double-delim
    * separators, so n = #delims / 2 − 1 (empty words — which
    * tokenization never produces — would yield 0).
    */
  def symbolCount(syms: Column): Column = {
    val delims = length(syms) - length(regexp_replace(syms, Delim, ""))
    greatest((delims.cast("int") / 2).cast("int") - 1, lit(0))
  }

  /** Corpus (word, freq) table from a text column. */
  def wordCounts(docs: DataFrame, text: String,
      tokenize: Column => Column): DataFrame =
    docs.select(explode(tokenize(col(text))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `nMerges` BPE merges on the corpus.
    *
    * Each round: explode every vocab word's CURRENT symbol sequence
    * into adjacent pairs weighted by word frequency, aggregate pair
    * counts (map-side combined — the pair space is tiny), pick the
    * most frequent pair with a deterministic (count DESC, a ASC, b ASC)
    * tie-break, rewrite the vocab frame with that merge. The vocab
    * frame is cached per round and linear in DISTINCT words; the
    * corpus itself is read exactly once by [[wordCounts]].
    *
    * Stops early when no pair occurs twice (freq 1 merges are noise).
    */
  def train(words: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var vocab = Materialize.barrier(
      words.select(toSymbols(col("word")).as("syms"), col("freq")))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = vocab
        // split on the delimiter and drop the empties the separators
        // produce — what's left is the symbol sequence in order
        .select(filter(
            split(col("syms"), java.util.regex.Pattern.quote(Delim)),
            x => x =!= "").as("s"),
          col("freq"))
        .select(explode(zip_with(
            slice(col("s"), lit(1), greatest(size(col("s")) - 1, lit(0))),
            slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .where(col("n") >= 2)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        out += ((a, b))
        vocab = Materialize.barrier(vocab.select(
          applyMerge(col("syms"), a, b).as("syms"), col("freq")))
        i += 1
      }
    }
    out.toSeq
  }
}
