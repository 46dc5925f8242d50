package graft.operators

import graft.util.Caches._
import graft.Tables
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016):
  * the merge-loop that learns a tokenizer from a corpus — the
  * counterpart of the q66 pre-tokenizer, which only APPLIES one.
  *
  * Scale shape (the reason this distributes): the corpus is read
  * ONCE to build the (word, freq) vocabulary — Heaps' law makes the
  * vocab orders of magnitude smaller than a 100 TB corpus — and
  * every merge round then runs on the vocabulary alone: one
  * partially-aggregated pair-count shuffle + a TakeOrdered(1) argmax
  * + a map-side merge. k rounds = k small shuffles, never a second
  * corpus pass. The per-round driver argmax (one row) is the same
  * legitimate iterative pattern as PageRank's convergence count.
  *
  * Merge semantics: symbols start as characters; each round picks
  * the adjacent pair with the highest freq-weighted count (ties:
  * lexicographic left, then right) and fuses every left-to-right
  * non-overlapping occurrence of ADJACENT WHOLE SYMBOLS — a greedy
  * boundary-anchored fold over the symbol sequence (e.g. pair (a,a)
  * on [a,a,a] → [aa,a]), exactly Sennrich's reference merge. A plain
  * substring replace over the joined string is NOT equivalent: it
  * also fuses where the left element is only a suffix of a longer
  * symbol (pair (h,e) on [th,e] would corrupt to [the]) — see
  * [[applyMerge]]. The DuckDB oracle replays the identical rounds
  * unrolled with the same boundary-anchored fold.
  */
object BpeTrain {

  /** Symbol separator: the unit-separator control char, which cannot
    * appear in whitespace-split tokens of sane text (words containing
    * it are dropped defensively on both engine and oracle sides).
    */
  val Sep = "\u001F"

  /** One merge round applied to a Sep-joined symbol string: the
    * greedy left-to-right fold that fuses adjacent WHOLE symbols
    * (l, r) -> l+r. Boundary anchoring falls out of the fold shape --
    * the accumulator's last symbol equals `l` iff the accumulator IS
    * `l` or ends with Sep+`l` (symbols never contain Sep), so a
    * symbol merely SUFFIXED by `l` can't match. Greedy non-overlap
    * falls out too: the fused symbol l+r can never equal `l` again
    * (r is non-empty), so a just-fused symbol never re-fuses within
    * the round. One interpreted fold per word per round, over the
    * vocabulary only -- never the corpus.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      split(syms, Sep),
      lit("").cast("string"),
      (acc, x) =>
        when(acc === lit(""), x)
          .when(
            x === lit(r) && (acc === lit(l) || acc.endsWith(lit(Sep + l))),
            concat(acc, x)
          )
          .otherwise(concat(acc, lit(Sep), x))
    )

  /** Learned merge table: (merge_rank, left, right, pair_count),
    * one row per round, rank 1 = first merge.
    */
  def train(spark: SparkSession, dir: String, rounds: Int = 8): DataFrame =
    trainFromWords(corpusWords(spark, dir), rounds)

  /** The (w, freq) corpus vocabulary — one tokenize pass. NOT cached
    * here: the train path reads it exactly once (straight into the
    * round-0 localCheckpoint), so a cache would only add an
    * InMemoryRelation materialization between the scan and the loop —
    * measured +1.1 s on q125 in round 7. [[segmentation]], the one
    * consumer that reads the vocab twice, caches its own handle.
    */
  private def corpusWords(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(Sep))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))

  /** The merge loop over a prepared (w, freq) vocabulary frame. */
  def trainFromWords(words: DataFrame, rounds: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var seq = words
      .select(
        col("freq"),
        array_join(split(col("w"), ""), Sep).as("syms")
      )
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      val best = seq
        .select(col("freq"), split(col("syms"), Sep).as("a"))
        .select(
          col("freq"),
          explode(
            arrays_zip(
              slice(col("a"), lit(1), size(col("a")) - 1).as("l"),
              slice(col("a"), lit(2), size(col("a")) - 1).as("r")
            )
          ).as("p")
        )
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) continue = false
      else {
        val (l, rt, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rt, c))
        // map-side merge of the chosen pair — the boundary-anchored
        // greedy fold (see applyMerge); localCheckpoint keeps the
        // per-round lineage O(1) like PageRank's rounds
        seq = seq
          .withColumn("syms", applyMerge(col("syms"), l, rt))
          .localCheckpoint()
        r += 1
      }
    }
    merges
      .result()
      .toDF("merge_rank", "left", "right", "pair_count")
  }

  /** q134: the trained tokenizer applied to the WHOLE corpus — the
    * pass a data pipeline runs after q125 training to budget
    * sequence lengths: per document, whitespace word count, subword
    * count under the learned merges, and the chars-per-subword
    * compression the tokenizer achieves.
    *
    * Scale shape: merges are applied to the VOCABULARY (Heaps-law
    * small), never to the token stream — the corpus pass is then one
    * (doc_id, word) → vocab equi-join carrying only the per-word
    * piece count (AQE broadcasts the vocab side at bench scale; at
    * web scale it's a key shuffle against a vocab table orders of
    * magnitude smaller than the corpus). Docs whose every token was
    * dropped by the vocab guards (empty, separator-bearing) simply
    * have no rows to aggregate — consistent on both engines.
    */
  def corpusApply(
      spark: SparkSession,
      dir: String,
      rounds: Int = 8
  ): DataFrame = {
    val vocab = segmentation(spark, dir, rounds)
      .select(col("w"), col("n_pieces"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(Sep))
      .join(vocab, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_subwords"),
        sum(length(col("w"))).as("n_chars")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_subwords"),
        graft.functions.IntMath
          .idivHalfUp(col("n_chars") * 1000L, col("n_subwords"))
          .as("chars_per_subword_milli")
      )
  }

  /** The trained segmentation: each vocab word's final symbol list
    * after applying all learned merges (what a tokenizer ships).
    */
  def segmentation(
      spark: SparkSession,
      dir: String,
      rounds: Int = 8
  ): DataFrame = {
    // cached HERE because segmentation is the one consumer that reads
    // the vocab twice: once into the merge loop (materialized eagerly
    // by the collect below) and once more in the shipped pieces frame
    val words = corpusWords(spark, dir).cacheTracked()
    val merged = trainFromWords(words, rounds).collect()
    val syms = merged.foldLeft(
      array_join(split(col("w"), ""), Sep)
    ) { (acc, m) =>
      applyMerge(acc, m.getString(1), m.getString(2))
    }
    // materialize pieces first: the k-round nested merge fold is a
    // lambda-bearing expression Spark's subexpression elimination
    // skips, so writing split(syms) twice would run the whole fold
    // twice per row
    words
      .select(col("w"), col("freq"), split(syms, Sep).as("pieces"))
      .select(
        col("w"),
        col("freq"),
        col("pieces"),
        size(col("pieces")).as("n_pieces")
      )
  }

  /** q146: tokenizer fertility per language — subwords-per-word and
    * chars-per-subword of the trained BPE, grouped by `lang`. The
    * standard multilingual-tokenizer equity audit: a language with
    * fertility far above the corpus mean is being over-segmented
    * (its tokens buy fewer characters), which inflates its training
    * cost and truncation rate.
    *
    * The segmentation table is O(|vocab|) and broadcast; the corpus
    * pays one explode + one hash agg on `lang` — the same topology
    * as q134's per-doc apply.
    */
  def langFertility(
      spark: SparkSession,
      dir: String,
      rounds: Int = 8
  ): DataFrame = {
    val vocab = segmentation(spark, dir, rounds)
      .select(col("w"), col("n_pieces"))
    Tables
      .documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(Sep))
      .join(broadcast(vocab), "w")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_subwords"),
        sum(length(col("w"))).as("n_chars")
      )
      .select(
        col("lang"),
        col("n_words"),
        col("n_subwords"),
        graft.functions.IntMath
          .idivHalfUp(col("n_subwords") * 1000L, col("n_words"))
          .as("fertility_milli"),
        graft.functions.IntMath
          .idivHalfUp(col("n_chars") * 1000L, col("n_subwords"))
          .as("chars_per_subword_milli")
      )
  }
}
