package graft.operators

import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.util.Caches._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Intra- and cross-document repetition analysis — the Gopher
  * repetition battery's n-gram half (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * §A1.3) and the cross-document duplicate-window detector that
  * complements whole-document dedup: boilerplate headers, license
  * blocks, and navigation chrome repeat ACROSS documents that are not
  * near-duplicates of each other, so pairwise dedup never sees them.
  *
  * Both operators are one tokenize pass plus (doc, gram)-keyed
  * partial-aggregated counts — map-side combine does the heavy
  * lifting, the shuffle carries counts, and nothing is pairwise: at
  * 100 TB the window table is the posting-list shape (gram → docs),
  * identical to the q82/q73 topology.
  */
object Repetition {

  /** q195: per-document n-gram repetition stats — the within-doc
    * duplication signals a quality battery cuts on:
    *   - dup_token_ppm: 1 − distinct/total tokens (token-level
    *     duplication; 0 for empty docs), exact half-up ppm,
    *   - top_bigram_ppm: tokens covered by the most frequent word
    *     bigram (2·max-count/total — only the max matters, so ties
    *     need no ordering), exact ppm,
    *   - dup_trigram_ppm: share of trigram OCCURRENCES whose
    *     trigram appears ≥ 2 times in the doc, exact ppm.
    * keep = all three under the (700000, 200000, 300000) ppm cuts.
    *
    * Scale: the token stats are in-row expressions; the bigram and
    * trigram passes are per-doc hash aggregates over exploded grams —
    * partial aggregation collapses each doc's grams before the
    * exchange, and the per-doc result rows are O(docs), never
    * O(grams).
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      // feeds the base stats and both gram passes
      .cacheTracked()
    val t = col("t")
    val base = docs.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct")
    )
    def grams(n: Int) = docs
      .filter(size(t) >= n)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), size(t) - n),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(t, i + j + 1)): _*)
          )
        ).as("g")
      )
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    val biTop = grams(2)
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bi"))
    val triAgg = grams(3)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("tri_tot"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("tri_dup")
      )
    // exact-integer ppm twins of the float fractions (round-11 float
    // purge); the keep cuts are restated on the ppm scale
    import graft.functions.IntMath.{idivHalfUp, microRatio}
    val dupTok = when(col("n_tokens") === 0, lit(0L)).otherwise(
      microRatio(col("n_tokens") - col("n_distinct"), col("n_tokens")))
    val topBi = when(col("n_tokens") === 0, lit(0L)).otherwise(
      idivHalfUp(
        lit(2000000L) * coalesce(col("top_bi"), lit(0L)),
        col("n_tokens")))
    val dupTri = when(col("tri_tot").isNull, lit(0L))
      .otherwise(microRatio(col("tri_dup"), col("tri_tot")))
    base
      .join(biTop, Seq("doc_id"), "left")
      .join(triAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        dupTok.as("dup_token_ppm"),
        topBi.as("top_bigram_ppm"),
        dupTri.as("dup_trigram_ppm"),
        (dupTok <= 700000L &&
          topBi <= 200000L &&
          dupTri <= 300000L).cast("int").as("keep")
      )
  }

  /** q196: cross-document duplicate windows — 10-token windows at
    * stride 5; a window is duplicated if its exact text occurs in
    * ≥ 2 DISTINCT documents. Per document: window count, duplicated
    * window count, and the duplicated fraction — the signal that
    * catches shared boilerplate spans inside otherwise-unique
    * documents (the failure mode whole-doc and near-dup passes both
    * miss). Documents shorter than one window report 0 windows.
    *
    * Scale: windows are keyed by their text (at 100 TB, by a 128-bit
    * content hash — same topology); the duplicate set is one
    * (window → distinct-doc count) aggregate, partial-aggregated
    * map-side, and the per-doc rollup joins counts back on the
    * window key. Stride 5 bounds the window stream at ~tokens/5 —
    * linear in corpus size, never pairwise.
    */
  def duplicateWindows(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val stride = 5
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val t = col("t")
    val wins = docs
      .filter(size(t) >= k)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0),
              ((size(t) - k).cast("double") / stride).cast("int")),
            i => array_join(slice(t, i * stride + 1, lit(k)), " ")
          )
        ).as("w")
      )
      // feeds the duplicate-set aggregate and the per-doc rollup
      .cacheTracked()
    val dupWins = wins
      .groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("w"), lit(1).as("is_dup"))
    val perDoc = wins
      .join(dupWins, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("is_dup"), lit(0))).cast("long").as("n_dup_windows")
      )
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        when(col("n_windows").isNull, lit(0L))
          .otherwise(graft.functions.IntMath
            .microRatio(col("n_dup_windows"), col("n_windows")))
          .as("dup_window_ppm")
      )
  }
}
