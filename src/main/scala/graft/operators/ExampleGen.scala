package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Self-supervised training-example generation over the generic
  * document corpus — the corpus-side counterpart of the reference's
  * task generators (transformer.py's five JIRA templates, SURVEY
  * §2.5): where those template METADATA into examples, these corrupt
  * the TEXT itself, the objective used to pretrain encoder-decoder
  * models.
  *
  * Scale design: masking decisions are per-(doc, position) hashes —
  * no RNG state, no driver coordination, reproducible on any cluster
  * layout (the q49 determinism convention). The span/sentinel
  * assembly needs one per-doc ordered pass, expressed as window
  * functions over the exploded token stream: a single doc_id-keyed
  * shuffle, then everything is partition-local. Output examples are
  * doc-sized rows — the same order of bytes as the input corpus.
  */
object ExampleGen {

  /** q138: T5-style span corruption (Raffel et al., "Exploring the
    * limits of transfer learning with a unified text-to-text
    * transformer", JMLR 2020 §3.1.4): mask ~15% of token positions
    * with the deterministic per-position hash
    * `hash60(doc_id:pos) % 1000 < 150`, collapse each masked RUN into
    * one `<extra_id_k>` sentinel in the input, and emit the masked
    * tokens prefixed by their sentinel as the target. Spans here are
    * the runs of the iid position mask (geometric lengths) rather
    * than T5's sampled mean-3 spans — the deterministic variant that
    * replays exactly on any engine.
    *
    * Per doc: (doc_id, n_tokens, n_masked, n_spans, input_text,
    * target_text); `n_spans` sentinels appear in both texts in order.
    */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val marked = Tables
      .documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn(
        "m",
        TextFunctions.hash60(
          concat(col("doc_id").cast("string"), lit(":"), col("pos"))
        ) % 1000 < 150
      )
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = marked
      .withColumn(
        "span_start",
        col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false))
      )
      .withColumn(
        "span_id",
        sum(when(col("span_start"), 1).otherwise(0)).over(w) - 1
      )
    val sentinel =
      concat(lit("<extra_id_"), col("span_id").cast("string"), lit(">"))
    val pieces = spans.select(
      col("doc_id"),
      col("pos"),
      col("m"),
      col("span_start"),
      when(!col("m"), col("tok"))
        .when(col("span_start"), sentinel)
        .as("in_piece"),
      when(col("span_start"), concat(sentinel, lit(" "), col("tok")))
        .when(col("m"), col("tok"))
        .as("tgt_piece")
    )
    pieces
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("span_start"), 1L).otherwise(0L)).as("n_spans"),
        concat_ws(
          " ",
          transform(
            array_sort(
              collect_list(struct(col("pos"), col("in_piece").as("p")))
            ),
            s => s.getField("p")
          )
        ).as("input_text"),
        concat_ws(
          " ",
          transform(
            array_sort(
              collect_list(struct(col("pos"), col("tgt_piece").as("p")))
            ),
            s => s.getField("p")
          )
        ).as("target_text")
      )
  }
}
