package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document arriving on the ingest stream, pre-tokenized. */
case class PackIn(doc_id: Long, lang: String, n_tokens: Long)

/** Per-language packer state: tokens emitted so far. */
case class PackCursor(cum: Long)

/** One packed assignment, identical to the q53 batch row. */
case class PackAssign(
    doc_id: Long,
    lang: String,
    n_tokens: Long,
    cum_tokens: Long,
    window_id: Long
)

/** q231: streaming context-window packer — the q53 layout computed
  * ONLINE: documents arrive as a stream and each is assigned its
  * window the moment it arrives, from one running token cursor per
  * language. This is how a continuously-ingesting pretraining
  * pipeline actually lays out windows (the corpus never "finishes",
  * so the batch cumsum never runs); the state is a single long per
  * language, and the drained assignment is row-identical to the
  * batch q53 — the same determinism contract as q181's admission
  * gate.
  *
  * Determinism: the stream delivers documents in doc_id order per
  * file; within a micro-batch each language group sorts by doc_id
  * before folding, so arrival races inside a batch cannot reorder
  * the layout.
  *
  * Scale: state is O(|languages|) longs — nothing grows with the
  * corpus; the only shuffle is the per-language groupByKey, exactly
  * the batch layout's partitioning.
  */
object StreamPack {

  private val Budget = 2048L

  private[streaming] def packFn(
      lang: String,
      docs: Iterator[PackIn],
      state: GroupState[PackCursor]
  ): Iterator[PackAssign] = {
    var cum = state.getOption.map(_.cum).getOrElse(0L)
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      cum += d.n_tokens
      PackAssign(d.doc_id, lang, d.n_tokens, cum, (cum - d.n_tokens) / Budget)
    }
    state.update(PackCursor(cum))
    out.iterator
  }

  def assignmentStream(docs: DataFrame): Dataset[PackAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens")
      )
      .as[PackIn]
      .groupByKey(_.lang)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      )(packFn)
  }

  def streamPackWindows(spark: SparkSession, dir: String): DataFrame =
    EventStreams.runAvailableNow(
      assignmentStream(
        EventStreams.readTableStream(spark, dir, "documents")).toDF(),
      "q231_stream_pack_out",
      "append"
    )
}
