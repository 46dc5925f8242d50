package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QualityLR

/** Streaming trained-model admission — the online twin of the q180
  * LR gate: the model is trained OFFLINE on the batch corpus (q180's
  * exact full-batch GD), then shipped to the stream as plain literals
  * (weights + admission threshold), and every arriving document is
  * scored and admitted statelessly. This is how trained quality gates
  * actually deploy: training is a batch job over the corpus; serving
  * is a pure map over the ingest stream with the model as broadcast
  * config — no state store, no per-batch retraining, no feedback from
  * the stream into the model.
  *
  * The admission threshold is the corpus-mean score (the q194
  * convention — on a 5%-positive corpus the 0.5 decision threshold
  * admits nothing), computed batch-side and frozen into the stream.
  *
  * Determinism contract: the stream applies the same featuresFrom
  * column map and the same literal weights as the batch gate, so the
  * drained output is row-identical to scoring the table in batch —
  * the DuckDB oracle replays the q180 GD chain and the same mean cut.
  *
  * Scale: zero streaming state; the only batch work is one feature
  * scan (train) whose gradient aggregate ships one row per round.
  */
object StreamQualityGate {

  def streamLrAdmission(spark: SparkSession, dir: String): DataFrame = {
    // offline phase: train on the batch table; model + threshold
    // become literals (three tiny driver values, never a join). The
    // cut is the corpus-mean z — z_pico·n >= Σz_pico is the mean
    // comparison in exact signed BIGINTs (round-9 convention: the
    // sigmoid never reaches an emitted or compared value)
    val feats = QualityLR.features(spark, dir).localCheckpoint(true)
    val w = QualityLR.train(feats)
    val cutRow = feats
      .select(QualityLR.zPico(w).as("z"))
      .agg(sum(col("z")).as("sz"), count(lit(1)).as("n"))
      .head()
    val (sumZ, nDocs) = (cutRow.getLong(0), cutRow.getLong(1))
    // online phase: stateless score-and-admit over the ingest stream
    val admitted = QualityLR
      .featuresFrom(EventStreams.readTableStream(spark, dir, "documents"))
      .select(
        col("doc_id"),
        QualityLR.zPico(w).as("z_pico")
      )
      .withColumn("admitted", col("z_pico") * lit(nDocs) >= lit(sumZ))
    EventStreams.runAvailableNow(
      admitted,
      "q217_stream_quality_gate_out",
      "append"
    )
  }
}
