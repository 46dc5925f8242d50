package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.shingles
import graft.operators.Dedup

/** One (band, bandValue) collision event for one document. */
case class BandHit(bkey: String, doc_id: Long)

/** Per-band state: the smallest doc_id ever seen on this band key. */
case class BandMin(minDoc: Long)

/** Per-(doc, band) verdict: did an earlier document already occupy
  * this band bucket?
  */
case class BandVerdict(doc_id: Long, hit_earlier: Boolean)

/** Streaming MinHash-LSH near-duplicate suppression — the online
  * admission twin of the batch band join (q22): documents arrive as a
  * stream and each is kept only if none of its 4 LSH band buckets was
  * already claimed by an earlier document. This is the shape of a
  * continuously-ingesting training-data pipeline: the corpus-wide
  * dedup (q78) runs in batch, and this gate keeps the stream from
  * re-admitting near-copies between batch runs.
  *
  * Scale design:
  *   - state is ONE long per occupied band bucket (the min doc_id) —
  *     O(distinct band values), not O(documents); buckets are the
  *     same 60-bit md5 band keys as q22, so state is bounded by
  *     corpus novelty, and a production deployment ages buckets out
  *     with a TTL/timeout;
  *   - the only shuffle is the groupByKey on band key — exactly the
  *     batch band join's exchange, one row per (doc, band);
  *   - per-document verdicts (4 rows) are folded back to one row per
  *     document by a downstream batch aggregation after the drain.
  *
  * Determinism contract: "earlier" = smaller doc_id. The stream
  * delivers documents in doc_id order (an append-only id-ordered
  * source), and within one micro-batch each band group sorts its
  * hits by doc_id before folding, so the drained result equals the
  * batch semantics the DuckDB oracle states: a document is
  * suppressed iff ANY of its band buckets contains a smaller doc_id.
  * Documents with fewer than 3 tokens have no shingles, hence no
  * bands, and are always kept.
  */
object StreamNearDup {

  private val NumBands = 4 // 2 of the 8 minhash components per band

  /** Streaming read of the documents table (file source — stands in
    * for any append-only document feed).
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    EventStreams.readTableStream(spark, dir, "documents")

  /** (doc_id, band key) hits: the q22 signature → band construction
    * as pure column expressions (streaming-safe, zero state). The
    * band key embeds the band index so distinct bands never collide.
    */
  def bandHits(docs: DataFrame): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("mh", Dedup.minhashSignature(col("sh")))
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), lit(NumBands - 1)),
            j =>
              concat_ws(
                "_",
                j,
                element_at(col("mh"), j * 2 + 1),
                element_at(col("mh"), j * 2 + 2)
              )
          )
        ).as("bkey")
      )
      .select(col("bkey"), col("doc_id"))
      .as[BandHit]
  }

  /** Per-band fold: emit one verdict per hit; a hit is "earlier-hit"
    * iff a smaller doc_id already claimed the bucket (in state from a
    * previous micro-batch, or earlier in this batch's sorted group).
    */
  private[streaming] def suppressFn(
      bkey: String,
      hits: Iterator[BandHit],
      state: GroupState[BandMin]
  ): Iterator[BandVerdict] = {
    var mn = state.getOption.map(_.minDoc).getOrElse(Long.MaxValue)
    val out = hits.toSeq.sortBy(_.doc_id).map { h =>
      val hit = h.doc_id > mn
      if (h.doc_id < mn) mn = h.doc_id
      BandVerdict(h.doc_id, hit)
    }
    state.update(BandMin(mn))
    out.iterator
  }

  /** The streaming verdict stream: one row per (doc, band). */
  def suppressionStream(docs: DataFrame): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandHits(docs)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      )(suppressFn)
  }

  /** TTL for [[ttlSuppressFn]] in arrival-id units: a band bucket
    * only suppresses a new document if its PREVIOUS occupant arrived
    * within this many doc_ids. The logical form of state expiry: a
    * production deployment additionally DELETES buckets idle past
    * the TTL (transformWithState ttlConfig / state timeouts) so
    * state stays bounded by the active window, not corpus novelty —
    * the admission decisions are identical because an expired bucket
    * can never suppress.
    */
  private[streaming] val TtlIds = 100L

  /** Per-band fold with TTL semantics: the bucket remembers the LAST
    * doc that hit it (suppressed or not — a fresh copy refreshes the
    * template's recency); a new doc is suppressed iff the previous
    * occupant is within [[TtlIds]]. Sorted within the group so the
    * drained result equals the batch lag() oracle exactly.
    */
  private[streaming] def ttlSuppressFn(
      bkey: String,
      hits: Iterator[BandHit],
      state: GroupState[BandMin]
  ): Iterator[BandVerdict] = {
    var last: Long = state.getOption.map(_.minDoc).getOrElse(Long.MinValue)
    val out = hits.toSeq.sortBy(_.doc_id).map { h =>
      val hit = last != Long.MinValue && h.doc_id - last <= TtlIds
      last = h.doc_id
      BandVerdict(h.doc_id, hit)
    }
    state.update(BandMin(last))
    out.iterator
  }

  /** The TTL'd verdict stream: one row per (doc, band). */
  def ttlSuppressionStream(docs: DataFrame): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandHits(docs)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      )(ttlSuppressFn)
  }

  /** q385: TTL'd streaming near-dup admission — suppress a document
    * only when a band bucket was hit RECENTLY (within [[TtlIds]]
    * arrivals). The production middle ground between q181's forever-
    * state (suppresses re-crawls of year-old pages, state grows with
    * corpus novelty) and no dedup at all: templates that burst
    * (stuck crawlers, mirror storms — the q369 signal) are caught
    * while the long tail ages out and state stays bounded by the
    * active window. Deterministic batch twin: suppressed iff ANY
    * band's immediately-previous occupant is within the TTL — the
    * lag() form the oracle replays.
    */
  def streamTtlNearDup(spark: SparkSession, dir: String): DataFrame = {
    val verdicts = EventStreams.runAvailableNow(
      ttlSuppressionStream(readDocuments(spark, dir)).toDF(),
      "q385_stream_ttl_dedup_out",
      "append"
    )
    val perDoc = verdicts
      .groupBy(col("doc_id"))
      .agg(max(col("hit_earlier")).as("suppressed"))
    graft.Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("suppressed"), lit(false)).as("suppressed")
      )
  }

  /** q433: admission-policy delta — per source, how the TTL gate
    * (q385) and the forever-state gate (q181) disagree: documents
    * the TTL gate RESCUES (suppressed forever, admitted under TTL —
    * re-crawls of content older than the window) and the agreement
    * counts. The TTL gate can never suppress a doc the forever gate
    * admits (its previous-occupant test is strictly weaker), so the
    * delta is one-sided — asserted by the spec and visible here as a
    * structurally-zero column the oracle also derives. This is the
    * table an operator reads to pick the gate: rescued mass is
    * exactly what forever-state dedup would cost in fresh-again
    * content.
    */
  def admissionPolicyDelta(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val ttl = streamTtlNearDup(spark, dir)
      .select(col("doc_id"), col("suppressed").as("ttl_sup"))
    val forever = streamNearDupSuppress(spark, dir)
      .select(col("doc_id"), col("suppressed").as("fv_sup"))
    graft.Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(ttl, "doc_id")
      .join(forever, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("fv_sup") && !col("ttl_sup"), 1L).otherwise(0L))
          .as("n_rescued"),
        sum(when(col("ttl_sup") && !col("fv_sup"), 1L).otherwise(0L))
          .as("n_impossible"),
        sum(when(col("ttl_sup") && col("fv_sup"), 1L).otherwise(0L))
          .as("n_both_suppress")
      )
      .select(
        col("source"), col("n_docs"), col("n_rescued"),
        col("n_impossible"), col("n_both_suppress"),
        microRatio(col("n_rescued"), col("n_docs")).as("rescued_ppm")
      )
  }

  /** q181: drain the suppression stream, fold band verdicts to one
    * row per document, and re-attach band-less documents (always
    * kept): (doc_id, suppressed).
    */
  def streamNearDupSuppress(spark: SparkSession, dir: String): DataFrame = {
    val verdicts = EventStreams.runAvailableNow(
      suppressionStream(readDocuments(spark, dir)).toDF(),
      "q181_stream_neardup_out",
      "append"
    )
    val perDoc = verdicts
      .groupBy(col("doc_id"))
      .agg(max(col("hit_earlier")).as("suppressed"))
    graft.Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("suppressed"), lit(false)).as("suppressed")
      )
  }
}
