package graft.operators

import graft.Tables
import graft.util.Caches._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table (SURVEY §2.9): the
  * batch forms of the streaming workloads — tumbling/sliding windows,
  * gap-based sessionization, and a backward as-of join. The streaming
  * twins live in graft.streaming and share these semantics.
  *
  * Scale design: every operator is one shuffle on (user_id) or
  * (window bucket) — event-time bucketing is computed before the
  * exchange so partial aggregation applies; the as-of join is the
  * union-then-window merge (no per-row probes, no broadcast of the big
  * side), the standard distributed as-of topology.
  */
object Events {

  /** q27: tumbling 1-hour windows per event type. */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")
      )

  /** q28: sliding windows (1h length, 30m slide) — each event lands in
    * exactly 2 buckets; bucket starts are epoch-aligned, matching
    * Spark's `window()` alignment.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"),
        col("value")
      )
      .groupBy(col("w.start").as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")
      )

  /** q29: gap-based sessionization (30-minute inactivity gap) per
    * user: lag → new-session flag → running sum as session id → one
    * row per session. Single shuffle on user_id; both window passes
    * reuse the same partitioning.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val newSession = when(
      col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000,
      1L
    ).otherwise(0L)
    Tables
      .events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", newSession)
      .withColumn(
        "session_seq",
        sum(col("is_new"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0))
      )
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")
      )
  }

  /** q30: backward as-of join — for every purchase, the most recent
    * strictly-prior error of the same user, via a single event-time
    * window over the unioned stream (`last(_, ignoreNulls)` with a
    * ROWS … 1 PRECEDING frame). One shuffle on user_id; no pairwise
    * probe — this is the 100 TB-safe as-of formulation.
    */
  def purchaseAfterError(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables
      .events(spark, dir)
      .withColumn(
        "prior_error_ts",
        last(when(col("event_type") === "error", col("ts")), ignoreNulls = true)
          .over(byUser)
      )
      .withColumn(
        "prior_error_value",
        last(
          when(col("event_type") === "error", col("value")),
          ignoreNulls = true
        ).over(byUser)
      )
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("value"),
        col("prior_error_ts"),
        col("prior_error_value")
      )
  }

  /** q31: multimodal-column plumbing — treat text as an opaque binary
    * payload with typed metadata derived deterministically (byte
    * length, sha256 content id, fake decoded dimensions standing in
    * for a real image decoder; see graft.operators.Multimodal for the
    * partition-level decode stub).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    val sha = sha2(payload, 256)
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        length(payload).cast("long").as("n_bytes"),
        sha.as("content_id"),
        (conv(substring(sha, 1, 4), 16, 10).cast("long") % 1920)
          .cast("int")
          .as("fake_width"),
        (conv(substring(sha, 5, 4), 16, 10).cast("long") % 1080)
          .cast("int")
          .as("fake_height")
      )
  }

  /** q67: per-user event deltas — lag/lead neighbors, seconds since
    * the previous event, running event count, and a 3-row moving
    * average of `value`. All five window functions share ONE
    * partitioning+ordering (user_id, ts, event_id), so the whole
    * query is a single shuffle followed by one per-partition sort —
    * the plan shape that survives any scale-up (state is one pass,
    * no buffering beyond the 3-row frame).
    */
  def lagLeadDeltas(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val movingFrame = byUser.rowsBetween(-2, Window.currentRow)
    // exact integer emissions (round-12 float purge): event values
    // are 2-decimal money, so cents are exact BIGINTs; the time delta
    // is native microseconds; the 3-row mean is an exact half-up
    // milli-cent division of the frame sum by the frame count.
    Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("prev_value_cents", lag(col("vc"), 1).over(byUser))
      .withColumn("next_value_cents", lead(col("vc"), 1).over(byUser))
      .withColumn(
        "us_since_prev",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
      )
      .withColumn("event_rank", row_number().over(byUser))
      .withColumn(
        "moving_avg3_cents_milli",
        graft.functions.IntMath.idivHalfUp(
          sum(col("vc")).over(movingFrame) * lit(1000L),
          count(col("vc")).over(movingFrame)
        )
      )
      .select(
        col("event_id"),
        col("user_id"),
        col("prev_value_cents"),
        col("next_value_cents"),
        col("us_since_prev"),
        col("event_rank"),
        col("moving_avg3_cents_milli")
      )
  }

  /** q79: per-user trailing 1-hour activity — a RANGE-framed window
    * (value-based frame over event-time, not a row count): for every
    * event, how many events and how much value the same user produced
    * in the preceding hour including this one. The frame key is epoch
    * MICROseconds, so the boundary is exact at the source's native
    * precision (casting to seconds would widen the frame for
    * sub-second neighbors). One shuffle on user_id, one ordered pass
    * per partition with an O(frame) sliding accumulator — the rolling
    * feature-extraction shape (user velocity / fraud features) that
    * holds at any scale because frames never cross users.
    */
  def rollingHourly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("value")
      )
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
  }

  /** q87: gap sessionization via Spark's NATIVE `session_window`
    * aggregate — the idiomatic form of q29's manual lag/flag/running-
    * sum construction. One shuffle on (user_id); Spark merges
    * overlapping per-event windows [ts, ts+gap) inside the aggregate,
    * so state per open session is one struct, and the window end is
    * the exclusive bound last_ts + gap (q29 reports the inclusive
    * last-event end — both emitted here, derived from the same
    * window). Exactly-equal boundary gaps are the one semantic edge:
    * `session_window` starts a new session at diff == gap while the
    * manual form continues; the corpus has microsecond timestamps, so
    * the case is structurally absent (asserted against q29 in the
    * spec).
    */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(
        col("user_id"),
        session_window(col("ts"), "30 minutes").as("w")
      )
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")
      )
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end_excl"),
        col("n_events"),
        col("sum_value")
      )

  /** q123: session_window with a DYNAMIC gap — purchases hold a
    * session open 30 minutes, everything else 10: the
    * engagement-weighted sessionization a conversion pipeline uses.
    * With variable gaps the session end is the running MAX of member
    * ends (a longer-gap early event can cover a later short-gap one),
    * which is exactly what the native operator maintains — the naive
    * lag-based boundary (q29/q87's fixed-gap replay) is wrong here,
    * and the oracle replays the running-max-end merge instead.
    */
  def dynamicSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(
        col("user_id"),
        session_window(
          col("ts"),
          when(col("event_type") === "purchase", "30 minutes")
            .otherwise("10 minutes")
        ).as("w")
      )
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")
      )
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end_excl"),
        col("n_events"),
        col("sum_value")
      )

  /** q83: ordered funnel (view → click → purchase): per user, the
    * earliest view, the earliest click strictly after that view, and
    * the earliest purchase strictly after that click. Stage k is one
    * conditional min-aggregate over the stage-k event type joined back
    * on user_id — three key-shuffles of pre-filtered slices (each
    * scan reads only its event type via pushed filters), never a
    * per-user sort of the full history. The standard funnel topology:
    * state per user is three timestamps regardless of event volume.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    def stageMin(eventType: String, out: String) =
      events
        .filter(col("event_type") === eventType)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as(out))
    val v = stageMin("view", "view_ts")
    val c = events
      .filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("view_ts"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("click_ts"))
    val p = events
      .filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("click_ts"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("purchase_ts"))
    v.join(c.select(col("user_id"), col("click_ts")), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("view_ts"),
        col("click_ts"),
        col("purchase_ts"),
        (lit(1) + col("click_ts").isNotNull.cast("int")
          + col("purchase_ts").isNotNull.cast("int")).as("stage_reached")
      )
  }

  /** q105: the native as-of join ([[graft.plans.AsOfJoin]] — custom
    * LogicalPlan/Strategy/SparkPlan) computing exactly q30's
    * semantics: each purchase joined to the last strictly-prior error
    * of the same user in (ts, event_id) order. The window-merge form
    * ([[purchaseAfterError]]) is the executable spec; both are gated
    * on the same DuckDB oracle.
    *
    * Scale: co-partition + sort both sides once, then an O(1)-state
    * forward merge per partition — the window form instead carries
    * EVERY event (all types) through one window frame; here only the
    * two filtered streams shuffle.
    */
  def purchaseAfterErrorNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = ev
      .filter(col("event_type") === "error")
      .select(
        col("user_id").as("err_user"),
        col("ts").as("prior_error_ts"),
        col("event_id").as("err_event_id"),
        col("value").as("prior_error_value")
      )
    graft.plans.AsOf
      .join(
        purchases,
        errors,
        leftKeys = Seq("user_id"),
        rightKeys = Seq("err_user"),
        leftOrder = Seq("ts", "event_id"),
        rightOrder = Seq("prior_error_ts", "err_event_id")
      )
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("value"),
        col("prior_error_ts"),
        col("prior_error_value")
      )
  }

  /** q120: semi-structured props through the VARIANT type (Spark 4's
    * schema-on-read path): `parse_json` once into a binary variant,
    * then typed `variant_get` extraction — no fixed schema declared,
    * no per-field JSON re-parse (the variant is a parsed binary —
    * repeated field reads don't re-tokenize the string, which is the
    * 100 TB difference vs get_json_object per field).
    */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k")
      )
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        graft.functions.IntMath
          .idivHalfUp(sum(col("k")) * 1000L, count(col("k")))
          .as("avg_k_milli"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")
      )

  /** q95: cohort retention — users grouped by first-activity day, then
    * the distinct-user count per (cohort, days-since-cohort) cell: the
    * classic engagement-decay matrix.
    *
    * Scale: first-activity is one partially-aggregated min per user;
    * the matrix is a second aggregate keyed on ~(days × days) cells.
    * The join back to events is on user_id — at 100 TB both sides
    * shuffle on the same key once (or the cohort side broadcasts when
    * the user dimension allows).
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .groupBy(
        // ISO string, not DateType: date-typed cells round-trip as
        // different host types on the two engines' result paths.
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("days_since")
      )
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** q158: next-event-prediction training examples — the behavioral
    * twin of next-token prediction: for every event with at least 3
    * predecessors in its user's stream, emit (3-event history →
    * label) where the history is the lag-3..lag-1 event types in
    * arrival order and the label is the current event type. This is
    * the example generator for session-recommendation / user-model
    * training data at feed scale.
    *
    * Scale: three lag() calls over ONE (user_id)-partitioned,
    * (ts, event_id)-ordered window — a single hash shuffle on
    * user_id and one per-partition sort produce every example;
    * no joins, no self-joins, no state.
    */
  def nextEventExamples(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("h1", lag(col("event_type"), 3).over(w))
      .withColumn("h2", lag(col("event_type"), 2).over(w))
      .withColumn("h3", lag(col("event_type"), 1).over(w))
      .filter(col("h1").isNotNull)
      .select(
        col("user_id"),
        col("event_id"),
        concat_ws(",", col("h1"), col("h2"), col("h3")).as("history"),
        col("event_type").as("label")
      )
  }

  /** q269: hourly cross-correlation matrix — Pearson correlation
    * between every ORDERED pair of event types' hourly count series
    * at lags −3..+3 hours: corr(a_t, b_{t−lag}) over the hours both
    * series observe. A peak at lag>0 means a LEADS b (errors lead
    * purchase dips, campaigns lead signups) — the lead/lag screen
    * behind alerting and causal follow-up. All moments are exact
    * integer sums over integer counts; the correlation is one final
    * division.
    *
    * Scale: the series frame is (type, hour) — bounded by observed
    * hours, never events; the pair×lag join is |types|²×7 of those
    * bounded frames.
    */
  def crossCorrelation(spark: SparkSession, dir: String, maxLag: Int = 3): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      .groupBy(
        col("event_type"),
        (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("hi")
      )
      .agg(count(lit(1)).as("n"))
    val a = hourly.select(
      col("event_type").as("type_a"),
      col("hi"),
      col("n").as("x")
    )
    val b = hourly.select(
      col("event_type").as("type_b"),
      col("hi").as("hib"),
      col("n").as("y")
    )
    val lags = explode(lit((-maxLag to maxLag).toArray)).as("lag")
    val joined = a
      .select(col("type_a"), col("hi"), col("x"), lags)
      .join(
        b,
        col("hib") === col("hi") - col("lag") && col("type_a") =!= col("type_b")
      )
    val n = col("cnt").cast("double")
    val corr = (n * col("sxy") - col("sx") * col("sy")) /
      (sqrt(n * col("sx2") - col("sx") * col("sx")) *
        sqrt(n * col("sy2") - col("sy") * col("sy")))
    joined
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"),
        sum(col("x") * col("y")).as("sxy")
      )
      .select(
        col("type_a"),
        col("type_b"),
        col("lag").cast("long").as("lag_h"),
        col("cnt").as("n_hours"),
        round(corr * 1e6).cast("long").as("corr_micro")
      )
  }

  /** q270: session-level event-type PMI — for every unordered type
    * pair, the pointwise mutual information of co-occurring in one
    * session (q29's 30-minute-gap sessions): PMI = ln(n_ab·S /
    * (n_a·n_b)) over S sessions. Positive PMI pairs are behavioral
    * bundles (view→purchase in one sitting); negative pairs are
    * mutually exclusive modes — the session-structure complement to
    * q262's step-level transitions. Counts are exact integers.
    *
    * Scale: sessionization is the audited q29 windows; the pair join
    * runs within sessions over ≤|types| distinct rows each, so
    * candidates ∝ sessions·|types|², never events².
    */
  def sessionTypePmi(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val newSession = when(
      col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000,
      1L
    ).otherwise(0L)
    val st = Tables
      .events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", newSession)
      .withColumn(
        "session_seq",
        sum(col("is_new"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0))
      )
      .select(col("user_id"), col("session_seq"), col("event_type"))
      .distinct()
    val totS = broadcast(
      st.select(col("user_id"), col("session_seq"))
        .distinct()
        .agg(count(lit(1)).as("s"))
    )
    val perType = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = st
      .as("a")
      .join(
        st.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.session_seq") === col("b.session_seq")
          && col("a.event_type") < col("b.event_type")
      )
      .groupBy(
        col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b")
      )
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(
        perType.select(col("event_type").as("type_a"), col("n_t").as("n_a")),
        Seq("type_a")
      )
      .join(
        perType.select(col("event_type").as("type_b"), col("n_t").as("n_b")),
        Seq("type_b")
      )
      .crossJoin(totS)
      .select(
        col("type_a"),
        col("type_b"),
        col("n_ab"),
        col("n_a"),
        col("n_b"),
        round(
          log(
            col("n_ab").cast("double") * col("s") / (col("n_a") * col("n_b"))
          ) * 1e6
        ).cast("long").as("pmi_micro")
      )
  }

  /** q280: calendar activity profile — event counts per (day-of-week,
    * hour-of-day) cell with corpus share and a peak flag (cell count
    * > 2× the mean cell count). The seasonality fingerprint behind
    * capacity planning and the denominator q254's burst z-scores
    * implicitly assume away: a Monday-9am "burst" that repeats every
    * Monday is calendar, not anomaly. Counts are exact integers;
    * dow follows ISO (1 = Monday) via dayofweek re-mapping so both
    * engines agree.
    *
    * Scale: one scan → 168-cell agg, map-side combined.
    */
  def calendarProfile(spark: SparkSession, dir: String): DataFrame = {
    // Spark dayofweek: 1 = Sunday; remap to ISO 1 = Monday
    val isoDow = ((dayofweek(col("ts")) + 5) % 7 + 1).cast("long")
    val cells = Tables
      .events(spark, dir)
      .groupBy(isoDow.as("dow"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    val tot = broadcast(
      cells.agg(sum(col("n")).as("tot"), count(lit(1)).as("n_cells"))
    )
    cells
      .crossJoin(tot)
      .select(
        col("dow"),
        col("hod"),
        col("n"),
        graft.functions.IntMath.microRatio(col("n"), col("tot"))
          .as("share_ppm"),
        (col("n") * col("n_cells") > col("tot") * 2).as("peak")
      )
  }

  /** q262: first-order event-type transition matrix — per-user event
    * sequences (event-time order, event_id tiebreak) lag-paired into
    * (from, to) transitions, counted, and row-normalized to
    * probabilities (micro-units). The Markov backbone behind q158's
    * next-event examples: the matrix IS the baseline next-event
    * predictor, and off-diagonal mass identifies funnel edges worth
    * modeling (view→purchase) vs noise (click→click self-loops).
    * Exact integer counts; probabilities are single divisions.
    *
    * Scale: one per-user lag window (bounded per user), one
    * (from, to) agg — |types|² rows out, map-side combined.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val tr = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    tr.groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type")))
      )
      .select(
        col("from_type"),
        col("to_type"),
        col("n"),
        graft.functions.IntMath.microRatio(col("n"), col("row_total"))
          .as("p_micro")
      )
  }

  /** q261: inter-arrival burstiness per event type — gaps between
    * consecutive events (microseconds, event-time order with
    * event_id tiebreak), summarized as mean gap and the squared
    * coefficient of variation CV² = Var(gap)/E[gap]² (micro-units).
    * CV² ≈ 1 is Poisson arrival; CV² ≫ 1 is bursty (retry storms,
    * batch replays), CV² ≪ 1 is metronome traffic (synthetic bots,
    * cron) — the arrival-process audit behind q254's rate z-scores.
    * Gap moments are exact integer sums (µs gaps), so the statistic
    * is drift-free up to the final divisions.
    *
    * Scale: one per-type lag window (bounded by the per-type event
    * count; at 100 TB, per (type, day) shards), one |types|-row agg.
    */
  def interArrivalStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    val gaps = Tables
      .events(spark, dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val n = col("n").cast("double")
    val mean = col("s").cast("double") / col("n")
    val varr = (col("s2").cast("double") - col("s").cast("double") * col("s") / col("n")) / col("n")
    gaps
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("gap")).as("s"),
        sum(col("gap").cast("double") * col("gap")).as("s2")
      )
      .select(
        col("event_type"),
        col("n").as("n_gaps"),
        // exact milli-µs mean (round-12 float purge): the gap sum and
        // count are exact integers, so the mean needs no doubles
        graft.functions.IntMath
          .idivHalfUp(col("s") * lit(1000L), col("n"))
          .as("mean_gap_us_milli"),
        round(varr / (mean * mean) * 1e6).cast("long").as("cv2_micro")
      )
  }

  /** q257: per-user behavioral profile — event count, distinct event
    * types, and the Shannon entropy of the user's event-type
    * distribution (micro-units). Entropy 0 = single-behavior users
    * (bots, scrapers, dead accounts); high entropy = engaged mixed
    * behavior — the per-entity diversity screen that q83's funnel
    * and q95's retention read cohort-level. All counts are exact
    * integers; the entropy terms are divisions of exact integers.
    *
    * Scale: one (user, type) partial agg, then a user-keyed rollup —
    * both map-side combined, state ∝ |users|·|types|.
    */
  def userBehaviorProfile(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables
      .events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "tot",
        sum(col("c")).over(Window.partitionBy(col("user_id")))
      )
    val p = col("c").cast("double") / col("tot")
    ut.groupBy(col("user_id"))
      .agg(
        max(col("tot")).as("n_events"),
        count(lit(1)).as("n_types"),
        round(sum(-p * log(p)) * 1e6).cast("long").as("entropy_micro")
      )
  }

  /** q254: hourly burst detection — per event type, the hourly count
    * z-scored against the trailing 24 OBSERVED hourly buckets
    * (exclusive), flagged as a burst at z > 3 once ≥ 12 trailing
    * buckets exist. The rate-anomaly monitor on top of q79's rolling
    * counts: ingestion spikes, bot storms, and pipeline stalls all
    * show up here first. Trailing mean/variance are derived from
    * integer window sums (Σn, Σn²), so the statistic is drift-free:
    * the only floats are divisions of exact integers.
    *
    * Scale: one (type, hour) partial agg (map-side combined), then
    * bounded windows over per-type hourly series — frame size =
    * hours observed, never event rows.
    */
  def burstFlags(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("hour"))
      .rowsBetween(-24, -1)
    val mean = col("s").cast("double") / col("k")
    val varr =
      (col("s2").cast("double") - col("s").cast("double") * col("s") / col("k")) /
        col("k")
    val z = (col("n") - mean) / sqrt(varr)
    hourly
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .select(
        col("event_type"),
        unix_micros(col("hour")).as("hour_us"),
        col("n"),
        col("k").as("n_prev"),
        when(col("k") >= 12 && varr > 0, round(z * 1e6).cast("long"))
          .as("z_micro"),
        coalesce(col("k") >= 12 && varr > 0 && z > 3.0, lit(false))
          .as("burst")
      )
  }

  /** q316: burst attribution — for every hour q254 flags as a burst,
    * the top-3 users by EXCESS contribution: their count in the
    * burst hour minus the count their overall share of the type's
    * traffic predicts for an hour of that size. This is the page an
    * on-call actually needs after the q254 alert fires — "who is
    * it": one dominant user with a huge excess is a bot or a stuck
    * retry loop; diffuse excess across thousands is organic. Every
    * count is exact; the expected contribution is micro-quantized
    * before the excess subtraction so ranking ties are
    * engine-stable.
    *
    * Scale: the q254 chain (bounded hourly frames) + ONE pass over
    * events restricted to burst (type, hour) pairs via a broadcast
    * semi-join — the corpus is never rescanned per burst; the top-3
    * window partitions on (type, hour), bounded by users-per-hour.
    */
  def burstAttribution(spark: SparkSession, dir: String): DataFrame = {
    val bursts = burstFlags(spark, dir)
      .filter(col("burst"))
      .select(col("event_type"), col("hour_us"), col("n").as("hour_n"))
    val ev = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("user_id")
      )
    val typeTotals = broadcast(
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("type_n"))
    )
    val userShare = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("user_n"))
    val inBurst = ev
      .join(broadcast(bursts), Seq("event_type", "hour_us"))
      .groupBy(col("event_type"), col("hour_us"), col("user_id"))
      .agg(count(lit(1)).as("n_in_hour"), max(col("hour_n")).as("hour_n"))
    val expected = graft.functions.IntMath.microRatio(
      col("user_n") * col("hour_n"), col("type_n"))
    val scoredU = inBurst
      .join(userShare, Seq("event_type", "user_id"))
      .join(typeTotals, "event_type")
      .withColumn(
        "excess_micro",
        col("n_in_hour") * lit(1000000L) - expected
      )
    val w = Window
      .partitionBy(col("event_type"), col("hour_us"))
      .orderBy(
        col("excess_micro").desc,
        col("user_id").asc
      )
    scoredU
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(
        col("event_type"),
        col("hour_us"),
        col("rk").cast("long").as("rk"),
        col("user_id"),
        col("n_in_hour"),
        col("user_n"),
        col("excess_micro")
      )
  }

  /** q320: deseasonalized anomaly flags — the q254 burst detector
    * re-run on RESIDUALS after removing each type's (ISO dow × hour)
    * calendar profile (the q280 cells): r = count − cell mean,
    * flagged at |r| > 3σ_r. q296 proves these series carry strong
    * daily/weekly cycles, so raw z-scores (q254) fire every Monday
    * 9am; the residual flag only fires when an hour is anomalous FOR
    * ITS SLOT. Emitted rows are the union of residual anomalies and
    * raw q254 bursts with both verdicts side by side — the
    * comparison IS the artifact (raw-only rows are seasonality false
    * alarms; residual-only rows are what seasonality masked).
    *
    * Determinism: cell means are milli-quantized integers, residuals
    * exact BIGINT, σ_r from the exact residual second moment.
    *
    * Scale: one (type, hour) agg → bounded hourly frames; the cell
    * profile is a |types|·168-row broadcast.
    */
  def deseasonalizedAnomalies(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      .groupBy(
        col("event_type"),
        date_trunc("hour", col("ts")).as("hour")
      )
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", ((dayofweek(col("hour")) + 5) % 7 + 1).cast("long"))
      .withColumn("hod", hour(col("hour")).cast("long"))
    val cells = broadcast(
      hourly
        .groupBy(col("event_type"), col("dow"), col("hod"))
        .agg(graft.functions.IntMath
          .idivHalfUp(sum(col("n")) * lit(1000L), count(lit(1)))
          .as("m_milli"))
    )
    val withR = hourly
      .join(cells, Seq("event_type", "dow", "hod"))
      .withColumn("r", lit(1000L) * col("n") - col("m_milli"))
    val sig = broadcast(
      withR
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_hours"),
          sum(col("r") * col("r")).as("rr")
        )
        .withColumn(
          "sigma_r",
          sqrt(col("rr").cast("double") / col("n_hours"))
        )
        .select(col("event_type"), col("sigma_r"))
    )
    val raw = burstFlags(spark, dir)
      .select(
        col("event_type"),
        col("hour_us"),
        col("burst").as("raw_burst")
      )
    val z = col("r").cast("double") / col("sigma_r")
    withR
      .join(sig, "event_type")
      .withColumn("hour_us", unix_micros(col("hour")))
      .join(raw, Seq("event_type", "hour_us"))
      .withColumn(
        "anomalous",
        coalesce(col("sigma_r") =!= 0.0 && abs(z) > 3.0, lit(false))
      )
      .filter(col("anomalous") || col("raw_burst"))
      .select(
        col("event_type"),
        col("hour_us"),
        col("n"),
        col("r").as("resid_milli"),
        when(col("sigma_r") === 0.0, lit(0L))
          .otherwise(round(z * 1e6).cast("long")).as("z_micro"),
        col("anomalous"),
        col("raw_burst")
      )
  }

  /** q321: transition-matrix stationarity — q262's first-order
    * (from, to) matrix is only a usable predictor if it is STABLE
    * over time; this splits the corpus at the midpoint timestamp
    * (a transition belongs to its second event's half), builds the
    * two per-half matrices, and runs a per-from-type χ² homogeneity
    * test of the outgoing distributions with a Wilson-Hilferty
    * normal tail (both engines, no χ² CDF). A drifted row says that
    * type's behavior changed mid-corpus — retrain windows, don't
    * pool.
    *
    * Determinism: the midpoint is exact integer arithmetic; cell
    * χ² contributions are nano-quantized BIGINTs before the
    * per-from sum.
    *
    * Scale: one lag window per user (bounded), one (from, to, half)
    * agg — |types|² cells; everything after is cell arithmetic.
    */
  def transitionStationarity(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    val mid = broadcast(
      ev.agg(
        ((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid")
      )
    )
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val tr = ev
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .crossJoin(mid)
      .select(
        col("prev").as("from_type"),
        col("event_type").as("to_type"),
        when(col("us") <= col("mid"), 1L).otherwise(2L).as("half")
      )
    val cellsW = tr
      .groupBy(col("from_type"), col("to_type"))
      .agg(
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("half") === 2L, 1L).otherwise(0L)).as("n2")
      )
    val rowTot = cellsW
      .groupBy(col("from_type"))
      .agg(sum(col("n1")).as("r1"), sum(col("n2")).as("r2"))
    val e1 = (col("n1") + col("n2")).cast("double") * col("r1") /
      (col("r1") + col("r2"))
    val e2 = (col("n1") + col("n2")).cast("double") * col("r2") /
      (col("r1") + col("r2"))
    val contrib =
      when(e1 > 0.0, (col("n1") - e1) * (col("n1") - e1) / e1)
        .otherwise(0.0) +
        when(e2 > 0.0, (col("n2") - e2) * (col("n2") - e2) / e2)
          .otherwise(0.0)
    val perFrom = cellsW
      .join(broadcast(rowTot), "from_type")
      .select(
        col("from_type"),
        col("n1"),
        col("n2"),
        round(contrib * 1e9).cast("long").as("c_nano")
      )
      .groupBy(col("from_type"))
      .agg(
        sum(col("n1")).as("n_first_half"),
        sum(col("n2")).as("n_second_half"),
        count(lit(1)).as("n_cells"),
        sum(col("c_nano")).as("chi2_nano")
      )
    val df = (col("n_cells") - 1).cast("double")
    val chi2 = col("chi2_nano").cast("double") / 1e9
    val zWh = (pow(chi2 / df, 1.0 / 3.0) -
      (lit(1.0) - lit(2.0) / (lit(9.0) * df))) /
      sqrt(lit(2.0) / (lit(9.0) * df))
    perFrom
      .filter(col("n_cells") > 1)
      .select(
        col("from_type"),
        col("n_first_half"),
        col("n_second_half"),
        graft.functions.IntMath
          .idivHalfUp(col("chi2_nano"), lit(1000000L)).as("chi2_milli"),
        (col("n_cells") - 1).as("df"),
        round(zWh * 1e3).cast("long").as("z_milli"),
        (zWh > lit(1.645)).as("drifted")
      )
  }

  /** q331: Markov entropy rate — per from-type, the entropy of its
    * outgoing transition distribution, and the corpus entropy rate
    * Σ πᵢ·Hᵢ with π the observed from-type mass: how PREDICTABLE the
    * event stream is given one step of context. Read with q262 (the
    * matrix) and q321 (its stability): a low entropy rate justifies
    * the Markov baseline for q158-style next-event examples; a
    * high one says one step of context buys little. Summands are
    * nano-quantized BIGINTs; π and H are exact-integer divisions.
    *
    * Scale: the q262 lag window + |types|²-cell arithmetic.
    */
  def entropyRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val tr = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rows = tr
      .withColumn(
        "rt",
        sum(col("n")).over(Window.partitionBy(col("from_type")))
      )
      .select(
        col("from_type"),
        col("n"),
        col("rt"),
        round(
          lit(-1.0) * col("n").cast("double") / col("rt") *
            log(col("n").cast("double") / col("rt")) * 1e9
        ).cast("long").as("h_nano")
      )
    val perFrom = rows
      .groupBy(col("from_type"))
      .agg(max(col("rt")).as("n_out"), sum(col("h_nano")).as("h_sum"))
    val tot = broadcast(perFrom.agg(sum(col("n_out")).as("n_total")))
    val withPi = perFrom
      .crossJoin(tot)
      .withColumn(
        "rate_term_nano",
        round(
          col("n_out").cast("double") / col("n_total") *
            (col("h_sum").cast("double") / 1e9) * 1e9
        ).cast("long")
      )
    val rate = broadcast(
      withPi.agg(sum(col("rate_term_nano")).as("rate_nano"))
    )
    withPi
      .crossJoin(rate)
      .select(
        col("from_type"),
        col("n_out"),
        graft.functions.IntMath.microRatio(col("n_out"), col("n_total"))
          .as("pi_ppm"),
        graft.functions.IntMath.idivHalfUp(col("h_sum"), lit(1000000L))
          .as("h_milli"),
        graft.functions.IntMath.idivHalfUp(col("rate_nano"), lit(1000000L))
          .as("rate_milli")
      )
  }

  /** q345: hourly concurrency percentiles — per event type, the
    * exact p50/p95/max of DISTINCT active users per observed hour.
    * Events-per-hour (q254's series) sizes throughput; distinct
    * users sizes per-user session state (q121/q123's stores scale
    * with concurrent keys, not events) — and the p95:p50 ratio is
    * the burstiness a provisioner pads for. Percentiles are exact
    * rank statistics over the bounded hourly frame (value at rank
    * ⌈p·n⌉, the q197 convention).
    *
    * Scale: one (type, hour, user) distinct pass → (type, hour)
    * counts (bounded by hours) → per-type rank windows on the
    * bounded frame.
    */
  def concurrencyPercentiles(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        col("user_id")
      )
      .distinct()
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("u"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("u").asc, col("h").asc)
    val ranked = hourly
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn(
        "cnt",
        count(lit(1)).over(Window.partitionBy(col("event_type")))
      )
    val p50 = ranked
      .filter(col("rn") === ceil(col("cnt") / 2))
      .select(col("event_type"), col("u").as("p50_users"))
    val p95 = ranked
      .filter(col("rn") === ceil(col("cnt") * 19 / 20))
      .select(col("event_type"), col("u").as("p95_users"))
    val mx = hourly
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        max(col("u")).as("max_users")
      )
    mx.join(broadcast(p50), "event_type")
      .join(broadcast(p95), "event_type")
      .select(
        col("event_type"),
        col("n_hours"),
        col("p50_users"),
        col("p95_users"),
        col("max_users"),
        graft.functions.IntMath
          .idivHalfUp(col("p95_users") * lit(1000L), col("p50_users"))
          .as("burst_ratio_milli")
      )
  }

  /** q350: common event paths — the top-5 three-step type sequences
    * per starting type, from per-user event streams (event-time
    * order, event_id tiebreak). q262's matrix is the one-step view;
    * paths of three expose the flows product analytics actually
    * names (view→click→purchase vs view→click→view), and the top-k
    * per start keeps the output bounded at |types|·5. Exact counts;
    * rank ties broken lexicographically.
    *
    * Scale: two lag columns on one per-user window (bounded), one
    * trigram agg (≤ |types|³ cells), a bounded rank window.
    */
  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val tri = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .filter(col("p2").isNotNull)
      .groupBy(
        col("p2").as("step1"),
        col("p1").as("step2"),
        col("event_type").as("step3")
      )
      .agg(count(lit(1)).as("n"))
    val tot = tri
      .groupBy(col("step1"))
      .agg(sum(col("n")).as("start_total"))
    val wr = Window
      .partitionBy(col("step1"))
      .orderBy(col("n").desc, col("step2").asc, col("step3").asc)
    tri
      .withColumn("rk", row_number().over(wr).cast("long"))
      .filter(col("rk") <= 5)
      .join(broadcast(tot), "step1")
      .select(
        col("step1"),
        col("rk"),
        col("step2"),
        col("step3"),
        col("n"),
        graft.functions.IntMath.microRatio(col("n"), col("start_total"))
          .as("share_ppm")
      )
  }

  /** q353: transition dwell-time percentiles — per (from, to) type
    * pair, the exact p50/p95 of the gap seconds between the two
    * events of each transition. q262 says WHICH transitions happen;
    * this says HOW FAST (a view→purchase median of 30 s vs 2 h is a
    * different product), and the p95 sets session-timeout and
    * watermark bounds per edge. Percentiles are exact rank
    * statistics over the QUANTIZED gap domain (second resolution —
    * the value-domain cumsum, never a window over transition rows).
    *
    * Scale: the q262 lag window, one (pair, gap_s) count frame
    * (bounded by distinct gaps), per-pair cumsums on that bounded
    * frame.
    */
  def transitionDwell(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val tr = Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(
        col("prev_type").as("from_type"),
        col("event_type").as("to_type"),
        expr("(us - prev_us) div 1000000").as("gap_s")
      )
    val counts = tr
      .groupBy(col("from_type"), col("to_type"), col("gap_s"))
      .agg(count(lit(1)).as("c"))
    val wc = Window
      .partitionBy(col("from_type"), col("to_type"))
      .orderBy(col("gap_s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cumc", sum(col("c")).over(wc))
      .withColumn(
        "n",
        sum(col("c")).over(
          Window.partitionBy(col("from_type"), col("to_type"))
        )
      )
    val p50 = cum
      .filter(col("cumc") * 2 >= col("n"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(min(col("gap_s")).as("p50_gap_s"))
    val p95 = cum
      .filter(col("cumc") * 20 >= col("n") * 19)
      .groupBy(col("from_type"), col("to_type"))
      .agg(min(col("gap_s")).as("p95_gap_s"))
    val nn = cum
      .groupBy(col("from_type"), col("to_type"))
      .agg(max(col("n")).as("n"))
    nn.join(p50, Seq("from_type", "to_type"))
      .join(p95, Seq("from_type", "to_type"))
      .select(
        col("from_type"),
        col("to_type"),
        col("n"),
        col("p50_gap_s"),
        col("p95_gap_s")
      )
  }

  /** q355: burst value impact — per event type, the event count and
    * mean `value` inside q254's burst hours vs all other hours. The
    * triage question after an alert: organic bursts carry normal (or
    * better) per-event value; bot storms and retry loops carry
    * near-zero. Joining the verdict to the ledger answers it
    * before anyone pages the on-call. Values are micro-quantized
    * per event and summed exactly.
    *
    * Scale: the q254 chain (bounded) broadcast against one event
    * scan; a |types|·2 agg.
    */
  def burstValueImpact(spark: SparkSession, dir: String): DataFrame = {
    val bursts = burstFlags(spark, dir)
      .filter(col("burst"))
      .select(col("event_type"), col("hour_us"), lit(true).as("in_burst"))
    val ev = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        round(col("value") * 1e6).cast("long").as("vm")
      )
    ev.join(broadcast(bursts), Seq("event_type", "hour_us"), "left")
      .groupBy(
        col("event_type"),
        coalesce(col("in_burst"), lit(false)).as("in_burst")
      )
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("v_sum"))
      .select(
        col("event_type"),
        col("in_burst"),
        col("n_events"),
        round(col("v_sum").cast("double") / col("n_events"))
          .cast("long").as("mean_value_micro")
      )
  }

  /** q357: user-activity five-point summary — per event type, the
    * exact min/p25/p50/p75/max of events per user. The
    * abuse-and-capacity gauge: a p75≈median with a huge max is a
    * bot profile (q316 names it); a fat p75 is genuinely heavy
    * usage. Exact rank statistics over the quantized count domain
    * (per-user counts grouped by value, never a window over users).
    *
    * Scale: one (type, user) agg → (type, count-value) frame
    * (bounded by distinct activity levels) → value-domain cumsums.
    */
  def userActivityFivePoint(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val perUser = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("k"))
    val vals = perUser
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("c"))
    val wc = Window
      .partitionBy(col("event_type"))
      .orderBy(col("k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cumc", sum(col("c")).over(wc))
      .withColumn(
        "n",
        sum(col("c")).over(Window.partitionBy(col("event_type")))
      )
    def pick(num: Int, den: Int, name: String): DataFrame =
      cum
        .filter(col("cumc") * den >= col("n") * num)
        .groupBy(col("event_type"))
        .agg(min(col("k")).as(name))
    val ext = cum
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_users"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")
      )
    ext
      .join(broadcast(pick(1, 4, "p25_k")), "event_type")
      .join(broadcast(pick(1, 2, "p50_k")), "event_type")
      .join(broadcast(pick(3, 4, "p75_k")), "event_type")
      .select(
        col("event_type"),
        col("n_users"),
        col("min_k"),
        col("p25_k"),
        col("p50_k"),
        col("p75_k"),
        col("max_k")
      )
  }

  /** q358: value concentration — per event type, the share of total
    * event value carried by the top 1% of users (by their value
    * sum), plus the user-count and value totals. The revenue twin of
    * q357's activity profile: whale-concentration decides whether
    * per-user protections (rate limits, fraud review) target the
    * right tail. Exact: per-user micro sums, the top-1% threshold by
    * exact rank (⌈n/100⌉ users), tie handling by (value, user_id)
    * order.
    *
    * Scale: one (type, user) agg; the rank runs per type over user
    * rows (two-level rank at extreme scale); one bounded rollup.
    */
  def valueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(round(col("value") * 1e6).cast("long")).as("v"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("v").desc, col("user_id").asc)
    perUser
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn(
        "n",
        count(lit(1)).over(Window.partitionBy(col("event_type")))
      )
      .withColumn("k_top", ceil(col("n") / lit(100.0)).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_users"),
        max(col("k_top")).as("k_top"),
        sum(col("v")).as("v_total"),
        sum(when(col("rk") <= col("k_top"), col("v")).otherwise(0L))
          .as("v_top")
      )
      .select(
        col("event_type"),
        col("n_users"),
        col("k_top"),
        col("v_total"),
        col("v_top"),
        when(col("v_total") === 0L, lit(null).cast("long"))
          .otherwise(
            graft.functions.IntMath
              .microRatio(col("v_top"), col("v_total")))
          .as("top_share_ppm")
      )
  }

  /** q359: weekly growth — per event type and ISO week start, the
    * event count and week-over-week growth in ppm (the first week
    * has none). The trend line under q254's hourly anomalies and
    * q320's seasonality: sustained growth is capacity planning,
    * sustained decline is a product conversation, and both are
    * invisible at hourly granularity. Exact counts; growth is one
    * division; weeks come from date_trunc so both engines bucket
    * identically.
    *
    * Scale: one (type, week) agg (bounded by the time span), a
    * bounded lag window.
    */
  def weeklyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables
      .events(spark, dir)
      .groupBy(
        col("event_type"),
        unix_micros(date_trunc("week", col("ts"))).as("week_us")
      )
      .agg(count(lit(1)).as("n"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("week_us").asc)
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(
        col("event_type"),
        col("week_us"),
        col("n"),
        col("prev_n"),
        when(col("prev_n").isNull, lit(null).cast("long"))
          .otherwise(
            graft.functions.IntMath.idivHalfUpSigned(
              (col("n") - col("prev_n")) * lit(1000000L),
              col("prev_n"))
          ).as("growth_ppm")
      )
  }

  /** q237: exponentially-decayed event counts — per event type and
    * half-life (1 h, 6 h, 24 h), the decay-weighted count
    * Σ exp(−ln2 · age/half_life) anchored at the corpus's latest
    * timestamp. The freshness-weighted activity metric behind
    * trending/decay dashboards and recency-weighted sampling: a
    * count whose unit is "events as of now", where an event
    * half_life ago is worth half an event. Three half-lives in one
    * scan show how fast each type's mass evaporates.
    *
    * Scale: one broadcast max-ts row, one scan × 3 literal
    * half-lives, one (type, half-life) partial agg — |types|·3 rows
    * out.
    */
  def decayCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("ts"))
    val ref = ev.agg(max(col("ts")).as("ref"))
    val halfLives = Seq(3600L, 21600L, 86400L)
    ev
      .crossJoin(broadcast(ref))
      .select(
        col("event_type"),
        ((unix_micros(col("ref")) - unix_micros(col("ts"))).cast("double") /
          lit(1e6)).as("age_s"),
        explode(lit(halfLives.toArray)).as("half_life_s")
      )
      .groupBy(col("event_type"), col("half_life_s"))
      .agg(
        count(lit(1)).as("n_events"),
        round(
          sum(exp(lit(-math.log(2.0)) * col("age_s") / col("half_life_s"))),
          6
        ).as("decayed_count")
      )
  }

  /** q296: seasonality strength per event type — the sample
    * autocorrelation of the DENSE hourly count series at lags 1
    * (persistence), 24 (daily cycle), and 168 (weekly cycle). q254
    * flags individual bursts against a trailing window; this is the
    * global periodic structure those thresholds should be conditioned
    * on (a type with acf₂₄ ≈ 0.8 needs hour-of-day-relative burst
    * baselines, q280's cells). The grid is filled with explicit
    * zero hours (sequence over the [min, max] hour range — absent
    * hours are real observations of zero, and skipping them biases
    * the ACF toward busy periods).
    *
    * Determinism: hour buckets are exact integer `div`; deviations
    * use the milli-mean integer pivot (d = 1000·x − m), so both ACF
    * sums are exact BIGINTs and the ratio is one division.
    *
    * Scale: one (type, hour) count agg; the dense series is bounded
    * by the time span (hours, not events), so the per-type window is
    * bounded by construction; three lead() columns ride one window.
    */
  /** The dense zero-filled hourly count series with the milli-mean
    * integer pivot — shared by q296's ACF and q308's CUSUM (absent
    * hours are real zero observations for both).
    */
  private def denseHourlySeries(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val counts = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h")
      )
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
    val span = counts
      .groupBy(col("event_type"))
      .agg(min(col("h")).as("h_min"), max(col("h")).as("h_max"))
    val grid = span
      .select(
        col("event_type"),
        explode(sequence(col("h_min"), col("h_max"))).as("h")
      )
    val dense = grid
      .join(counts, Seq("event_type", "h"), "left")
      .select(
        col("event_type"),
        col("h"),
        coalesce(col("x"), lit(0L)).as("x")
      )
    val m = broadcast(
      dense
        .groupBy(col("event_type"))
        .agg(graft.functions.IntMath
          .idivHalfUp(sum(col("x")) * lit(1000L), count(lit(1)))
          .as("m_milli"))
    )
    dense
      .join(m, "event_type")
      .withColumn("d", lit(1000L) * col("x") - col("m_milli"))
  }

  def hourlyAcf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
    val withD = denseHourlySeries(spark, dir)
      .withColumn("d1", lead(col("d"), 1).over(w))
      .withColumn("d24", lead(col("d"), 24).over(w))
      .withColumn("d168", lead(col("d"), 168).over(w))
    val agg = withD
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("d") * col("d")).as("den"),
        sum(when(col("d1").isNotNull, col("d") * col("d1"))
          .otherwise(0L)).as("num1"),
        sum(when(col("d24").isNotNull, col("d") * col("d24"))
          .otherwise(0L)).as("num24"),
        sum(when(col("d168").isNotNull, col("d") * col("d168"))
          .otherwise(0L)).as("num168")
      )
    agg
      .select(
        col("event_type"),
        col("n_hours"),
        col("den"),
        explode(
          array(
            struct(lit(1L).as("lag"), col("num1").as("num")),
            struct(lit(24L).as("lag"), col("num24").as("num")),
            struct(lit(168L).as("lag"), col("num168").as("num"))
          )
        ).as("e")
      )
      .select(
        col("event_type"),
        col("e.lag").as("lag"),
        col("n_hours"),
        when(col("den") === 0L, lit(0L))
          .otherwise(
            graft.functions.IntMath
              .idivHalfUpSigned(col("e.num") * lit(1000000L), col("den"))
          ).as("acf_micro"),
        // 0.2 threshold as the exact cross-multiplication num·5 > den
        (col("den") =!= 0L && col("e.num") * 5 > col("den")).as("seasonal")
      )
  }

  /** q308: CUSUM level-shift detection per event type — Page's
    * cumulative-sum chart over the dense hourly series, computed in
    * CLOSED FORM: the sequential recursion S_t = max(0, S_{t−1}+d_t)
    * equals P_t − min_{j≤t} P_j for the prefix sums P, so two
    * windows (a cumsum and a running min) replace the unparalleliz-
    * able loop. q254's z-score flags single-hour spikes; CUSUM
    * accumulates SMALL persistent shifts (a source that quietly
    * doubles its rate never trips a 3σ hourly gate but walks the
    * CUSUM straight up). Alarm when S_t > 8σ_d, σ_d from the exact
    * integer second moment of the milli-pivot deviations. Per type:
    * the path maximum, its hour, alarm count, and first alarm hour.
    *
    * Determinism: P and S are exact BIGINT (milli-deviation cumsums);
    * only the σ threshold comparison is a double.
    *
    * Scale: the dense series is bounded by the time span; per-type
    * windows never see event rows.
    */
  def cusumShifts(spark: SparkSession, dir: String): DataFrame = {
    val wc = Window
      .partitionBy(col("event_type"))
      .orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val series = denseHourlySeries(spark, dir)
      .withColumn("p", sum(col("d")).over(wc))
      .withColumn("pmin", min(col("p")).over(wc))
      .withColumn("s", col("p") - least(col("pmin"), lit(0L)))
    val sd = broadcast(
      series
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_hours"),
          sum(col("d") * col("d")).as("dd")
        )
        .withColumn(
          "sigma_milli",
          sqrt(col("dd").cast("double") / col("n_hours"))
        )
    )
    val flagged = series
      .join(sd, "event_type")
      .withColumn(
        "alarm",
        col("s").cast("double") > lit(8.0) * col("sigma_milli")
      )
    val summary = flagged
      .groupBy(col("event_type"))
      .agg(
        max(col("n_hours")).as("n_hours"),
        round(max(col("sigma_milli"))).cast("long").as("sigma_milli"),
        max(col("s")).as("max_cusum_milli"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("alarm"), col("h"))).as("first_alarm_h")
      )
    // peak hour: the LAST hour attaining the path maximum (exact
    // integer equality, oracle-identical tiebreak)
    val peak = flagged
      .join(
        broadcast(
          summary.select(col("event_type"), col("max_cusum_milli"))
        ),
        "event_type"
      )
      .filter(col("s") === col("max_cusum_milli"))
      .groupBy(col("event_type"))
      .agg(max(col("h")).as("peak_h"))
    summary
      .join(broadcast(peak), "event_type")
      .select(
        col("event_type"),
        col("n_hours"),
        col("sigma_milli"),
        col("max_cusum_milli"),
        col("peak_h"),
        col("n_alarms"),
        col("first_alarm_h")
      )
  }

  /** q366: event-type co-occurrence lift — for every unordered type
    * pair, how much more often the two types co-occur in the same
    * (user, hour) context than independence predicts:
    * lift = P(a,b) / (P(a)·P(b)) over distinct contexts, emitted in
    * exact integer milli as n_ab·N·1000 / (n_a·n_b). The
    * market-basket view of the event stream: high-lift pairs are
    * behavioral bundles (the q262 transition matrix sees ORDER;
    * this sees association regardless of order), and lift < 1 pairs
    * are substitutes. Context = the deterministic hour bucket — no
    * session inference, so the oracle replays it exactly.
    *
    * Scale: one scan → distinct (context, type) (partial agg), a
    * self-join keyed on the context (collision-linear in co-occurring
    * pairs, never |types|²·|contexts|), two bounded rollups. All
    * integer arithmetic (round-9 seam).
    */
  def typeCooccurrenceLift(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    import graft.util.Caches._
    val ctx = Tables
      .events(spark, dir)
      .select(
        concat_ws("#", col("user_id").cast("string"),
          unix_micros(date_trunc("hour", col("ts"))).cast("string"))
          .as("ctx"),
        col("event_type")
      )
      .distinct()
      .cacheTracked()
    val n = broadcast(ctx.select(col("ctx")).distinct()
      .agg(count(lit(1)).as("n_ctx")))
    val singles = ctx
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val pairs = ctx
      .join(
        ctx.select(col("ctx"), col("event_type").as("type_b")),
        Seq("ctx"))
      .filter(col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(singles.select(col("event_type").as("type_a"),
        col("n_t").as("n_a")), Seq("type_a"))
      .join(singles.select(col("event_type").as("type_b"),
        col("n_t").as("n_b")), Seq("type_b"))
      .crossJoin(n)
      .select(
        col("type_a"),
        col("type_b"),
        col("n_a"),
        col("n_b"),
        col("n_ab"),
        idivHalfUp(col("n_ab") * col("n_ctx") * lit(1000L),
          col("n_a") * col("n_b")).as("lift_milli")
      )
  }

  /** q390: event-type daily-share stability — for every event type,
    * the lowest and highest share of a single day's traffic it took
    * across the corpus window (exact ppm per day; a day×type lattice
    * so absence counts as 0, not a gap), and the swing between them.
    * The composition-stability gauge under every daily mix/rate plan
    * (q104/q332): a type whose share swings 3× between days makes
    * yesterday's per-type thresholds wrong tomorrow. Days are exact
    * integer microsecond div 86400e6 from the corpus min — no
    * calendar arithmetic.
    *
    * Scale: one (day, type) partial agg over the scan; the lattice
    * is |days|·|types| (time-span × vocabulary, not data-sized).
    */
  def dailyShareStability(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    val e = Tables
      .events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val origin = e.agg(min(col("us")).as("us0"))
    val byDay = e
      .crossJoin(broadcast(origin))
      .select(idiv(col("us") - col("us0"), lit(86400000000L)).as("day"),
        col("event_type"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val days = byDay.select(col("day")).distinct()
    val types = byDay.select(col("event_type")).distinct()
    val lattice = days.crossJoin(types)
    val dayTotals = byDay
      .groupBy(col("day"))
      .agg(sum(col("n")).as("day_total"))
    lattice
      .join(byDay, Seq("day", "event_type"), "left")
      .na
      .fill(0L, Seq("n"))
      .join(dayTotals, "day")
      .select(col("event_type"),
        microRatio(col("n"), col("day_total")).as("share_ppm"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        min(col("share_ppm")).as("min_share_ppm"),
        max(col("share_ppm")).as("max_share_ppm")
      )
      .withColumn("swing_ppm",
        col("max_share_ppm") - col("min_share_ppm"))
  }

  /** q405: transition predictability — per FROM-type, the Simpson
    * coincidence probability of its next-event distribution: the
    * exact chance two transitions drawn from the same source type go
    * to the SAME next type, in ppm. The logarithm-free predictability
    * score on top of q262's transition matrix (entropy would need ln;
    * coincidence is a pure integer ratio, mergeable across shards by
    * summing the per-pair numerators): 1e6 = deterministic next step
    * (a funnel), ~1/|types| = anything can follow.
    *
    * Scale: the q262 lag pass (one user-keyed window), a (from, to)
    * partial agg, and a |types|-row rollup.
    */
  def transitionPredictability(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val trans = Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("c"))
    trans
      .groupBy(col("from_type"))
      .agg(
        sum(col("c")).as("n_transitions"),
        count(lit(1)).as("n_next_types"),
        sum(col("c") * (col("c") - 1)).as("coincidence_pairs")
      )
      .filter(col("n_transitions") >= 2)
      .select(
        col("from_type"), col("n_transitions"), col("n_next_types"),
        col("coincidence_pairs"),
        microRatio(col("coincidence_pairs"),
          col("n_transitions") * (col("n_transitions") - 1))
          .as("predictability_ppm")
      )
  }

  /** q408: load-error concordance — Kendall-style concordant /
    * discordant pair counts between hourly traffic volume and hourly
    * error count across the corpus's hour buckets. C >> D means
    * errors scale WITH load (capacity problem); C ≈ D means errors
    * are load-independent (bugs, not pressure). The q374 integer
    * concordance machinery pointed at an ops question; the pair set
    * is bounded by the time SPAN squared (hours², not events²), and
    * the z-statistic lives in the spec.
    */
  def loadErrorConcordance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val hourly = Tables
      .events(spark, dir)
      .select(
        idiv(unix_micros(col("ts")), lit(3600000000L)).as("hour"),
        when(col("event_type") === "error", 1L).otherwise(0L)
          .as("is_err")
      )
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("volume"), sum(col("is_err")).as("errors"))
    val a = hourly.select(col("hour").as("h_a"),
      col("volume").as("v_a"), col("errors").as("e_a"))
    val b = hourly.select(col("hour").as("h_b"),
      col("volume").as("v_b"), col("errors").as("e_b"))
    a.join(b, col("h_a") < col("h_b"))
      .select(
        (col("v_a") - col("v_b")).as("dv"),
        (col("e_a") - col("e_b")).as("de")
      )
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("dv") =!= 0 && col("de") =!= 0 &&
          (col("dv") > 0) === (col("de") > 0), 1L).otherwise(0L))
          .as("concordant"),
        sum(when(col("dv") =!= 0 && col("de") =!= 0 &&
          (col("dv") > 0) =!= (col("de") > 0), 1L).otherwise(0L))
          .as("discordant"),
        sum(when(col("dv") === 0 || col("de") === 0, 1L).otherwise(0L))
          .as("ties")
      )
      .withColumn("tau_num", col("concordant") - col("discordant"))
  }

  /** q409: late-event census — how much of the stream arrives with
    * an event time BEHIND the maximum event time already seen in
    * arrival (event_id) order, banded by lateness. THE number that
    * sets a Structured Streaming watermark: the "≥ 10 min late" band
    * is exactly what `withWatermark("10 minutes")` would drop, and
    * on-time share says whether event time ≈ arrival order at all.
    *
    * Scale: the running maximum over arrival order is computed as a
    * DISTRIBUTED PREFIX MAX — range-shuffle on event_id, one
    * within-partition running max, then each partition's incoming
    * prefix (the max over all earlier partitions, P-row frame,
    * broadcast) — the q258 cumulative-sum topology with max as the
    * monoid, never a single-partition window.
    */
  def lateEventCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val e = Tables
      .events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val parts = e
      .repartitionByRange(8, col("event_id").asc)
      .withColumn("pid", spark_partition_id())
    val wIn = Window
      .partitionBy(col("pid"))
      .orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = parts
      .withColumn("prev_max_in", max(col("us")).over(wIn))
      .cacheTracked()
    val offsets = withLocal
      .groupBy(col("pid"))
      .agg(max(col("us")).as("pmax"))
      .withColumn("prefix_max",
        max(col("pmax")).over(
          Window.orderBy(col("pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pid"), col("prefix_max"))
    val lateness = withLocal
      .join(broadcast(offsets), Seq("pid"))
      .select(
        col("event_type"),
        // the event's own time floors the running max so the first
        // event scores exactly 0 (no Long.MinValue sentinel — the
        // subtraction would overflow)
        (greatest(
          coalesce(col("prev_max_in"), col("us")),
          coalesce(col("prefix_max"), col("us"))
        ) - col("us")).as("late_us")
      )
    lateness
      .select(
        col("event_type"),
        when(col("late_us") <= 0L, "on_time")
          .when(col("late_us") <= 60000000L, "lt_1min")
          .when(col("late_us") <= 600000000L, "lt_10min")
          .otherwise("dropped_at_10min").as("band")
      )
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("type_total",
        sum(col("n_events")).over(
          Window.partitionBy(col("event_type"))))
      .withColumn("band_ppm",
        microRatio(col("n_events"), col("type_total")))
  }

  /** q410: purchase-value five-point summary per event type — exact
    * min/P25/P50/P75/max rank picks of the RAW value doubles (picked,
    * never computed: a selected double read from the same parquet is
    * bit-identical in every engine, so the float never breaks the
    * hash). The distribution shape behind q355/q358's aggregates.
    *
    * Scale (round 10, was a per-type row-level sort): value-domain
    * cumsum — the q356 `lengthFivePoint` form. One groupBy collapses
    * the stream to the DISTINCT (type, value) frame (values are
    * quantized, so the frame is bounded by the value domain, not the
    * event count); the rank pick `value at rank ceil(n·p/100)` is
    * equivalently `min value whose cumulative count · 100 ≥ n · p`,
    * a filter + min over the bounded frame. No N-row window task.
    */
  def valueFivePoint(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables
      .events(spark, dir)
      .select(col("event_type"), col("value"))
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("c"))
    val wc = Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cumc", sum(col("c")).over(wc))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .cacheTracked()
    def pick(p: Int, name: String): DataFrame =
      cum
        .filter(col("cumc") * 100 >= col("n") * p)
        .groupBy(col("event_type"))
        .agg(min(col("value")).as(name))
    val out = cum
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value")
      )
      .join(broadcast(pick(25, "p25_value")), "event_type")
      .join(broadcast(pick(50, "p50_value")), "event_type")
      .join(broadcast(pick(75, "p75_value")), "event_type")
      .select(
        col("event_type"), col("n_events"), col("min_value"),
        col("p25_value"), col("p50_value"), col("p75_value"),
        col("max_value")
      )
    out
  }

  /** q412: session-gap sensitivity sweep — session counts and shape
    * at inactivity thresholds {5, 30, 120} minutes, in one pass. The
    * report an operator reads BEFORE pinning q29's 30-minute gap: a
    * threshold on the flat part of the n_sessions curve is robust; on
    * a steep part, session metrics are artifacts of the constant.
    * Mean events/session is the exact half-up milli ratio.
    *
    * Scale: events explode ×3 (the threshold lattice), then ONE
    * (threshold, user) windowed prefix-sum — same topology as q29,
    * three logical copies.
    */
  def sessionGapSweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    val e = Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .crossJoin(
        spark.range(0, 3).select(
          element_at(array(lit(5L), lit(30L), lit(120L)),
            (col("id") + 1).cast("int")).as("gap_minutes")))
    val byUser = Window
      .partitionBy(col("gap_minutes"), col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val sessions = e
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") >
            col("gap_minutes") * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_new"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("gap_minutes"), col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_ev"))
    sessions
      .groupBy(col("gap_minutes"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_session_events")
      )
      .select(
        col("gap_minutes"), col("n_sessions"), col("n_events"),
        col("max_session_events"),
        idivHalfUp(col("n_events") * lit(1000L), col("n_sessions"))
          .as("mean_events_milli")
      )
  }

  /** q414: behavioral twins — users whose event-type count profiles
    * are IDENTICAL (same types, same counts), grouped by a canonical
    * profile fingerprint. Twin groups flag scripted/bot traffic (one
    * automation behind many accounts) and duplicate instrumentation;
    * per group-size band: groups, users, and the largest group. The
    * fingerprint is a deterministic string of the sorted (type,
    * count) list — entity resolution on behavior, no floats anywhere.
    *
    * Scale: one (user, type) partial agg → per-user sorted-profile
    * fingerprint (bounded by |types|) → fingerprint-keyed counts.
    */
  def behavioralTwins(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val profiles = Tables
      .events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("event_type"), col("c")))),
            s => concat(s("event_type"), lit(":"), s("c"))))
          .as("fp"))
    val groups = profiles
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("group_size"))
    val tot = profiles.agg(count(lit(1)).as("n_users"))
    groups
      .select(
        when(col("group_size") === 1, "unique")
          .when(col("group_size") <= 3, "twins_2_3")
          .otherwise("herd_4_plus").as("band"),
        col("group_size")
      )
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("group_size")).as("n_users_in_band"),
        max(col("group_size")).as("largest_group")
      )
      .crossJoin(broadcast(tot))
      .select(
        col("band"), col("n_groups"), col("n_users_in_band"),
        col("largest_group"),
        microRatio(col("n_users_in_band"), col("n_users"))
          .as("user_ppm")
      )
  }

  /** q415: sequence-violation audit — users whose event ordering
    * breaks domain invariants: a purchase BEFORE any signup, and a
    * click BEFORE any view. On instrumented product data these should
    * be ~0; a synthetic or corrupted feed lights them up, which makes
    * this the semantic-sanity twin of q372's referential audit
    * (foreign keys can be perfectly clean while the event ORDER is
    * nonsense). Per rule: users carrying both event types, violators
    * (the earlier-bound event's min time precedes the later-bound
    * one's), exact ppm.
    *
    * Scale: one per-(user, type) min-timestamp aggregate feeds both
    * rules — map-side combinable, |users|·|types| state, no windows.
    */
  def sequenceViolations(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val firstByType = Tables
      .events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("first_us"))
    def rule(name: String, earlier: String, later: String): DataFrame = {
      val e = firstByType
        .filter(col("event_type") === earlier)
        .select(col("user_id"), col("first_us").as("e_us"))
      val l = firstByType
        .filter(col("event_type") === later)
        .select(col("user_id"), col("first_us").as("l_us"))
      e.join(l, "user_id")
        .agg(
          count(lit(1)).as("n_users_with_both"),
          sum(when(col("l_us") < col("e_us"), 1L).otherwise(0L))
            .as("n_violations")
        )
        .select(lit(name).as("rule"), col("n_users_with_both"),
          col("n_violations"))
    }
    rule("purchase_before_signup", "signup", "purchase")
      .unionByName(rule("click_before_view", "view", "click"))
      .select(
        col("rule"), col("n_users_with_both"), col("n_violations"),
        microRatio(col("n_violations"),
          greatest(col("n_users_with_both"), lit(1L)))
          .as("violation_ppm")
      )
  }

  /** q427: engagement-depth bands — users by DISTINCT ACTIVE DAYS
    * (exact integer day buckets): one-day drive-bys, casual
    * (2-7 days), habitual (8+), with each band's event and value
    * mass. The denominator question under q95's retention and q358's
    * whale analysis: what fraction of apparent "users" ever came
    * back at all. Day buckets are epoch-micro div 86400e6 (the q378
    * convention).
    *
    * Scale: one (user, day) dedup agg → per-user distinct-day count
    * → 3-band rollup; all map-side combinable.
    */
  def activeDaysBands(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    val perUser = Tables
      .events(spark, dir)
      .select(col("user_id"),
        idiv(unix_micros(col("ts")), lit(86400000000L)).as("day"),
        col("value"))
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_events")
      )
    val banded = perUser
      .select(
        when(col("n_days") === 1, "1_drive_by")
          .when(col("n_days") <= 7, "2_7_casual")
          .otherwise("8_plus_habitual").as("band"),
        col("n_events")
      )
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
    val tot = banded.agg(sum(col("n_users")).as("total_users"))
    banded
      .crossJoin(broadcast(tot))
      .select(
        col("band"), col("n_users"), col("n_events"),
        microRatio(col("n_users"), col("total_users")).as("user_ppm")
      )
  }

  /** q432: first-touch conversion — users cohorted by their FIRST
    * event's type (ties at the same microsecond break by event_id),
    * with each cohort's later-purchase conversion rate in exact ppm.
    * The acquisition-channel census: if signup-first users convert
    * at 3× view-first users, the funnel's entry point carries
    * predictive signal and rate plans (q332) should weight it.
    * "Later purchase" = any purchase event strictly after the first
    * event (a purchase-first user converts only if a SECOND purchase
    * follows — the standard repeat-conversion reading).
    *
    * Scale: one per-user min-struct aggregate (map-side combinable)
    * + one purchase-side min — both user-keyed, no windows.
    */
  def firstTouchConversion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val e = Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val first = e
      .groupBy(col("user_id"))
      .agg(min(struct(col("us"), col("event_id"), col("event_type")))
        .as("f"))
      .select(col("user_id"), col("f.event_type").as("first_type"),
        col("f.us").as("first_us"), col("f.event_id").as("first_id"))
    val purch = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"),
        col("event_id").as("p_id"))
    val converted = first
      .join(purch, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("first_type"))
      .agg(
        max(when(col("p_us") > col("first_us") ||
          (col("p_us") === col("first_us") &&
            col("p_id") > col("first_id")), 1L).otherwise(0L))
          .as("converted"))
    val cohorts = converted
      .groupBy(col("first_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
    cohorts.select(
      col("first_type"), col("n_users"), col("n_converted"),
      microRatio(col("n_converted"), col("n_users"))
        .as("conversion_ppm")
    )
  }

  /** q436: sessions-per-user five-point — the exact distribution of
    * q29 session counts per user (min/P25/P50/P75/max rank picks).
    * Completes the session family: q29 builds sessions, q412 sweeps
    * the gap, q123/q124 size them dynamically — this says how many
    * a USER accumulates, the visit-frequency shape retention models
    * consume.
    *
    * Scale (round 10, was row_number over an UNPARTITIONED window —
    * the whole |users| frame in one task): the rank is now
    * [[Ranking.withGlobalRank]] (range shuffle + zipWithIndex, the
    * q422 machinery), so no single-partition stage exists anywhere
    * in the plan; n_users is max(global rank), and the five picks
    * stay the exact `rank = ceil(n·p/100)` elements.
    */
  def sessionsPerUserFivePoint(spark: SparkSession, dir: String): DataFrame = {
    val perUser = sessionize(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
    val ranked = Ranking
      .withGlobalRank(
        perUser,
        Seq(col("n_sessions").asc, col("user_id").asc),
        "rn",
        32
      )
      .cacheTracked()
    val cnt = ranked.agg(max(col("rn")).as("cnt"))
    def pick(p: Int) =
      max(when(col("rn") === ceil(col("cnt") * p / 100),
        col("n_sessions")))
    ranked
      .crossJoin(broadcast(cnt))
      .agg(
        max(col("cnt")).as("n_users"),
        min(col("n_sessions")).as("min_sessions"),
        pick(25).as("p25_sessions"),
        pick(50).as("p50_sessions"),
        pick(75).as("p75_sessions"),
        max(col("n_sessions")).as("max_sessions")
      )
  }

  /** q440: inter-arrival gap five-point per event type — the exact
    * min/P25/P50/P75/max of the q261 gap stream (microsecond
    * integers, picked not computed). q261's mean and CV² say HOW
    * bursty; the quantiles say WHERE the mass sits (a tight P25-P75
    * with a huge max is a scheduled feed with outages; a wide body
    * is organic traffic).
    *
    * Scale (round 10, was a second per-type row-level sort for the
    * rank picks): the gap stream is the q261 lag (per-type event-time
    * order; at 100 TB, per (type, day) shards exactly as q261
    * documents), and the five-point is the q356 value-domain cumsum —
    * gaps are quantized integer microseconds, so the DISTINCT
    * (type, gap) frame is bounded by the gap domain, and the rank
    * pick `gap at rank ceil(n·p/100)` is `min gap whose cumulative
    * count · 100 ≥ n · p`. No N-row window task in the pick stage.
    */
  def interArrivalFivePoint(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    val gaps = Tables
      .events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val vals = gaps
      .groupBy(col("event_type"), col("gap"))
      .agg(count(lit(1)).as("c"))
    val wc = Window
      .partitionBy(col("event_type"))
      .orderBy(col("gap").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cumc", sum(col("c")).over(wc))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .cacheTracked()
    def pick(p: Int, name: String): DataFrame =
      cum
        .filter(col("cumc") * 100 >= col("n") * p)
        .groupBy(col("event_type"))
        .agg(min(col("gap")).as(name))
    cum
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_gaps"),
        min(col("gap")).as("min_gap_us"),
        max(col("gap")).as("max_gap_us")
      )
      .join(broadcast(pick(25, "p25_gap_us")), "event_type")
      .join(broadcast(pick(50, "p50_gap_us")), "event_type")
      .join(broadcast(pick(75, "p75_gap_us")), "event_type")
      .select(
        col("event_type"), col("n_gaps"), col("min_gap_us"),
        col("p25_gap_us"), col("p50_gap_us"), col("p75_gap_us"),
        col("max_gap_us")
      )
  }

  /** q378: discrete life table for time-to-first-purchase — per whole
    * day since each user's FIRST event: how many users are still at
    * risk (no purchase yet, still observable), how many convert that
    * day, how many are censored (observation window ends before they
    * purchase). The survival-analysis primitive under every
    * activation/retention metric; the Kaplan-Meier product itself is
    * a product of rationals, so it lives in the spec — the hashed
    * surface is NOTHING BUT counts. Day offsets are exact integer
    * microsecond differences div 86400e6 (no calendar arithmetic, no
    * timezone sensitivity).
    *
    * Scale: two per-user min-aggregations (map-side combinable), one
    * scalar max (the censoring horizon), then a groupBy(day) whose
    * cumulative window runs over the bounded day lattice (the
    * corpus's time SPAN, not its size).
    */
  def purchaseSurvival(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val e = Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val first = e.groupBy(col("user_id")).agg(min(col("us")).as("us0"))
    val purch = e
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("usp"))
    val horizon = e.agg(max(col("us")).as("us_max"))
    val perUser = first
      .join(purch, Seq("user_id"), "left")
      .crossJoin(horizon)
      .select(
        idiv(coalesce(col("usp"), col("us_max")) - col("us0"),
          lit(86400000000L)).as("day"),
        when(col("usp").isNotNull, 1L).otherwise(0L).as("converted")
      )
    val byDay = perUser
      .groupBy(col("day"))
      .agg(
        sum(col("converted")).as("n_events"),
        sum(lit(1L) - col("converted")).as("n_censored"),
        count(lit(1)).as("n_ending")
      )
    val wAll = Window.partitionBy()
    val wCum = Window
      .partitionBy()
      .orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_total", sum(col("n_ending")).over(wAll))
      .withColumn("ended_through", sum(col("n_ending")).over(wCum))
      .select(
        col("day"),
        (col("n_total") - col("ended_through") + col("n_ending"))
          .as("n_at_risk"),
        col("n_events"),
        col("n_censored")
      )
  }

  /** q447: Pettitt changepoint test on the daily event-count series —
    * the rank-based single-changepoint locator (Pettitt, "A
    * non-parametric approach to the change-point problem", JRSS-C
    * 1979). With tie-averaged double-ranks r̄ (2·r̄ integer, the q446
    * convention) the statistic U_t = Σ_{i≤t} 2·r̄_i − t(n+1) is exact
    * BIGINT at every prefix; the output row is (n_days, t_star_day,
    * k_stat = max|U_t|, u_at_tstar), argmax broken to the earliest
    * day. The CUSUM (q308) asks "did the level drift?" under a
    * mean/σ model; Pettitt asks the distribution-free version — the
    * day the traffic regime most plausibly changed, robust to the
    * heavy-tailed bursts q254/q301 prove this stream has. The
    * significance transform p ≈ 2·exp(−6K²/(n³+n²)) is float-only
    * and lives in the spec (the q367 Mann-Kendall split).
    *
    * Scale: one groupBy to daily counts, then every window runs on
    * the daily frame — calendar-bounded (≤366 rows/year), never
    * event-scale. The rank frame is the distinct-count value domain.
    */
  def pettittChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val daily = Tables
      .events(spark, dir)
      .select(
        idiv(unix_micros(col("ts")), lit(86400000000L)).as("d")
      )
      .groupBy(col("d"))
      .agg(count(lit(1)).as("cnt"))
      .cacheTracked()
    // tie-averaged double-ranks over the distinct-count value domain
    val g = daily.groupBy(col("cnt")).agg(count(lit(1)).as("c"))
    val wv = Window
      .orderBy(col("cnt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r2 = g
      .withColumn("cum", sum(col("c")).over(wv))
      .select(
        col("cnt"),
        (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))
          .as("r2")
      )
    val wd = Window
      .orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    daily
      .join(broadcast(r2), Seq("cnt"))
      .withColumn("t", row_number().over(Window.orderBy(col("d").asc)))
      .withColumn("s2", sum(col("r2")).over(wd))
      .crossJoin(broadcast(nDays))
      .filter(col("t") < col("n_days"))
      .select(
        col("n_days"),
        col("d"),
        (col("s2") - col("t") * (col("n_days") + lit(1L))).as("u_t")
      )
      .orderBy(abs(col("u_t")).desc, col("d").asc)
      .limit(1)
      .select(
        col("n_days"),
        col("d").as("t_star_day"),
        abs(col("u_t")).as("k_stat"),
        col("u_t").as("u_at_tstar")
      )
  }

  /** q453: Haar wavelet energy spectrum of the hourly event-count
    * series — for each dyadic level l = 1..9 over the first 512
    * hours, the unnormalized Haar detail coefficient of each
    * 2^l-hour block is (first-half sum − second-half sum), and the
    * level's energy is Σ d² — all exact BIGINT (unnormalized Haar
    * needs no division). The spectrum says WHICH TIMESCALE carries
    * the traffic variance: bursty minutes-scale noise loads the low
    * levels, diurnal structure loads l ≈ 4-5 (16-32 h), regime
    * drift loads the top. The q296 hourly ACF measures periodicity
    * at one lag per row; the Haar spectrum is the scale-domain
    * summary a capacity planner reads first (Mallat, "A theory for
    * multiresolution signal decomposition", PAMI 1989).
    *
    * Scale: one event→hour aggregate (calendar-bounded frame), then
    * a 9-level explode over the ≤512-row hourly frame and one
    * (level, block) signed-sum aggregate — the signed sum folds the
    * pairwise differencing into a single groupBy, so no level ever
    * sees more than the hourly frame. No window at all.
    */
  def haarEnergy(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val hourly = Tables
      .events(spark, dir)
      .select(idiv(unix_micros(col("ts")), lit(3600000000L)).as("hr"))
      .groupBy(col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val h0 = hourly
      .crossJoin(broadcast(hourly.agg(min(col("hr")).as("hr0"))))
      .select((col("hr") - col("hr0")).as("h"), col("cnt"))
      .filter(col("h") < 512L)
    val leveled = h0.select(
      col("h"),
      col("cnt"),
      explode(sequence(lit(1L), lit(9L))).as("level")
    )
    // block = h >> level; sign flips on bit (level-1) of h — the
    // column-amount shift form of the pairwise Haar differencing
    val terms = leveled.select(
      col("level"),
      expr("shiftright(h, cast(level AS INT))").as("block"),
      when(
        expr("shiftright(h, cast(level AS INT) - 1)")
          .bitwiseAND(lit(1L)) === 0L,
        col("cnt")
      ).otherwise(-col("cnt")).as("signed")
    )
    terms
      .groupBy(col("level"), col("block"))
      .agg(sum(col("signed")).as("dcoef"))
      .groupBy(col("level"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("dcoef") * col("dcoef")).as("energy")
      )
  }

  /** q455: Wilcoxon signed-rank test on per-user value drift — each
    * user's mean event value (exact micro) over the FIRST half of
    * their event sequence is paired with the SECOND half, the
    * nonzero milli-quantized differences get tie-averaged
    * double-ranks of |d|, and W⁺/W⁻ are the signed rank sums
    * (Wilcoxon, Biometrics 1945). The paired complement to q283's
    * unpaired Mann-Whitney: the user is their own control, so
    * population mix can't fake a drift. Hashed surface is exact
    * BIGINT (n_pairs, w_plus_x2, w_minus_x2 in double-rank units,
    * their sum pinned to n(n+1) by construction); the normal
    * approximation z lives in the spec.
    *
    * Scale: per-user windows partition on user_id (millions of
    * partitions — the safe kind); the only unpartitioned window is
    * the |d| rank cumsum over the DISTINCT quantized-milli domain
    * (value-domain bounded, the q410 convention).
    */
  def wilcoxonValueDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idivHalfUp, idivHalfUpSigned}
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        round(col("value") * 1e6).cast("long").as("vm")
      )
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val halves = ev
      .withColumn("rn", row_number().over(byUser))
      .withColumn(
        "n",
        count(lit(1)).over(Window.partitionBy(col("user_id")))
      )
      .filter(col("n") >= 2L)
      .select(
        col("user_id"),
        col("vm"),
        when(col("rn") * 2 <= col("n"), lit(1L)).otherwise(lit(2L))
          .as("half")
      )
    val means = halves
      .groupBy(col("user_id"), col("half"))
      .agg(idivHalfUp(sum(col("vm")), count(lit(1))).as("mean_vm"))
    val paired = means
      .groupBy(col("user_id"))
      .agg(
        max(when(col("half") === 1L, col("mean_vm"))).as("m1"),
        max(when(col("half") === 2L, col("mean_vm"))).as("m2")
      )
      .select(
        idivHalfUpSigned(col("m2") - col("m1"), lit(1000L)).as("dm")
      )
      .filter(col("dm") =!= 0L)
      .select(
        abs(col("dm")).as("ad"),
        when(col("dm") > 0L, lit(1L)).otherwise(lit(-1L)).as("sgn")
      )
      .cacheTracked()
    // tie-averaged double-ranks over the distinct |d| milli domain
    val g = paired.groupBy(col("ad")).agg(count(lit(1)).as("c"))
    val wv = Window
      .orderBy(col("ad").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r2 = g
      .withColumn("cum", sum(col("c")).over(wv))
      .select(
        col("ad"),
        (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))
          .as("r2")
      )
    paired
      .join(broadcast(r2), Seq("ad"))
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("sgn") > 0, col("r2"))
          .otherwise(lit(0L))), lit(0L)).as("w_plus_x2"),
        coalesce(sum(when(col("sgn") < 0, col("r2"))
          .otherwise(lit(0L))), lit(0L)).as("w_minus_x2")
      )
  }

  /** q456: Page's L trend test for ordered weekday alternatives —
    * daily event counts in complete (week, weekday) blocks, within-
    * week tie-averaged double-ranks of the 7 daily counts, and
    * L = Σ_weeks Σ_j j·R_j with j the weekday position (Page,
    * "Ordered hypotheses for multiple treatments", JASA 1963). The
    * q428 weekday profile shows the SHAPE; Page's L is the TEST for
    * a monotone weekday trend with the week as its own block, so
    * week-to-week volume drift can't masquerade as a weekday
    * effect. Emitted in exact double-rank units (l_x2) with the
    * null expectation e_l_x2 = n·k(k+1)²/2 and the signed
    * deviation; the variance/z transform lives in the spec.
    *
    * Scale: one day aggregate (calendar-bounded), per-week rank
    * windows partition on the week key (grows with the data — the
    * safe kind), and the complete-week filter is a 7-distinct test
    * per week. Weekday convention: (epoch_day + 4) mod 7 (q428 —
    * never a locale-dependent builtin).
    */
  def pageTrendWeekday(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val daily = Tables
      .events(spark, dir)
      .select(
        idiv(unix_micros(col("ts")), lit(86400000000L)).as("ed")
      )
      .groupBy(col("ed"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        idiv(col("ed") + lit(4L), lit(7L)).as("week"),
        pmod(col("ed") + lit(4L), lit(7L)).as("wd"),
        col("cnt")
      )
    val complete = daily
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"))
      .filter(col("n_days") === 7L)
      .select(col("week"))
    val blocks = daily.join(broadcast(complete), Seq("week"))
    // within-week tie-averaged double-ranks via the count-of-smaller
    // identity over the 7-row block (value-domain form is overkill
    // at k = 7; the self-join stays inside the week key)
    val lhs = blocks.select(col("week"), col("wd"), col("cnt"))
    val rhs = blocks.select(
      col("week"),
      col("cnt").as("cnt2")
    )
    val ranked = lhs
      .join(rhs, Seq("week"))
      .groupBy(col("week"), col("wd"), col("cnt"))
      .agg(
        (lit(2L) * sum(when(col("cnt2") < col("cnt"), 1L)
          .otherwise(0L)) +
          sum(when(col("cnt2") === col("cnt"), 1L).otherwise(0L)) +
          lit(1L)).as("r2")
      )
    val agg = ranked
      .agg(
        (countDistinct(col("week"))).as("n_weeks"),
        sum((col("wd") + lit(1L)) * col("r2")).as("l_x2")
      )
    // E[L] = n·k(k+1)²/4 = 112·n at k = 7; double-rank units double it
    agg.select(
      col("n_weeks"),
      col("l_x2"),
      (col("n_weeks") * lit(224L)).as("e_l_x2"),
      (col("l_x2") - col("n_weeks") * lit(224L)).as("dev_x2")
    )
  }

  /** q462: SAX motif census of the hourly event-count series —
    * Symbolic Aggregate approXimation (Lin/Keogh et al., DMKD
    * 2007), integer-exact end to end: the first 512 hours aggregate
    * into 64 eight-hour PAA segments (the segment SUM is the
    * statistic — same ordering as the mean, no division), segments
    * quantize into 4 symbols by their own value-domain quartile
    * breakpoints (lower-quartile picks, house convention), and
    * every 3-gram of consecutive symbols is counted. Recurring
    * motifs are the series' vocabulary — "ramp-up" (012), "spike"
    * (030) — and motif frequency is what separates periodic
    * structure from noise at a glance; the Haar spectrum (q453)
    * gives scale energies, SAX gives the SHAPES carrying them.
    *
    * Scale: everything after the hour aggregate runs on the 64-row
    * segment frame (calendar-bounded); the only unpartitioned
    * windows are its quartile cumsum and the 3-gram leads.
    */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val hourly = Tables
      .events(spark, dir)
      .select(idiv(unix_micros(col("ts")), lit(3600000000L)).as("hr"))
      .groupBy(col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val seg = hourly
      .crossJoin(broadcast(hourly.agg(min(col("hr")).as("hr0"))))
      .select((col("hr") - col("hr0")).as("h"), col("cnt"))
      .filter(col("h") < 512L)
      .groupBy(idiv(col("h"), lit(8L)).as("w"))
      .agg(sum(col("cnt")).as("s"))
      .cacheTracked()
    val g = seg.groupBy(col("s")).agg(count(lit(1)).as("c"))
    val wv = Window
      .orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cw", sum(col("c")).over(wv))
      .crossJoin(broadcast(seg.agg(count(lit(1)).as("n"))))
    def pick(p: Int, name: String) =
      cum
        .filter(col("cw") * 4 >= col("n") * p)
        .agg(min(col("s")).as(name))
    val bounds = pick(1, "q1")
      .crossJoin(pick(2, "q2"))
      .crossJoin(pick(3, "q3"))
    val sym = seg
      .crossJoin(broadcast(bounds))
      .select(
        col("w"),
        when(col("s") <= col("q1"), lit(0L))
          .when(col("s") <= col("q2"), lit(1L))
          .when(col("s") <= col("q3"), lit(2L))
          .otherwise(lit(3L)).as("sym")
      )
    val ww = Window.orderBy(col("w").asc)
    sym
      .withColumn("s1", lead(col("sym"), 1).over(ww))
      .withColumn("s2", lead(col("sym"), 2).over(ww))
      .filter(col("s1").isNotNull && col("s2").isNotNull)
      .select(
        concat(col("sym").cast("string"), col("s1").cast("string"),
          col("s2").cast("string")).as("motif")
      )
      .groupBy(col("motif"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** q470: weekend difference-in-differences on event value — mean
    * value (exact micro) in the 2×2 of {weekday, weekend} ×
    * {first, second half of the span}, and the DiD estimate
    * (Δweekend − Δweekday) in signed micro. The causal-inference
    * primitive in its simplest form: if "value drifted" (q283/q455
    * say it did), DiD asks whether weekends drifted MORE than the
    * weekday baseline — a calendar-mix shift masquerading as a
    * trend is the classic false alarm this design subtracts out.
    * Weekend uses the (epoch_day + 4) mod 7 house calendar (0 =
    * Sunday, 6 = Saturday — q428's convention, never a locale
    * builtin); the span splits at min_day + 15.
    *
    * Scale: one scan → one 4-cell aggregate → one wide row. The
    * span minimum is a broadcast scalar.
    */
  def weekendDid(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, idivHalfUp}
    val ev = Tables
      .events(spark, dir)
      .select(
        idiv(unix_micros(col("ts")), lit(86400000000L)).as("ed"),
        round(col("value") * 1e6).cast("long").as("vm")
      )
    val tagged = ev
      .crossJoin(broadcast(ev.agg(min(col("ed")).as("ed0"))))
      .select(
        pmod(col("ed") + lit(4L), lit(7L)).isin(0L, 6L)
          .as("is_weekend"),
        (col("ed") >= col("ed0") + lit(15L)).as("is_h2"),
        col("vm")
      )
    def cell(we: Boolean, h2: Boolean, n: String, m: String) = Seq(
      sum(when(col("is_weekend") === we && col("is_h2") === h2, 1L)
        .otherwise(0L)).as(n),
      idivHalfUp(
        sum(when(col("is_weekend") === we && col("is_h2") === h2,
          col("vm")).otherwise(0L)),
        greatest(
          sum(when(col("is_weekend") === we && col("is_h2") === h2,
            1L).otherwise(0L)),
          lit(1L)
        )
      ).as(m)
    )
    val cells =
      cell(false, false, "n_wd_h1", "m_wd_h1") ++
        cell(false, true, "n_wd_h2", "m_wd_h2") ++
        cell(true, false, "n_we_h1", "m_we_h1") ++
        cell(true, true, "n_we_h2", "m_we_h2")
    tagged
      .agg(cells.head, cells.tail: _*)
      .select(
        col("n_wd_h1"), col("m_wd_h1"),
        col("n_wd_h2"), col("m_wd_h2"),
        col("n_we_h1"), col("m_we_h1"),
        col("n_we_h2"), col("m_we_h2"),
        ((col("m_we_h2") - col("m_we_h1")) -
          (col("m_wd_h2") - col("m_wd_h1"))).as("did_micro")
      )
  }

  /** q479: ordered conversion funnel view → click → purchase — the
    * sequential-pattern census the flat per-type counts (q01-family)
    * and first-touch cohorts (q432) cannot express: a user counts at
    * step 2 only with a click STRICTLY AFTER their first view, and at
    * step 3 only with a purchase strictly after that click. Emits one
    * row per step with the user count and the step-over-step
    * conversion in exact ppm — the product funnel every growth
    * dashboard opens with, defined so reordering events can only
    * reduce it (a purchase before any view is window shopping
    * attribution, not conversion).
    *
    * Scale: three (user-keyed aggregate + join) rounds over one
    * cached narrow projection — each step's frame is one row per
    * surviving user, never the event log; counts are scalar actions.
    */
  def orderedFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .cacheTracked()
    val t1 = ev
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t1"))
    val t2 = ev
      .filter(col("event_type") === "click")
      .join(t1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t2"))
    val t3 = ev
      .filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t3"))
    val n0 = ev.select(col("user_id")).distinct().count()
    val n1 = t1.count()
    val n2 = t2.count()
    val n3 = t3.count()
    def ppm(a: Long, b: Long): Long =
      (2 * a * 1000000L + math.max(b, 1L)) / (2 * math.max(b, 1L))
    import spark.implicits._
    Seq(
      ("0_users", n0, 1000000L),
      ("1_view", n1, ppm(n1, n0)),
      ("2_click", n2, ppm(n2, n1)),
      ("3_purchase", n3, ppm(n3, n2))
    ).toDF("step", "n_users", "conv_ppm")
  }
}
