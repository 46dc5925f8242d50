package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event operators
  * (SURVEY §2.9): the reference's offset-based incremental pull loop
  * generalized to real streams — windowed aggregation under a
  * watermark, stateful gap sessionization via flatMapGroupsWithState,
  * and keyed latest-record dedup (the "issue updated after scrape"
  * late-data extension).
  *
  * All operators run on an unbounded stream with bounded state:
  * watermarks bound window state; session state is one small struct
  * per active user; dedup state is one (key → updated) entry per key
  * inside the watermark horizon.
  */
object EventStreams {

  /** Drain a streaming DataFrame to a named in-memory table with
    * Trigger.AvailableNow and return that table.
    *
    * Stateful operators allocate one state store per shuffle
    * partition (a stream-stream join allocates four); with tiny
    * per-key state the store setup/commit dominates runtime, so the
    * number of state partitions is sized to the load rather than
    * inherited from the batch shuffle width. It is a start-time
    * choice pinned into the checkpoint — production deployments with
    * wide state raise `SPARK_GRAFT_STREAM_PARTITIONS`; the batch
    * setting is restored once the stream drains.
    */
  def runAvailableNow(
      df: DataFrame,
      name: String,
      mode: String
  ): DataFrame = {
    val spark = df.sparkSession
    val statePartitions =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "4")
    val batchShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    // These are throwaway drain-once checkpoints (offset/commit logs +
    // state deltas, fsync'd per micro-batch) — putting them on tmpfs
    // keeps the state-store lifecycle off the disk, where concurrent
    // I/O load (an oracle dump, another job's shuffle spill) otherwise
    // multiplies the per-batch commit latency. A production stream
    // points checkpointLocation at durable shared storage instead —
    // that is the resume contract, which a drain-and-discard run
    // doesn't need.
    val ckptRoot = sys.env.getOrElse(
      "SPARK_GRAFT_STREAM_CKPT_ROOT",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-ckpt"
      else sys.props("java.io.tmpdir") + "/graft-ckpt")
    // the ACTIVE queryName must be unique per invocation: two
    // concurrent drains of the same logical stream (parallel test
    // suites in one JVM — sbt runs ScalaTest suites in parallel
    // threads under Test/fork) would otherwise race on "query with
    // that name is already active". Nothing external reads the
    // memory-sink view by name; callers consume the returned frame.
    val qname =
      s"${name}_${java.util.UUID.randomUUID().toString.take(8)}"
    val ckpt = new java.io.File(
      s"$ckptRoot/$qname-${java.util.UUID.randomUUID()}")
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // a partially-drained table must never masquerade as the result
      if (!q.awaitTermination(180000)) {
        q.stop()
        throw new IllegalStateException(
          s"stream $name did not drain within 180s")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", batchShuffle)
      deleteRecursively(ckpt)
    }
    spark.table(qname)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Streaming read of one test-dir parquet table (file source —
    * stands in for any append-only feed). Shared by the event stream
    * and the document stream readers: schema probed from a batch
    * read, pathGlobFilter pins the single table file.
    */
  def readTableStream(
      spark: SparkSession,
      dir: String,
      table: String
  ): DataFrame = {
    val schema = spark.read
      .option("mergeSchema", "false")
      .parquet(s"$dir/$table.parquet")
      .schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", s"$table.parquet")
      .parquet(dir) // file streaming source requires a directory
  }

  /** Streaming read of the events table; ts arrives as TIMESTAMP_NTZ
    * micros, cast to session-zone TimestampType like Tables.events.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    readTableStream(spark, dir, "events")
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))

  /** Tumbling 1-hour windowed counts under a 10-minute watermark —
    * the streaming twin of Events.tumblingCounts.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(
      start: Timestamp,
      end: Timestamp,
      n: Long,
      sum: Double
  )

  case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double
  )

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Stateful gap sessionization (30-minute inactivity) with
    * flatMapGroupsWithState: closed sessions are emitted as soon as a
    * later event proves the gap; the trailing open session per user
    * stays in state until event-time timeout. State per user is one
    * SessionState — O(active users), not O(events).
    */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(sessionFn)
  }

  private[streaming] def sessionFn(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]
  ): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(
        SessionOut(userId, s.start, s.end, s.n, s.sum)
      )
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    val closed = Seq.newBuilder[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts.getTime - s.end.getTime <= SessionGapMs =>
          cur = Some(s.copy(end = e.ts, n = s.n + 1, sum = s.sum + e.value))
        case Some(s) =>
          closed += SessionOut(userId, s.start, s.end, s.n, s.sum)
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.end.getTime + SessionGapMs)
    }
    closed.result().iterator
  }

  /** Stream-stream interval join: purchases ⋈ errors of the same user
    * within the preceding hour. Watermarks on both sides bound the
    * join state (Spark evicts buffered rows once the event-time range
    * condition can no longer match).
    */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        col("ts").as("p_ts")
      )
      .withWatermark("p_ts", "10 minutes")
    val errors = events
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    purchases
      .join(
        errors,
        expr(
          """p_user = e_user AND
             e_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"""
        )
      )
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts"), col("e_ts"))
  }

  case class FunnelState(
      view: Option[Timestamp],
      click: Option[Timestamp],
      purchase: Option[Timestamp]
  )

  case class FunnelOut(
      user_id: Long,
      view_ts: Timestamp,
      click_ts: Option[Timestamp],
      purchase_ts: Option[Timestamp],
      stage_reached: Int
  )

  /** Streaming ordered-funnel detection (view → click → purchase) via
    * mapGroupsWithState: per-user state is three optional timestamps
    * — O(users), independent of event volume. Each batch folds its
    * events in event-time order into the earliest-qualifying-stage
    * state (identical recurrence to the batch funnel); update-mode
    * emission re-emits a user's current stage on every change, so the
    * terminal deterministic view is the per-user max-stage row (the
    * same argmax wrapper q45 uses for its update-mode stream).
    */
  def funnelStream(events: DataFrame): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Timestamp, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[FunnelState]) => {
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, tpe) =>
            s = stepFunnel(s, ts, tpe)
          }
          state.update(s)
          FunnelOut(
            userId,
            s.view.orNull,
            s.click,
            s.purchase,
            1 + s.click.size + s.purchase.size
          )
        }
      )
      .filter(_.view_ts != null)
  }

  /** One funnel transition: earliest view; earliest click strictly
    * after the view; earliest purchase strictly after the click.
    */
  private[streaming] def stepFunnel(
      s: FunnelState,
      ts: Timestamp,
      tpe: String
  ): FunnelState = tpe match {
    case "view" if s.view.isEmpty => s.copy(view = Some(ts))
    case "click"
        if s.click.isEmpty &&
          s.view.exists(v => ts.getTime > v.getTime) =>
      s.copy(click = Some(ts))
    case "purchase"
        if s.purchase.isEmpty &&
          s.click.exists(c => ts.getTime > c.getTime) =>
      s.copy(purchase = Some(ts))
    case _ => s
  }

  /** Stream-static enrichment join + windowless aggregation: the
    * streaming events join a STATIC broadcast dimension (customer →
    * market segment) — the classic enrich-then-aggregate topology.
    * The static side is planned as a broadcast hash join under every
    * micro-batch, so the join is stateless (no state store at all);
    * the only stateful operator is the running aggregate. At scale
    * the dimension is the small side by construction; a large,
    * slowly-changing dimension would become a second stream with a
    * temporal (as-of) join instead.
    */
  def segmentActivity(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(
        broadcast(customers.select(
          col("c_custkey").as("user_id"), col("c_mktsegment"))),
        Seq("user_id")
      )
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")
      )

  /** q101: streaming exact dedup with bounded state — the built-in
    * `dropDuplicatesWithinWatermark` (state evicted once the
    * watermark passes a key's last-seen event time) feeding a running
    * per-type distinct-user count. This is the idiomatic bounded-state
    * twin of [[latestByKey]]'s hand-rolled `mapGroupsWithState`: at
    * 100 TB/day the duplicate horizon (the watermark delay) is what
    * keeps the state store finite. The delay here exceeds the test
    * data's 30-day span, so the drain equals an exact batch
    * COUNT(DISTINCT user_id) — which is the oracle.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "40 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  /** q124: the native streaming session_window with a DYNAMIC
    * per-event gap (purchase 30m / else 10m) — the streaming twin of
    * the batch q123; drained availableNow in complete mode, the
    * session set must be identical.
    */
  def dynamicSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
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

  /** q121's per-user state machine on the transformWithState API
    * (Spark 4's arbitrary-state successor to mapGroupsWithState):
    * typed ValueState handles, explicit TTL surface, RocksDB-backed —
    * the API a long-running 100 TB/day stateful job should target,
    * since RocksDB state spills off-heap and snapshots incrementally
    * where the HDFS-backed store holds state in executor memory.
    */
  private[streaming] class UserActivityProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var nState: ValueState[Long] = _
    @transient private var maxState: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nState = getHandle
        .getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
      maxState = getHandle
        .getValueState[Double]("mx", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues
    ): Iterator[(Long, Long, Double)] = {
      var n = if (nState.exists()) nState.get() else 0L
      var mx = if (maxState.exists()) maxState.get() else Double.MinValue
      rows.foreach { case (_, v) =>
        n += 1
        mx = math.max(mx, v)
      }
      nState.update(n)
      maxState.update(mx)
      Iterator.single((key, n, mx))
    }
  }

  /** q121: running per-user activity (count + max value) through
    * transformWithState, drained availableNow; the terminal emission
    * per user must equal the batch GROUP BY. Update-mode emissions —
    * the terminal state is the max (n is monotone per key).
    */
  def userActivity(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new UserActivityProcessor,
        TimeMode.None(),
        OutputMode.Update()
      )
      .toDF("user_id", "n_events", "max_value")
  }

  /** q277's per-user transition detector: state = the last
    * (us, event_id, type) seen per user; each batch's rows are
    * sorted by (us, event_id) inside the group and every consecutive
    * pair (state→first, then row→row) emits one (from, to)
    * transition. One tiny struct of state per user — the streaming
    * footprint of q262's lag window. Cross-batch correctness rides
    * on per-key event-time-ordered arrival (true for the drain-once
    * AvailableNow source here; a production stream buffers within
    * the watermark before applying the same fold).
    */
  private[streaming] class TransitionProcessor
      extends StatefulProcessor[Long, (Long, Long, Long, String),
        (String, String)] {
    @transient private var last: ValueState[(Long, Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[(Long, Long, String)](
        "last",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.STRING),
        TTLConfig.NONE
      )

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long, Long, String)],
        timerValues: TimerValues
    ): Iterator[(String, String)] = {
      val ordered = rows.toArray.sortBy(r => (r._3, r._2))
      val out = Array.newBuilder[(String, String)]
      var prev: Option[(Long, Long, String)] =
        if (last.exists()) Some(last.get()) else None
      ordered.foreach { case (_, eid, us, tp) =>
        prev.foreach(p => out += ((p._3, tp)))
        prev = Some((us, eid, tp))
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** q277: streaming event-type transitions — the TransitionProcessor
    * emits (from, to) rows in append mode; the count rollup happens
    * over the drained table (counting is order-free, so it needs no
    * stream state of its own). Drained availableNow, the transition
    * multiset must equal batch q262's lag-window counts — that
    * equality is the oracle.
    */
  def streamTransitions(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(
        new TransitionProcessor,
        TimeMode.None(),
        OutputMode.Append()
      )
      .toDF("from_type", "to_type")
  }

  /** q277 gate surface: drain the transition stream, then the
    * order-free count rollup and row-normalization (the batch part —
    * counting transitions needs no stream state). Must equal q262.
    */
  def streamTransitionCounts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    // transformWithState requires the RocksDB provider (the HDFS
    // store has no column families); restore the session conf after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val drained =
      try
        runAvailableNow(
          streamTransitions(readEvents(spark, dir)),
          "q277_stream_transitions_out",
          "append"
        )
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    drained
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "row_total",
        sum(col("n")).over(W.partitionBy(col("from_type")))
      )
      .select(
        col("from_type"),
        col("to_type"),
        col("n"),
        graft.functions.IntMath.microRatio(col("n"), col("row_total"))
          .as("p_micro")
      )
  }

  /** q301's per-type burst detector: state = the ≤24 most recent
    * CLOSED (hour, count) buckets plus the currently-open bucket.
    * Each batch folds its rows into a local hour→count map, closes
    * hours in ascending order, and emits a verdict for every closed
    * bucket z-scored against the trailing ring — EXACTLY q254's
    * 24-PRECEDING-observed-buckets window, streamed with O(24)
    * state per type. The final still-open hour never emits (it is
    * not complete), so drained output ≡ batch q254 minus each
    * type's last observed hour — that restriction IS the oracle.
    * Cross-batch correctness rides on per-key event-time-ordered
    * arrival (the q277 contract; true for the drain-once
    * AvailableNow source here).
    */
  private[streaming] class BurstProcessor
      extends StatefulProcessor[String, (String, Long),
        (String, Long, Long, Long, Long, Boolean, Boolean)] {
    @transient private var ring: ListState[(Long, Long)] = _
    @transient private var cur: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ring = getHandle.getListState[(Long, Long)](
        "ring",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE
      )
      cur = getHandle.getValueState[(Long, Long)](
        "cur",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE
      )
    }

    private def verdict(
        key: String,
        hour: Long,
        n: Long,
        prev: scala.collection.Seq[(Long, Long)]
    ): (String, Long, Long, Long, Long, Boolean, Boolean) = {
      val k = prev.size.toLong
      val s = prev.map(_._2).sum
      val s2 = prev.map(c => c._2 * c._2).sum
      if (k >= 12) {
        val mean = s.toDouble / k
        val varr = (s2.toDouble - s.toDouble * s / k) / k
        if (varr > 0) {
          val z = (n - mean) / math.sqrt(varr)
          // Spark round() is HALF_UP (away from zero) — mirror it
          val zMicro = BigDecimal(z * 1e6)
            .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toLong
          (key, hour, n, k, zMicro, true, z > 3.0)
        } else (key, hour, n, k, 0L, false, false)
      } else (key, hour, n, k, 0L, false, false)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues
    ): Iterator[(String, Long, Long, Long, Long, Boolean, Boolean)] = {
      val counts = scala.collection.mutable.SortedMap.empty[Long, Long]
      rows.foreach { case (_, h) =>
        counts.update(h, counts.getOrElse(h, 0L) + 1L)
      }
      val ringBuf =
        scala.collection.mutable.ArrayBuffer.from(ring.get())
      var open: Option[(Long, Long)] =
        if (cur.exists()) Some(cur.get()) else None
      val out = Array.newBuilder[
        (String, Long, Long, Long, Long, Boolean, Boolean)]
      counts.foreach { case (h, c) =>
        open match {
          case Some((ch, cn)) if h == ch => open = Some((ch, cn + c))
          case Some((ch, cn)) =>
            // h > ch under ordered arrival: close the open bucket
            out += verdict(key, ch, cn, ringBuf)
            ringBuf += ((ch, cn))
            if (ringBuf.size > 24) ringBuf.remove(0)
            open = Some((h, c))
          case None => open = Some((h, c))
        }
      }
      ring.clear()
      ringBuf.foreach(ring.appendValue)
      open.foreach(cur.update)
      out.result().iterator
    }
  }

  /** q301: streaming burst flags — the BurstProcessor in append mode
    * over (type, event-hour) rows.
    */
  def streamBursts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us")
      )
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new BurstProcessor,
        TimeMode.None(),
        OutputMode.Append()
      )
      .toDF("event_type", "hour_us", "n", "n_prev", "z_raw", "has_z",
        "burst")
  }

  /** q301 gate surface: drain the burst stream and project the batch
    * q254 schema (z_micro NULL below the 12-bucket / zero-variance
    * floor). Must equal q254 minus each type's final (still-open)
    * hour.
    */
  def streamBurstFlags(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val drained =
      try
        runAvailableNow(
          streamBursts(readEvents(spark, dir)),
          "q301_stream_bursts_out",
          "append"
        )
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    drained.select(
      col("event_type"),
      col("hour_us"),
      col("n"),
      col("n_prev"),
      when(col("has_z"), col("z_raw")).as("z_micro"),
      col("burst")
    )
  }

  /** Streaming fixed-bin value histogram per tumbling hour — the
    * bounded-memory substrate of the q185 quantile monitor: state per
    * window is ≤ 20 counter cells regardless of event volume, evicted
    * by the watermark. (An exact streaming quantile would need the
    * raw values in state — unbounded.)
    */
  def windowedValueHistogram(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(
        window(col("ts"), "1 hour"),
        least(floor(col("value") / 25.0), lit(19.0)).cast("int").as("bin")
      )
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("bin"), col("cnt"))

  /** q185: continuous data-quality monitoring — per-hour approximate
    * p50/p95 of the event value from the streaming histogram, with
    * the exact batch percentiles joined in as the audit (the q103
    * pattern lifted onto a stream). Quantile estimate = midpoint of
    * the first bin whose cumulative count reaches q·n (bins of width
    * 25 over [0, 500), last bin open). The post-drain assembly is a
    * ≤ 20-rows-per-window batch window function.
    */
  def streamQualityMonitor(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val hist = runAvailableNow(
      windowedValueHistogram(readEvents(spark, dir)),
      "q185_stream_monitor_out",
      "complete"
    )
    val cumW = W.partitionBy(col("window_start")).orderBy(col("bin"))
    val totW = W.partitionBy(col("window_start"))
    // both quantiles in ONE conditional-aggregation pass over the
    // ≤ 20-row per-window histogram (min ignores the nulls of bins
    // below the threshold)
    def qbin(q: Double): Column =
      min(
        when(
          col("cum").cast("double") >= lit(q) * col("n"),
          col("bin")
        )
      )
    val ests = hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(totW))
      .groupBy(col("window_start"))
      .agg(
        min(col("n")).as("n_events"),
        qbin(0.5).as("qbin50"),
        qbin(0.95).as("qbin95")
      )
    val exact = graft.Tables
      .events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(
        round(expr("percentile(value, 0.5D)"), 6).as("p50_exact"),
        round(expr("percentile(value, 0.95D)"), 6).as("p95_exact")
      )
    ests
      .join(exact, Seq("window_start"))
      .select(
        col("window_start"),
        col("n_events"),
        round((col("qbin50") + 0.5) * 25.0, 6).as("p50_est"),
        round((col("qbin95") + 0.5) * 25.0, 6).as("p95_est"),
        col("p50_exact"),
        col("p95_exact")
      )
  }

  /** Keyed latest-record dedup: for a stream of (key, updated,
    * payload) keep only the newest record per key — the late-update
    * extension the reference never handles (SURVEY §2.9 "late data").
    * Emits the current winner on every change (update mode).
    */
  /** How long a key's latest-record state survives past its last
    * update before event-time eviction — the bound that keeps state
    * O(keys inside the horizon), not O(all keys ever seen).
    */
  val LatestByKeyHorizonMs: Long = 60L * 60 * 1000

  def latestByKey(records: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[Timestamp]) => {
          if (state.hasTimedOut) {
            // horizon passed with no new update: emit the final
            // winner once more and evict — without this the state
            // table grows with every key ever seen
            val last = state.get
            state.remove()
            (key, last)
          } else {
            val maxNew = rows.map(_._2).maxBy(_.getTime)
            val winner = state.getOption match {
              case Some(old) if old.getTime >= maxNew.getTime => old
              case _ => state.update(maxNew); maxNew
            }
            state.setTimeoutTimestamp(
              math.max(
                winner.getTime + LatestByKeyHorizonMs,
                state.getCurrentWatermarkMs() + 1
              )
            )
            (key, winner)
          }
        }
      )
      .toDF("k", "latest_ts")
  }
}
