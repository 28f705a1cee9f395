package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface. The reference is explicitly
  * batch-only (README.md:31); its closest analog is the `update`
  * refresh loop that waits for extract events and percolates new data
  * through the DAG (/root/reference/python/etl/monitor.py:825-859,
  * load.py:1343-1355). Spark-first, that loop IS
  * `Trigger.AvailableNow` + `foreachBatch`; on top of it the engine
  * exposes the standard streaming operator set over the `events`
  * table shape: watermarked tumbling-window aggregation (the
  * streaming twin of q14) and gap-based sessionization via
  * `flatMapGroupsWithState` (the streaming twin of q15).
  *
  * All transforms take a DataFrame so they compose with ANY source —
  * `readStream` (files/Kafka) in production, `MemoryStream` in tests,
  * or a batch frame (the window/agg forms are identical).
  */
object EventStreams {

  /** Hourly tumbling-window counts with a 2-hour watermark: late
    * events beyond the watermark are dropped, window state is evicted
    * once the watermark passes — bounded state at any scale. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(
      startMicros: Long, lastMicros: Long, nEvents: Long)
  /** Open sessions per user, disjoint and sorted by start. More than
    * one can be open at once: an out-of-order event more than a gap
    * OLDER than every open session opens its own earlier window —
    * exactly the state the native `session_window` operator keeps
    * (a set of merged windows per key). Bounded: open windows are
    * pairwise more than a gap apart inside the watermark horizon, so
    * |open| ≤ horizon/gap + 1 (3 at the 1 h / 30 min defaults). */
  final case class SessionsState(open: List[SessionState])
  final case class SessionOut(
      user_id: Long, n_events: Long, duration_s: Long)

  val SessionGapMicros: Long = 1800L * 1000000L  // 30 min, same as q15

  /** Gap-based sessionization: a session closes when its user is
    * silent for 30 minutes past the watermark (EventTimeTimeout).
    * State per user is a handful of open windows (see
    * [[SessionsState]]) — at 100 TB the state store holds
    * |active users| entries, not events.
    *
    * Merge rule — the NATIVE `session_window` semantics, which the
    * spec pins [[sessionizeNative]] equal to: an event's window is
    * `[ts, ts + gap)`; windows that overlap merge. So a late
    * within-watermark event merges into an open session iff
    * `session.start − gap ≤ ts ≤ session.last + gap` (extending
    * whichever end it falls past), and an event more than a gap
    * older than every open start BEGINS A SEPARATE EARLIER SESSION —
    * folding it into the newer session (as a naive `ts − last ≤ gap`
    * check would, the difference being negative) would inflate its
    * duration and diverge from the native twin. One event can also
    * BRIDGE two open sessions into one; the merge pass below handles
    * that by normalizing the sorted window list. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMillis = SessionGapMicros / 1000L
    def close(s: SessionState, userId: Long): SessionOut =
      SessionOut(userId, s.nEvents,
        (s.lastMicros - s.startMicros) / 1000000L)
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionsState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.map(_.open).getOrElse(Nil)
          // fold the batch in as singleton windows, then normalize:
          // sorted by start, neighbors whose [start, last + gap)
          // spans touch merge (sums nEvents) — this is simultaneously
          // the event-joins-session merge and the event-bridges-two-
          // sessions merge
          val singles = rows.map { e =>
            val m = e.ts.getTime * 1000L
            SessionState(m, m, 1L)
          }
          val all = (prior ++ singles).sortBy(s => (s.startMicros, s.lastMicros))
          val merged = all.foldLeft(List.empty[SessionState]) {
            case (cur :: done, next)
              if next.startMicros <= cur.lastMicros + SessionGapMicros =>
              cur.copy(
                lastMicros = math.max(cur.lastMicros, next.lastMicros),
                nEvents = cur.nEvents + next.nEvents) :: done
            case (acc, next) => next :: acc
          }.reverse
          // a session is closed once the watermark passes last + gap
          // (the native window's end) — on timeout AND on data, so a
          // very-late straggler window can close in the same batch it
          // was opened
          val (closed, open) =
            merged.partition(s => s.lastMicros / 1000L + gapMillis <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionsState(open))
            // earliest open window closes first; re-armed every batch
            state.setTimeoutTimestamp(
              open.map(_.lastMicros / 1000L + gapMillis).min)
          }
          closed.iterator.map(close(_, userId))
      }
  }

  /** The NATIVE twin of [[sessionize]]: Spark's built-in
    * `session_window` gap-merge aggregation — preference order (a),
    * compose existing operators before custom state. The state store
    * carries one merged window per open session (engine-managed,
    * including out-of-order window merges the hand-rolled version
    * never re-opens); sessions emit in append mode once the watermark
    * passes their gap. A closed session's window end is
    * `last event + gap`, so duration = end − start − gap. Same
    * output contract as [[sessionize]] — the spec pins them equal. */
  def sessionizeNative(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, session_window, unix_micros}
    val gapSec = SessionGapMicros / 1000000L
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        // micros, not per-endpoint unix_timestamp: truncating each
        // endpoint to whole seconds diverges from sessionize's
        // floor-of-the-difference on sub-second timestamps. The gap
        // is a whole-second multiple, so the floor passes through:
        // floor((last-start+gap)/1s) - gap == floor((last-start)/1s)
        ((unix_micros(col("session_window.end"))
          - unix_micros(col("session_window.start"))) / lit(1000000L)
          - gapSec).cast("long")
          .as("duration_s"))
  }

  final case class ClickOrPurchase(
      user_id: Long, event_id: Long, ts: Timestamp, event_type: String)
  final case class LastClick(clickId: Long, clickMillis: Long)
  final case class AsofOut(
      purchase_id: Long, user_id: Long, purchase_ts: Timestamp,
      last_click_id: Option[Long], last_click_ts: Option[Timestamp])

  /** Watermark-horizon click log per user, sorted ascending by
    * (millis, id). Bounded the same way a stream-stream join's
    * buffer is: clicks older than the watermark can only ever be an
    * as-of match as "the latest click before the horizon", so the
    * log keeps ONE representative below the watermark plus every
    * click inside the horizon — O(clicks per user per watermark
    * window), never O(stream). */
  final case class ClickLog(clicks: List[LastClick])

  /** Streaming as-of enrichment — the streaming twin of
    * `q19_asof_join`: each purchase is emitted with the latest click
    * its user made at or before it. State per user is the
    * watermark-pruned [[ClickLog]] — a single "last click" scalar is
    * NOT enough: with the stored last at 10:10, a later micro-batch
    * carrying (click 10:08, purchase 10:09) must enrich the purchase
    * with the 10:08 click; collapsing state to one click either
    * loses 10:08 (only-advance guard → the purchase gets a FUTURE
    * click, violating the as-of contract) or loses 10:10 (blind
    * overwrite → a later purchase regresses). Clicks arriving in a
    * batch AFTER a purchase was already emitted do not retroactively
    * re-enrich (append mode) — the batch q19 is the ground truth,
    * this is the low-latency view. */
  def asofEnrich(events: Dataset[ClickOrPurchase]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickLog, AsofOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[ClickOrPurchase],
         state: GroupState[ClickLog]) =>
          val wm = state.getCurrentWatermarkMs()
          val batch = rows.toSeq
          // fold the batch's clicks in first: within one micro-batch
          // there is no arrival order, so every purchase sees every
          // click of its batch with click_ts <= purchase_ts — same
          // tie rule as the batch as-of (equal timestamps match)
          val merged = (state.getOption.map(_.clicks).getOrElse(Nil)
            ++ batch.collect { case e if e.event_type == "click" =>
                 LastClick(e.event_id, e.ts.getTime) })
            .sortBy(c => (c.clickMillis, c.clickId))
          val out = batch.collect { case e if e.event_type == "purchase" =>
            // latest click at or before the purchase; max id on ties
            val m = merged.foldLeft(Option.empty[LastClick]) { (acc, c) =>
              if (c.clickMillis <= e.ts.getTime) Some(c) else acc
            }
            AsofOut(e.event_id, userId, e.ts,
              m.map(_.clickId), m.map(c => new Timestamp(c.clickMillis)))
          }
          // prune: every click inside the watermark horizon survives;
          // below it only the latest (any future purchase has
          // ts >= wm, so older clicks can never be its latest-at-or-
          // before)
          val (recent, old) = merged.partition(_.clickMillis >= wm)
          val kept = old.lastOption.toList ++ recent
          if (kept.isEmpty) state.remove() else state.update(ClickLog(kept))
          out.iterator
      }
  }

  /** Watermarked STREAM-STREAM join — both sides unbounded (the form
    * [[rangeJoinStream]]'s stream-static shape cannot express):
    * purchases attribute to every click by the same user within the
    * preceding `horizon`. The time-range predicate plus watermarks on
    * BOTH sides is what bounds the join state — Spark evicts a
    * buffered click once the purchase-side watermark passes
    * click_ts + horizon, so state is O(events-per-horizon), never
    * O(stream). Without the range condition (or with only one
    * watermark) the state grows forever — the 100 TB failure mode
    * this operator exists to avoid.
    *
    * `joinType` "inner" (default): late/unmatched rows drop;
    * attribution completeness is the batch as-of join's job (q19
    * family), this is its low-latency prefix. "leftOuter" — what an
    * attribution pipeline actually ships — KEEPS unattributed
    * purchases: Spark holds an unmatched purchase in state until the
    * CLICK-side watermark guarantees no matching click can still
    * arrive, then emits it null-padded — outer rows run late by up
    * to the horizon but are never lost, and the same watermarks that
    * bound the join state also bound the null-emit delay. */
  def attributionJoinStream(clicks: DataFrame, purchases: DataFrame,
                            horizon: String = "1 hour",
                            joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "leftOuter",
      s"attribution join supports inner/leftOuter, got '$joinType'")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", horizon)
    val p = purchases
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", horizon)
    p.join(c,
      expr(s"user_id = c_user AND " +
        s"c_ts BETWEEN p_ts - INTERVAL $horizon AND p_ts"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Streaming range join — the streaming twin of
    * `range_join_events`: points arriving on the stream attach to
    * every `[lo, hi)` interval of their key in a STATIC interval
    * table (campaign windows, outage windows, validity periods).
    * Delegates to the batch operator's bucket decomposition
    * ([[graft.queries.RangeJoinOps.bucketed]]), which keeps the
    * stream-static join an EQUI join — stateless per micro-batch, no
    * theta-join nested loop, the static side exploded once per its
    * own size (not per batch row). Append mode; a pair meets in
    * exactly one bucket, so no dedup state is needed. */
  def rangeJoinStream(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], t: String, lo: String,
                      hi: String, widthSec: Long): DataFrame =
    graft.queries.RangeJoinOps.bucketed(
      points, intervals, keys, t, lo, hi, widthSec)

  /** Streaming exact dedup — the streaming twin of `dedup_exact`:
    * keep the FIRST arrival per content fingerprint, drop every later
    * copy. `dropDuplicatesWithinWatermark` bounds the state store to
    * one entry per distinct fingerprint seen within the watermark
    * horizon (a plain dropDuplicates would grow state forever — the
    * 100 TB failure mode), so duplicates separated by more than the
    * horizon can both survive: the batch dedup is the ground truth,
    * this is the low-latency prefilter in front of it. */
  def dedupStream(docs: DataFrame, watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", md5(graft.queries.TextOps.normText(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming curation front-end — the streaming twin of
    * `curation_pipeline`'s stateless prefix plus `pii_redact`:
    * language filter → quality gate → PII redaction → token count,
    * built from the SAME shared Column expressions as the batch
    * operators ([[graft.queries.TextOps.qualityScore]] /
    * [[graft.queries.TextOps.redactPii]]), so stream and batch score
    * and scrub identically by construction. Entirely stateless
    * per-row codegen'd work — no watermark, no state store; the one
    * stateful curation step (dedup) is [[dedupStream]], composed
    * after this when needed. */
  def curateStream(docs: DataFrame,
                   minQuality: Double = graft.queries.TextOps.CurationMinQuality)
      : DataFrame = {
    import graft.queries.TextOps
    docs.filter(col("lang") === "en")
      .withColumn("quality_score", TextOps.qualityScore(col("text")))
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"), col("quality_score"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.piiMatchCount(col("text")).as("n_pii"),
        TextOps.redactPii(col("text")).as("text"))
  }

  /** Streaming decontamination — the streaming twin of
    * `dedup_decontaminate_bloom`: keep incoming documents whose
    * distinct shingles hit the FROZEN eval-set bloom fewer than
    * `minOverlap` times, dropping benchmark near-copies at ingest.
    * The eval side is built once driver-side
    * ([[graft.queries.DedupOps.evalShingleBloom]], ~1.2 bytes per
    * eval shingle — benchmark sets are bounded, so task-binary-sized
    * at any corpus scale) and embedded as a LITERAL in Spark's own
    * `BloomFilterMightContain`; per row the work is a stateless
    * codegen'd count over the doc's shingle array — no state store,
    * no join, no watermark. Like [[dedupStream]] this is the
    * low-latency prefilter in front of the batch ground truth: a
    * bloom false positive can inflate a count by ~fpp per shingle
    * (never deflate it), so the stream may rarely over-drop near the
    * threshold and the batch operator remains authoritative.
    * `n_eval_hits` rides along for observability. */
  def decontaminateStream(docs: DataFrame, evalBloom: Array[Byte],
                          minOverlap: Long =
                            graft.queries.DedupOps.ContaminationMinShingles)
      : DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val shingles = graft.queries.DedupOps.shingleArrayOf(col("text"))
    val hits = size(filter(shingles, s =>
      PlanBridge.columnOf(BloomFilterMightContain(
        Literal(evalBloom, org.apache.spark.sql.types.BinaryType),
        PlanBridge.expressionOf(graft.queries.DedupOps.shingleHash(s))))))
    docs
      .withColumn("n_eval_hits", hits.cast("long"))
      .filter(col("n_eval_hits") < minOverlap)
  }

  /** Streaming ingest that keeps the [[graft.etl.FileSkipIndex]]
    * CURRENT: each micro-batch lands in the data table via the
    * batch-id-tagged idempotent append, then the index refresh scans
    * ONLY the files that append produced (Θ(batch)). Order matters —
    * data first, index second — so a crash between the two leaves the
    * index BEHIND the table, which the next refresh repairs (and
    * which prunedScan's staleness guard treats as a full-scan
    * fallback, never a wrong answer). */
  def skipIndexStream(wh: graft.etl.Warehouse,
                      table: graft.etl.TableName,
                      cols: Seq[String],
                      rows: DataFrame,
                      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the empty-seed discipline every maintainer here follows:
        // batch 0 against a missing table must seed schema-only, then
        // flow through the batch-tagged append like every other batch
        if (!batch.sparkSession.catalog.tableExists(table.quoted))
          wh.writeTable(table, batch.limit(0))
        wh.appendToTableIdempotent(table, batch, s"skipidx-batch-$id")
        graft.etl.FileSkipIndex.refresh(wh, table, cols)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming maintenance of the STORED retrieval index
    * ([[graft.queries.TextOps.buildRetrievalIndex]]'s three tables):
    * each micro-batch of (doc_id, text) rows lands as Θ(batch)
    * batch-id-tagged idempotent appends — postings for the new docs,
    * df MONOID PARTIALS (summed at query time, existing rows never
    * rewritten), and a corpus-size partial. Ingest-to-searchable is
    * one micro-batch; queries keep reading the same tables.
    *
    * Seed discipline (shared by every foreachBatch maintainer here):
    * the FIRST batch seeds EMPTY tables (schema only) and then flows
    * through the same batch-tagged idempotent append as every other
    * batch. Seeding with the batch's own rows via writeTable would
    * leave batch 0 unmarked — a crash between the seed and the
    * checkpoint commit would re-deliver batch 0 into the append path
    * and double-apply it. With the empty seed, every data write is
    * marker-guarded, so at-least-once replay converges in every
    * crash interleaving. */
  def retrievalIndexStream(wh: graft.etl.Warehouse,
                           base: String,
                           docs: DataFrame,
                           checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val tfTable = graft.etl.TableName.parse(s"$base" + "_tf")
        if (!batch.sparkSession.catalog.tableExists(tfTable.quoted))
          graft.queries.TextOps.buildRetrievalIndex(wh, batch.limit(0), base)
        graft.queries.TextOps.appendRetrievalBatch(
          wh, batch, base, s"ret-batch-$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** GENERAL streaming incremental-view maintenance: any transform
    * that distributes over batches — a projection/filter, a join
    * against static dimensions ([[graft.queries.DimOps]]'s delta-join
    * fact side), a per-row feature extraction — maintained as a
    * stored warehouse table by applying the transform to each
    * micro-batch and appending the result under the batch-id tag
    * (first batch seeds; replays replace their own files, so an
    * at-least-once restart converges). This is the one shape behind
    * the skip-index / retrieval / histogram streams, exposed so a
    * pipeline can materialize ANY delta-distributive view without
    * writing a new foreachBatch body. NOT for transforms that need
    * cross-batch state (aggregates over the whole history belong to
    * the monoid-partial patterns; joins between two streams to the
    * watermarked stream-stream join). */
  def incrementalViewStream(wh: graft.etl.Warehouse,
                            table: graft.etl.TableName,
                            transform: DataFrame => DataFrame,
                            rows: DataFrame,
                            checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // empty seed + marker-guarded append for EVERY batch — see
        // retrievalIndexStream's seed-discipline note
        if (!batch.sparkSession.catalog.tableExists(table.quoted))
          wh.writeTable(table, transform(batch.limit(0)))
        wh.appendToTableIdempotent(table, transform(batch), s"mv-batch-$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming maintenance of the [[graft.queries.DimOps]] histogram
    * quantile rollup: each micro-batch's (day, type, bin) counts are
    * appended with the batch-id-tagged idempotent append, so an
    * at-least-once replay of a batch never double-counts a bin and
    * the stored rollup converges to exactly the batch-pipeline's
    * histogram (integer monoid — the spec pins stream-vs-batch
    * equality on the final quantiles). State outside the table is
    * zero: the histogram IS the aggregate, per-batch work is
    * Θ(batch). */
  def valueHistogramStream(wh: graft.etl.Warehouse,
                           table: graft.etl.TableName,
                           events: DataFrame,
                           checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // empty seed + marker-guarded append for EVERY batch — see
        // retrievalIndexStream's seed-discipline note (seeding with
        // batch 0's rows would double-apply them if batch 0 replays
        // after a crash before the checkpoint commit)
        if (!batch.sparkSession.catalog.tableExists(table.quoted))
          wh.writeTable(table,
            graft.queries.DimOps.valueHistogram(batch.limit(0)))
        graft.queries.DimOps.appendValueHistogram(
          wh, table, batch, s"hist-batch-$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming heavy hitters — the streaming twin of
    * `text_heavy_hitters`: a bounded Misra–Gries summary of the
    * WHOLE stream maintained as a warehouse table. Each micro-batch
    * computes its own distributed MG summary (per-partition pass +
    * driver merge — ≤ k counters however large the batch), then
    * folds it into the stored state with the MERGEABLE-summaries
    * merge, whose error bound (≤ n_total/(k+1), superset guarantee
    * for every token above that rate) holds across ANY merge tree —
    * so the state never rescans history and never exceeds k rows.
    * State lives as a versioned warehouse table (atomic pointer-swap
    * writes), carrying `n_total` and the last applied `batch_id`:
    * foreachBatch is at-least-once, and a REPLAYED batch id is
    * skipped, keeping the fold exactly-once. The batch operator's
    * exact second pass remains the authority; this is the standing
    * candidate set a pipeline consults between full runs. Readers of
    * the state table filter `token IS NOT NULL` (a null-token row is
    * the metadata sentinel an all-cancel merge leaves behind). */
  def heavyHittersStream(wh: graft.etl.Warehouse,
                         state: graft.etl.TableName,
                         docs: DataFrame,
                         checkpointDir: String,
                         k: Int = (graft.queries.TextOps.HeavyHitterPhiDen /
                           graft.queries.TextOps.HeavyHitterPhiNum).toInt)
                        (emit: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (applyHeavyHitterBatch(wh, state, batch, id, k))
          emit(batch.sparkSession.table(state.quoted), id)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One micro-batch fold (factored for direct replay testing).
    * Returns false when `id` was already applied — the at-least-once
    * replay no-op. */
  private[streaming] def applyHeavyHitterBatch(
      wh: graft.etl.Warehouse, state: graft.etl.TableName,
      batch: DataFrame, id: Long, k: Int): Boolean = {
    import graft.queries.TextOps
    val spark = batch.sparkSession
    import spark.implicits._
    val (prevN, prevSum, prevId) =
      if (!spark.catalog.tableExists(state.quoted)) (0L, Map.empty[String, Long], -1L)
      else {
        // foreachBatch runs in a CLONED session with its own relation
        // cache: refresh, or from the third micro-batch on this read
        // serves the location cached in batch 1 and silently drops
        // batch 1's fold (the same staleness class as the r15/r16
        // erIndexAppend bug)
        spark.catalog.refreshTable(state.quoted)
        val rows = spark.table(state.quoted)
          .select($"token", $"cnt", $"n_total", $"batch_id").collect()
        if (rows.isEmpty) (0L, Map.empty[String, Long], -1L)
        else (rows.head.getLong(2),
          // null-token row = the metadata sentinel (see below)
          rows.filter(!_.isNullAt(0))
            .map(r => r.getString(0) -> r.getLong(1)).toMap,
          rows.head.getLong(3))
      }
    if (id <= prevId) false
    else {
      val (bn, bsum) = TextOps.mgSummarize(TextOps.hhTokens(batch), k)
      val merged = TextOps.mgMerge(prevSum, bsum, k)
      // an ALL-CANCEL merge (k+1 distinct singletons) leaves zero
      // counters; n_total and batch_id must survive it or the error
      // bound's denominator resets and a replay double-applies —
      // a null-token sentinel row carries the metadata (readers of
      // the state table filter token IS NOT NULL)
      val dataRows = merged.toSeq.map { case (t, c) => (t, c, prevN + bn, id) }
      val outRows =
        if (dataRows.nonEmpty) dataRows
        else Seq((null.asInstanceOf[String], 0L, prevN + bn, id))
      // ≤ k+1 rows by the MG bound (k is a constant): one write task —
      // a driver-local Seq otherwise parallelizes to the session's
      // full width, and the 32-near-empty-task state write per batch
      // was the largest stage family of the streaming replay
      wh.writeTable(state,
        outRows.toDF("token", "cnt", "n_total", "batch_id").coalesce(1))
      // fresh view for the emit read in the SAME cloned session
      spark.catalog.refreshTable(state.quoted)
      true
    }
  }

  /** Streaming NEAR-dup detection — the streaming twin of
    * `dedup_minhash_incremental`: each micro-batch plays the
    * "incoming batch" of the incremental lifecycle — banded with the
    * SAME [[graft.queries.DedupOps.minhashBandsOf]] expressions as
    * the batch operator, joined against the MATERIALIZED band index,
    * which then absorbs the batch. The warehouse table, not the state
    * store, is the cross-batch state: a state-store copy of a
    * corpus-scale band index cannot fit an executor and cannot be
    * shared with batch runs, while the warehouse table is durable,
    * O(batch) to extend, and identical for batch and stream by
    * construction. Candidate pairs per micro-batch go to `emit`.
    *
    * foreachBatch is AT-LEAST-ONCE — after a failure the same batch id
    * replays — so the index append is the batch-tagged idempotent form
    * ([[graft.etl.Warehouse.appendToTableIdempotent]]): a replay
    * replaces its own files instead of duplicating band rows, keeping
    * the durable index exactly-once. The batch's bands are cached for
    * the append + join, then unpersisted once `emit` returns, so a
    * long-running stream holds no accumulating cache entries. */
  def incrementalDedupStream(wh: graft.etl.Warehouse,
                             index: graft.etl.TableName,
                             docs: DataFrame,
                             checkpointDir: String)
                            (emit: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import graft.queries.DedupOps
        val bands = DedupOps.minhashBandsOf(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          wh.appendToTableIdempotent(index, bands, s"b$id")
          emit(DedupOps.pairsAgainstIndex(wh, index, bands), id)
        } finally { bands.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming SCD2 maintenance — the streaming twin of
    * [[graft.queries.DimOps.scd2MergeDim]]: each micro-batch carries
    * partial-dimension upserts (key, attrs, as_of) and is merged into
    * the WAREHOUSE dim table by the shared
    * [[graft.queries.DimOps.scd2Upsert]] core — like the band index,
    * the warehouse table (not the state store) is the cross-batch
    * state, durable and shared with batch readers. The merge reads
    * the table's current pointer and `writeTable` lands the merged
    * history at a NEW versioned location before atomically
    * re-pointing, so concurrent readers never see a half-written
    * dimension and foreachBatch's at-least-once replay just re-lands
    * an identical version (scd2Upsert is convergent: re-applied
    * attributes change nothing). Cost per batch is one scan of the
    * dimension + a join of its current slice against the batch —
    * dimensions are the small side of a warehouse, which is what
    * makes the rewrite-and-re-point form viable where a fact table
    * would need partition-level merge. */
  def scd2Stream(wh: graft.etl.Warehouse, dim: graft.etl.TableName,
                 key: String, attrs: Seq[String],
                 updates: DataFrame, checkpointDir: String)
                (afterBatch: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the dimension is a batch-lifecycle artifact; a loud contract
        // beats refreshTable's obscure NoSuchTableException on batch 0
        require(batch.sparkSession.catalog.tableExists(dim.quoted),
          s"scd2Stream requires dimension '${dim.identifier}' to exist " +
            "- build it with the batch SCD2 lifecycle first")
        // foreachBatch runs in a CLONED session with its own relation
        // cache — refresh so this batch sees the location the previous
        // batch re-pointed to, not a stale cached file index
        batch.sparkSession.catalog.refreshTable(dim.quoted)
        val current = batch.sparkSession.table(dim.quoted)
        val merged = graft.queries.DimOps.scd2Upsert(current, batch, key, attrs)
        wh.writeTable(dim, merged)
        afterBatch(id)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ANN index maintenance — the streaming twin of the
    * stored IVF lifecycle ([[graft.queries.AnnOps.appendToIvfIndex]]):
    * each micro-batch of new vectors is assigned to its coarse cell
    * against the STORED centroid table and appended to the stored
    * coded-corpus index — Θ(batch · √n) assignment compute, O(batch)
    * appended bytes, no corpus rescan. The warehouse tables (not the
    * state store) are the cross-batch state, so batch probes
    * ([[graft.queries.AnnOps.annIvfTopkStored]]-style) immediately see
    * streamed vectors and the index survives the stream. The append is
    * the batch-tagged idempotent form: foreachBatch's at-least-once
    * replay replaces its own files instead of duplicating index rows.
    * Centroids are NOT retrained per batch (retraining would reassign
    * the whole corpus — the O(n) step this index exists to avoid);
    * drift is handled the way IVF systems do it: periodic batch
    * rebuild, streamed appends between rebuilds. */
  def ivfIndexStream(wh: graft.etl.Warehouse,
                     centroids: graft.etl.TableName,
                     index: graft.etl.TableName,
                     vectors: DataFrame, checkpointDir: String)
                    (afterBatch: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.queries.AnnOps.appendToIvfIndex(wh, centroids, index,
          batch, s"b$id")
        afterBatch(id)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming entity-resolution maintenance — the streaming twin of
    * the incremental ER lifecycle
    * ([[graft.queries.FuzzyJoin.erIndexAppend]]): each micro-batch of
    * new (id, name) records folds into the stored variant index and
    * entity table at Θ(batch + touched components) — candidate edges
    * against the STORED index, only touched components re-resolved,
    * untouched entities keep their rows. The warehouse tables are the
    * cross-batch state, so golden-record queries
    * ([[graft.queries.FuzzyJoin.erServeGoldenRecords]]) immediately
    * see streamed records. At-least-once replay converges: the
    * variant append is batch-tag idempotent and the re-run entity
    * merge recomputes identical assignments. */
  def erIndexStream(wh: graft.etl.Warehouse, base: String,
                    records: DataFrame, checkpointDir: String)
                   (afterBatch: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // seed-empty discipline (see retrievalIndexStream's scaladoc):
        // every DATA write stays marker-guarded / merge-idempotent
        val vT = graft.etl.TableName.parse(s"$base" + "_variants")
        if (!batch.sparkSession.catalog.tableExists(vT.quoted))
          graft.queries.FuzzyJoin.erIndexBuild(wh, batch.limit(0), base)
        graft.queries.FuzzyJoin.erIndexAppend(wh, batch, base, s"er-b$id")
        afterBatch(id)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The `update` refresh loop as a stream (load.py:1343-1367 →
    * Trigger.AvailableNow): drain whatever extract files have landed
    * under `sourceDir`, run `apply` on each micro-batch (e.g. build a
    * relation via the Warehouse), then stop. Returns after all
    * available data is processed — the reference's "wait for extract
    * events then percolate" without the polling. */
  def availableNowRefresh(spark: SparkSession, sourceDir: String,
                          schema: org.apache.spark.sql.types.StructType,
                          checkpointDir: String)
                         (apply: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => apply(batch, id) }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
