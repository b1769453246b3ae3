package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType}

import graft.core.Tables

/** The reference warehouse's own operator surface (SURVEY.md §2),
  * re-expressed as oracle-checkable batch queries over the `events`
  * fixture. Each query models one reference operator's semantics with
  * the fixture's columns standing in for the gmall page-log/CDC fields;
  * the streaming (incremental) forms of the stateful ones live in
  * `graft.streaming` and are exercised by ScalaTest.
  *
  * Reference citations are to /root/reference/gmall-logger/src/main/java/.
  *
  * Scale notes: every query is a narrow scan + (at most) one hash
  * shuffle on its natural key (user_id / event_type), so each plan is
  * the one you'd run at 100 TB: filters/projections reach the parquet
  * scan, per-key windows partition by high-cardinality keys (never a
  * global window), and the only broadcast is the 3-row config table.
  */
object Warehouse {

  private def dsum(c: Column): Column = Q.dsum(c)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Materialize a SMALL result into the driver so the temp working
    * dir backing it can be deleted before the query returns (the
    * store-building queries w17–w19 otherwise leak one tree per bench
    * invocation into /tmp). Only for dim-sized outputs — never call on
    * a fact-sized frame. */
  private def localized(s: SparkSession, df: DataFrame): DataFrame =
    s.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val w = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toVector.sortBy(-_.getNameCount)
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      } finally w.close()
    }

  /** CDC/page-log envelope schema for the from_json round-trips
    * (models the Debezium envelope probed at app/dim/DimApp.java:61 and
    * app/func/TableProcessFunction.java:110-114). */
  private val envSchema: DataType = DataType.fromDDL(
    "type STRING, source_table STRING, data STRUCT<event_id: BIGINT, user_id: BIGINT>")

  /** Rows with event_id % 11 == 0 get a deliberately corrupt payload so
    * the parse-or-drop / dirty-side-output paths have real work. */
  private def withEnvelope(df: DataFrame): DataFrame =
    df.withColumn("raw",
      when(pmod(col("event_id"), lit(11)) === 0,
        concat(lit("{corrupt"), col("props")))
      .otherwise(to_json(struct(
        col("event_type").as("type"),
        lit("events").as("source_table"),
        struct(col("event_id"), col("user_id")).as("data")))))

  // ---------------------------------------------------------------------
  // w01 — P1: parse-or-drop JSON + CDC-op filter (DimApp.java:54-72).
  // Serialize to a CDC-style envelope (P5/F5), parse back (P4), drop
  // malformed rows and ops outside the allowed set. The op set
  // {signup,purchase,click} stands in for {insert,update,bootstrap-insert}.
  val w01 = Q(
    "w01_cdc_op_filter",
    (s, dir) => {
      import s.implicits._
      withEnvelope(ev(s, dir))
        .withColumn("j", from_json($"raw", envSchema))
        .filter($"j.type".isin("signup", "purchase", "click"))
        .select($"j.data.event_id".as("event_id"), $"j.type".as("op"),
                $"j.data.user_id".as("user_id"))
    },
    Some("""
      SELECT event_id, event_type AS op, user_id
      FROM events
      WHERE event_id % 11 <> 0
        AND event_type IN ('signup', 'purchase', 'click')
    """))

  // ---------------------------------------------------------------------
  // w02 — P2: dirty side output (BaseLogApp.java:46-62). The rows the
  // parse drops are routed to their own output with the raw payload
  // preserved, instead of being silently discarded.
  val w02 = Q(
    "w02_dirty_side_output",
    (s, dir) => {
      import s.implicits._
      withEnvelope(ev(s, dir))
        .withColumn("j", from_json($"raw", envSchema))
        .filter($"j.type".isNull)
        .select($"event_id", $"raw")
    },
    Some("""
      SELECT event_id, '{corrupt' || props AS raw
      FROM events
      WHERE event_id % 11 = 0
    """))

  // ---------------------------------------------------------------------
  // w03 — M2: 5-way demultiplex (BaseLogApp.java:98-162, with the
  // intended semantics — SURVEY §7.4). One pass over the parsed stream
  // becomes five tagged sub-streams (err/start/page/display/action);
  // here each branch is a filter on the shared scan and the driver
  // output is the per-stream cardinality profile after re-union.
  // display/action fan out of page rows (exploded in w04).
  val w03 = Q(
    "w03_five_way_split",
    (s, dir) => {
      import s.implicits._
      val e = ev(s, dir)
      val err   = e.filter($"event_type" === "error").withColumn("stream", lit("err"))
      val start = e.filter($"event_type" === "signup").withColumn("stream", lit("start"))
      val page  = e.filter($"event_type".isin("view", "click", "purchase"))
      val disp  = page.withColumn("stream", lit("display"))
        .withColumn("n_child", pmod($"event_id", lit(3)) + 1)
      val act   = page.withColumn("stream", lit("action"))
        .withColumn("n_child", pmod($"event_id", lit(2)) + 1)
      err.withColumn("n_child", lit(1L))
        .unionByName(start.withColumn("n_child", lit(1L)))
        .unionByName(page.withColumn("stream", lit("page")).withColumn("n_child", lit(1L)))
        .unionByName(disp).unionByName(act)
        .groupBy($"stream")
        .agg(sum($"n_child").cast("long").as("n_rows"),
             countDistinct($"user_id").as("n_users"))
        .orderBy($"stream")
    },
    Some("""
      WITH tagged AS (
        SELECT 'err' AS stream, 1 AS n_child, user_id FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT 'start', 1, user_id FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT 'page', 1, user_id FROM events WHERE event_type IN ('view','click','purchase')
        UNION ALL
        SELECT 'display', event_id % 3 + 1, user_id FROM events WHERE event_type IN ('view','click','purchase')
        UNION ALL
        SELECT 'action', event_id % 2 + 1, user_id FROM events WHERE event_type IN ('view','click','purchase')
      )
      SELECT stream, CAST(SUM(n_child) AS BIGINT) AS n_rows,
             COUNT(DISTINCT user_id) AS n_users
      FROM tagged GROUP BY stream ORDER BY stream
    """))

  // ---------------------------------------------------------------------
  // w04 — M3: array explode with parent denormalization
  // (BaseLogApp.java:126-149): each display element becomes its own row
  // carrying the parent's common/page_id/ts fields. The display array is
  // synthesized deterministically from the event so both engines agree.
  val w04 = Q(
    "w04_explode_displays",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"event_type".isin("view", "click", "purchase"))
        .withColumn("displays", expr(
          "transform(sequence(0, pmod(event_id, 3)), " +
          "i -> named_struct('pos', i, 'item', concat('item_', pmod(event_id * 7 + i, 50))))"))
        .select($"event_id", $"user_id", $"event_type".as("page_id"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          explode($"displays").as("d"))
        .select($"event_id", $"user_id", $"page_id", $"ts_str",
          $"d.pos".as("pos"), $"d.item".as("item"))
    },
    Some("""
      SELECT event_id, user_id, page_id, ts_str, pos,
             'item_' || ((event_id * 7 + pos) % 50) AS item
      FROM (SELECT event_id, user_id, event_type AS page_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
              unnest(generate_series(0, event_id % 3)) AS pos
            FROM events
            WHERE event_type IN ('view','click','purchase'))
    """))

  // ---------------------------------------------------------------------
  // w05 — A1: per-key daily distinct / UV dedup
  // (DwdTrafficUniqueVisitorDetail.java:57-80): keep each user's first
  // event per day. Batch analogue of the ValueState<last_visit_date>
  // filter; incremental form: graft.streaming.DedupDaily.
  val w05 = Q(
    "w05_uv_dedup",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", to_date($"ts"))
        .orderBy($"ts", $"event_id")
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("event_date"),
                $"event_id", $"event_type")
    },
    Some("""
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS event_date, event_id, event_type
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts, event_id) AS rn
            FROM events)
      WHERE rn = 1
    """))

  // ---------------------------------------------------------------------
  // w06 — A2: new/returning-visitor flag repair (BaseLogApp.java:66-96):
  // a claimed is_new=1 survives only if the event really falls on the
  // user's first-ever date. The claimed flag is synthesized from the
  // event id; first-visit date is the per-user min — exactly the
  // ValueState the reference keeps. Incremental form:
  // graft.streaming.VisitorFlagRepair.
  val w06 = Q(
    "w06_is_new_repair",
    (s, dir) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      ev(s, dir)
        .withColumn("event_date", date_format($"ts", "yyyy-MM-dd"))
        .withColumn("is_new_claimed",
          when(pmod($"event_id", lit(3)) === 0, lit("1")).otherwise(lit("0")))
        .withColumn("first_date", min($"event_date").over(wu))
        .withColumn("is_new_repaired",
          when($"is_new_claimed" === "1" && $"event_date" === $"first_date", "1")
            .otherwise("0"))
        .select($"event_id", $"user_id", $"event_date",
                $"is_new_claimed", $"is_new_repaired")
    },
    Some("""
      SELECT event_id, user_id, event_date, is_new_claimed,
        CASE WHEN is_new_claimed = '1' AND event_date = first_date
             THEN '1' ELSE '0' END AS is_new_repaired
      FROM (SELECT event_id, user_id,
              strftime(ts, '%Y-%m-%d') AS event_date,
              CASE WHEN event_id % 3 = 0 THEN '1' ELSE '0' END AS is_new_claimed,
              MIN(strftime(ts, '%Y-%m-%d')) OVER (PARTITION BY user_id) AS first_date
            FROM events)
    """))

  // ---------------------------------------------------------------------
  // w07 — J1 + P6: broadcast config lookup join with data-driven column
  // projection (DimApp.java:89-96 + TableProcessFunction.java:107-141).
  // A 3-row config table routes each event type to a sink table and
  // names the columns to keep; unconfigured types drop (inner join,
  // like the reference's missing-key drop). Projection is exact set
  // membership on a MapType column — NOT the reference's buggy
  // substring contains (SURVEY §7.4). Config is broadcast: at 100 TB
  // the fact side never shuffles for this join.
  val w07 = Q(
    "w07_config_routing_projection",
    (s, dir) => {
      import s.implicits._
      val config = Seq(
        ("purchase", "dwd_purchase", "event_id,user_id,value_cents"),
        ("click",    "dwd_click",    "event_id,user_id"),
        ("view",     "dwd_view",     "event_id")
      ).toDF("source_type", "sink_table", "sink_columns")
      val e = ev(s, dir).withColumn("m", map(
        lit("event_id"), $"event_id".cast("string"),
        lit("user_id"), $"user_id".cast("string"),
        lit("value_cents"), round($"value" * 100).cast("long").cast("string")))
      e.join(broadcast(config), e("event_type") === config("source_type"))
        .withColumn("kept",
          map_filter($"m", (k, _) => array_contains(split($"sink_columns", ","), k)))
        .withColumn("ks", array_sort(map_keys($"kept")))
        .select($"sink_table", $"event_id",
          concat_ws(",", $"ks").as("kept_cols"),
          concat_ws(",", transform($"ks", k => element_at($"kept", k))).as("kept_vals"))
    },
    Some("""
      SELECT CASE event_type WHEN 'purchase' THEN 'dwd_purchase'
                             WHEN 'click' THEN 'dwd_click'
                             ELSE 'dwd_view' END AS sink_table,
        event_id,
        CASE event_type WHEN 'purchase' THEN 'event_id,user_id,value_cents'
                        WHEN 'click' THEN 'event_id,user_id'
                        ELSE 'event_id' END AS kept_cols,
        CASE event_type
          WHEN 'purchase' THEN event_id || ',' || user_id || ',' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
          WHEN 'click' THEN event_id || ',' || user_id
          ELSE CAST(event_id AS VARCHAR) END AS kept_vals
      FROM events
      WHERE event_type IN ('purchase','click','view')
    """))

  // ---------------------------------------------------------------------
  // w08 — W2: bounce detection, batch analogue of the CEP pattern
  // (DwdTrafficUserJumpDetail.java:88-136): a session-entry event
  // (no prior event within 10 min) is a bounce iff no follow-up event
  // arrives within 10 s. lead/lag per user replace the NFA + timeout
  // timer; incremental form: graft.streaming.BounceDetector.
  val w08 = Q(
    "w08_bounce_detect",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev(s, dir)
        .withColumn("ep", unix_micros($"ts"))
        .withColumn("prev_ep", lag($"ep", 1).over(w))
        .withColumn("next_ep", lead($"ep", 1).over(w))
        .filter(($"prev_ep".isNull || $"ep" - $"prev_ep" > 600L * 1000000L) &&
                ($"next_ep".isNull || $"next_ep" - $"ep" > 10L * 1000000L))
        .select($"event_id", $"user_id", Q.epochS($"ep").as("epoch_s"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) // 1000000 AS epoch_s
      FROM (SELECT event_id, user_id, ts,
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
              LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
            FROM events)
      WHERE (prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 600 * 1000000)
        AND (next_ts IS NULL OR epoch_us(next_ts) - epoch_us(ts) > 10 * 1000000)
    """))

  // ---------------------------------------------------------------------
  // w09 — W3: session-gap windows (the 10 s `within` generalized to a
  // 10 min session gap): gap-flag + running sum assigns session ids,
  // then one hash agg per (user, session). This is the batch shape of
  // session_window(ts, '10 minutes').
  val w09 = Q(
    "w09_session_agg",
    (s, dir) => {
      import s.implicits._
      val w  = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("ep", unix_micros($"ts"))
        .withColumn("new_sess",
          when(lag($"ep", 1).over(w).isNull ||
               $"ep" - lag($"ep", 1).over(w) > 600L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum($"new_sess").over(ws))
        .groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_events"),
             Q.epochS(min($"ep")).as("start_s"),
             Q.epochS(max($"ep")).as("end_s"),
             dsum($"value").as("session_value"))
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN LAG(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600 * 1000000
               THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessioned AS (
        SELECT *, SUM(new_sess) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        COUNT(*) AS n_events,
        epoch_us(MIN(ts)) // 1000000 AS start_s,
        epoch_us(MAX(ts)) // 1000000 AS end_s,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      FROM sessioned
      GROUP BY user_id, session_seq
    """))

  // ---------------------------------------------------------------------
  // w10 — K3: keyed upsert semantics / last-writer-wins
  // (DimSinkFunction.java:13-33): after replaying every change, the dim
  // table holds exactly the latest record per key. The physical MERGE
  // write path lives in graft.ops.DimStore (ScalaTest-verified); this
  // checks the resulting table state against the oracle.
  val w10 = Q(
    "w10_dim_upsert_lww",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type".as("last_event_type"),
          round($"value" * 100).cast("long").as("last_value_cents"),
          Q.epochS(unix_micros($"ts")).as("last_epoch_s"))
    },
    Some("""
      SELECT user_id, event_type AS last_event_type,
        CAST(round(value * 100) AS BIGINT) AS last_value_cents,
        epoch_us(ts) // 1000000 AS last_epoch_s
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
    """))

  // ---------------------------------------------------------------------
  // w11 — F1/F2/F3/F8: the reference's date kit (DateFormatUtil.java:
  // 10-38): epoch millis ↔ `yyyy-MM-dd [HH:mm:ss]` at an explicit UTC+8
  // offset (the reference bakes +8 into the JVM zone; we make it an
  // expression), plus day arithmetic.
  val w11 = Q(
    "w11_date_kit",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"event_type")
        .agg(min($"ts").as("min_ts"), max($"ts").as("max_ts"))
        .select($"event_type",
          date_format($"min_ts" + expr("INTERVAL 8 HOURS"), "yyyy-MM-dd HH:mm:ss")
            .as("min_cst"),
          date_format($"max_ts", "yyyy-MM-dd").as("max_date"),
          unix_millis($"min_ts").as("min_millis"),
          date_format(date_add($"max_ts".cast("date"), -1), "yyyy-MM-dd")
            .as("max_date_minus_1d"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
        strftime(MIN(ts) + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS min_cst,
        strftime(MAX(ts), '%Y-%m-%d') AS max_date,
        epoch_us(MIN(ts)) // 1000 AS min_millis,
        strftime(CAST(MAX(ts) AS DATE) - INTERVAL 1 DAY, '%Y-%m-%d') AS max_date_minus_1d
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """))

  // ---------------------------------------------------------------------
  // w12 — P5/F5: exact JSON serialization (to_json before the Kafka
  // sink, DwdTrafficUniqueVisitorDetail.java:84): byte-identical
  // payload strings both engines.
  val w12 = Q(
    "w12_json_serialize",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"event_type" === "purchase")
        .select($"event_id",
          to_json(struct($"event_id", $"event_type", $"user_id")).as("payload"))
    },
    Some("""
      SELECT event_id,
        '{"event_id":' || event_id || ',"event_type":"' || event_type ||
        '","user_id":' || user_id || '}' AS payload
      FROM events
      WHERE event_type = 'purchase'
    """))

  // ---------------------------------------------------------------------
  // w13 — tumbling windows via the window() function (SURVEY §2.5 note:
  // the reference's absent DWS layer exposed through
  // groupBy(window(...))), batch flavor of the streaming test's
  // windowed agg. Start times surface as epoch seconds for the oracle.
  val w13 = Q(
    "w13_tumbling_window",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .select($"w.start".cast("long").as("window_start_s"),
          $"event_type", $"n", $"total_value")
        .orderBy($"window_start_s", $"event_type")
    },
    Some("""
      SELECT (epoch_us(ts) // (21600::BIGINT * 1000000)) * 21600 AS window_start_s,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start_s, event_type
    """))

  // ---------------------------------------------------------------------
  // w14 — sliding windows (6h window, 3h slide): each event lands in
  // exactly two windows; the oracle replays that fan-out with an
  // explicit 2-way unnest.
  val w14 = Q(
    "w14_sliding_window",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "6 hours", "3 hours").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("uv"))
        .select($"w.start".cast("long").as("window_start_s"), $"n", $"uv")
        .orderBy($"window_start_s")
    },
    Some("""
      SELECT window_start_s, COUNT(*) AS n, COUNT(DISTINCT user_id) AS uv
      FROM (SELECT user_id,
              (epoch_us(ts) // (10800::BIGINT * 1000000)) * 10800 - k * 10800 AS window_start_s
            FROM events, LATERAL (SELECT unnest(range(0, 2)) AS k) t)
      GROUP BY window_start_s
      ORDER BY window_start_s
    """))

  // ---------------------------------------------------------------------
  // w15 — SCD-2 dim history: the K3 upsert's history-keeping variant.
  // Where w10 keeps only the latest record per key (SCD-1), this builds
  // the full validity-interval table from the change stream: each change
  // opens an interval that the key's NEXT change closes (lead over one
  // keyed sort — the same single-shuffle shape as w05/w10). -1 marks the
  // open (current) interval, mirroring the reference dim table's
  // "latest row wins" read path.
  val w15 = Q(
    "w15_scd2_intervals",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev(s, dir)
        .withColumn("next_ts", lead($"ts", 1).over(w))
        .select($"user_id", $"event_id", $"event_type".as("state"),
          Q.epochS(unix_micros($"ts")).as("valid_from_s"),
          coalesce(Q.epochS(unix_micros($"next_ts")), lit(-1L))
            .as("valid_to_s"),
          $"next_ts".isNull.as("is_current"))
    },
    Some("""
      SELECT user_id, event_id, event_type AS state,
        epoch_us(ts) // 1000000 AS valid_from_s,
        COALESCE(epoch_us(next_ts) // 1000000, -1) AS valid_to_s,
        next_ts IS NULL AS is_current
      FROM (SELECT *, LEAD(ts) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
            FROM events)
    """))

  // ---------------------------------------------------------------------
  // w16 — per-window heavy hitters: the "trending now" DWS rollup the
  // reference's absent summary layer would serve, composed from the
  // tumbling window (w13's shape) and the native SpaceSavingTopK
  // aggregate. Capacity 64 ≥ the distinct event-type count, so the
  // sketch is in its provably-exact regime and the plain-SQL oracle
  // stays valid (the approximate regime is pinned separately by
  // SpaceSavingSpec). One keyed shuffle at (window) grain; the sketch
  // merges associatively across partial aggregates, so map-side
  // combine ships one 64-entry summary per window per task — at
  // 100 TB this never materializes the per-(window, type) count table
  // a row_number top-n would shuffle.
  val w16 = Q(
    "w16_windowed_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.GraftPlanBridge
      val hh = GraftPlanBridge.col(
        graft.functions.SpaceSavingTopK(
          GraftPlanBridge.expr(array($"event_type")), 64)
          .toAggregateExpression())
      ev(s, dir)
        .groupBy(window($"ts", "6 hours").as("w"))
        .agg(count(lit(1)).as("n"), hh.as("hh"))
        .select($"w.start".cast("long").as("window_start_s"), $"n",
          concat_ws(",",
            transform(slice($"hh", 1, 3), h => h.getField("term")))
            .as("top_types"))
    },
    Some("""
      WITH w AS (
        SELECT (epoch_us(ts) // (21600::BIGINT * 1000000)) * 21600
                 AS window_start_s,
               event_type
        FROM events),
      tc AS (
        SELECT window_start_s, event_type, COUNT(*) AS cnt
        FROM w GROUP BY 1, 2),
      tr AS (
        SELECT window_start_s, event_type, row_number() OVER (
          PARTITION BY window_start_s ORDER BY cnt DESC, event_type) AS rk
        FROM tc),
      top AS (
        SELECT window_start_s,
               string_agg(event_type, ',' ORDER BY rk) AS top_types
        FROM tr WHERE rk <= 3 GROUP BY 1),
      n AS (SELECT window_start_s, COUNT(*) AS n FROM w GROUP BY 1)
      SELECT n.window_start_s, n.n, top.top_types
      FROM n JOIN top ON n.window_start_s = top.window_start_s
    """))

  // ---------------------------------------------------------------------
  // w17 — S2's true incremental half: snapshot-then-changelog CDC apply
  // (the reference's StartupOptions.initial(), app/dim/DimApp.java:
  // 74-86) through [[graft.streaming.IncrementalCdc]]. The query
  // EXECUTES the real machinery, not a window-function rephrasing:
  // bootstrap a dim store from the pre-cutoff snapshot, publish the
  // post-cutoff changelog as parquet, replay it in three
  // cursor-bounded applies — each reads only records past the
  // persisted cursor (a plain version predicate, so the parquet scan
  // zone-map-skips already-applied history; steady-state cost is
  // O(new records), not O(history)) — then return the final store
  // state. The oracle is the full-re-read LWW over ALL events, so a
  // green row IS the S2 proof obligation: snapshot + incremental tail
  // == full recompute. (user_id, ts) is unique in the fixture at every
  // SF, so version = epoch micros is a total per-key order and the
  // LWW winner is deterministic in both engines.
  val w17 = Q(
    "w17_cdc_incremental_apply",
    (s, dir) => {
      import s.implicits._
      import graft.streaming.IncrementalCdc
      def micros(d: String): Long =
        java.time.Instant.parse(d).toEpochMilli * 1000L
      val c0 = micros("2024-01-15T00:00:00Z")
      val versioned = ev(s, dir).select($"user_id", $"event_type",
        round($"value" * 100).cast("long").as("value_cents"),
        unix_micros($"ts").as("version"))
      val work = java.nio.file.Files.createTempDirectory("w17_cdc_")
      try {
        val store = s"$work/dim_user_latest"
        val chlog = s"$work/changelog"
        // fan-out sized to the dim (~150 users): bucket count is a
        // per-table property, and a small hot dim wants few buckets —
        // 64 dirs of near-empty files would quintuple the fs ops per
        // apply for zero pruning benefit
        IncrementalCdc.bootstrap(s, versioned.filter($"version" <= c0),
          store, "user_id", "version", nBuckets = 8)
        versioned.filter($"version" > c0).write.parquet(chlog)
        val tail = s.read.parquet(chlog)
        Seq(Some(micros("2024-01-20T00:00:00Z")),
            Some(micros("2024-01-25T00:00:00Z")), None)
          .foreach(up => IncrementalCdc.applyOnce(s, tail, store,
            "user_id", "version", up, nBuckets = 8))
        localized(s, IncrementalCdc.read(s, store)
          .select($"user_id", $"event_type".as("last_event_type"),
            $"value_cents".as("last_value_cents"),
            $"version".as("last_version")))
      } finally deleteTree(work)
    },
    Some("""
      SELECT user_id, event_type AS last_event_type,
        CAST(round(value * 100) AS BIGINT) AS last_value_cents,
        epoch_us(ts) AS last_version
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts) DESC) AS rn
            FROM events)
      WHERE rn = 1
    """))

  // ---------------------------------------------------------------------
  // w18 — K3's scale probe: a micro-batch MERGE into a fact-sized dim
  // store, priced on the bench. The base store (every lineitem keyed
  // by pk = l_orderkey·8 + l_linenumber, 256-way pk-hash buckets) is
  // STAGED once per dataset; each invocation hardlink-clones it
  // (O(file count), zero data bytes) and merges a FIXED-SIZE
  // micro-batch — the ~95 pk-collapsed line items of orderkeys ≤ 32,
  // version 2, quantity +100 — through DimStore's bucket-pruned
  // MERGE. ~95 pks hash into ≤95 of 256 buckets, so the merge reads
  // and rewrites about a third of the buckets worst-case and the
  // timed number proves
  // the O(touched-buckets) claim: as the table scales 100×, the
  // batch and its touched-bucket count do not. The result is the
  // merged store's full aggregate, so the oracle (plain LWW in SQL)
  // also certifies that no untouched row was lost or double-applied.
  val w18 = Q(
    "w18_dim_merge_probe",
    (s, dir) => {
      import s.implicits._
      import graft.ops.{DimStore, Staging}
      // the fixture's (orderkey, linenumber) is NOT unique (synthetic
      // duplicates), so collapse to pk grain with a deterministic
      // winner (max qty) FIRST — an upsert batch carrying true pk
      // duplicates would otherwise pick its survivor by the LWW
      // content tie-break, which no plain-SQL oracle can mirror
      def collapsed(v: Long) = Tables.load(s, dir, "lineitem")
        .select(($"l_orderkey" * 8 + $"l_linenumber").cast("long").as("pk"),
          $"l_quantity".cast("long").as("qty"))
        .groupBy($"pk").agg(max($"qty").as("qty"))
        .withColumn("version", lit(v))
      val staged = Staging.ensurePath("w18_dim_base", dir, Seq("lineitem")) {
        p =>
          DimStore.upsert(s, p.toString, collapsed(1L),
            "pk", "version", nBuckets = 256)
          // the initial 32-task write leaves up to 32 fragments per
          // bucket; compacting the published base to one file per
          // bucket makes every later clone+scan O(buckets) file ops,
          // the layout a real staged table would ship
          DimStore.compact(s, p.toString)
          ()
      }
      val work = java.nio.file.Files.createTempDirectory("w18_probe_")
      try {
        val store = work.resolve("dim").toString
        Staging.linkClone(staged, work.resolve("dim"))
        // orderkeys ≤ 32 ⟺ pk ≤ 263 (linenumber ∈ 1..7): ~95 pks
        val batch = collapsed(2L).filter($"pk" <= 263L)
          .withColumn("qty", $"qty" + 100L)
        DimStore.upsert(s, store, batch, "pk", "version")
        localized(s, DimStore.read(s, store)
          .agg(count(lit(1)).as("n_rows"), sum($"qty").as("sum_qty"),
            sum(when($"version" === 2L, 1L).otherwise(0L)).as("n_updated")))
      } finally deleteTree(work)
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey * 8 + l_linenumber AS pk,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem),
      agg AS (SELECT pk, MAX(qty) AS qty FROM li GROUP BY pk)
      SELECT COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN pk <= 263 THEN qty + 100 ELSE qty END)
             AS BIGINT) AS sum_qty,
        CAST(SUM(CASE WHEN pk <= 263 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_updated
      FROM agg
    """))

  // ---------------------------------------------------------------------
  // w19 — the Delta/Iceberg-style commit protocol end-to-end: versioned
  // snapshots, snapshot-isolated reads, time travel ACROSS a compaction
  // commit. The reference's Phoenix/HBase sink gets row versioning from
  // HBase cell timestamps for free (app/func/DimSinkFunction.java:13-33);
  // DimStore's `_commits/` manifest log is the Spark-native analogue.
  // The query EXECUTES the machinery: three upsert commits split at two
  // time cutoffs build a per-user latest-event dim (v1, v2, v4) with a
  // compaction commit (v3) in between, then diffs the time-traveled
  // v2 snapshot against the current version — every user whose latest
  // event changed after the second cutoff, plus users first seen after
  // it (null v2 columns). The oracle recomputes both snapshots from the
  // raw events with ROW_NUMBER LWW, so a green row certifies (a) each
  // commit captured exactly the LWW state of its prefix, (b) the
  // compaction rewrote bytes but not rows, and (c) the v2 manifest
  // still resolves after later commits rewrote its buckets.
  // (user_id, ts) is unique in the fixture, so both LWWs pick
  // deterministic winners.
  val w19 = Q(
    "w19_time_travel_diff",
    (s, dir) => {
      import s.implicits._
      import graft.ops.DimStore
      def micros(d: String): Long =
        java.time.Instant.parse(d).toEpochMilli * 1000L
      val c0 = micros("2024-01-15T00:00:00Z")
      val c1 = micros("2024-01-25T00:00:00Z")
      val versioned = ev(s, dir).select($"user_id", $"event_type",
        unix_micros($"ts").as("version"))
      val work = java.nio.file.Files.createTempDirectory("w19_tt_")
      try {
        val store = work.resolve("dim_user_latest").toString
        DimStore.upsert(s, store, versioned.filter($"version" <= c0),
          "user_id", "version", nBuckets = 8) // commit v1
        DimStore.upsert(s, store,
          versioned.filter($"version" > c0 && $"version" <= c1),
          "user_id", "version") // commit v2 — the snapshot under test
        DimStore.compact(s, store) // commit v3: new bytes, same rows
        DimStore.upsert(s, store, versioned.filter($"version" > c1),
          "user_id", "version") // commit v4 — current
        val old = DimStore.read(s, store, asOf = 2L)
          .select($"user_id", $"event_type".as("et_v2"),
            $"version".as("ver_v2"))
        val cur = DimStore.read(s, store)
          .select($"user_id", $"event_type".as("et_now"),
            $"version".as("ver_now"))
        localized(s, cur.join(old, Seq("user_id"), "left")
          .filter($"ver_v2".isNull || $"ver_v2" =!= $"ver_now")
          .select($"user_id", $"et_v2", $"ver_v2", $"et_now", $"ver_now"))
      } finally deleteTree(work)
    },
    Some("""
      WITH v AS (
        SELECT user_id, event_type, epoch_us(ts) AS version FROM events),
      old AS (
        SELECT user_id, event_type AS et_v2, version AS ver_v2
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY version DESC) AS rn
              FROM v
              WHERE version <= epoch_us(TIMESTAMP '2024-01-25 00:00:00'))
        WHERE rn = 1),
      cur AS (
        SELECT user_id, event_type AS et_now, version AS ver_now
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY version DESC) AS rn
              FROM v)
        WHERE rn = 1)
      SELECT cur.user_id, old.et_v2, old.ver_v2, cur.et_now, cur.ver_now
      FROM cur LEFT JOIN old ON cur.user_id = old.user_id
      WHERE old.ver_v2 IS NULL OR old.ver_v2 <> cur.ver_now
    """))

  // ---------------------------------------------------------------------
  // w20 — bucket fan-out EVOLUTION end-to-end: the same commit-protocol
  // machinery as w19, but the mid-history maintenance commit is a
  // REBUCKET (8 → 32 hash buckets) instead of a compaction. At 100 TB
  // this is the operation that keeps upsert write amplification
  // bounded after a dim outgrows its creation fan-out
  // (ops/DimStore.rebucket; amplification is O(table/buckets) per
  // touched bucket). The query builds the per-user latest-event dim in
  // commits v1/v2, re-buckets as commit v3, applies the remaining tail
  // at the NEW fan-out as v4, then diffs the time-traveled v2 snapshot
  // against the current version. A green row certifies (a) the rebucket
  // rewrote layout but not rows (current LWW still exact), (b) upserts
  // after the boundary merge correctly under the new bucket assignment,
  // and (c) the v2 manifest — recorded at the OLD fan-out — still
  // resolves after the table's fan-out changed (the `n=` property is
  // per-manifest, so history needs no migration).
  val w20 = Q(
    "w20_rebucket_diff",
    (s, dir) => {
      import s.implicits._
      import graft.ops.DimStore
      def micros(d: String): Long =
        java.time.Instant.parse(d).toEpochMilli * 1000L
      val c0 = micros("2024-01-15T00:00:00Z")
      val c1 = micros("2024-01-25T00:00:00Z")
      val versioned = ev(s, dir).select($"user_id", $"event_type",
        unix_micros($"ts").as("version"))
      val work = java.nio.file.Files.createTempDirectory("w20_rb_")
      try {
        val store = work.resolve("dim_user_latest").toString
        DimStore.upsert(s, store, versioned.filter($"version" <= c0),
          "user_id", "version", nBuckets = 8) // commit v1 (8 buckets)
        DimStore.upsert(s, store,
          versioned.filter($"version" > c0 && $"version" <= c1),
          "user_id", "version") // commit v2 — the snapshot under test
        DimStore.rebucket(s, store, "user_id", 32) // commit v3: 8 → 32
        DimStore.upsert(s, store, versioned.filter($"version" > c1),
          "user_id", "version") // commit v4 — merged at the new fan-out
        val old = DimStore.read(s, store, asOf = 2L)
          .select($"user_id", $"event_type".as("et_v2"),
            $"version".as("ver_v2"))
        val cur = DimStore.read(s, store)
          .select($"user_id", $"event_type".as("et_now"),
            $"version".as("ver_now"))
        localized(s, cur.join(old, Seq("user_id"), "left")
          .filter($"ver_v2".isNull || $"ver_v2" =!= $"ver_now")
          .select($"user_id", $"et_v2", $"ver_v2", $"et_now", $"ver_now"))
      } finally deleteTree(work)
    },
    Some("""
      WITH v AS (
        SELECT user_id, event_type, epoch_us(ts) AS version FROM events),
      old AS (
        SELECT user_id, event_type AS et_v2, version AS ver_v2
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY version DESC) AS rn
              FROM v
              WHERE version <= epoch_us(TIMESTAMP '2024-01-25 00:00:00'))
        WHERE rn = 1),
      cur AS (
        SELECT user_id, event_type AS et_now, version AS ver_now
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY version DESC) AS rn
              FROM v)
        WHERE rn = 1)
      SELECT cur.user_id, old.et_v2, old.ver_v2, cur.et_now, cur.ver_now
      FROM cur LEFT JOIN old ON cur.user_id = old.user_id
      WHERE old.ver_v2 IS NULL OR old.ver_v2 <> cur.ver_now
    """))

  // ---------------------------------------------------------------------
  // w21 — targeted row DELETION as a commit: the retention/GDPR pass a
  // dim store needs (the reference's HBase sink gets `delete` from the
  // storage engine; DimStore.deleteWhere is the Spark-native analogue —
  // a bucket-scoped commit touching only the buckets that hold a
  // matching row). The query builds the per-user latest-event dim in
  // commits v1/v2, PURGES every user whose latest event predates the
  // retention cutoff as commit v3 (deleteWhere — the x94 purge's table
  // primitive, here graded on the warehouse grain), then applies the
  // remaining event tail as v4, and FULL-OUTER diffs the time-traveled
  // v2 snapshot against the current version. A green row certifies
  // (a) the delete removed exactly the predicate's rows and nothing
  // else, (b) upserts merge correctly on the shrunken manifest —
  // including REVIVING a purged user whose events resume after the
  // cutoff (the LWW re-ingest contract), (c) the v2 manifest still
  // resolves across the delete commit (history is append-only; the
  // deleted rows stay time-travelable until vacuum). Purged-for-good
  // users surface with null current columns, revived/updated users
  // with both sides, post-cutoff newcomers with null v2 columns —
  // nothing about the deletion is silent.
  val w21 = Q(
    "w21_delete_where_diff",
    (s, dir) => {
      import s.implicits._
      import graft.ops.DimStore
      def micros(d: String): Long =
        java.time.Instant.parse(d).toEpochMilli * 1000L
      val c0 = micros("2024-01-15T00:00:00Z")
      val c1 = micros("2024-01-25T00:00:00Z")
      val cRet = micros("2024-01-20T00:00:00Z") // retention cutoff
      val versioned = ev(s, dir).select($"user_id", $"event_type",
        unix_micros($"ts").as("version"))
      val work = java.nio.file.Files.createTempDirectory("w21_dw_")
      try {
        val store = work.resolve("dim_user_latest").toString
        DimStore.upsert(s, store, versioned.filter($"version" <= c0),
          "user_id", "version", nBuckets = 8) // commit v1
        DimStore.upsert(s, store,
          versioned.filter($"version" > c0 && $"version" <= c1),
          "user_id", "version") // commit v2 — the snapshot under test
        DimStore.deleteWhere(s, store, "user_id",
          org.apache.spark.sql.functions.col("version") < cRet) // v3
        DimStore.upsert(s, store, versioned.filter($"version" > c1),
          "user_id", "version") // commit v4 — revives returning users
        val old = DimStore.read(s, store, asOf = 2L)
          .select($"user_id", $"event_type".as("et_v2"),
            $"version".as("ver_v2"))
        val cur = DimStore.read(s, store)
          .select($"user_id", $"event_type".as("et_now"),
            $"version".as("ver_now"))
        localized(s, cur.join(old, Seq("user_id"), "full_outer")
          .filter($"ver_v2".isNull || $"ver_now".isNull ||
            $"ver_v2" =!= $"ver_now")
          .select($"user_id", $"et_v2", $"ver_v2", $"et_now", $"ver_now"))
      } finally deleteTree(work)
    },
    Some("""
      WITH v AS (
        SELECT user_id, event_type, epoch_us(ts) AS version FROM events),
      old AS (
        SELECT user_id, event_type AS et_v2, version AS ver_v2
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY version DESC) AS rn
              FROM v
              WHERE version <= epoch_us(TIMESTAMP '2024-01-25 00:00:00'))
        WHERE rn = 1),
      surv AS (
        SELECT * FROM old
        WHERE ver_v2 >= epoch_us(TIMESTAMP '2024-01-20 00:00:00')),
      cur AS (
        SELECT user_id, event_type AS et_now, version AS ver_now
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY version DESC) AS rn
              FROM (SELECT user_id, event_type, version FROM v
                    WHERE version > epoch_us(TIMESTAMP '2024-01-25 00:00:00')
                    UNION ALL
                    SELECT user_id, et_v2 AS event_type, ver_v2 AS version
                    FROM surv))
        WHERE rn = 1)
      SELECT COALESCE(cur.user_id, old.user_id) AS user_id,
        old.et_v2, old.ver_v2, cur.et_now, cur.ver_now
      FROM cur FULL OUTER JOIN old ON cur.user_id = old.user_id
      WHERE old.ver_v2 IS NULL OR cur.ver_now IS NULL
         OR old.ver_v2 <> cur.ver_now
    """))

  def queries: Seq[Q] = Seq(
    w01, w02, w03, w04, w05, w06, w07, w08, w09, w10, w11, w12, w13, w14,
    w15, w16, w17, w18, w19, w20, w21)
}
