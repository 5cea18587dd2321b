"""Temporal operators over `events`: as-of join, sessionization, JSON
extraction, exact quantiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import catalog
from ..operators.asof import asof_join_backward
from ..operators.timebucket import bucket_sql
from ..operators.sessions import session_stats, sessionize
from ..session import prep
from . import query

SESSION_GAP_S = 3600


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return catalog.load(spark, sf_dir, "events")


@query(
    "asof_last_signup",
    oracle="""
    SELECT e.event_id, e.user_id,
           s.event_id AS asof_event_id,
           CASE WHEN s.event_id IS NULL THEN NULL
                ELSE (epoch_us(e.ts) - epoch_us(s.ts)) // 1000000
           END AS secs_since_signup
    FROM events e
    ASOF LEFT JOIN (
        SELECT user_id, ts, event_id FROM (
            SELECT user_id, ts, event_id, row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC
            ) AS rn
            FROM events WHERE event_type = 'signup'
        ) WHERE rn = 1
    ) s ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every event paired with the user's most recent
    signup at or before it (union+window idiom; DuckDB oracle uses its
    native ASOF JOIN — a genuine cross-engine semantics check)."""
    from ..operators.winners import top1_per_key

    e = _events(spark, sf_dir)
    left = e.select("event_id", "user_id", "ts")
    # Dedupe the right side to unique (user, ts): SQL ASOF JOIN's pick among
    # exact-timestamp duplicates is engine-defined, so the differential gate
    # needs a canonical right row (max event_id) before the join.
    right = top1_per_key(
        e.where(F.col("event_type") == "signup").select(
            "user_id", "ts", F.col("event_id").alias("sig_event_id")
        ),
        ["user_id", "ts"],
        [F.desc("sig_event_id")],
    )
    joined = asof_join_backward(
        left.withColumnRenamed("event_id", "l_event_id"),
        right.withColumn("sig_ts_us", F.unix_micros("ts")),
        key_cols=["user_id"],
        ts_col="ts",
        payload_cols=["sig_event_id", "sig_ts_us"],
    )
    return joined.select(
        F.col("l_event_id").alias("event_id"),
        "user_id",
        F.col("asof_sig_event_id").alias("asof_event_id"),
        F.expr("(unix_micros(ts) - asof_sig_ts_us) div 1000000").alias(
            "secs_since_signup"
        ),
    )


_SESSION_CTE = f"""
ordered AS (
    SELECT user_id, event_id, ts,
           lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_us
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prev_us IS NULL
                     OR (epoch_us(ts) - prev_us) > {SESSION_GAP_S * 1_000_000}
                THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sessions AS (
    SELECT user_id, event_id, ts,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS session_id
    FROM flagged
)
"""


@query(
    "user_sessions",
    oracle=f"""
    WITH {_SESSION_CTE.strip()}
    SELECT user_id, session_id, count(*) AS n_events,
           (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS duration_secs
    FROM sessions GROUP BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1 h gap): lag + running-sum construction,
    per-session counts and exact integer durations."""
    e = _events(spark, sf_dir)
    s = sessionize(e, "user_id", "ts", "event_id", gap_seconds=SESSION_GAP_S)
    return session_stats(s, "user_id", "ts")


@query(
    "props_json_stats",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round((sum(CAST(json_extract(props, '$.k') AS BIGINT)) * 1.0)
                 / count(*), 6) AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (§2.8 JSON family: the reference round-trips
    GeoJSON strings): get_json_object -> typed aggregation, exact integer
    sums."""
    e = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.round((F.sum(k) * 1.0) / F.count(F.lit(1)), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# BPE-ish pre-tokenizer pattern (the GPT-2 shape reduced to character
# classes so the same text parses identically under Java regex and RE2):
# letter runs | digit runs | non-alphanumeric-non-space runs.
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@query(
    "props_bpe_tokens",
    oracle=f"""
    WITH t AS (
        SELECT event_type,
               regexp_extract_all(props, '{_BPE_PAT}') AS toks,
               regexp_extract(props, '[0-9]+') AS num_tok
        FROM events
    )
    SELECT event_type,
           count(*) AS n_rows,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
           CAST(sum(len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]'))))
               AS BIGINT) AS n_word,
           CAST(sum(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]'))))
               AS BIGINT) AS n_num,
           CAST(sum(len(list_filter(toks, x -> NOT regexp_matches(x, '^[A-Za-z0-9]'))))
               AS BIGINT) AS n_punct,
           CAST(sum(length(num_tok)) AS BIGINT) AS digit_width
    FROM t GROUP BY event_type
    """,
)
def props_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex pre-tokenization (the training-pipeline token-counting kernel:
    whitespace split is `doc_token_stats`; this is the BPE-ish class-run
    pattern) over the punctuation-rich JSON props column — all JVM-side
    regexp_extract_all/filter, no Python in the path."""
    e = _events(spark, sf_dir)
    t = e.select(
        "event_type",
        F.expr(f"regexp_extract_all(props, '{_BPE_PAT}', 0)").alias("toks"),
        F.expr("regexp_extract(props, '[0-9]+', 0)").alias("num_tok"),
    )
    n_of = lambda cond: F.sum(F.size(F.expr(f"filter(toks, x -> {cond})")))  # noqa: E731
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.size("toks")).alias("n_tokens"),
        n_of("x rlike '^[A-Za-z]'").alias("n_word"),
        n_of("x rlike '^[0-9]'").alias("n_num"),
        n_of("NOT (x rlike '^[A-Za-z0-9]')").alias("n_punct"),
        F.sum(F.length("num_tok")).alias("digit_width"),
    )


@query(
    "value_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles (linear interpolation — Spark `percentile`
    and DuckDB `quantile_cont` share the definition). The approximate
    variant for 100 TB is percentile_approx; exact is kept here for the
    differential gate."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@query(
    "running_value_totals",
    oracle="""
    SELECT event_id, user_id,
           sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING
           ) / 100.0 AS running_value
    FROM events
    """,
)
def running_value_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame (ROWS UNBOUNDED PRECEDING running sum) — the
    reference only ever uses default frames (SURVEY §2.5); engine surface.
    Cent-quantized accumulation keeps every prefix sum bit-exact."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vc = F.round(F.col("value") * 100).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        (F.sum(vc).over(w) / 100.0).alias("running_value"),
    )


@query(
    "inter_event_gaps",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS gap_us
        FROM events
    )
    SELECT user_id,
           count(gap_us) AS n_gaps,
           CAST(sum(gap_us) // 1000000 AS BIGINT) AS total_gap_secs,
           round((sum(gap_us) / 1000000.0) / count(gap_us), 6) AS avg_gap_secs
    FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    """,
)
def inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-arrival analysis: per-device gap count and mean, exact
    integer microsecond arithmetic end to end."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    g = e.select("user_id", gap.alias("gap_us")).where(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.expr("sum(gap_us) div 1000000").alias("total_gap_secs"),
        F.round((F.sum("gap_us") / 1000000.0) / F.count("gap_us"), 6).alias(
            "avg_gap_secs"
        ),
    )


@query(
    "interval_join_events",
    oracle="""
    SELECT p.event_id, s.sig_event_id
    FROM events p
    JOIN (
        SELECT user_id, ts AS start_ts,
               ts + INTERVAL 48 HOUR AS end_ts,
               event_id AS sig_event_id
        FROM events WHERE event_type = 'signup'
    ) s
    ON p.user_id = s.user_id
       AND p.ts >= s.start_ts AND p.ts < s.end_ts
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-containment join at scale: every event matched to each of the
    user's 48-hour post-signup windows via the bucketed interval join
    (operators/rangejoin.py — hash join on (user, time-bucket), never a
    BroadcastNestedLoop). The DuckDB oracle is the bare theta join, so the
    differential proves the bucketed decomposition IS the containment
    semantics."""
    from ..operators.rangejoin import interval_join

    e = _events(spark, sf_dir)
    points = e.select("user_id", "ts", "event_id")
    intervals = (
        e.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 48 HOURS")).alias("end_ts"),
            F.col("event_id").alias("sig_event_id"),
        )
    )
    out = interval_join(
        points, intervals,
        ts_col="ts", start_col="start_ts", end_col="end_ts",
        keys=["user_id"], bucket_seconds=48 * 3600,
    )
    return out.select("event_id", "sig_event_id")


_ERR_DEDUP_CTE = """
    err AS (
        SELECT user_id, ts, event_id FROM (
            SELECT user_id, ts, event_id, row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC
            ) AS rn
            FROM events WHERE event_type = 'error'
        ) WHERE rn = 1
    )
"""


def _err_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-(user, ts) canonical 'error' rows (max event_id), mirroring
    _ERR_DEDUP_CTE — SQL ASOF JOIN's pick among exact-ts duplicates is
    engine-defined, so the differential needs a canonical right side."""
    from ..operators.winners import top1_per_key

    e = _events(spark, sf_dir)
    return top1_per_key(
        e.where(F.col("event_type") == "error").select(
            "user_id", "ts", F.col("event_id").alias("err_event_id")
        ),
        ["user_id", "ts"],
        [F.desc("err_event_id")],
    )


@query(
    "asof_next_error",
    oracle=f"""
    WITH {_ERR_DEDUP_CTE}
    SELECT e.event_id, e.user_id,
           r.event_id AS next_error_id,
           CASE WHEN r.event_id IS NULL THEN NULL
                ELSE (epoch_us(r.ts) - epoch_us(e.ts)) // 1000000
           END AS secs_until_error
    FROM events e
    ASOF LEFT JOIN err r ON e.user_id = r.user_id AND e.ts <= r.ts
    """,
)
def asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: every event paired with the user's next 'error'
    event at or after it (DuckDB's forward ASOF JOIN as the oracle — a
    native cross-engine semantics check for the reversed-scan kernel)."""
    from ..operators.asof import asof_join_forward

    e = _events(spark, sf_dir)
    left = e.select(F.col("event_id").alias("l_event_id"), "user_id", "ts")
    right = _err_right(spark, sf_dir).withColumn("err_ts_us", F.unix_micros("ts"))
    joined = asof_join_forward(
        left, right,
        key_cols=["user_id"], ts_col="ts",
        payload_cols=["err_event_id", "err_ts_us"],
    )
    return joined.select(
        F.col("l_event_id").alias("event_id"),
        "user_id",
        F.col("asof_err_event_id").alias("next_error_id"),
        F.expr("(asof_err_ts_us - unix_micros(ts)) div 1000000").alias(
            "secs_until_error"
        ),
    )


@query(
    "asof_nearest_error",
    oracle=f"""
    WITH {_ERR_DEDUP_CTE}
    SELECT e.event_id, e.user_id,
           CASE WHEN b.event_id IS NULL THEN f.event_id
                WHEN f.event_id IS NULL THEN b.event_id
                WHEN (epoch_us(f.ts) - epoch_us(e.ts))
                     < (epoch_us(e.ts) - epoch_us(b.ts)) THEN f.event_id
                ELSE b.event_id
           END AS nearest_error_id
    FROM events e
    ASOF LEFT JOIN err b ON e.user_id = b.user_id AND e.ts >= b.ts
    ASOF LEFT JOIN err f ON e.user_id = f.user_id AND e.ts <= f.ts
    """,
)
def asof_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (|Δts| minimizer, ties backward — the pandas
    merge_asof 'nearest' contract). Oracle: both DuckDB ASOF directions +
    the same closer-of-two CASE, so the tie rule is checked cross-engine."""
    from ..operators.asof import asof_join_nearest

    e = _events(spark, sf_dir)
    left = e.select(F.col("event_id").alias("l_event_id"), "user_id", "ts")
    joined = asof_join_nearest(
        left, _err_right(spark, sf_dir),
        key_cols=["user_id"], ts_col="ts",
        payload_cols=["err_event_id"],
    )
    return joined.select(
        F.col("l_event_id").alias("event_id"),
        "user_id",
        F.col("asof_err_event_id").alias("nearest_error_id"),
    )


@query(
    "overlap_windows_events",
    oracle="""
    SELECT s.sig_event_id, r.err_event_id
    FROM (
        SELECT user_id, ts AS s_start, ts + INTERVAL 48 HOUR AS s_end,
               event_id AS sig_event_id
        FROM events WHERE event_type = 'signup'
    ) s
    JOIN (
        SELECT user_id AS r_user_id, ts AS r_start,
               ts + INTERVAL 24 HOUR AS r_end, event_id AS err_event_id
        FROM events WHERE event_type = 'error'
    ) r
    ON s.user_id = r.r_user_id
       AND s.s_start < r.r_end AND r.r_start < s.s_end
    """,
)
def overlap_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join at scale: each user's 48-hour
    post-signup window matched to their overlapping 24-hour post-error
    windows via the bucketed overlap decomposition (exactly-once at the
    max-start bucket, no dedup). Oracle: the bare theta join."""
    from ..operators.rangejoin import interval_overlap_join

    e = _events(spark, sf_dir)
    sig = e.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("s_start"),
        (F.col("ts") + F.expr("INTERVAL 48 HOURS")).alias("s_end"),
        F.col("event_id").alias("sig_event_id"),
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_start"),
        (F.col("ts") + F.expr("INTERVAL 24 HOURS")).alias("r_end"),
        F.col("event_id").alias("err_event_id"),
    )
    out = interval_overlap_join(
        sig, err.withColumnRenamed("r_user_id", "user_id"),
        l_start="s_start", l_end="s_end",
        r_start="r_start", r_end="r_end",
        keys=["user_id"], bucket_seconds=24 * 3600,
    )
    return out.select("sig_event_id", "err_event_id")


@query(
    "events_quality_report",
    oracle="""
    SELECT 'not_null' AS rule, 'user_id' AS target,
           count(*) FILTER (WHERE user_id IS NULL) AS n_violations
    FROM events
    UNION ALL
    SELECT 'unique', 'event_id', count(*) - count(DISTINCT event_id)
    FROM events
    UNION ALL
    SELECT 'unique', 'user_id,ts', count(*) - count(DISTINCT (user_id, ts))
    FROM events
    UNION ALL
    SELECT 'in_range', 'value',
           count(*) FILTER (WHERE value IS NOT NULL
                            AND (value < 0 OR value > 250))
    FROM events
    UNION ALL
    SELECT 'in_set', 'event_type',
           count(*) FILTER (WHERE event_type IS NOT NULL AND event_type
                            NOT IN ('click', 'view', 'purchase'))
    FROM events
    UNION ALL
    SELECT 'matches', 'props',
           count(*) FILTER (WHERE props IS NOT NULL
                            AND NOT regexp_matches(props, '^\\{'))
    FROM events
    """,
)
def events_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report over events (the reference's inline
    asserts generalized, SURVEY.md §5) — all rules in one aggregation pass;
    mix of passing and violated rules so the counts are non-degenerate."""
    from ..operators.quality import (
        check_rules, in_range, in_set, matches, not_null, unique,
    )

    e = _events(spark, sf_dir)
    return check_rules(
        e,
        [
            not_null("user_id"),
            unique("event_id"),
            unique("user_id", "ts"),
            in_range("value", 0, 250),
            in_set("event_type", ("click", "view", "purchase")),
            matches("props", "^\\{"),
        ],
    )


@query(
    "session_window_counts",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC
               ) AS prev_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN prev_us IS NULL
                         OR (epoch_us(ts) - prev_us) > {SESSION_GAP_S * 1_000_000}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts)) + {SESSION_GAP_S * 1_000_000} AS end_us,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (the engine-internal
    merging-session state machine) checked against a from-first-principles
    lag/cumsum oracle. Boundary semantics: sessions MERGE when the next
    event is at or before last_ts + gap (closed boundary — probed
    empirically, pinned in tests/test_session_window.py), so the oracle's
    new-session rule is strictly `> gap`, identical to the hand-built
    sessionize."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_events",
        )
    )


@query(
    "hopping_window_counts",
    oracle="""
    SELECT window_start_us, event_type, count(*) AS n_events FROM (
        SELECT unnest([
                   (epoch_us(ts) // 300000000) * 300000000 - 300000000,
                   (epoch_us(ts) // 300000000) * 300000000
               ]) AS window_start_us,
               epoch_us(ts) AS us, event_type
        FROM events
    )
    WHERE us >= window_start_us AND us < window_start_us + 600000000
    GROUP BY window_start_us, event_type
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 10-minute windows every 5 minutes —
    Spark's native overlapping `window(ts, '600 seconds', '300 seconds')`
    (each event lands in exactly 2 windows, epoch-anchored) against an
    explicit unnest-the-candidate-starts oracle."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "600 seconds", "300 seconds").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
        )
    )


@query(
    "hourly_rollup_cascade",
    oracle="""
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_start_us,
           event_type, count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def hourly_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup with partial reuse: hourly counts computed
    by RE-AGGREGATING epoch-anchored 10-minute window partials (the
    continuous-aggregate / materialized-rollup pattern — at 100 TB the
    10-minute table is materialized once and every coarser granularity
    sums it instead of rescanning the facts). Exact because 600 s divides
    3600 s and both grids are epoch-anchored; the origin-anchored tw
    buckets (W5) canNOT nest this way — their grid is shifted by a
    data-dependent origin, so a tw bucket can straddle an hour boundary.
    Oracle: the direct hourly aggregation over the raw events."""
    e = _events(spark, sf_dir)
    tenmin = e.groupBy(
        F.window("ts", "600 seconds").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        tenmin.select(
            F.expr(
                "(unix_micros(w.start) div 3600000000) * 3600000000"
            ).alias("hour_start_us"),
            "event_type",
            "n",
        )
        .groupBy("hour_start_us", "event_type")
        .agg(F.sum("n").alias("n_events"))
    )


@query(
    "moving_value_avg",
    oracle="""
    SELECT event_id, user_id, mv_n,
           CASE WHEN mv_n > 0
                THEN round(mv_sum_c / (100.0 * mv_n), 6) END AS mv_avg
    FROM (
        SELECT event_id, user_id,
               sum(CAST(round(value * 100) AS BIGINT)) OVER w AS mv_sum_c,
               count(value) OVER w AS mv_n
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    """,
)
def moving_value_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    moving average — the frame variant running_value_totals doesn't cover.
    Cent-quantized sum + explicit non-null count so the average is exact
    on both engines; NULL-value rows contribute nothing (count(value)
    skips NULLs identically in Spark and SQL)."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-3, Window.currentRow)
    )
    vc = F.round(F.col("value") * 100).cast("bigint")
    mv_sum = F.sum(vc).over(w)
    mv_n = F.count("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        mv_n.alias("mv_n"),
        F.when(mv_n > 0, F.round(mv_sum / (100.0 * mv_n), 6)).alias("mv_avg"),
    )


@query(
    "value_deciles_by_type",
    oracle="""
    SELECT event_id, event_type,
           ntile(10) OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id DESC
           ) AS decile
    FROM events WHERE value IS NOT NULL
    """,
)
def value_deciles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-height decile assignment per event type (ntile) — the
    bucketing window the quantile queries don't exercise. Partitioned by
    the type key so the sort is per-group (never a global single-partition
    window); the unique (value, event_id) order makes bucket boundaries
    engine-stable."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.desc("event_id")
    )
    return (
        e.where(F.col("value").isNotNull())
        .select("event_id", "event_type", F.ntile(10).over(w).alias("decile"))
    )


ROLLUP_CUTOVER = "2024-01-21"  # ~2/3 history downsampled, ~1/3 raw


@query(
    "tiered_retention_events",
    oracle=f"""
    SELECT 'rollup' AS tier,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           event_type,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum
    FROM events WHERE ts < TIMESTAMP '{ROLLUP_CUTOVER}'
    GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'raw' AS tier,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS bucket_ts,
           event_type,
           1 AS n_events,
           CAST(round(value * 100) AS BIGINT) / 100.0 AS value_sum
    FROM events WHERE ts >= TIMESTAMP '{ROLLUP_CUTOVER}'
    """,
)
def tiered_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered retention / downsampling policy: history older than the
    cutover collapses to hourly rollups, the recent window stays raw —
    the hypertable retention pattern that keeps a 100 TB time-series
    table queryable (old partitions shrink ~event-rate×3600-fold; both
    tiers carry the same schema so one UNION view serves queries). Each
    side is a partition-prunable scan; the rollup aggregates map-side."""
    e = _events(spark, sf_dir)
    cut = F.lit(ROLLUP_CUTOVER).cast("timestamp")
    vc = F.round(F.col("value") * 100).cast("bigint")
    rollup = (
        e.where(F.col("ts") < cut)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_ts"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(vc) / 100.0).alias("value_sum"),
        )
        .select(
            F.lit("rollup").alias("tier"),
            "bucket_ts",
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    raw = e.where(F.col("ts") >= cut).select(
        F.lit("raw").alias("tier"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("bucket_ts"),
        F.col("event_type"),
        F.lit(1).cast("long").alias("n_events"),
        (vc / 100.0).alias("value_sum"),
    )
    return rollup.unionAll(raw)


@query(
    "value_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           round(last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING), 6) AS value_filled
    FROM events
    """,
)
def value_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill (last observation carried forward): NULL measurements
    take the most recent non-NULL value in event order — the standard
    sensor/time-series imputation. IGNORE NULLS last_value over a running
    frame on both engines; rows before a user's first observation stay
    NULL. Per-user window, so the sort is per-key at any scale."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.last("value", ignorenulls=True).over(w), 6).alias(
            "value_filled"
        ),
    )


@query(
    "value_outliers",
    oracle="""
    WITH m AS (
        SELECT user_id,
               count(value) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS sc,
               sum(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) AS sc2
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round((CAST(round(e.value * 100) AS BIGINT) - sc * 1.0 / n)
                 / sqrt(sc2 * 1.0 / n - (sc * 1.0 / n) * (sc * 1.0 / n)),
                 6) AS z_r
    FROM events e JOIN m ON m.user_id = e.user_id
    WHERE e.value IS NOT NULL AND m.n >= 2
      AND sc2 * n > sc * sc
      AND abs(round((CAST(round(e.value * 100) AS BIGINT) - sc * 1.0 / n)
                 / sqrt(sc2 * 1.0 / n - (sc * 1.0 / n) * (sc * 1.0 / n)),
                 6)) >= 2
    """,
)
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier screen (|z| >= 2) — the anomaly-detection
    staple. Moments accumulate as EXACT integer cents (sums and
    sum-of-squares are exact int64 at any corpus size that fits 10^18
    cents², i.e. far past 100 TB of this schema), so mean/std derive from
    identical integers on both engines and the rounded z crosses the
    threshold identically. Degenerate groups (n<2 or zero variance) are
    excluded on both sides by the same integer predicate; the sc*sc / sc2*n
    products in that predicate are computed in decimal(38,0) so the guard
    itself cannot overflow int64 at group sizes where sc approaches 2^31.5
    (DuckDB promotes the same products to HUGEINT)."""
    e = _events(spark, sf_dir)
    vc = F.round(F.col("value") * 100).cast("bigint")
    m = e.groupBy("user_id").agg(
        F.count("value").alias("n"),
        F.sum(vc).alias("sc"),
        F.sum(vc * vc).alias("sc2"),
    )
    mean = F.col("sc") * 1.0 / F.col("n")
    var = F.col("sc2") * 1.0 / F.col("n") - mean * mean
    z = F.round((vc - mean) / F.sqrt(var), 6)
    return (
        e.join(m, "user_id")
        .where(
            F.col("value").isNotNull()
            & (F.col("n") >= 2)
            & (
                F.col("sc2").cast("decimal(38,0)") * F.col("n")
                > F.col("sc").cast("decimal(38,0)") * F.col("sc")
            )
            & (F.abs(z) >= 2)
        )
        .select("event_id", "user_id", z.alias("z_r"))
    )


@query(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(CAST(round(value * 100) AS BIGINT) / 1000) AS BIGINT)
               AS bin_id,
           count(*) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10-unit bins on the cent grid) per event
    type — the profiling staple. Binning is integer division of exact
    cents, so bin edges cannot drift between engines; one map-side-
    combined aggregation."""
    e = _events(spark, sf_dir)
    vc = F.round(F.col("value") * 100).cast("bigint")
    return (
        e.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(vc / 1000).cast("bigint").alias("bin_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "user_missing_days",
    oracle="""
    WITH span AS (
        SELECT user_id,
               CAST(min(ts) AS DATE) AS d0,
               CAST(max(ts) AS DATE) AS d1
        FROM events GROUP BY user_id
    ),
    cal AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1,
               INTERVAL 1 DAY)) AS DATE) AS day
        FROM span
    ),
    seen AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS missing_day
    FROM cal c ANTI JOIN seen s USING (user_id, day)
    """,
)
def user_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + gap detection: generate each user's full
    activity-span day sequence (F.sequence → explode, a map-side 1→N
    generator — no calendar dimension table needed) and anti-join the
    observed days; the remainder is the silent-day report (the reference's
    trusted-range/missing-day bookkeeping, calendar_utils, as one query).
    Output size is gap-bounded; the only exchanges are the span aggregate
    and the anti join on (user, day)."""
    e = _events(spark, sf_dir)
    span = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    seen = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    return (
        cal.join(seen, ["user_id", "day"], "left_anti")
        .select("user_id", F.date_format("day", "yyyy-MM-dd").alias("missing_day"))
    )


@query(
    "trailing_hour_stats",
    oracle="""
    SELECT event_id, user_id, rng_n,
           CASE WHEN rng_n > 0
                THEN round(rng_sum_c / (100.0 * rng_n), 6) END AS rng_avg
    FROM (
        SELECT event_id, user_id,
               sum(CAST(round(value * 100) AS BIGINT)) OVER w AS rng_sum_c,
               count(value) OVER w AS rng_n
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    )
    """,
)
def trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE sliding frame (RANGE BETWEEN 1 HOUR PRECEDING, in exact
    integer microseconds) — the frame family member ROWS-based
    moving_value_avg cannot express: the window is defined by the TIME
    span, not a row count, so bursts widen the frame and quiet periods
    shrink it. Peers at the same timestamp fall in one frame on both
    engines (RANGE includes ties), which keeps the result deterministic
    without an event_id tie-break. Cent-quantized sum + non-null count,
    exact on both sides."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    vc = F.round(F.col("value") * 100).cast("bigint")
    rng_sum = F.sum(vc).over(w)
    rng_n = F.count("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        rng_n.alias("rng_n"),
        F.when(rng_n > 0, F.round(rng_sum / (100.0 * rng_n), 6)).alias(
            "rng_avg"
        ),
    )


@query(
    "user_event_sequences",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS seq
    FROM events GROUP BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event-type sequence (the training-sequence prep
    op: event logs -> one ordered token string per entity). collect_list
    is order-nondeterministic under shuffle, so the total order is
    imposed AFTER collection: array_sort over (ts, event_id, type)
    structs — event_id makes the sort total, so both engines emit the
    identical string. One groupBy shuffle; the sort is per-group and
    JVM-side (no window, no second exchange). Scale note: the sequence is
    per-entity-unbounded by definition (like any collect_list); a 100 TB
    run caps it the way training pipelines do — slice(sorted, 1, max_len)
    before the join — which keeps the same plan shape and bounds group
    memory."""
    e = _events(spark, sf_dir)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), seq.alias("seq")
    )


@query(
    "intersect_day_users",
    oracle="""
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-03'
    INTERSECT
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'
    """,
)
def intersect_day_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — the set-op family member UNION/EXCEPT queries don't
    cover (devices active on BOTH days). Spark plans it as a left-semi
    over distinct inputs; same shape as the reference's day-overlap
    checks."""
    e = _events(spark, sf_dir)
    d1 = e.where(F.to_date("ts") == F.lit("2024-01-03")).select("user_id")
    d2 = e.where(F.to_date("ts") == F.lit("2024-01-10")).select("user_id")
    return d1.intersect(d2)


@query(
    "value_rank_profile",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(event_id) OVER w AS min_event,
           nth_value(event_id, 2) OVER (
               PARTITION BY event_type ORDER BY value ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_event
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
    """,
)
def value_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first_value / nth_value in one pass —
    the analytic rank functions the ntile and row_number queries leave
    uncovered. The (value, event_id) order is total so every rank is
    deterministic; nth_value uses the full frame (its default running
    frame would make the first row NULL on both engines anyway, but the
    explicit frame removes the engine-default dependence)."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("event_id").over(w).alias("min_event"),
        F.nth_value("event_id", 2).over(wf).alias("second_event"),
    )


@query(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event streams
    (the funnel/behaviour-model input): lead() within user ordered by
    (ts, event_id) — the unique id tie-break makes the successor, and so
    the whole matrix, deterministic under same-timestamp events. One
    shuffle on user_id for the window, then the transition groupBy runs
    map-side-combined into at most |types|² rows; user streams are the
    natural partition unit at 100 TB."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firstday AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events
        GROUP BY user_id
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN firstday f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, distinct
    actives counted at each day offset — the standard growth-analytics
    rollup. The first-seen aggregate shuffles on user_id; the join back is
    user-keyed so it reuses that partitioning; the final (cohort, offset)
    distinct-count is the only wide aggregate and its key space is
    days², not data-sized. Dates format to strings so the compare is
    timezone-representation-proof."""
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    return (
        e.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "daily_new_users",
    oracle="""
    WITH firstday AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    active AS (
        SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS n_active
        FROM events GROUP BY day
    ),
    fresh AS (
        SELECT d0 AS day, count(*) AS n_new FROM firstday GROUP BY d0
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day, a.n_active,
           coalesce(f.n_new, 0) AS n_new
    FROM active a LEFT JOIN fresh f USING (day)
    """,
)
def daily_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active vs newly-acquired users — the DAU/new-user split every
    events dashboard opens with. Two shuffles (per-day distinct actives;
    per-user first-day then per-day count), joined on the tiny day key;
    the left join zero-fills days with no first-timers. Day-keyed results
    are calendar-sized, so everything after the fact scans is
    broadcast-cheap at any event volume."""
    e = _events(spark, sf_dir)
    day = F.col("ts").cast("date")
    active = e.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("n_active")
    )
    fresh = (
        e.groupBy("user_id")
        .agg(F.min(day).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    return (
        active.join(F.broadcast(fresh), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )


@query(
    "value_minmax_scaled",
    oracle="""
    WITH mm AS (
        SELECT event_type, min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           round((e.value - m.vmin) / (m.vmax - m.vmin), 6) AS scaled
    FROM events e JOIN mm m USING (event_type)
    WHERE m.vmax > m.vmin
    """,
)
def value_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling (the normalization step feature
    pipelines apply before training): group extrema joined back onto every
    row. min/max are order-insensitive — unlike sums they are bit-exact
    regardless of partitioning, so the scaled value is reproducible
    cross-engine with one rounded division. The extrema table is
    |types|-sized and broadcasts; the fact never shuffles (map-only
    transform after the broadcast attach) — at 100 TB this is a pure
    second scan, not an exchange. Degenerate constant groups are gated
    out identically on both sides."""
    e = _events(spark, sf_dir)
    mm = e.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    return (
        e.join(F.broadcast(mm), "event_type")
        .where(F.col("vmax") > F.col("vmin"))
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin")),
                6,
            ).alias("scaled"),
        )
    )


@query(
    "event_type_user_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, count(*) AS n FROM tu GROUP BY event_type),
    common AS (
        SELECT a.event_type AS a_type, b.event_type AS b_type,
               count(*) AS n_common
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT c.a_type, c.b_type, sa.n AS n_a, sb.n AS n_b, c.n_common,
           round(c.n_common * 1.0 / (sa.n + sb.n - c.n_common), 6)
               AS jaccard
    FROM common c
    JOIN sizes sa ON sa.event_type = c.a_type
    JOIN sizes sb ON sb.event_type = c.b_type
    """,
)
def event_type_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the USER sets behind
    each ordered pair of event types (the cohort-overlap report product
    analytics builds; also the same set-similarity kernel the dedup stack
    uses, here on (type, user) instead of (doc, shingle)). One distinct
    pass, then a self-join keyed on user_id — user_id is the high-
    cardinality side, so the join shuffles once on it and never
    all-pairs; per-type set sizes attach as a broadcast. Jaccard is a
    ratio of exact integers -> identical IEEE division on both engines;
    (a_type, b_type) is the unique row key."""
    e = _events(spark, sf_dir)
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.selectExpr("event_type AS a_type", "user_id")
    b = tu.selectExpr("event_type AS b_type", "user_id")
    common = (
        a.join(b, "user_id")
        .where(F.col("a_type") < F.col("b_type"))
        .groupBy("a_type", "b_type")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes.selectExpr("event_type AS a_type", "n AS n_a"))
    sb = F.broadcast(sizes.selectExpr("event_type AS b_type", "n AS n_b"))
    return (
        common.join(sa, "a_type")
        .join(sb, "b_type")
        .select(
            "a_type",
            "b_type",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "user_activity_gini",
    oracle="""
    WITH per_user AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt ASC, user_id ASC) AS i
        FROM per_user
    )
    SELECT count(*) AS n_users,
           CAST(sum(cnt) AS BIGINT) AS total_events,
           round((2.0 * sum(i * cnt) - (count(*) + 1.0) * sum(cnt))
                 / (count(*) * sum(cnt)), 6) AS gini
    FROM ranked
    """,
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration report: the Gini coefficient of per-user
    event counts (the skew scorecard that tells you whether a user-keyed
    shuffle needs salting — the engine's own hot-key diagnostics, as a
    query). Formula: with counts sorted ascending and ranked 1..n,
    G = (2·Σi·x_i − (n+1)·Σx_i) / (n·Σx_i); ties contribute the same sum
    under any permutation, so the user_id tie-break only pins the plan,
    not the value. One count groupBy (map-side combined), one global rank
    over the ALREADY-AGGREGATED n_users rows (users, not events — at
    product scale this is the small frame), one scalar agg; every term is
    an exact integer, so the single rounded division is engine-exact."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.asc("cnt"), F.asc("user_id"))
    ranked = per_user.withColumn("i", F.row_number().over(w))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_users"),
        F.sum("cnt").alias("total_events"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("cnt")) - (n + 1.0) * F.sum("cnt"))
            / (n * F.sum("cnt")),
            6,
        ).alias("gini"),
    )


@query(
    "purchase_conversion_funnel",
    oracle="""
    WITH m AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view') AS tv,
               min(ts) FILTER (WHERE event_type = 'click') AS tc,
               min(ts) FILTER (WHERE event_type = 'purchase') AS tp
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_viewed,
           CAST(sum(CASE WHEN tv IS NOT NULL AND tc > tv THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked_after,
           CAST(sum(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after,
           round(sum(CASE WHEN tv IS NOT NULL AND tc > tv THEN 1 ELSE 0 END)
                 * 1.0
                 / sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END), 6)
               AS click_rate,
           round(sum(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc
                          THEN 1 ELSE 0 END) * 1.0
                 / nullif(sum(CASE WHEN tv IS NOT NULL AND tc > tv
                                   THEN 1 ELSE 0 END), 0), 6)
               AS purchase_rate
    FROM m
    """,
)
def purchase_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event conversion funnel: users whose FIRST view precedes
    their first click precedes their first purchase — the sequence-pattern
    rollup (SQL MATCH_RECOGNIZE-lite) product analytics runs daily. The
    per-user min-timestamps per type are conditional aggregates in ONE
    groupBy pass (no per-type self-joins — at 100 TB that is one shuffle
    of (user, 3 timestamps) instead of three joins), then a scalar rollup;
    NULL-safe strict inequalities encode the ordering, and the rates are
    ratios of exact integers."""
    e = _events(spark, sf_dir)
    m = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
    )
    viewed = F.sum(F.when(F.col("tv").isNotNull(), 1).otherwise(0))
    clicked = F.sum(
        F.when(F.col("tv").isNotNull() & (F.col("tc") > F.col("tv")), 1).otherwise(0)
    )
    purchased = F.sum(
        F.when(
            F.col("tv").isNotNull()
            & (F.col("tc") > F.col("tv"))
            & (F.col("tp") > F.col("tc")),
            1,
        ).otherwise(0)
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        viewed.alias("n_viewed"),
        clicked.alias("n_clicked_after"),
        purchased.alias("n_purchased_after"),
        F.round(clicked * 1.0 / viewed, 6).alias("click_rate"),
        F.round(
            purchased * 1.0 / F.nullif(clicked, F.lit(0)), 6
        ).alias("purchase_rate"),
    )


@query(
    "session_bounce_rate",
    oracle=f"""
    WITH {_SESSION_CTE.strip()},
    per AS (
        SELECT user_id, session_id, count(*) AS n
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounced,
           round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / count(*),
                 6) AS bounce_rate
    FROM per
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over gap-sessionized activity: the share of sessions
    containing exactly one event (the engagement scalar next to the
    session-length distribution). Reuses the certified sessionize kernel
    (lag + cumulative-flag windows, all user-partitioned), then one
    per-session count and one scalar rollup — the 'global' aggregate runs
    over sessions, not events; the rate is a ratio of exact integers."""
    e = _events(spark, sf_dir)
    sess = sessionize(e, "user_id", "ts", "event_id", gap_seconds=SESSION_GAP_S)
    per = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounced = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounced.cast("bigint").alias("n_bounced"),
        F.round(bounced * 1.0 / F.count(F.lit(1)), 6).alias("bounce_rate"),
    )


@query(
    "value_quartile_labels",
    oracle="""
    SELECT event_id, event_type,
           CAST(ntile(4) OVER (
               PARTITION BY event_type
               ORDER BY CAST(round(value * 1000000) AS BIGINT) ASC,
                        event_id ASC
           ) AS INTEGER) AS quartile
    FROM events
    """,
)
def value_quartile_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quartile labelling via ntile(4) — the bucketed-rank window
    family (equal-count bins, unlike the value-cut histograms) the suite
    had not yet pinned. ntile's bin boundaries depend only on the row
    ORDER, so the ordering is made total (exact-micros value, event_id
    tie-break) and the labels are engine-exact; one shuffle on the
    5-value type key."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    vmicros = F.round(F.col("value") * 1000000).cast("bigint")
    w = Window.partitionBy("event_type").orderBy(
        vmicros.asc(), F.col("event_id").asc()
    )
    return e.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "events_since_last_error",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS err_grp
        FROM events
    )
    SELECT user_id, event_id,
           CAST(row_number() OVER (
               PARTITION BY user_id, err_grp ORDER BY ts ASC, event_id ASC
           ) - 1 AS BIGINT) AS events_since_error
    FROM o WHERE event_type <> 'error'
    """,
)
def events_since_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event distance since the user's last error — the RESET-window
    pattern (a running counter that restarts at a marker event), which
    plain frames can't express: a cumulative error count partitions each
    user's stream into error epochs, then a row_number within (user,
    epoch) is the distance. Both windows share the same user-keyed
    clustering (one shuffle); events before any error count from stream
    start. Ordering is total (ts, event_id), everything integer."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    o = e.withColumn(
        "err_grp",
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .cast("bigint"),
    )
    w2 = Window.partitionBy("user_id", "err_grp").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        o.where(F.col("event_type") != "error")
        .select(
            "user_id",
            "event_id",
            (F.row_number().over(w2) - 1).cast("bigint").alias(
                "events_since_error"
            ),
        )
    )


@query(
    "events_dow_hour_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS INTEGER) AS weekday,
           CAST(hour(ts) AS INTEGER) AS hour_of_day,
           count(*) AS n_events
    FROM events GROUP BY weekday, hour_of_day
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap — the load-profile matrix capacity
    planning reads (and the week-periodicity check behind the night-window
    gates). Uses the pinned cross-engine weekday mapping (Spark weekday()
    0=Monday vs DuckDB isodow()-1) and session-UTC hours; one map-only
    extract + a 7×24-key count groupBy."""
    e = _events(spark, sf_dir)
    return (
        e.select(
            F.expr("weekday(ts)").cast("int").alias("weekday"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .groupBy("weekday", "hour_of_day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "markov_transition_probs",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    counts AS (
        SELECT event_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           round(CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE),
                 6) AS prob
    FROM counts
    """,
)
def markov_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-normalized first-order Markov transition matrix (the
    behaviour-model form of event_type_transitions): P(next | current) =
    n / row-total. The normalization is a window over the ALREADY
    AGGREGATED |types|^2 matrix, not over the fact — the expensive part
    (per-user lead + transition groupBy) is identical to
    event_type_transitions, and the extra window touches at most 25
    rows whatever the corpus size. Counts are exact integers; the one
    division is the same double op on both engines. The counts subplan
    IS event_type_transitions (called, not re-spelled, so a fix to the
    certified transition counts can never diverge from this matrix)."""
    from pyspark.sql import Window

    counts = event_type_transitions(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(wt).cast("double"),
            6,
        ).alias("prob"),
    )


@query(
    "user_burstiness",
    oracle="""
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               )) // 1000000 AS gap_s
        FROM events
    ),
    sums AS (
        -- s and q stay HUGEINT here so the n*q - s^2 products below are
        -- exact at any history length (they are never projected raw)
        SELECT user_id,
               count(*) AS n_gaps,
               sum(gap_s) AS s,
               sum(gap_s * gap_s) AS q
        FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round((sqrt(CAST(n_gaps * q - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
                 / (sqrt(CAST(n_gaps * q - s * s AS DOUBLE)) + CAST(s AS DOUBLE)),
                 6) AS burstiness
    FROM sums WHERE n_gaps >= 2 AND s > 0
    """,
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of per-user
    inter-event gaps — the temporal-pattern statistic separating
    Poisson-like activity (B ~ 0) from bursty sessions (B -> 1) and
    clockwork pings (B -> -1). Cross-engine float discipline: sigma and
    mu are NOT computed with stddev()/avg() (engine-order-dependent
    accumulation); instead the population-variance identity
    n*sigma^2 = (n*Q - S^2)/n cancels n in the ratio, so
    B = (sqrt(nQ - S^2) - S) / (sqrt(nQ - S^2) + S) evaluates from the
    EXACT integer second sums S and Q with one identical sqrt+divide on
    both engines. One user_id shuffle for the lag window, then the
    aggregate combines map-side — same shape as inter_event_gaps."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    )
    g = (
        e.select("user_id", gap_us.alias("gap_us"))
        .where(F.col("gap_us").isNotNull())
        .select("user_id", F.expr("gap_us div 1000000").alias("gap_s"))
    )
    # decimal accumulators: n*Q and S^2 pass int64 for decade-long
    # per-user histories (same products-of-sums frontier as
    # degree_assortativity); the oracle's HUGEINT sums are the mirror
    dec = "decimal(38,0)"
    sums = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap_s").cast(dec)).alias("s"),
        F.sum((F.col("gap_s") * F.col("gap_s")).cast(dec)).alias("q"),
    )
    disc = (
        F.col("n_gaps").cast(dec) * F.col("q") - F.col("s") * F.col("s")
    ).cast("double")
    return sums.where((F.col("n_gaps") >= 2) & (F.col("s") > 0)).select(
        "user_id",
        "n_gaps",
        F.round(
            (F.sqrt(disc) - F.col("s").cast("double"))
            / (F.sqrt(disc) + F.col("s").cast("double")),
            6,
        ).alias("burstiness"),
    )


@query(
    "value_autocorr_lag1",
    oracle="""
    WITH pairs AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS x,
               lead(CAST(round(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS y
        FROM events
    ),
    sums AS (
        -- HUGEINT sums; only the rounded double and the count project
        SELECT user_id, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs WHERE y IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS autocorr
    FROM sums
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def value_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values — the
    trending-vs-mean-reverting signal on a user's value stream (near +1:
    values drift in runs; near 0: independent; negative: alternating).
    The cross-product generalization of the moment-sum discipline
    (DETERMINISM.md): Pearson r over consecutive (x, y=next x) cent
    pairs is assembled from exact integer sums — here the x/y marginals
    genuinely differ (y drops each user's first value, x the last), so
    both variance legs are computed, each under its own sqrt, spelled
    identically in both engines. Accumulators are DECIMAL(38,0)
    (products-of-sums frontier); the variance>0 gates are exact integer
    comparisons so no engine can disagree about which users appear.
    One user_id window shuffle, then a map-side-combined aggregate."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    vc = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        e.select("user_id", vc.alias("x"), F.lead(vc).over(w).alias("y"))
        .where(F.col("y").isNotNull())
    )
    sums = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    n = F.col("n").cast(dec)
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        sums.where((F.col("n") >= 2) & (varx > 0) & (vary > 0))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round(
                cov.cast("double")
                / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
                6,
            ).alias("autocorr"),
        )
    )


@query(
    "session_duration_histogram",
    oracle=f"""
    WITH {_SESSION_CTE.strip()},
    durs AS (
        SELECT user_id, session_id,
               (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000
                   AS duration_secs
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT CAST(duration_secs // 600 AS BIGINT) AS bucket_10min,
           count(*) AS n_sessions,
           min(duration_secs) AS min_secs,
           max(duration_secs) AS max_secs
    FROM durs GROUP BY bucket_10min
    """,
)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution in 10-minute buckets — the engagement
    histogram behind session-quality dashboards, COMPOSED on the certified
    sessionizer (same lag + running-sum construction as user_sessions;
    this query certifies the composition, the duration arithmetic is
    exact integer seconds). Bucketing is integer floor-division so the
    histogram key is exact; the second aggregate reduces to
    |buckets| rows however many sessions exist."""
    e = _events(spark, sf_dir)
    s = sessionize(e, "user_id", "ts", "event_id", gap_seconds=SESSION_GAP_S)
    durs = session_stats(s, "user_id", "ts").select(
        F.col("duration_secs")
    )
    return (
        durs.select(
            F.expr("duration_secs div 600").cast("bigint").alias("bucket_10min"),
            "duration_secs",
        )
        .groupBy("bucket_10min")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.min("duration_secs").alias("min_secs"),
            F.max("duration_secs").alias("max_secs"),
        )
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT d.day, count(DISTINCT u.user_id) AS wau
        FROM days d
        JOIN du u ON u.day > d.day - 7 AND u.day <= d.day
        GROUP BY d.day
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day,
           a.dau, w.wau,
           round(a.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau a JOIN wau w ON w.day = a.day
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU stickiness — the engagement ratio product
    teams track daily. Sliding-window COUNT DISTINCT can't run as a
    window function (distinct isn't decomposable over frames), so the
    trailing week materializes as a bounded self-join: distinct
    (day, user) rows join the day spine on a 7-day band — candidate
    volume is |days| x avg-DAU, i.e. 7x the distinct table, NOT the
    fact. At 100 TB the distinct (day, user) table is the pre-aggregated
    input (days partition key); an HLL-sketch union variant
    (approx_count_distinct over merged day sketches) is the documented
    swap when exactness yields."""
    e = _events(spark, sf_dir)
    du = e.select(
        F.to_date("ts").alias("day"), "user_id"
    # three consumers (dau, day spine, band join) would re-run the
    # fact distinct (plan_audit lead, r10)
    ).distinct().localCheckpoint(eager=False)
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = du.select("day").distinct()
    d = days.alias("d")
    u = du.alias("u")
    wau = (
        d.join(
            u,
            (F.col("u.day") > F.date_sub(F.col("d.day"), 7))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query(
    "first_touch_attribution",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type AS first_type FROM (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT f.first_type,
           count(*) AS n_users,
           CAST(count(c.user_id) AS BIGINT) AS n_converted,
           round(count(c.user_id) * 1.0 / count(*), 6) AS conversion_rate
    FROM firsts f LEFT JOIN conv c ON c.user_id = f.user_id
    GROUP BY f.first_type
    """,
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: users grouped by their FIRST event type,
    with the fraction who ever purchase — the acquisition-channel
    conversion report (here event_type stands in for the channel). The
    first-touch is the W4 winner kernel on (ts, event_id) order
    (WindowGroupLimit prunes to one row per user before the shuffle);
    conversion is a distinct semi-side LEFT-joined so never-converting
    channels still report 0. Output is |event_types| rows."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    firsts = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
    )
    conv = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("__conv", F.lit(1))
    )
    return (
        firsts.join(conv, "user_id", "left")
        .groupBy("first_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("__conv").alias("n_converted"),
            F.round(F.count("__conv") * 1.0 / F.count(F.lit(1)), 6).alias(
                "conversion_rate"
            ),
        )
    )


@query(
    "hourly_anomaly_zscore",
    oracle="""
    WITH grid AS (
        SELECT t.event_type, h.hour
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(range(24)) AS hour) h
    ),
    counts AS (
        SELECT event_type, hour(ts) AS hour, count(*) AS c
        FROM events GROUP BY event_type, hour(ts)
    ),
    filled AS (
        SELECT g.event_type, g.hour, coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.hour = g.hour
    ),
    m AS (
        SELECT event_type, sum(c) AS s, sum(c*c) AS q
        FROM filled GROUP BY event_type
    )
    SELECT f.event_type, CAST(f.hour AS BIGINT) AS hour,
           CAST(f.c AS BIGINT) AS n_events,
           round((f.c - m.s / 24.0)
                 / sqrt(CAST(24 * m.q - m.s * m.s AS DOUBLE)) * 24.0,
                 6) AS zscore
    FROM filled f JOIN m ON m.event_type = f.event_type
    """,
)
def hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day anomaly scores: each (type, hour) count standardized
    against that type's 24-hour profile — the load-anomaly view an
    on-call dashboard renders (|z| > 2 rows are the alert candidates).
    Missing hours zero-fill via a generated type x 24 grid so the
    profile is over all 24 hours, not just observed ones. The z-score
    assembles from exact integer moment sums (s, q over exactly 24
    values) with one identical double expression — population sigma =
    sqrt(24q - s^2)/24, so z = (c - s/24)·24/sqrt(24q - s^2); the
    standardization is locked by the sum-zero / square-sum-24 test."""
    e = _events(spark, sf_dir)
    counts = e.groupBy(
        "event_type", F.hour("ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    types = e.select("event_type").distinct()
    hours = spark.range(24).select(F.col("id").cast("int").alias("hour"))
    grid = types.crossJoin(F.broadcast(hours))
    filled = grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce("c", F.lit(0)).alias("c")
    )
    m = filled.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.sum(F.col("c") * F.col("c")).alias("q")
    )
    z = F.round(
        (F.col("c") - F.col("s") / 24.0)
        / F.sqrt((24 * F.col("q") - F.col("s") * F.col("s")).cast("double"))
        * 24.0,
        6,
    )
    return (
        filled.join(m, "event_type")
        .select(
            "event_type",
            F.col("hour").cast("bigint").alias("hour"),
            F.col("c").cast("bigint").alias("n_events"),
            z.alias("zscore"),
        )
    )


LIFECYCLE_ACTIVE_D = 0
LIFECYCLE_LAPSING_D = 1


@query(
    "user_lifecycle_stages",
    oracle=f"""
    WITH last_seen AS (
        SELECT user_id, max(CAST(ts AS DATE)) AS last_day FROM events
        GROUP BY user_id
    ),
    horizon AS (SELECT max(CAST(ts AS DATE)) AS end_day FROM events),
    staged AS (
        SELECT CASE
                 WHEN end_day - last_day <= {LIFECYCLE_ACTIVE_D} THEN 'active'
                 WHEN end_day - last_day <= {LIFECYCLE_LAPSING_D} THEN 'lapsing'
                 ELSE 'churned'
               END AS stage
        FROM last_seen CROSS JOIN horizon
    )
    SELECT stage, count(*) AS n_users FROM staged GROUP BY stage
    """,
)
def user_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifecycle segmentation: active (seen ON the data
    horizon day), lapsing (within {LIFECYCLE_LAPSING_D} day), churned
    (older) — cuts sized to the synthetic feed's dense cadence; a
    production feed widens them — the retention staging
    every growth dashboard opens with. The horizon is a scalar-agg
    cross join (the engine's W1 pattern — never an eager collect), the
    stage cut is an exact integer day difference, and the output is 3
    rows from one user-keyed aggregate."""
    e = _events(spark, sf_dir)
    last_seen = e.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day")
    )
    horizon = e.agg(F.max(F.to_date("ts")).alias("end_day"))
    gap = F.datediff(F.col("end_day"), F.col("last_day"))
    stage = (
        F.when(gap <= LIFECYCLE_ACTIVE_D, "active")
        .when(gap <= LIFECYCLE_LAPSING_D, "lapsing")
        .otherwise("churned")
    )
    return (
        last_seen.crossJoin(F.broadcast(horizon))
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "error_burst_windows",
    oracle=f"""
    WITH errs AS (
        SELECT {bucket_sql('events', 'ts')} AS tw, count(*) AS c
        FROM events WHERE event_type = 'error'
        GROUP BY tw
    ),
    tot AS (SELECT sum(c) AS s, count(*) AS nb FROM errs)
    SELECT e.tw, CAST(e.c AS BIGINT) AS n_errors
    FROM errs e CROSS JOIN tot
    WHERE e.c * tot.nb > 2 * tot.s
    """,
)
def error_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detector: 10-minute buckets whose error count exceeds
    2x the per-bucket average — the paging condition of an alerting
    pipeline, as a batch query. The threshold comparison is EXACT
    integer cross-multiplication (c·n_buckets > 2·total), never a float
    average — so a bucket sitting exactly ON the threshold can't flip
    between engines (the knife-edge discipline). One filtered bucket
    aggregate + a scalar-agg cross join."""
    from .mobility import _bucket_origin_us
    from ..operators.timebucket import with_time_bucket  # noqa: F811

    e = _events(spark, sf_dir).where(F.col("event_type") == "error")
    b = with_time_bucket(
        e, "ts", 600, origin_us=_bucket_origin_us(spark, sf_dir)
    )
    errs = b.groupBy("tw").agg(F.count(F.lit(1)).alias("c"))
    tot = errs.agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("nb")
    )
    return (
        errs.crossJoin(F.broadcast(tot))
        .where(F.col("c") * F.col("nb") > 2 * F.col("s"))
        .select("tw", F.col("c").cast("bigint").alias("n_errors"))
    )


@query(
    "value_winsorized_stats",
    oracle="""
    WITH vm AS (
        SELECT event_type,
               CAST(round(value * 1e6) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    cuts AS (
        SELECT event_type,
               CAST(round(quantile_cont(v, 0.05)) AS BIGINT) AS lo,
               CAST(round(quantile_cont(v, 0.95)) AS BIGINT) AS hi
        FROM vm GROUP BY event_type
    )
    SELECT vm.event_type,
           count(*) AS n,
           round(cuts.lo / 1e6, 6) AS p5,
           round(cuts.hi / 1e6, 6) AS p95,
           round(sum(least(greatest(vm.v, cuts.lo), cuts.hi))
                 / (count(*) * 1e6), 6) AS winsorized_mean
    FROM vm JOIN cuts ON cuts.event_type = vm.event_type
    GROUP BY vm.event_type, cuts.lo, cuts.hi
    """,
)
def value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust mean: values clamped to their type's [p5, p95]
    before averaging (winsorization — the robust stat a metrics pipeline
    reports when heavy tails poison plain means). Determinism chain:
    values quantize to integer micros FIRST, the exact continuous
    percentile interpolates on those integers (the order_value_median
    contract) and re-rounds to an integer cut, the clamp is pure integer
    least/greatest, and the mean divides one exact integer sum — no
    float enters until the final division. Two aggregates on the type
    key (percentile needs the group's values; the documented
    approx-sketch swap applies when groups outgrow executors)."""
    e = _events(spark, sf_dir).where(F.col("value").isNotNull())
    vm = e.select(
        "event_type", F.round(F.col("value") * 1e6).cast("long").alias("v")
    )
    cuts = vm.groupBy("event_type").agg(
        F.round(F.percentile(F.col("v"), F.lit(0.05))).cast("long").alias("lo"),
        F.round(F.percentile(F.col("v"), F.lit(0.95))).cast("long").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        vm.join(cuts, "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(clamped).alias("csum"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("lo") / 1e6, 6).alias("p5"),
            F.round(F.col("hi") / 1e6, 6).alias("p95"),
            F.round(F.col("csum") / (F.col("n") * 1e6), 6).alias(
                "winsorized_mean"
            ),
        )
    )


@query(
    "value_first_digit_benford",
    oracle="""
    WITH vm AS (
        SELECT CAST(round(value * 1e6) AS BIGINT) AS v FROM events
        WHERE value IS NOT NULL AND round(value * 1e6) >= 1
    ),
    digits AS (
        SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM vm
    ),
    tot AS (SELECT count(*) AS n FROM digits)
    SELECT d.digit,
           count(*) AS n_values,
           round(count(*) * 1.0 / max(tot.n), 6) AS observed_freq,
           round(ln(1.0 + 1.0 / d.digit) / ln(10.0), 6) AS benford_freq
    FROM digits d CROSS JOIN tot
    GROUP BY d.digit
    """,
)
def value_first_digit_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column — the classic
    fabricated-data / instrumentation-bug screen: natural multi-scale
    measurements put ~30.1% of first digits at 1, a uniform RNG puts
    ~11%, and the gap between observed_freq and benford_freq is the
    signal (the synthetic feed here is uniform, so the flat profile is
    the expected finding). The first digit comes from the STRING of the
    micro-quantized INTEGER — never from float formatting, which
    engines render differently; the Benford reference frequency is one
    identical ln expression per digit. Map-only projection + 9-row
    aggregate + scalar-agg total."""
    e = _events(spark, sf_dir).where(F.col("value").isNotNull())
    vm = e.select(F.round(F.col("value") * 1e6).cast("long").alias("v")).where(
        F.col("v") >= 1
    )
    digits = vm.select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("long").alias("digit")
    )
    tot = digits.agg(F.count(F.lit(1)).alias("n"))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_values"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_values",
            F.round(F.col("n_values") * 1.0 / F.col("n"), 6).alias(
                "observed_freq"
            ),
            F.round(
                F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 6
            ).alias("benford_freq"),
        )
    )


@query(
    "purchase_interpurchase_gaps",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, event_id,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS prev_us
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT user_id, (epoch_us(ts) - prev_us) // 3600000000 AS gap_h
        FROM p WHERE prev_us IS NOT NULL
    )
    SELECT count(*) AS n_gaps,
           count(DISTINCT user_id) AS n_repeat_buyers,
           CAST(round(quantile_cont(gap_h, 0.5)) AS BIGINT) AS median_gap_h,
           CAST(round(quantile_cont(gap_h, 0.9)) AS BIGINT) AS p90_gap_h
    FROM gaps
    """,
)
def purchase_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence: the distribution of hours between a
    user's consecutive purchases — the repurchase-cycle metric behind
    replenishment reminders and churn-risk windows. Gaps are exact
    integer hours (floor-divided epoch micros; lag over the
    (ts, event_id)-ordered per-user window), and the summary quantiles
    interpolate on those integers then re-round — so the only floats
    are two engine-identical interpolations. One filtered window + one
    scalar aggregate."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = (
        e.select(
            "user_id",
            (
                (
                    F.unix_micros("ts")
                    - F.lag(F.unix_micros("ts")).over(w)
                )
            ).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
        .select("user_id", F.expr("gap_us div 3600000000").alias("gap_h"))
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.countDistinct("user_id").alias("n_repeat_buyers"),
        F.round(F.percentile("gap_h", F.lit(0.5))).cast("bigint").alias(
            "median_gap_h"
        ),
        F.round(F.percentile("gap_h", F.lit(0.9))).cast("bigint").alias(
            "p90_gap_h"
        ),
    )


@query(
    "event_value_welch_test",
    oracle="""
    WITH vm AS (
        SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(v) AS DOUBLE) / count(*) / 1e6 AS mean,
               CAST(count(*) * sum(CAST(v AS HUGEINT) * v)
                    - CAST(sum(v) AS HUGEINT) * sum(v) AS DOUBLE)
                   / (count(*) * (count(*) - 1.0)) / 1e12 AS var
        FROM vm GROUP BY event_type
        HAVING count(*) >= 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS n_a, b.n AS n_b,
           round(a.mean - b.mean, 6) AS mean_diff,
           round((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 6) AS welch_t,
           round((a.var / a.n + b.var / b.n)
                 * (a.var / a.n + b.var / b.n)
                 / ((a.var / a.n) * (a.var / a.n) / (a.n - 1.0)
                    + (b.var / b.n) * (b.var / b.n) / (b.n - 1.0)),
                 6) AS welch_df
    FROM m a JOIN m b ON a.event_type < b.event_type
    """,
)
def event_value_welch_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise WELCH two-sample t statistics between event types' value
    distributions — the experiment-analysis kernel (an A/B readout is
    exactly this: unequal-variance mean comparison plus the
    Welch–Satterthwaite degrees of freedom that calibrate the p-value).
    Determinism: values micro-quantize to integers, per-type mean and
    sample variance assemble from EXACT moment sums (n·Σv² - (Σv)² in
    decimal/HUGEINT — the products-of-sums discipline, DETERMINISM.md),
    and the t/df formulas are written with identical association on both
    engines so every double op is bit-mirrored before the final
    round(...,6). Plan: one map-side-combined moments aggregate (5 rows
    out however large the fact), then a broadcast self-join over the
    handful of types — the fact is touched once; this is the same
    one-pass profile as events_quality_report with a statistical head."""
    e = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    vm = F.round(F.col("value") * 1e6).cast("long")
    m = e.select("event_type", vm.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum((F.col("v").cast(dec) * F.col("v")).cast(dec)).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n") / 1e6
    var = (
        (F.col("n").cast(dec) * F.col("q") - F.col("s") * F.col("s")).cast(
            "double"
        )
        / (F.col("n") * (F.col("n") - 1.0))
        / 1e12
    )
    # n >= 2 guard: a single-row type would put n*(n-1) = 0 in the
    # sample-variance denominator, and 0/0 double semantics differ across
    # engines (Spark NaN vs DuckDB's configurable NULL/error) — degenerate
    # groups are excluded from the pairwise test on BOTH sides.
    m = m.where(F.col("n") >= 2).select(
        "event_type", "n", mean.alias("mean"), var.alias("var")
    )
    a = m.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = m.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.round(F.col("mean_a") - F.col("mean_b"), 6).alias("mean_diff"),
            F.round(
                (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb), 6
            ).alias("welch_t"),
            F.round(
                (sa + sb)
                * (sa + sb)
                / (
                    sa * sa / (F.col("n_a") - 1.0)
                    + sb * sb / (F.col("n_b") - 1.0)
                ),
                6,
            ).alias("welch_df"),
        )
    )


# Kaplan-Meier axis resolution: waits bucket to whole minutes (bounds the
# curve to max-gap-minutes rows at any corpus size).
SURVIVAL_BUCKET_US = 60_000_000


@query(
    "wait_time_survival_curve",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS next_us
        FROM events
    ),
    horizon AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
    obs AS (
        SELECT CASE WHEN next_us IS NULL
                    THEN (end_us - ts_us) // {SURVIVAL_BUCKET_US}
                    ELSE (next_us - ts_us) // {SURVIVAL_BUCKET_US}
               END AS lifetime,
               CASE WHEN next_us IS NULL THEN 0 ELSE 1 END AS observed
        FROM seq CROSS JOIN horizon
    ),
    hist AS (
        SELECT lifetime, count(*) AS c, sum(observed) AS d
        FROM obs GROUP BY lifetime
    ),
    risk AS (
        SELECT lifetime, d,
               sum(c) OVER (ORDER BY lifetime DESC) AS n_risk
        FROM hist
    ),
    km AS (
        SELECT lifetime, d, n_risk,
               sum(CASE WHEN d < n_risk THEN CAST(round(
                   ln((n_risk - d) * 1.0 / n_risk) * 1e9) AS BIGINT)
                   ELSE 0 END) OVER (ORDER BY lifetime ASC) AS lognano,
               max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY lifetime ASC) AS hit_zero
        FROM risk WHERE d > 0
    )
    SELECT CAST(lifetime AS BIGINT) AS t_minutes,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE round(exp(lognano / 1e9), 6) END AS survival
    FROM km
    """,
)
def wait_time_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve of the WAIT between consecutive user
    events (whole minutes), right-censoring each user's final wait at the
    observation horizon — the time-to-next-event estimator behind churn
    and re-engagement models (KM uses completed AND still-open waits
    together without the bias of dropping the open ones; the mean of
    inter_event_gaps silently conditions on a next event existing).
    Determinism: each factor ln(1 - d/n) sits on an exact integer ratio,
    quantizes to integer NANOS before the cumulative sum
    (quantize-then-accumulate, DETERMINISM.md — a float cumulative
    product would drift with accumulation order), and the single exp
    lands under round(...,6); a step where the whole risk set dies pins
    survival to exactly 0.0 on both engines rather than exp(-inf). Plan:
    one lead() pass over the per-user sequence (the certified
    inter-event window), horizon as a scalar-agg crossJoin, one
    histogram aggregate, then windows over the WAIT-HISTOGRAM axis — at
    most max-gap-minutes rows however many events — so the 'global'
    windows are trivially single-partition; the heavy lifting is the
    per-user window, which shuffles the fact once on user_id."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.unix_micros("ts").alias("ts_us"),
        F.lead(F.unix_micros("ts")).over(wu).alias("next_us"),
    )
    horizon = e.agg(F.max(F.unix_micros("ts")).alias("end_us"))
    obs = seq.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("next_us").isNull(),
            F.expr(f"(end_us - ts_us) div {SURVIVAL_BUCKET_US}"),
        )
        .otherwise(F.expr(f"(next_us - ts_us) div {SURVIVAL_BUCKET_US}"))
        .alias("lifetime"),
        F.when(F.col("next_us").isNull(), 0).otherwise(1).alias("observed"),
    )
    hist = obs.groupBy("lifetime").agg(
        F.count(F.lit(1)).alias("c"), F.sum("observed").alias("d")
    )
    w_desc = Window.orderBy(F.col("lifetime").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.select(
        "lifetime", "d", F.sum("c").over(w_desc).alias("n_risk")
    ).where(F.col("d") > 0)
    w_asc = Window.orderBy(F.col("lifetime").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nano = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log((F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk"))
            * 1e9
        ).cast("long"),
    ).otherwise(F.lit(0))
    km = risk.select(
        "lifetime",
        "d",
        "n_risk",
        F.sum(nano).over(w_asc).alias("lognano"),
        F.max(
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
        )
        .over(w_asc)
        .alias("hit_zero"),
    )
    return km.select(
        F.col("lifetime").cast("bigint").alias("t_minutes"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("lognano") / 1e9), 6))
        .alias("survival"),
    )


@query(
    "value_mad_by_type",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(min(m.med), 6) AS median_value,
           round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
    FROM events e JOIN med m ON m.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the ROBUST scale
    estimator (value_winsorized_stats trims, value_outliers z-scores;
    MAD is the one that survives arbitrarily heavy tails, and
    1.4826 x MAD is the standard robust sigma). Two exact-percentile
    passes: the per-type median (the proven value_quantiles
    interpolation identity: Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition), a
    broadcast of the 5-row median table back onto the fact for the
    absolute deviations, then the median of deviations. Plan: the fact
    is touched twice by necessity (MAD is a nested median — not
    one-pass computable exactly); both touches are type-keyed aggregates
    with per-type percentile state, and the mid-table broadcast is
    type-cardinality-sized. At 100 TB swap the outer exact percentile
    for percentile_approx; exact is kept for the differential gate."""
    e = _events(spark, sf_dir)
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = e.select("event_type", "value").join(F.broadcast(med), "event_type")
    return j.groupBy("event_type").agg(
        F.round(F.min("med"), 6).alias("median_value"),
        F.round(
            F.expr("percentile(abs(value - med), 0.5)"), 6
        ).alias("mad"),
    )


@query(
    "value_ks_test_pairs",
    oracle="""
    WITH vm AS (
        SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS v
        FROM events
    ),
    tn AS (SELECT event_type, count(*) AS n FROM vm GROUP BY event_type),
    cnts AS (
        SELECT event_type, v, count(*) AS c FROM vm GROUP BY event_type, v
    ),
    pairs AS (
        SELECT a.event_type AS ta, a.n AS na, b.event_type AS tb, b.n AS nb
        FROM tn a JOIN tn b ON a.event_type < b.event_type
    ),
    inc AS (
        SELECT p.ta, p.tb, p.na, p.nb, c.v,
               sum(CASE WHEN c.event_type = p.ta THEN c.c ELSE 0 END) AS ia,
               sum(CASE WHEN c.event_type = p.tb THEN c.c ELSE 0 END) AS ib
        FROM pairs p JOIN cnts c ON c.event_type IN (p.ta, p.tb)
        GROUP BY p.ta, p.tb, p.na, p.nb, c.v
    ),
    cum AS (
        SELECT ta, tb, na, nb,
               sum(ia) OVER (PARTITION BY ta, tb ORDER BY v ASC) AS ca,
               sum(ib) OVER (PARTITION BY ta, tb ORDER BY v ASC) AS cb
        FROM inc
    )
    SELECT ta AS type_a, tb AS type_b,
           round(max(abs(ca * 1.0 / na - cb * 1.0 / nb)), 6) AS ks_d
    FROM cum GROUP BY ta, tb, na, nb
    """,
)
def value_ks_test_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample KOLMOGOROV-SMIRNOV statistics between event
    types' value distributions — the nonparametric companion to
    event_value_welch_test (Welch compares means; KS compares WHOLE
    distributions: D = sup |ECDF_a - ECDF_b|, the drift metric
    data-quality monitors alarm on). Determinism end-to-end: values
    micro-quantize to integers (which also makes the ECDF grid finite —
    the binned-ECDF lever at scale), per-(pair, v) increment counts are
    exact integers grouped BEFORE the cumulative window (so ties
    contribute atomically and the running counts are evaluated only at
    distinct grid points), the two ECDFs are ratios of exact integers
    (identical IEEE division), and the sup is a max — no interpolation
    anywhere. Plan: one type-keyed count, one (type, v) count, a
    nested-loop attach of the C(5,2)=10-row pair table (broadcast — the
    pair table is type-cardinality², never data-sized), a pair-keyed
    grid aggregate, one pair-partitioned cumulative window, and a 10-row
    max. Window state per pair is the merged distinct-value grid —
    linear in the quantized support, not in rows."""
    e = _events(spark, sf_dir)
    vm = e.select(
        "event_type",
        F.round(F.col("value") * 1e6).cast("bigint").alias("v"),
    )
    tn = vm.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    cnts = vm.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    a = tn.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))
    b = tn.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))
    pairs = a.join(b, F.col("ta") < F.col("tb"))
    inc = (
        cnts.join(
            F.broadcast(pairs),
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "na", "nb", "v")
        .agg(
            F.sum(
                F.when(F.col("event_type") == F.col("ta"), F.col("c"))
                .otherwise(0)
            ).alias("ia"),
            F.sum(
                F.when(F.col("event_type") == F.col("tb"), F.col("c"))
                .otherwise(0)
            ).alias("ib"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("ta", "tb")
        .orderBy(F.asc("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = inc.select(
        "ta",
        "tb",
        "na",
        "nb",
        F.sum("ia").over(w).alias("ca"),
        F.sum("ib").over(w).alias("cb"),
    )
    return cum.groupBy("ta", "tb", "na", "nb").agg(
        F.round(
            F.max(
                F.abs(
                    F.col("ca") * 1.0 / F.col("na")
                    - F.col("cb") * 1.0 / F.col("nb")
                )
            ),
            6,
        ).alias("ks_d")
    ).select(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b"), "ks_d"
    )


@query(
    "event_transition_entropy",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS next_type
        FROM events
    ),
    tc AS (
        SELECT event_type, next_type, count(*) AS c
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    tot AS (
        SELECT event_type, sum(c) AS n_trans FROM tc GROUP BY event_type
    ),
    top AS (
        SELECT event_type, next_type AS top_next FROM (
            SELECT tc.*, row_number() OVER (
                PARTITION BY event_type ORDER BY c DESC, next_type ASC
            ) AS rn FROM tc
        ) WHERE rn = 1
    )
    SELECT t.event_type,
           CAST(t.n_trans AS BIGINT) AS n_trans,
           round(-sum((tc.c * 1.0 / t.n_trans)
                      * ln(tc.c * 1.0 / t.n_trans)), 6) AS entropy,
           min(p.top_next) AS top_next
    FROM tc
    JOIN tot t ON t.event_type = tc.event_type
    JOIN top p ON p.event_type = tc.event_type
    GROUP BY t.event_type, t.n_trans
    """,
)
def event_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successor-distribution SHANNON ENTROPY per event type — the
    information-theoretic head on the Markov chain
    (markov_transition_probs gives the matrix; this collapses each row
    to one number: how predictable the next step is, plus the modal
    successor). A type with near-zero entropy is a deterministic funnel
    edge; maximal entropy means the type carries no sequence signal.
    Determinism: successor counts are exact integers over the
    (ts, event_id)-ordered per-user lead; probabilities are exact
    int/int divisions; the entropy sum runs over at most
    |event_type| <= 5 terms whose reorder drift is ~1e-16, absorbed by
    round(...,6) (the value_quantiles argument class); the modal
    successor breaks count ties on the type name. Plan: one user-spine
    window, one (type, next) aggregate whose output is type²-bounded,
    then 5-row joins."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    tc = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    # n_trans and the modal successor are both windows over the SAME tiny
    # (type, next) count table, so the expensive user-spine subtree is
    # evaluated exactly once (the join formulation re-derived tc per
    # consumer — plan-audit lead); both windows share the event_type
    # clustering, so this costs one type-keyed exchange total.
    wt = Window.partitionBy("event_type")
    wr = wt.orderBy(F.desc("c"), F.asc("next_type"))
    tc = tc.select(
        "event_type",
        "next_type",
        "c",
        F.sum("c").over(wt).alias("n_trans"),
        F.row_number().over(wr).alias("rn"),
    )
    p = F.col("c") * 1.0 / F.col("n_trans")
    return (
        tc.groupBy("event_type", "n_trans")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.min(
                F.when(F.col("rn") == 1, F.col("next_type"))
            ).alias("top_next"),
        )
        .select(
            "event_type",
            F.col("n_trans").cast("bigint").alias("n_trans"),
            "entropy",
            "top_next",
        )
    )


@query(
    "value_cusum_range",
    oracle="""
    WITH vm AS (
        SELECT event_type, ts, event_id,
               CAST(round(value * 1e6) AS BIGINT) AS v
        FROM events
    ),
    cs AS (
        SELECT event_type,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(CAST(v AS HUGEINT)) OVER (PARTITION BY event_type) AS s,
               sum(CAST(v AS HUGEINT)) OVER (
                   PARTITION BY event_type ORDER BY ts ASC, event_id ASC
                   ROWS UNBOUNDED PRECEDING
               ) AS p,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY ts ASC, event_id ASC
               ) AS k
        FROM vm
    ),
    t AS (
        SELECT event_type, n, n * p - k * s AS t_k FROM cs
    )
    SELECT event_type,
           CAST(min(n) AS BIGINT) AS n_events,
           round(CAST(greatest(max(t_k), 0) - least(min(t_k), 0) AS DOUBLE)
                 / min(n) / 1e6, 6) AS cusum_range
    FROM t GROUP BY event_type
    """,
)
def value_cusum_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift range per event type — the change-point screen (a
    value stream whose mean shifts mid-window produces a large cumulative
    excursion around the global mean; a stationary one hovers near zero).
    Computed EXACTLY in integers: with P_k the running sum of
    micro-quantized values and (n, S) the per-type totals, the centered
    cusum n*(P_k - k*S/n) = n*P_k - k*S needs no division, so every
    T_k is an exact HUGEINT/DECIMAL(38,0); the range includes the S_0 = 0
    anchor (greatest/least against 0), and the single normalization
    /n/1e6 puts the result back in value units. The (ts, event_id) order
    is a unique total order. Plan: ONE type-keyed exchange shared by all
    four windows (same clustering), then a 5-row aggregate — one pass
    over the fact at any scale."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    vm = e.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1e6).cast("long").alias("v"),
    )
    w_all = Window.partitionBy("event_type")
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    cs = vm.select(
        "event_type",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum(F.col("v").cast(dec)).over(w_all).alias("s"),
        F.sum(F.col("v").cast(dec)).over(w_ord).alias("p"),
        F.row_number().over(w_rn).alias("k"),
    )
    t = cs.select(
        "event_type",
        "n",
        (F.col("n").cast(dec) * F.col("p") - F.col("k").cast(dec) * F.col("s")).alias(
            "t_k"
        ),
    )
    return t.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_events"),
        F.round(
            (
                F.greatest(F.max("t_k"), F.lit(0).cast("decimal(38,0)"))
                - F.least(F.min("t_k"), F.lit(0).cast("decimal(38,0)"))
            ).cast("double")
            / F.min("n")
            / 1e6,
            6,
        ).alias("cusum_range"),
    )


@query(
    "value_skewness_by_type",
    oracle="""
    WITH vm AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type,
               count(*) AS n,
               sum(CAST(v AS HUGEINT)) AS s1,
               sum(CAST(v AS HUGEINT) * v) AS s2,
               sum(CAST(v AS HUGEINT) * v * v) AS s3
        FROM vm GROUP BY event_type
        HAVING count(*) >= 2 AND count(*) * sum(CAST(v AS HUGEINT) * v)
               - CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT)
                 * sum(CAST(v AS HUGEINT)) > 0
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           round(CAST(s1 AS DOUBLE) / n / 100.0, 6) AS mean_value,
           round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 100.0, 6)
               AS std_value,
           round((CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / pow(CAST(n * s2 - s1 * s1 AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 1.5),
                 6) AS skewness
    FROM m
    """,
)
def value_skewness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third standardized moment (population skewness) per event type —
    the tail-asymmetry profile next to the robust (MAD) and trimmed
    (winsorized) summaries. Values quantize to exact cents; the three
    power sums accumulate in HUGEINT/DECIMAL(38,0); the central-moment
    combinations (n*s2 - s1^2, n^2*s3 - 3n*s2*s1 + 2*s1^3) are computed
    as exact integers BEFORE the only doubles (mirrored divisions and
    one pow) — the products-of-sums discipline, and standardized moments
    are scale-free so the cents unit cancels. Degenerate groups (n < 2
    or zero variance) are excluded on both engines. One map-side
    combined aggregate: a single pass over the fact."""
    e = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    vm = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    vd = F.col("v").cast(dec)
    m = vm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(vd).alias("s1"),
        F.sum((vd * F.col("v")).cast(dec)).alias("s2"),
        F.sum((vd * F.col("v") * F.col("v")).cast(dec)).alias("s3"),
    )
    var_num = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(dec)
    m = m.where((F.col("n") >= 2) & (var_num > 0))
    nd = F.col("n").cast("double")
    var = var_num.cast("double") / (nd * nd)
    # third central moment via divided double moments (m3 - 3 m1 m2 +
    # 2 m1^3), NOT the exact-integer n^2 s3 - 3 n s2 s1 + 2 s1^3: the
    # s1^3 term is decimal(38,0)-capped in Spark (silent NULL on
    # overflow under non-ANSI) vs HUGEINT in DuckDB (hard error), so at
    # |s1| beyond ~4.6e12 the engines would diverge silently. Dividing
    # by n first keeps every intermediate near the data's magnitude;
    # the oracle mirrors the expression term-for-term.
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    m3 = F.col("s3").cast("double") / nd
    cm3 = m3 - F.lit(3) * m1 * m2 + F.lit(2) * m1 * m1 * m1
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("s1").cast("double") / F.col("n") / 100.0, 6).alias(
            "mean_value"
        ),
        F.round(F.sqrt(var) / 100.0, 6).alias("std_value"),
        F.round(cm3 / F.pow(var, 1.5), 6).alias("skewness"),
    )


@query(
    "signup_to_purchase_latency",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'signup' THEN ts END) OVER (
                   PARTITION BY user_id
               ) AS st
        FROM events
        WHERE event_type IN ('signup', 'purchase')
    ),
    per_user AS (
        SELECT user_id, max(st) AS st,
               min(CASE WHEN event_type = 'purchase' AND ts >= st
                        THEN ts END) AS pt
        FROM ev GROUP BY user_id
    ),
    lat AS (
        SELECT st,
               CASE WHEN pt IS NOT NULL
                    THEN (epoch_us(pt) - epoch_us(st)) // 60000000
               END AS mins
        FROM per_user WHERE st IS NOT NULL
    )
    SELECT count(st) AS n_signup_users,
           count(mins) AS n_converted,
           round(count(mins) * 1.0 / count(st), 6) AS conversion_rate,
           CAST(round(quantile_cont(mins, 0.5)) AS BIGINT) AS p50_min,
           CAST(round(quantile_cont(mins, 0.9)) AS BIGINT) AS p90_min
    FROM lat
    """,
)
def signup_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT: each user's first signup to their first purchase
    AT OR AFTER it — the activation-latency metric growth teams watch
    next to the step-count funnel (purchase_conversion_funnel says how
    many convert; this says how fast). Latencies floor-divide exact
    epoch micros to integer minutes; the two quantiles interpolate over
    integers then re-round to BIGINT; the conversion rate is a ratio of
    exact counts. Plan: one type-filtered scan feeding a per-user
    window (the signup anchor) and a per-user aggregate, then one
    scalar rollup — the fact subtree is evaluated exactly once."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    # single pass: the signup anchor is a per-user window over the
    # type-filtered scan, so the fact subtree is evaluated once (the
    # aggregate-then-join formulation re-derived it per consumer —
    # plan-audit lead); user window + user aggregate + one scalar rollup.
    w_u = Window.partitionBy("user_id")
    ev = e.where(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        .over(w_u)
        .alias("st"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("st").alias("st"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("st")),
                F.col("ts"),
            )
        ).alias("pt"),
    )
    lat = per_user.where(F.col("st").isNotNull()).select(
        "st",
        F.when(
            F.col("pt").isNotNull(),
            F.expr("(unix_micros(pt) - unix_micros(st)) div 60000000"),
        ).alias("mins"),
    )
    return lat.agg(
        F.count("st").alias("n_signup_users"),
        F.count("mins").alias("n_converted"),
        F.round(F.count("mins") * 1.0 / F.count("st"), 6).alias(
            "conversion_rate"
        ),
        F.round(F.percentile("mins", F.lit(0.5)))
        .cast("bigint")
        .alias("p50_min"),
        F.round(F.percentile("mins", F.lit(0.9)))
        .cast("bigint")
        .alias("p90_min"),
    )


SESSION_GAP_US = SESSION_GAP_S * 1_000_000  # the engine's session gap


# Shared by peak_concurrency (global-window calibration baseline) and
# peak_concurrency_partitioned (the scale path): identical semantics, so
# one oracle certifies both plans.
_PEAK_ORACLE = f"""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, epoch_us(ts) AS us, event_id,
               CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_start
        FROM seq
    ),
    sess AS (
        SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
        FROM (
            SELECT user_id, us,
                   sum(is_start) OVER (
                       PARTITION BY user_id
                       ORDER BY us ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        ) GROUP BY user_id, sid
    ),
    pts AS (
        SELECT s_us AS us, 1 AS delta, user_id, sid FROM sess
        UNION ALL
        SELECT e_us + 1, -1, user_id, sid FROM sess
    ),
    run AS (
        SELECT us, sum(delta) OVER (
                   ORDER BY us ASC, delta ASC, user_id ASC, sid ASC
                   ROWS UNBOUNDED PRECEDING
               ) AS conc
        FROM pts
    )
    SELECT CAST(max(conc) AS BIGINT) AS max_concurrent,
           CAST(min(CASE WHEN conc = (SELECT max(conc) FROM run)
                         THEN us END) // 1000000 AS BIGINT) AS at_epoch_s
    FROM run
    """


def _session_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line endpoint stream over gap sessions: (us, delta, user_id,
    sid) with +1 at each session start and -1 just after its end. Shared
    by the global-window peak and the day-partitioned scale variant.

    sid assignment uses the SAME total order that derived is_start
    ((ts, event_id)) — ordering by us alone would make session endpoints
    tie-order-dependent on duplicate (user_id, ts) rows. Both endpoints
    explode out of each session ROW (a union of two selects would
    re-derive the whole sessionization subtree per branch — plan-audit
    lead; the explode keeps it one evaluation)."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    marked = seq.select(
        "user_id",
        "us",
        "event_id",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        marked.withColumn("sid", F.sum("is_start").over(w_run))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
    )
    return sess.select(
        "user_id",
        "sid",
        F.explode(
            F.array(
                F.struct(
                    F.col("s_us").alias("us"), F.lit(1).alias("delta")
                ),
                F.struct(
                    (F.col("e_us") + 1).alias("us"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select(
        F.col("e.us").alias("us"),
        F.col("e.delta").alias("delta"),
        "user_id",
        "sid",
    )


@query("peak_concurrency", oracle=_PEAK_ORACLE)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENT SESSIONS — the capacity-planning scalar (the max
    of the sweep line over session intervals: +1 at each session start,
    -1 just after its end, running sum, take the max and the first
    instant it is reached). Sessions are the engine's standard gap
    sessionization (user_sessions' 1 h gap); interval endpoints are exact integer
    micros and the sweep order (us, delta, user_id, sid) is total, with
    ends sorting before starts at the same instant via delta ASC — so
    back-to-back sessions never double-count. The running sum is an
    ordered GLOBAL window: the endpoint stream is session-bounded (two
    rows per session, orders of magnitude below event volume), which is
    what makes a single-partition pass acceptable for a scalar
    diagnostic; peak_concurrency_partitioned is the day-partitioned
    scale path certified against this same oracle, and this global
    sweep is its calibration baseline (the mutual-kNN pattern).
    Output: the peak and the epoch-second it is first reached."""
    from pyspark.sql import Window

    pts = _session_endpoints(spark, sf_dir)
    w_sweep = Window.orderBy(
        F.col("us").asc(),
        F.col("delta").asc(),
        F.col("user_id").asc(),
        F.col("sid").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = pts.select("us", F.sum("delta").over(w_sweep).alias("conc"))
    mx = run.agg(F.max("conc").alias("max_concurrent"))
    return (
        run.join(F.broadcast(mx), run.conc == mx.max_concurrent)
        .agg(
            F.min("max_concurrent").cast("bigint").alias("max_concurrent"),
            F.expr("min(us) div 1000000").cast("bigint").alias("at_epoch_s"),
        )
    )


@query("peak_concurrency_partitioned", oracle=_PEAK_ORACLE)
def peak_concurrency_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PEAK CONCURRENCY, the 100 TB shape: the sweep line partitioned by
    DAY with a boundary-count carry-forward — identical semantics to
    peak_concurrency (same oracle certifies both), but no data-sized
    single-partition window anywhere.

    Why it is exact: day = us div 86_400_000_000 is monotone in us, so
    the global endpoint order (us, delta, user_id, sid) is the
    concatenation of the per-day orders — the within-day running sum
    plus the sum of all PRIOR days' deltas (the carry) equals the global
    prefix sum at every endpoint. The carry table is one row per
    calendar day (bounded by the calendar, not the data): a per-day
    groupBy, an exclusive running sum over those few rows (the only
    unpartitioned window, deliberately calendar-bounded), and a
    broadcast join back onto the endpoint stream. Per-day sweeps run in
    parallel across the cluster; endpoint volume per partition is
    session-bounded per day."""
    from pyspark.sql import Window

    day_us = 86_400_000_000
    pts = _session_endpoints(spark, sf_dir).withColumn(
        "day", F.expr(f"us div {day_us}")
    # consumed by the carry totals AND the sweep (plan_audit lead, r10)
    ).localCheckpoint(eager=False)
    day_tot = pts.groupBy("day").agg(F.sum("delta").alias("tot"))
    w_days = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = day_tot.select(
        "day", F.coalesce(F.sum("tot").over(w_days), F.lit(0)).alias("carry")
    )
    w_day_sweep = (
        Window.partitionBy("day")
        .orderBy(
            F.col("us").asc(),
            F.col("delta").asc(),
            F.col("user_id").asc(),
            F.col("sid").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("in_day", F.sum("delta").over(w_day_sweep)).join(
        F.broadcast(carry), "day"
    ).select(
        "us", (F.col("in_day") + F.col("carry")).alias("conc")
    ).localCheckpoint(eager=False)  # consumed by the max AND the argmax join
    mx = run.agg(F.max("conc").alias("max_concurrent"))
    return (
        run.join(F.broadcast(mx), run.conc == mx.max_concurrent)
        .agg(
            F.min("max_concurrent").cast("bigint").alias("max_concurrent"),
            F.expr("min(us) div 1000000").cast("bigint").alias("at_epoch_s"),
        )
    )


@query(
    "weekend_value_lift",
    oracle="""
    WITH vm AS (
        SELECT event_type,
               CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS we,
               CAST(round(value * 1e6) AS BIGINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type,
               sum(we) AS n_weekend,
               count(*) - sum(we) AS n_weekday,
               sum(CASE WHEN we = 1 THEN CAST(v AS HUGEINT) ELSE 0 END)
                   AS s_we,
               sum(CASE WHEN we = 0 THEN CAST(v AS HUGEINT) ELSE 0 END)
                   AS s_wd
        FROM vm GROUP BY event_type
        HAVING sum(we) >= 1 AND count(*) - sum(we) >= 1
           AND sum(CASE WHEN we = 0 THEN CAST(v AS HUGEINT) ELSE 0 END) > 0
    )
    SELECT event_type,
           CAST(n_weekend AS BIGINT) AS n_weekend,
           CAST(n_weekday AS BIGINT) AS n_weekday,
           round(CAST(s_we AS DOUBLE) / n_weekend / 1e6, 6)
               AS weekend_avg,
           round(CAST(s_wd AS DOUBLE) / n_weekday / 1e6, 6)
               AS weekday_avg,
           round((CAST(s_we AS DOUBLE) / n_weekend)
                 / (CAST(s_wd AS DOUBLE) / n_weekday), 6) AS lift
    FROM m
    """,
)
def weekend_value_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday VALUE LIFT per event type — the seasonality
    split every revenue dashboard carries (the dow/hour heatmap shows
    the full surface; this is its one-number summary with the averages
    that produced it). Weekend is ISO Saturday/Sunday, expressed with
    each engine's own calendar function mapped to the same predicate
    (isodow >= 6 in DuckDB, weekday >= 5 in Spark — both Monday-based).
    Micro-quantized conditional sums are exact integers; averages and
    the lift are mirrored double divisions rounded at 6dp; degenerate
    types (either side empty, or zero weekday mass) gate out on both
    engines. One map-side-combined aggregate: a single fact pass."""
    e = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    vm = e.select(
        "event_type",
        F.when(F.expr("weekday(ts)") >= 5, 1).otherwise(0).alias("we"),
        F.round(F.col("value") * 1e6).cast("long").alias("v"),
    )
    vd = F.col("v").cast(dec)
    m = vm.groupBy("event_type").agg(
        F.sum("we").alias("n_weekend"),
        (F.count(F.lit(1)) - F.sum("we")).alias("n_weekday"),
        F.sum(F.when(F.col("we") == 1, vd).otherwise(F.lit(0).cast(dec))).alias(
            "s_we"
        ),
        F.sum(F.when(F.col("we") == 0, vd).otherwise(F.lit(0).cast(dec))).alias(
            "s_wd"
        ),
    )
    m = m.where(
        (F.col("n_weekend") >= 1)
        & (F.col("n_weekday") >= 1)
        & (F.col("s_wd") > 0)
    )
    we_avg = F.col("s_we").cast("double") / F.col("n_weekend")
    wd_avg = F.col("s_wd").cast("double") / F.col("n_weekday")
    return m.select(
        "event_type",
        F.col("n_weekend").cast("bigint").alias("n_weekend"),
        F.col("n_weekday").cast("bigint").alias("n_weekday"),
        F.round(we_avg / 1e6, 6).alias("weekend_avg"),
        F.round(wd_avg / 1e6, 6).alias("weekday_avg"),
        F.round(we_avg / wd_avg, 6).alias("lift"),
    )
