"""Relational operator coverage over the TPC-H-ish tables (SURVEY §2.2,
§2.5, §2.6, §2.7): filters/projections, group-by aggregation, broadcast
star joins, top-k, deterministic sampling, windowed rolling aggregates.

Float-safety rule for oracles: per-row double arithmetic is IEEE-identical
across engines; only SUM accumulation order varies. So every double that
feeds a SUM is cast to decimal(18,4) first (exact, order-independent) and
the final sum is cast back to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg.ids import id64

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-flavored aggregation over lineitem.

    Money arithmetic is done entirely in decimal: only the RAW columns are
    cast double->decimal (safe: raw values are exact at 4dp, so Spark's
    shortest-string cast and DuckDB's exact-scaling cast agree), and the
    products are exact decimal x decimal — no double product is ever cast
    to decimal, which is where Spark (HALF_UP on shortest repr) and DuckDB
    (exact binary scaling) round differently (round-1 sum_charge bug).
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    ep = F.col("l_extendedprice").cast("decimal(12,4)")
    disc_f = (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")).cast("decimal(6,4)")
    tax_f = (F.lit(1) + F.col("l_tax").cast("decimal(6,4)")).cast("decimal(6,4)")
    disc_price = ep * disc_f          # decimal(19,8), exact
    charge = disc_price * tax_f       # decimal(26,12), exact
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS decimal(18,4))) AS double) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS decimal(12,4))) AS double) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS decimal(12,4))
                * CAST(1 - CAST(l_discount AS decimal(6,4)) AS decimal(6,4))) AS double)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS decimal(12,4))
                * CAST(1 - CAST(l_discount AS decimal(6,4)) AS decimal(6,4))
                * CAST(1 + CAST(l_tax AS decimal(6,4)) AS decimal(6,4))) AS double)
         AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: orders ⋈ customer ⋈ nation, dims broadcast."""
    orders = _t(spark, sf_dir, "orders")
    customer = F.broadcast(_t(spark, sf_dir, "customer"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def revenue_by_nation_sql() -> str:
    return """
SELECT n_name,
       CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k customers by order revenue (K1 analog), deterministic ties.

    Plan shape: ``orderBy().limit(k)`` = TakeOrderedAndProject (parallel
    per-partition partial top-k, k rows to the driver-side merge), NOT a
    global un-partitioned Window, which would move every aggregated row to
    a single task. The rank column is derived AFTER the limit, over the
    k-row result — that residual window touches a constant k rows at any
    data scale.
    """
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue")
    )
    topk = rev.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(k)
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("o_custkey").alias("custkey"), "revenue", "rank"
    )


def top_customers_sql(k: int = 10) -> str:
    return f"""
SELECT custkey, revenue, rank FROM (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) AS revenue,
         row_number() OVER (
           ORDER BY CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) DESC,
                    o_custkey ASC) AS rank
  FROM orders GROUP BY o_custkey
) WHERE rank <= {k}"""


def sampled_orders(spark: SparkSession, sf_dir: str, pct: int = 5) -> DataFrame:
    """K2 analog: deterministic hash sample (pandas seed-42 sampling is not
    reproducible in Spark — SURVEY §7.4.3 — so sampling is md5-hash-based
    and therefore identical in any engine)."""
    orders = _t(spark, sf_dir, "orders")
    h = F.pmod(id64(F.col("o_orderkey").cast("string")), F.lit(100))
    return orders.filter(h < pct).select("o_orderkey", "o_custkey", "o_totalprice")


def sampled_orders_sql(pct: int = 5) -> str:
    return f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE (('0x' || substr(md5(o_orderkey::varchar), 1, 15))::bigint) % 100 < {pct}"""


def events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 analog: per-user rolling mean of the last 3 event values
    (ordered by ts, event_id). Frame order is fully deterministic, so the
    in-frame double sum is identical across engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("rolling_avg"),
    )


def events_rolling_sql() -> str:
    return """
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
FROM events"""


def event_type_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 analog: histogram with a having filter."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .filter(F.col("n") > 0)
    )


def event_type_hist_sql() -> str:
    return """
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type HAVING count(*) > 0"""


BIG_ORDER = 300_000.0


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (set-difference shape the reference lacks entirely):
    customers who never placed a large order, with their nation. (Every
    customer has SOME order in this corpus, so the anti join is against
    the large-order subset to keep the result non-trivial.)"""
    customer = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        customer.join(
            big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
        )
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name")
    )


def customers_without_orders_sql() -> str:
    return f"""
SELECT c_custkey, c_name, n_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > {BIG_ORDER}
)"""


def suppliers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: suppliers whose parts appear in any lineitem."""
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return supplier.join(
        li, supplier.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def suppliers_with_orders_sql() -> str:
    return """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream — the canonical
    training-data-pipeline windowing op the reference lacks (its closest
    analog is the rolling latency window, ``api/main.py:66-77``). A new
    session starts when a user is idle > 30 min; per-session rollup.

    Scale shape: everything is a PARTITIONED window on user_id (shuffle
    once on the user key, no global ordering anywhere) + one groupBy on
    (user_id, session_seq) that reuses the same partitioning. Gap math is
    exact int64 microseconds (identical in Spark/DuckDB).
    Output (user_id, session_seq, n_events, start_ts, end_ts,
    duration_us, total_value).
    """
    return sessionize_df(_t(spark, sf_dir, "events"))


def sessionize_df(ev: DataFrame) -> DataFrame:
    """Sessionize any (user_id, event_id, ts, value) frame — see
    :func:`sessionize` for semantics and scale notes."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session TZ is pinned UTC, so the cast interprets
    # naive == UTC — exactly DuckDB's epoch_us on a naive timestamp
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_s = (
        prev_us.isNull() | ((us - prev_us) > SESSION_GAP_US)
    ).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.select(
        "user_id", "ts", "event_id", "value", us.alias("us"), new_s.alias("new_s")
    )
    sess = flagged.withColumn("session_seq", F.sum("new_s").over(run))
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


def sessionize_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM e
),
sess AS (
  -- CAST: DuckDB's windowed sum(int) returns HUGEINT, which pandas turns
  -- into float64 — the driver's value-hash is dtype-representation-
  -- sensitive ("4.0" != "4"), so pin the oracle to int64 like Spark
  SELECT *, CAST(sum(new_s) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       max(us) - min(us) AS duration_us,
       CAST(sum(CAST(value AS decimal(18,4))) AS double) AS total_value
FROM sess GROUP BY user_id, session_seq"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type (the
    distribution-profiling agg a data-quality pass needs). Exact
    ``percentile`` (sort-based) rather than approx sketches so the DuckDB
    ``quantile_cont`` oracle matches bit-for-bit; at 100 TB swap in
    ``approx_percentile`` (t-digest, no global sort) where 4-dp exactness
    isn't contractual. Output (event_type, p50, p95)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
    )


def value_percentiles_sql() -> str:
    return """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY event_type"""


def value_percentiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10_000
) -> DataFrame:
    """The 100 TB twin of :func:`value_percentiles`: ``approx_percentile``
    (Greenwald-Khanna sketch — constant memory per group, partial-merge
    aggregation, NO per-group sort), where 4-dp exactness isn't
    contractual. At accuracy=10000 the rank error bound is 1/accuracy =
    0.01% of rows per group, so small groups come out exact. No DuckDB
    bit-exact oracle exists for sketch internals — equality-within-
    tolerance vs the exact operator is pinned in
    tests/test_ops.py::test_value_percentiles_approx_matches_exact, and
    the driver records the rows-only check. Output (event_type, p50, p95).
    """
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(
            F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)), 4
        ).alias("p50"),
        F.round(
            F.percentile_approx("value", F.lit(0.95), F.lit(accuracy)), 4
        ).alias("p95"),
    )


def filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F5 analog: required-field + length-bounds filter and derived
    projection over documents."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.filter(
            F.col("text").isNotNull()
            & (F.length("text") >= 100)
            & (F.length("text") <= 10000)
        )
        .select(
            "doc_id",
            F.length("text").alias("text_length"),
            F.lit(True).alias("has_full_data"),
            F.concat(F.col("source"), F.lit(":"), F.col("lang")).alias("source_lang"),
        )
    )


def filter_projection_sql() -> str:
    return """
SELECT doc_id,
       CAST(length(text) AS int) AS text_length,
       TRUE AS has_full_data,
       source || ':' || lang AS source_lang
FROM documents
WHERE text IS NOT NULL AND length(text) BETWEEN 100 AND 10000"""


# ---------------------------------------------------------------------------
# Round-5 additions: the two classic "Spark lacks the primitive" joins
# (as-of, interval/range) re-expressed as scale-safe compositions, plus a
# ROLLUP hierarchy aggregate. Reference analog: the query layer's
# time-scoped lookups (api/query_engine.py's filtered search paths); the
# compositions themselves are the standard Spark-first designs.
# ---------------------------------------------------------------------------

INCIDENT_WINDOW_US = 600_000_000  # 10-minute incident windows (microseconds)


def asof_purchase_error(
    spark: SparkSession, sf_dir: str, how: str = "inner"
) -> DataFrame:
    """As-of join: for every purchase event, attach the most recent error
    event by the same user at-or-before the purchase timestamp.

    ``how='inner'`` (the contract form) keeps only purchases that HAVE a
    prior error; ``how='left'`` keeps all purchases with nullable asof
    columns. The contract pins the inner form deliberately: a nullable
    TIMESTAMP output column is a hash-representation hazard (pandas
    compares datetime64[ns] vs DuckDB's datetime64[us] by raw int64 when
    NaT is present, so even value-identical frames mismatch — the same
    class of drift scripts/check_contract.py::dtype_repr_findings guards
    for decimals).

    Spark has no ASOF JOIN primitive; the naive formulation (theta-join on
    ``p.ts >= e.ts`` + argmax) degenerates to BroadcastNestedLoopJoin.
    Scale-safe composition instead: tag both sides, UNION, and run ONE
    running window over (user_id ordered by ts, side) taking
    ``last(error_cols, ignorenulls)`` — a single shuffle on user_id,
    linear per-partition work, no range explosion, and the running frame
    is evaluated incrementally. Per-user skew is bounded by events/user;
    at 100 TB a hot user would be range-partitioned by (user_id, ts-day)
    with per-day boundary seeds, same shape as the sessionize note.

    Determinism: the error side is pre-deduped per (user_id, ts) keeping
    the max-event_id row, so "at-or-before" has a unique winner in both
    engines (DuckDB ASOF leaves equal-key ties unspecified otherwise).
    Errors sort BEFORE purchases at equal ts (side 0 < 1) to match the
    oracle's inclusive ``p.ts >= e.ts``.

    Oracle: DuckDB's native ASOF LEFT JOIN.
    Output (event_id, user_id, ts, value, asof_error_ts, asof_error_value).
    """
    ev = _t(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("err_value"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    tagged = pur.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lit(1).alias("side"),
        F.lit(None).cast("double").alias("err_value"),
    ).unionByName(
        err.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("side"),
            "err_value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    err_ts = F.when(F.col("side") == 0, F.col("ts"))
    err_val = F.when(F.col("side") == 0, F.col("err_value"))
    out = (
        tagged.withColumn("asof_error_ts", F.last(err_ts, ignorenulls=True).over(w))
        .withColumn("asof_error_value", F.last(err_val, ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id", "user_id", "ts", "value", "asof_error_ts", "asof_error_value"
        )
    )
    if how == "inner":
        out = out.filter(F.col("asof_error_ts").isNotNull())
    return out


def asof_purchase_error_sql() -> str:
    return """
WITH err AS (
  SELECT user_id, ts, max_by(value, event_id) AS err_value
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
), pur AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       e.ts AS asof_error_ts, e.err_value AS asof_error_value
FROM pur p ASOF JOIN err e
  ON p.user_id = e.user_id AND p.ts >= e.ts"""


def incident_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: every error event opens a 10-minute incident
    window [ts, ts+10min); count ALL events (any user — no equi key) that
    fall inside each window, with a decimal-exact value sum.

    A pure inequality join is a BroadcastNestedLoopJoin in Spark —
    O(n*m) and a driver-memory bomb at scale. Scale-safe composition:
    bucketize time into fixed bins the size of the window, explode each
    window to the (at most 2) bins it overlaps, equi-join on bin, then
    re-check the exact range. All bin math is int64 microseconds with
    integer division (``div`` / ``//``), so Spark and DuckDB place every
    boundary event identically — no float epoch anywhere. An event lives
    in exactly ONE bin, so no (window, event) pair can match twice and no
    post-dedup is needed. The join is a plain equi-join on ``bin`` —
    shuffle-partitioned, AQE-skew-splittable; tests/test_plans.py gates
    that no BroadcastNestedLoopJoin/CartesianProduct appears.

    Oracle: the naive inequality join in DuckDB (exact at sf0.01).
    Output (incident_id, n_events, sum_value); n_events >= 1 because a
    window always contains its opening error event.
    """
    ev = _t(spark, sf_dir, "events")
    win_us = F.lit(INCIDENT_WINDOW_US)
    # ts is TIMESTAMP_NTZ; session TZ is pinned UTC, so the cast interprets
    # naive == UTC — exactly DuckDB's epoch_us on a naive timestamp
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        us.alias("w_start"),
        (us + win_us).alias("w_end"),
    )
    wbins = err.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"w_start div {INCIDENT_WINDOW_US}"),
                F.expr(f"(w_end - 1) div {INCIDENT_WINDOW_US}"),
            )
        ),
    )
    evb = ev.select(
        F.col("event_id").alias("ev_id"),
        us.alias("ev_us"),
        F.col("value").cast(DEC).alias("ev_value"),
    ).withColumn("bin", F.expr(f"ev_us div {INCIDENT_WINDOW_US}"))
    joined = wbins.join(
        evb,
        (wbins["bin"] == evb["bin"])
        & (evb["ev_us"] >= wbins["w_start"])
        & (evb["ev_us"] < wbins["w_end"]),
        "left",
    )
    zero = F.lit("0").cast(DEC)
    return joined.groupBy("incident_id").agg(
        F.count("ev_id").alias("n_events"),
        F.coalesce(F.sum("ev_value"), zero).cast("double").alias("sum_value"),
    )


def incident_window_counts_sql() -> str:
    w = INCIDENT_WINDOW_US
    return f"""
WITH err AS (
  SELECT event_id AS incident_id,
         epoch_us(ts) AS w_start,
         epoch_us(ts) + {w} AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT incident_id,
       count(e.event_id) AS n_events,
       CAST(coalesce(sum(CAST(e.value AS decimal(18,4))), 0) AS double)
         AS sum_value
FROM err LEFT JOIN events e
  ON epoch_us(e.ts) >= err.w_start AND epoch_us(e.ts) < err.w_end
GROUP BY incident_id"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region -> nation -> grand total) of order
    revenue — the hypertable-rollup-style aggregate a reporting layer
    runs. One pass: Spark expands the rollup into grouping sets with
    map-side partial aggregation; dims are broadcast so the only shuffle
    is the final agg. ``lvl`` is the standard GROUPING bit-vector
    (r_name is the high bit in both engines), disambiguating real NULLs
    from subtotal rows. Oracle: DuckDB GROUP BY ROLLUP."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select("r_name", "n_name", "lvl", "revenue", "n_orders")
    )


def revenue_rollup_sql() -> str:
    return """
SELECT r_name, n_name,
       CAST(GROUPING(r_name, n_name) AS bigint) AS lvl,
       CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)"""


STRATA_CAP = 20


def stratified_sample(
    spark: SparkSession, sf_dir: str, cap: int = STRATA_CAP
) -> DataFrame:
    """Deterministic stratified sample: at most ``cap`` events per
    event_type, chosen by md5-hash order — the per-class cap a
    training-data pipeline applies before building a balanced set (the
    hash order makes the picked rows a stable pseudo-random subset,
    reproducible in any engine; same rationale as :func:`sampled_orders`,
    SURVEY §7.4.3). Output (event_id, event_type, user_id, value,
    strata_rank).

    Scale shape: ONE shuffle on the strata key into a partitioned
    row_number window — per-partition top-cap heaps, no global sort. A
    hot class is bounded by the window's per-key sequential scan; classes
    are independent, so skew splits with the key. Tie-break on event_id
    after the hash makes the pick total-ordered and engine-identical."""
    ev = _t(spark, sf_dir, "events")
    h = id64(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.withColumn("strata_rank", F.row_number().over(w))
        .filter(F.col("strata_rank") <= cap)
        .select("event_id", "event_type", "user_id", "value", "strata_rank")
    )


def stratified_sample_sql(cap: int = STRATA_CAP) -> str:
    return f"""
SELECT event_id, event_type, user_id, value, strata_rank FROM (
  SELECT event_id, event_type, user_id, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY ('0x' || substr(md5(event_id::varchar), 1, 15))::bigint,
                    event_id) AS strata_rank
  FROM events
) WHERE strata_rank <= {cap}"""
