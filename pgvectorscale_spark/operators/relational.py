"""Relational surface queries over the driver's star schema.

The reference implements no relational operators — Postgres supplies
scan/filter/join/aggregate/sort around the index (SURVEY.md §2.7). In the
Spark rebuild those come from DataFrame/Catalyst directly; these queries are
the proof: scan+filter+agg (pricing summary), multi-way broadcast join
(top customers), and time-window aggregation (events rollup).

Float discipline for cross-engine parity: money is floored to integer cents
*per row* (float64 ops are per-row deterministic and identical across
engines), then summed exactly as bigints — a float sum over 600k rows is
association-order-dependent and would hash-mismatch, an integer sum cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pricing_summary", "top_customers", "events_hourly"]


def _cents(col) -> F.Column:
    return F.floor(col * 100).cast("long")


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1 shape: scan → filter → groupBy agg with map-side partial agg.

    One shuffle of (4 groups × partials); the filter and the 7-column
    projection push into the parquet scan.
    """
    li = lineitem.filter(F.col("l_shipdate") < F.lit(ship_before))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_summary_sql(ship_before: str = "1998-09-01") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
       sum(floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS sum_disc_cents,
       sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)::BIGINT)::BIGINT AS sum_charge_cents,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate < TIMESTAMP '{ship_before} 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def top_customers(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, k: int = 10
) -> DataFrame:
    """Revenue per customer with nation name: fact ⋈ two broadcast dims.

    customer and nation are dimension tables — broadcast both so the only
    shuffle is the groupBy on o_custkey (and AQE coalesces it).
    """
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
            F.count("*").alias("order_count"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def top_customers_sql(k: int = 10) -> str:
    return f"""
SELECT c_custkey, c_name, n_name,
       sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents,
       count(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey LIMIT {k}
"""


def ts_epoch_seconds(events: DataFrame, ts_col: str = "ts"):
    """Epoch seconds (bigint) from the events timestamp, whatever layout the
    driver generated: TIMESTAMP(NANOS) read as raw longs
    (spark.sql.legacy.parquet.nanosAsLong) or a native timestamp[us]/ntz
    column. Integer `div` throughout — float division would lose precision
    at 1e18 ns, and truncation matches DuckDB's floor(epoch(ts)) for the
    post-1970 driver data. Session timezone is UTC (session.get_spark), so
    the NTZ cast matches DuckDB's naive epoch()."""
    if dict(events.dtypes)[ts_col] == "bigint":  # nanos-as-long read path
        return F.expr(f"{ts_col} div 1000000000")
    return F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 1000000")


def events_hourly(events: DataFrame) -> DataFrame:
    """Per-type hourly rollup — the batch shape of a streaming windowed agg.

    Hour emitted as epoch seconds (bigint) so the value is engine- and
    timezone-representation independent.

    The driver's events parquet stores TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (see load_events) and this
    operator truncates the long nanos to the hour with integer arithmetic —
    same values as DuckDB's native ns-timestamp date_trunc.
    """
    if dict(events.dtypes)["ts"] == "bigint":  # nanos-as-long read path
        # `div` = exact long division; float `/` would lose precision at 1e18 ns
        hour = F.expr("ts div 3600000000000") * F.lit(3600)
    else:
        hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long")
    return (
        events.withColumn("hour_epoch", hour)
        .groupBy("event_type", "hour_epoch")
        .agg(
            F.count("*").alias("event_count"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .orderBy("event_type", "hour_epoch")
    )


def events_hourly_sql() -> str:
    return """
SELECT event_type,
       epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
       count(*) AS event_count,
       sum(floor(value * 100)::BIGINT)::BIGINT AS value_cents
FROM events GROUP BY event_type, hour_epoch ORDER BY event_type, hour_epoch
"""


def merge_hourly_rollup(
    state: DataFrame, new_events: DataFrame, min_hour_epoch: int | None = None
) -> DataFrame:
    """Incrementally maintain the ``events_hourly`` rollup — the
    continuous-aggregate refresh of the hypertable world (TimescaleDB's
    flagship pattern, the platform the reference extension ships on):
    instead of re-aggregating history, aggregate ONLY the new batch and
    merge its partials into the stored rollup. count and cents-sum are
    commutative monoids, so ``fold(merge, batches) == events_hourly(all
    events)`` for ANY split of the stream into batches — the driver
    oracle verifies exactly that identity.

    ``min_hour_epoch`` is the refresh watermark: late rows landing in
    buckets before it are DROPPED (the closed-bucket policy of a
    watermarked streaming agg); pass None to accept arbitrarily late
    data.

    Scale shape: the batch is pre-aggregated map-side to (type, hour)
    partials before it meets the state, so the merge join moves rollup-
    sized rows (buckets x types), never event-sized ones; the state
    never gets re-scanned per refresh."""
    delta = events_hourly(new_events)
    if min_hour_epoch is not None:
        delta = delta.filter(F.col("hour_epoch") >= int(min_hour_epoch))
    keys = ["event_type", "hour_epoch"]
    s = state.select(
        *keys,
        F.col("event_count").alias("_c1"),
        F.col("value_cents").alias("_v1"),
    )
    d = delta.select(
        *keys,
        F.col("event_count").alias("_c2"),
        F.col("value_cents").alias("_v2"),
    )
    # no orderBy here: refreshes fold, and a per-fold global sort would be
    # paid N times for presentation order only the final reader needs
    return s.join(d, keys, "full_outer").select(
        *keys,
        (F.coalesce("_c1", F.lit(0)) + F.coalesce("_c2", F.lit(0))).alias(
            "event_count"
        ),
        (F.coalesce("_v1", F.lit(0)) + F.coalesce("_v2", F.lit(0))).alias(
            "value_cents"
        ),
    )


def empty_hourly_rollup(spark) -> DataFrame:
    """The merge identity: a zero-row rollup with the exact schema."""
    return spark.createDataFrame(
        [], "event_type string, hour_epoch long, event_count long, value_cents long"
    )


def events_json_rollup(events: DataFrame) -> DataFrame:
    """JSON column surface: extract props.k, aggregate per event_type.

    ``get_json_object`` is JVM-side (Jackson); the extraction and the cast
    stay inside whole-stage codegen — no UDF for semi-structured columns.
    """
    return (
        events.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def events_json_rollup_sql() -> str:
    return """
SELECT event_type,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_sum,
       min(json_extract(props, '$.k')::BIGINT) AS k_min,
       max(json_extract(props, '$.k')::BIGINT) AS k_max,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list | None = None,
    right_tiebreak: str | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` / kdb ``aj`` semantics): for
    each left row, attach the single right row of the same ``on`` key
    with the greatest ``right_ts`` at-or-before ``left_ts``
    (``direction="backward"``, the default — "attribute each click to
    the latest preceding view") or the smallest ``right_ts`` at-or-after
    (``direction="forward"`` — "the next view after each click").
    Matched right columns come back NULL when no right row qualifies (or
    when the match is further than ``tolerance`` time units away).

    Spark-first shape: NOT a range join (which Catalyst would plan as a
    per-key cartesian with a filter) and not a per-key loop — the two
    inputs are tagged and unioned, and one per-key window ordered by
    (ts, side, tiebreak) takes ``last(payload, ignorenulls=True)`` over
    the running frame: right rows at the same timestamp sort BEFORE left
    rows (at-or-before is inclusive), so the running last-non-null right
    payload AT each left row IS its as-of match. ONE shuffle on the key,
    O(1) window state per row, no row-pair blowup at any key skew —
    survives a 100x scale-up where the range-join formulation quadratics
    on hot keys.

    Ties among right rows at the same (key, ts) resolve to the LARGEST
    ``right_tiebreak`` backward / the SMALLEST forward (required when
    right timestamps can collide, for engine-reproducible output).
    ``value_cols`` defaults to every right column except the key and
    timestamp. The forward form is the same window over the REVERSED
    timestamp order — right rows still sort before left rows at equal
    timestamps, keeping the boundary inclusive."""
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    payload = F.struct(
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c) for c in value_cols],
    )
    payload_type = right.select(payload.alias("_p")).schema[0].dataType
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    r_tagged = right.select(
        F.col(on).alias(on),
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        payload.alias("_p"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias(on),
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    backward = direction == "backward"
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("_ts").asc() if backward else F.col("_ts").desc(),
            F.col("_side").asc(),
            F.col("_tb").asc() if backward else F.col("_tb").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_match", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        age = (
            F.col("_ts") - F.col("_match._rts")
            if backward
            else F.col("_match._rts") - F.col("_ts")
        )
        matched = matched.withColumn(
            "_match",
            F.when(age <= F.lit(int(tolerance)), F.col("_match")),
        )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols += [F.col("_match._rts").alias(f"{right_ts}_matched")]
    out_cols += [F.col(f"_match.{c}").alias(c + "_matched") for c in value_cols]
    return matched.select(*out_cols)


def as_of_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list | None = None,
    right_tiebreak: str | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Skew-robust twin of :func:`as_of_join` — identical output for
    every input (pytest parity on a pathological hot-key fixture), but
    a bot/service key with 10^8 rows no longer serializes through one
    window task. Same two-phase shape the repo uses for sessionize and
    per-key top-k:

    - **Phase 1** runs the tagged running-``last`` window partitioned by
      (key, TIME CHUNK): a hot key fans out across (key span /
      ``chunk_seconds``) tasks. A within-chunk match, when present, IS
      the global match — any right row in an earlier chunk is strictly
      older (equal timestamps share a chunk by construction, so the
      side/tiebreak ordering never crosses chunks).
    - **Phase 2** fills the rows phase 1 left unmatched from CHUNK-LEVEL
      rows only: per (key, chunk) the last right payload (``max_by`` on
      (ts, tiebreak) — one row per chunk, not per event), then an
      exclusive running ``last`` over chunk order gives each chunk its
      carry-in — the match any unmatched left row in that chunk
      inherits. The second window's per-key row count is the key's
      CHUNK count, bounded by active time, not event rate.

    ``direction="forward"`` mirrors everything (min_by, descending chunk
    order), exactly as the base operator mirrors its window."""
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if chunk_seconds <= 0:
        raise ValueError(f"chunk_seconds must be positive, got {chunk_seconds}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    payload = F.struct(
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c) for c in value_cols],
    )
    payload_type = right.select(payload.alias("_p")).schema[0].dataType
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    r_tagged = right.select(
        F.col(on).alias(on),
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        payload.alias("_p"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias(on),
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    backward = direction == "backward"
    u = r_tagged.unionByName(l_tagged).withColumn(
        "_chunk", F.floor(F.col("_ts") / F.lit(int(chunk_seconds))).cast("long")
    )
    w1 = (
        Window.partitionBy(on, "_chunk")
        .orderBy(
            F.col("_ts").asc() if backward else F.col("_ts").desc(),
            F.col("_side").asc(),
            F.col("_tb").asc() if backward else F.col("_tb").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched1 = u.withColumn("_m1", F.last("_p", ignorenulls=True).over(w1)).filter(
        F.col("_side") == 1
    )
    # chunk-level carry: one row per (key, chunk) present on EITHER side,
    # carrying that chunk's last (backward) / first (forward) right
    # payload — or null when the chunk has no right rows
    pick = F.max_by if backward else F.min_by
    chunk_rows = u.groupBy(on, "_chunk").agg(
        pick(
            F.when(F.col("_side") == 0, F.col("_p")),
            F.when(F.col("_side") == 0, F.struct(F.col("_ts"), F.col("_tb"))),
        ).alias("_cp")
    )
    wc = (
        Window.partitionBy(on)
        .orderBy(F.col("_chunk").asc() if backward else F.col("_chunk").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = chunk_rows.withColumn(
        "_carry", F.last("_cp", ignorenulls=True).over(wc)
    ).select(on, "_chunk", "_carry")
    matched = matched1.join(carry, [on, "_chunk"], "left").withColumn(
        "_match", F.coalesce(F.col("_m1"), F.col("_carry"))
    )
    if tolerance is not None:
        age = (
            F.col("_ts") - F.col("_match._rts")
            if backward
            else F.col("_match._rts") - F.col("_ts")
        )
        matched = matched.withColumn(
            "_match",
            F.when(age <= F.lit(int(tolerance)), F.col("_match")),
        )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols += [F.col("_match._rts").alias(f"{right_ts}_matched")]
    out_cols += [F.col(f"_match.{c}").alias(c + "_matched") for c in value_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int = 0,
    upper: int = 0,
    value_cols: list | None = None,
) -> DataFrame:
    """Interval range join: every (left, right) pair of the same ``on``
    key with ``right_ts - left_ts`` in [``lower``, ``upper``] — "all
    views within ±10 minutes of each click".

    Spark-first shape: a raw ``l.ts BETWEEN r.ts - u AND r.ts - l``
    predicate plans as an equi-join on the key with the range as a
    post-filter — a per-key cartesian that quadratics on hot keys.
    Instead, band the time axis: each right row lands in ONE bucket of
    width (upper - lower + 1); a left row's admissible window spans at
    most TWO consecutive buckets, so it probes exactly those (an explode
    of <= 2 rows), the join becomes an equi-join on (key, bucket), and
    the exact bounds filter runs on the already-narrowed pairs. Each
    matching pair is produced exactly once (right's bucket is unique).
    Hot keys split across time buckets, so skew is bounded by the window
    width, not the key's row count.

    ``value_cols`` (default: all right columns except key and timestamp)
    come back suffixed ``_matched`` alongside every left column."""
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    width = int(upper - lower + 1)
    r2 = right.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).cast("long").alias("_rts"),
        F.floor(F.col(right_ts).cast("long") / width).alias("_b"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    lo_b = F.floor((F.col(left_ts).cast("long") + lower) / width)
    hi_b = F.floor((F.col(left_ts).cast("long") + upper) / width)
    l2 = left.withColumn("_b", F.explode(F.array_distinct(F.array(lo_b, hi_b))))
    joined = l2.join(
        r2, (l2[on] == r2["_rk"]) & (l2["_b"] == r2["_b"]), "inner"
    ).filter(
        (F.col("_rts") - F.col(left_ts).cast("long") >= lower)
        & (F.col("_rts") - F.col(left_ts).cast("long") <= upper)
    )
    return joined.select(
        *[l2[c] for c in left.columns],
        F.col("_rts").alias(f"{right_ts}_matched"),
        *[F.col(f"_v_{c}").alias(f"{c}_matched") for c in value_cols],
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window-function surface: rank orders per customer, keep the top k.

    row_number over (custkey, totalprice desc) — one hash-partitioned window,
    ties broken by orderkey for cross-engine determinism.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


def top_orders_per_customer_salted(
    orders: DataFrame, k: int = 3, salt_buckets: int = 16
) -> DataFrame:
    """Skew-robust twin of ``top_orders_per_customer``: a customer holding
    a disproportionate share of orders (marketplace aggregator, bot
    account) makes the plain per-key window one straggler task. Two-phase
    top-k instead: phase 1 ranks within (custkey, SALT) — a deterministic
    hash of the order id splitting the hot key across ``salt_buckets``
    tasks — and keeps k per salted group, so phase 2's per-key window
    ranks at most ``salt_buckets * k`` rows per customer regardless of the
    key's true row count. Identical output to the plain form for every
    input: the global top k per key survives every per-salt top k
    (each kept list is a superset of its salt's contribution to the
    global top k). Pytest parity on a pathological fixture."""
    from pyspark.sql import Window

    salted = orders.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(int(salt_buckets))).cast("int")
    )
    w1 = Window.partitionBy("o_custkey", "_salt").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    survivors = salted.withColumn("_rn1", F.row_number().over(w1)).filter(
        F.col("_rn1") <= k
    )
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w2).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


def top_orders_per_customer_sql(k: int = 3) -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       floor(o_totalprice * 100)::BIGINT AS price_cents,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders QUALIFY rn <= {k} ORDER BY o_custkey, rn
"""
