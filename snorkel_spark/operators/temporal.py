"""Temporal joins Spark lacks as built-ins: the as-of join.

For every left row, attach the LATEST right row with
``right.ts <= left.ts`` within the same key — the standard operator
for "state as of the event" lookups (last price before a trade, last
session attribute before a click).  Spark has no ASOF JOIN; the
classic distributed formulation is used here: union both sides with a
side marker, one window per key ordered by (ts, marker) with a
carry-forward ``last(..., ignorenulls)`` over the right side's values,
then keep the left rows.  Exactly ONE shuffle (the window's partition
by key) — no range cross-join, no per-row Python; equal timestamps
order the right side first, so a right row AT the left's timestamp is
visible (the ``>=`` convention, matching DuckDB's ``ASOF JOIN`` which
serves as the oracle).

At 100 TB scale notes: the window sorts each key's rows — fine for
event-stream keys (bounded per-user history); for mega-keys, bucket
the time axis first (join on (key, ts_bucket) + carry the bucket
boundary state) so no single key's history must sort in one task.
Right-side duplicates at the same (key, ts) make "latest" ambiguous —
pre-aggregate the right side to one row per (key, ts) before calling
(the driver query does) or accept last-in-sort nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    left_vals: tuple[str, ...] = ("value",),
    right_vals: tuple[str, ...] = ("value",),
    right_prefix: str = "r_",
) -> DataFrame:
    """(key, ts, *left_vals, r_ts, *r_<right_vals>) — inner semantics:
    left rows with no right row at-or-before their timestamp drop.
    Value columns must be double-castable (the union's carry struct is
    typed once for both sides)."""
    from pyspark.sql.window import Window

    lv = [F.col(c).cast("double").alias(f"l_{c}") for c in left_vals]
    rv_struct = F.struct(
        F.col(ts_col).alias("rts"), *[F.col(c).alias(c) for c in right_vals]
    )
    l = left.select(
        F.col(key), F.col(ts_col).cast("timestamp").alias("_ts"), *lv,
        F.lit(1).alias("_side"), F.lit(None).cast(
            f"struct<rts:timestamp,{','.join(f'{c}:double' for c in right_vals)}>"
        ).alias("_rv"),
    )
    r = right.select(
        F.col(key), F.col(ts_col).cast("timestamp").alias("_ts"),
        *[F.lit(None).cast("double").alias(f"l_{c}") for c in left_vals],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).cast("timestamp").alias("rts"),
            *[F.col(c).cast("double").alias(c) for c in right_vals],
        ).alias("_rv"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).withColumn(
        "_carry", F.last("_rv", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("_side") == 1) & F.col("_carry").isNotNull())
        .select(
            key,
            F.col("_ts").alias(ts_col),
            *[F.col(f"l_{c}").alias(c) for c in left_vals],
            F.col("_carry.rts").alias(f"{right_prefix}{ts_col}"),
            *[F.col(f"_carry.{c}").alias(f"{right_prefix}{c}") for c in right_vals],
        )
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    left_vals: tuple[str, ...] = ("value",),
    right_vals: tuple[str, ...] = ("value",),
    right_prefix: str = "r_",
    bucket_sec: int = 3600,
) -> DataFrame:
    """``asof_join`` for MEGA-keys: identical output (equality-tested),
    but no single key's full history ever sorts in one task — the
    window path's documented 100 TB caveat, closed.

    Construction: bucket the time axis at ``bucket_sec``; then
    1. *within-bucket* as-of — the same union + carry-forward window,
       but partitioned by (key, bucket), so each task sorts at most one
       bucket's worth of one key's rows;
    2. *bucket-level carry* — per (key, bucket) the latest right row
       collapses DECLARATIVELY (``max_by``, partial agg — one row per
       occupied bucket crosses the exchange), and a window over the
       per-bucket rows (grouped per key: #occupied-buckets rows, never
       event rows) carries "latest right row STRICTLY before this
       bucket" to every left bucket — left rows sort before right rows
       inside a bucket there, so a same-bucket right row can never leak
       in as if it preceded the bucket;
    3. each left row takes its within-bucket carry, else the bucket
       carry; rows with neither drop (inner semantics, same as
       ``asof_join``).

    Cost: one extra shuffle + a tiny bucket-table window vs the plain
    path — the price of bounding every task by bucket width instead of
    key history.  Pick ``bucket_sec`` so a busy key's per-bucket rows
    fit a task comfortably (10⁶ rows/bucket is still fine)."""
    from pyspark.sql.window import Window

    rv_fields = ",".join(f"{c}:double" for c in right_vals)
    rv_type = f"struct<rts:timestamp,{rv_fields}>"
    # true floor bucketing: `div` truncates toward zero, which would
    # merge (-width, 0) and [0, width) into one double-width bucket for
    # pre-1970 timestamps — still correct (bucketing only needs
    # monotonicity) but off the documented per-task size bound, so use
    # floor() explicitly
    w = bucket_sec * 1_000_000
    bucket = F.expr(
        f"(unix_micros(_ts) div {w})"
        f" - (case when unix_micros(_ts) % {w} < 0 then 1 else 0 end)"
    )

    lv = [F.col(c).cast("double").alias(f"l_{c}") for c in left_vals]
    l = left.select(
        F.col(key), F.col(ts_col).cast("timestamp").alias("_ts"), *lv,
        F.lit(1).alias("_side"), F.lit(None).cast(rv_type).alias("_rv"),
    ).withColumn("_bucket", bucket)
    r = right.select(
        F.col(key), F.col(ts_col).cast("timestamp").alias("_ts"),
        *[F.lit(None).cast("double").alias(f"l_{c}") for c in left_vals],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).cast("timestamp").alias("rts"),
            *[F.col(c).cast("double").alias(c) for c in right_vals],
        ).alias("_rv"),
    ).withColumn("_bucket", bucket)

    # 1. within-bucket carry: same convention as asof_join (right rows
    # sort before left at equal ts → at-timestamp rows are visible)
    wb = (
        Window.partitionBy(key, "_bucket")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_bucket = l.unionByName(r).withColumn(
        "_carry_in", F.last("_rv", ignorenulls=True).over(wb)
    )
    left_rows = in_bucket.filter(F.col("_side") == 1)

    # 2. bucket-level carry from strictly-earlier buckets
    rb_last = r.groupBy(key, "_bucket").agg(F.max_by("_rv", "_ts").alias("_last"))
    lb = l.select(key, "_bucket").distinct().select(
        F.col(key), "_bucket", F.lit(1).alias("_bside"),
        F.lit(None).cast(rv_type).alias("_last"),
    )
    wk = (
        Window.partitionBy(key)
        # left-bucket rows sort BEFORE right rows of the same bucket,
        # so the carry they see is from strictly-earlier buckets only
        .orderBy(F.col("_bucket").asc(), F.col("_bside").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = (
        rb_last.withColumn("_bside", F.lit(2))
        .unionByName(lb)
        .withColumn("_carry_prev", F.last("_last", ignorenulls=True).over(wk))
        .filter(F.col("_bside") == 1)
        .select(key, "_bucket", "_carry_prev")
    )

    # 3. attach + resolve (join keyed on (key, bucket) — co-partitioned
    # with nothing upstream, one shuffle each side)
    out = left_rows.join(carry, [key, "_bucket"], "left").withColumn(
        "_carry", F.coalesce("_carry_in", "_carry_prev")
    )
    return (
        out.filter(F.col("_carry").isNotNull())
        .select(
            key,
            F.col("_ts").alias(ts_col),
            *[F.col(f"l_{c}").alias(c) for c in left_vals],
            F.col("_carry.rts").alias(f"{right_prefix}{ts_col}"),
            *[F.col(f"_carry.{c}").alias(f"{right_prefix}{c}") for c in right_vals],
        )
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    window_sec: int = 150,
    left_vals: tuple[str, ...] = ("value",),
    right_vals: tuple[str, ...] = ("value",),
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with |left.ts − right.ts| ≤ window_sec —
    UNKEYED, so a naive theta-join would be a BroadcastNestedLoop cross
    product (O(n·m), the plan that dies first at scale).  The standard
    fix, spelled out: bucket the time axis at ``window_sec`` width; a
    qualifying pair's buckets differ by at most 1, so each left row
    EXPLODES into its bucket ± 1 (3 rows — bounded, unlike the cross
    product) and joins the right side EQUI on the bucket key, then the
    exact |Δt| predicate filters inside the co-partitioned stage.  Cost
    is O(pairs-in-±1-bucket), i.e. proportional to the true output for
    time-spread streams; hot buckets (time skew) are AQE's skew-join
    case or a salt on the bucket key.  Same trick generalizes to any
    1-D band join (numeric ranges, geohash bands)."""
    # integer div, not float: micros ÷ width stays exact at any epoch
    b = lambda c: F.expr(f"unix_micros(cast({c} as timestamp)) div {window_sec * 1_000_000}")
    l = left.select(
        F.col(ts_col).cast("timestamp").alias("lts"),
        *[F.col(c).cast("double").alias(f"l_{c}") for c in left_vals],
        F.explode(F.array(b(ts_col) - 1, b(ts_col), b(ts_col) + 1)).alias("bucket"),
    )
    r = right.select(
        F.col(ts_col).cast("timestamp").alias("rts"),
        *[F.col(c).cast("double").alias(f"r_{c}") for c in right_vals],
        b(ts_col).alias("bucket"),
    )
    return (
        l.join(r, "bucket")
        .filter(
            F.abs(F.unix_micros("lts") - F.unix_micros("rts"))
            <= window_sec * 1_000_000
        )
        .select(
            F.col("lts").alias(ts_col),
            *[F.col(f"l_{c}").alias(c) for c in left_vals],
            F.col("rts").alias(f"{right_prefix}{ts_col}"),
            *[F.col(f"r_{c}").alias(f"{right_prefix}{c}") for c in right_vals],
        )
    )
