"""Time-series operators — SURVEY §1.5/§2.5 (W3-W8, A4/A6) Spark-first.

The reference's pipeline (``src/modules/price_forecast/data_utils.py``,
``dataset.py``) is single-series pandas: daily resample → bounded
interpolation → seasonal features → sliding windows → split → metrics.
Our operators compute the same semantics **for every series at once**:
partitionBy(series) windows, so a 1M-series corpus distributes instead of
looping. All arithmetic is structured so the DuckDB oracle reproduces it
bit-for-bit (integer date math; double expressions in identical order;
decimal-accumulated aggregates).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def daily_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """A4/resample('D'): per-key daily mean on a dense per-key date spine
    (min..max of that key); days with no observations are NULL — the
    gap-carrying series the interpolator expects.

    Mean via decimal accumulate (order-independent). The spine is a
    sequence+explode on the aggregated (min,max) row — one shuffle for the
    agg, one broadcast-joinable spine per key.
    """
    days = df.select(
        F.col(key_col),
        F.to_date(ts_col).alias("day"),
        F.col(val_col).alias("_v"),
    )
    daily = days.groupBy(key_col, "day").agg(
        (F.sum(F.col("_v").cast("decimal(30,6)")).cast("double") / F.count("_v")).alias(
            "val"
        )
    )
    spine = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            F.col(key_col),
            F.explode(F.sequence("_d0", "_d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    return spine.join(daily, [key_col, "day"], "left")


def bounded_interpolate(
    df: DataFrame,
    key_col: str,
    day_col: str = "day",
    val_col: str = "val",
    max_gap: int = 7,
) -> DataFrame:
    """W5 bounded time-interpolation (data_utils.py:38): linearly fill NULL
    days when the surrounding non-NULL observations are ≤ max_gap days
    apart; longer gaps (and edges) stay NULL.

    Two windows per key (backward last / forward first, IGNORE NULLS), then
    a pure-arithmetic blend: v = pv + (nv-pv) * (d-pd)/(nd-pd).
    """
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(val_col, ignorenulls=True).over(w_back)
    prev_d = F.last(
        F.when(F.col(val_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w_back)
    next_v = F.first(val_col, ignorenulls=True).over(w_fwd)
    next_d = F.first(
        F.when(F.col(val_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w_fwd)

    gap = F.datediff(next_d, prev_d)
    frac = F.datediff(F.col(day_col), prev_d).cast("double") / gap.cast("double")
    interp = prev_v + (next_v - prev_v) * frac
    filled = F.when(F.col(val_col).isNotNull(), F.col(val_col)).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull() & (gap <= max_gap), interp
        )
    )
    return df.withColumn("val_filled", filled)


def longest_valid_run(
    df: DataFrame, key_col: str, day_col: str = "day", val_col: str = "val"
) -> DataFrame:
    """W4 gaps-and-islands: length and start of the longest contiguous
    non-NULL daily run per key (data_utils.py:66-99 longest_valid_block).

    Island id = day - row_number days over non-null rows — constant within
    a consecutive run.
    """
    nn = df.filter(F.col(val_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(day_col)
    islands = nn.withColumn(
        "_island", F.date_sub(F.col(day_col), F.row_number().over(w))
    )
    runs = islands.groupBy(key_col, "_island").agg(
        F.count(F.lit(1)).alias("run_len"), F.min(day_col).alias("run_start")
    )
    w2 = Window.partitionBy(key_col).orderBy(
        F.col("run_len").desc(), F.col("run_start").asc()
    )
    return (
        runs.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .select(key_col, "run_len", "run_start")
    )


def seasonal_features(
    df: DataFrame, day_col: str = "day", round_to: int = 6
) -> DataFrame:
    """Seasonal encodings (data_utils.py:49-61): sin/cos of day-of-year and
    day-of-week, pandas convention (dow 0=Monday — Spark's dayofweek is
    1=Sunday, hence the +5 mod 7 offset, the SURVEY §7 off-by-one).

    Trig outputs quantized to 6 dp via round(x·1e6)/1e6 — NOT round(x, 6):
    multi-digit rounding of doubles disagrees between engines near
    boundaries, while integer rounding of the identical product double
    agrees everywhere (see .claude/skills/verify/SKILL.md).
    """
    scale = float(10**round_to)

    def q6(c: Column) -> Column:
        return F.round(c * scale, 0) / scale

    doy = F.dayofyear(day_col).cast("double")
    dow = ((F.dayofweek(day_col) + F.lit(5)) % 7).cast("double")
    return (
        df.withColumn("doy", F.dayofyear(day_col))
        .withColumn("dow", ((F.dayofweek(day_col) + F.lit(5)) % 7))
        .withColumn("sin_doy", q6(F.sin(doy * (TWO_PI / 365.25))))
        .withColumn("cos_doy", q6(F.cos(doy * (TWO_PI / 365.25))))
        .withColumn("sin_dow", q6(F.sin(dow * (TWO_PI / 7.0))))
        .withColumn("cos_dow", q6(F.cos(dow * (TWO_PI / 7.0))))
    )


def sliding_windows(
    df: DataFrame,
    key_col: str,
    day_col: str = "day",
    val_col: str = "val",
    lookback: int = 7,
) -> DataFrame:
    """W3 sliding lookback windows: for each day with a fully-observed
    trailing window of `lookback` days, emit the window as an array —
    the (X, y) sample generator (dataset.py:52-58).

    Validity = window has `lookback` non-NULL values AND spans exactly
    `lookback-1` days (contiguous dates, no silent gap-skipping).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(-(lookback - 1), 0)
    )
    return (
        df.withColumn("window_vals", F.collect_list(val_col).over(w))
        .withColumn("_n", F.count(val_col).over(w))
        .withColumn("_d0", F.min(day_col).over(w))
        .filter(
            (F.col("_n") == lookback)
            & (F.datediff(F.col(day_col), F.col("_d0")) == lookback - 1)
        )
        .select(key_col, day_col, "window_vals")
    )


def ratio_split(
    df: DataFrame,
    key_col: str,
    day_col: str = "day",
    ratios: tuple[int, int, int] = (7, 2, 1),
) -> DataFrame:
    """W6 positional train/val/test split per key at a:b:c — integer
    arithmetic only (rn·total_ratio vs n·cum_ratio), no float thresholds."""
    a, b, c = ratios
    tot = a + b + c
    w = Window.partitionBy(key_col).orderBy(day_col)
    wn = Window.partitionBy(key_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    split = (
        F.when(rn * tot <= n * a, F.lit("train"))
        .when(rn * tot <= n * (a + b), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def forecast_metrics(
    df: DataFrame,
    key_col: str,
    actual_col: str,
    pred_col: str,
) -> DataFrame:
    """A6 evaluation aggregates per key: RMSE and sMAPE with the reference's
    zero-denominator guard (data_utils.py:151-159: denom==0 → 1e-8).

    Per-row terms are double expressions quantized to int64 fixed-point
    (round(term·1e6)) before summing: both engines round the *identical*
    double product the same way, and int sums are exact — accumulation-order
    independent with zero cross-engine rounding risk. (A decimal(30,12) cast
    is NOT safe here: DuckDB scales by 10^12 in doubles, which overflows
    2^53 for terms ≥ ~1e4.)

    Domain bound: err²·1e6 must fit int64, i.e. |err| ≲ 3.0e6 per row —
    ample for price-scale series (the reference's domain); series in
    raw-volume units should be rescaled before metrics (ANSI mode fails
    loudly on the cast; legacy mode would NULL the term and deflate
    RMSE silently).
    """
    err = F.col(pred_col) - F.col(actual_col)
    sq_q = F.round(err * err * F.lit(1e6), 0).cast("long")
    denom = (F.abs(F.col(actual_col)) + F.abs(F.col(pred_col))) / F.lit(2.0)
    smape_term = F.abs(err) / F.when(denom == 0.0, F.lit(1e-8)).otherwise(denom)
    smape_q = F.round(smape_term * F.lit(1e6), 0).cast("long")
    return df.groupBy(key_col).agg(
        F.sqrt(
            (F.sum(sq_q).cast("double") / F.lit(1e6)) / F.count(F.lit(1))
        ).alias("rmse"),
        (
            (F.sum(smape_q).cast("double") / F.lit(1e6)) / F.count(F.lit(1))
        ).alias("smape"),
        F.count(F.lit(1)).alias("n_obs"),
    )
