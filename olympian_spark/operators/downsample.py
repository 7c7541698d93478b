"""Time-series downsampling for visualization / compact tiers.

M4 (Jugel, Markl et al., "M4: A Visualization-Oriented Time Series Data
Aggregation", VLDB 2014 — public literature): per (series, time bucket)
keep min, max, first and last values plus the first/last timestamps.
The paper's result is that these four points per pixel column are
SUFFICIENT for error-free line-chart rendering — which makes M4 the
downsampling operator a query engine should push down, unlike heuristic
selectors (LTTB) that need a sequential pass.

Scale shape: a single groupBy aggregate — min/max/min_by/max_by all
partially aggregate map-side, so the shuffle carries 4 values + 2
timestamps per bucket regardless of input rows. Pure JVM, codegen,
no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def m4_downsample(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: str | list[str] = "user_id",
    bucket_s: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """M4 aggregate per (by, bucket of ``bucket_s`` seconds).

    Output: keys + ``bucket_start`` + ``n`` + ``v_min v_max v_first
    v_last ts_first ts_last``. first/last are ordered by timestamp
    (plus ``tiebreak`` when equal timestamps are possible — pass one
    unless the series is known tie-free, or first/last are
    nondeterministic under Spark's unordered aggregation).

    Buckets come from floor-division of unix microseconds (pre-epoch
    safe), returned as a timestamp.
    """
    keys = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = bucket_s * 1_000_000
    bucket = (F.floor(us / bucket_us) * bucket_us).cast("long")
    ordk = us if tiebreak is None else F.struct(us, F.col(tiebreak))
    v = F.col(value_col)
    return (
        df.groupBy(*keys, F.timestamp_micros(bucket).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min_by(v, ordk).alias("v_first"),
            F.max_by(v, ordk).alias("v_last"),
            F.min(F.col(ts_col).cast("timestamp")).alias("ts_first"),
            F.max(F.col(ts_col).cast("timestamp")).alias("ts_last"),
        )
    )


def lttb_downsample(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: str | list[str] = "user_id",
    n_out: int = 100,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling to exactly ``n_out``
    points per series (Steinarsson, "Downsampling Time Series for Visual
    Representation", U. Iceland MSc thesis 2013 — the public algorithm
    every charting library ships).

    LTTB is inherently sequential per series — each bucket's pick
    depends on the previously selected point — so unlike M4 it cannot be
    a map-side-combinable aggregate. It runs as one vectorized-numpy
    ``applyInPandas`` kernel per series: the grouped-kernel shape used
    by the QC oracle, right when series count >> cores and one series
    fits an executor. A 10^12-turn series does NOT fit: downsample to an
    M4 tier first (error-free for rendering), then LTTB the tier — the
    composition this module's two operators are designed for.

    Output: keys + ``ts`` + ``value`` of the selected points (first and
    last point of every series always kept; deterministic argmax
    tiebreak = lowest index).
    """
    import numpy as np
    import pandas as pd

    keys = [by] if isinstance(by, str) else list(by)
    out_schema = ", ".join(
        [f"`{k}` string" for k in keys] + ["ts timestamp", "value double"]
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("_us", kind="mergesort").reset_index(drop=True)
        ts = pdf["_us"].to_numpy(np.int64)
        v = pdf["_v"].to_numpy(np.float64)
        n = len(ts)
        if n_out >= n or n <= 2:
            sel = np.arange(n)
        else:
            m = max(n_out, 3) - 2
            # interior candidate buckets over points 1..n-2
            edges = 1 + np.floor(np.arange(m + 1) * (n - 2) / m).astype(np.int64)
            sel_list = [0]
            a = 0
            for i in range(m):
                lo, hi = int(edges[i]), int(edges[i + 1])
                if hi <= lo:
                    continue
                if i + 1 < m:
                    nlo, nhi = int(edges[i + 1]), int(edges[i + 2])
                else:
                    nlo, nhi = n - 1, n
                avg_x = ts[nlo:nhi].mean()
                avg_y = v[nlo:nhi].mean()
                area = np.abs(
                    (ts[a] - avg_x) * (v[lo:hi] - v[a])
                    - (ts[a] - ts[lo:hi]) * (avg_y - v[a])
                )
                a = lo + int(area.argmax())  # ties -> lowest index
                sel_list.append(a)
            sel_list.append(n - 1)
            sel = np.asarray(sel_list)
        out = pdf.iloc[sel]
        res = {k: out[k] for k in keys}
        res["ts"] = pd.to_datetime(out["_us"], unit="us")
        res["value"] = out["_v"]
        return pd.DataFrame(res)

    prepped = df.select(
        *[F.col(k).cast("string").alias(k) for k in keys],
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return prepped.groupBy(*keys).applyInPandas(kernel, out_schema)
