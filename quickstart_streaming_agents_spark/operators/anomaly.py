"""``ml_detect_anomalies`` — online per-key anomaly detection.

Re-expresses the reference's ``ML_DETECT_ANOMALIES(metric, ts, JSON_OBJECT(
'minTrainingSize' ..., 'maxTrainingSize' ..., 'confidencePercentage' ...,
'enableStl' ...)) OVER (PARTITION BY key ORDER BY ts RANGE UNBOUNDED
PRECEDING)`` construct (LAB3-Walkthrough.md:119-132, LAB4-Walkthrough.md:
150-163 in /root/reference; parameter semantics LAB4-Walkthrough.md:185-190).

For each row, the detector forecasts the metric from the trailing history of
*previous* rows within the same key (ring buffer capped at
``max_training_size``), emits a confidence interval, and flags the observed
value as anomalous when it falls outside. No output confidence until
``min_training_size`` prior observations exist.

Two detectors:

- ``detector="ar"`` (default, matching the reference's ARIMA task): an
  auto-regressive model re-fit per row by ridge-stabilized least squares
  (numpy — statsmodels is not a dependency), executed as an Arrow-batched
  ``applyInPandas`` per key. Sequential within a key (each forecast depends
  on history), parallel across keys — exactly the reference's
  PARTITION BY parallelism. At 100 TB the cardinality of the key space
  (zones, cities) is what scales out; per-key history is bounded by
  ``max_training_size`` so state is O(keys × maxTrainingSize).
- ``detector="zscore"``: trailing mean ± z·stddev via built-in window
  functions — pure JVM whole-stage-codegen, no Python at all, and
  SQL-expressible (used for DuckDB oracle checks).

Confidence quantile uses Acklam's inverse-normal-CDF approximation
(public-domain rational approximation, |rel err| < 1.15e-9) to avoid a
scipy dependency.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANOMALY_RESULT_TYPE = T.StructType(
    [
        T.StructField("forecast_value", T.DoubleType()),
        T.StructField("upper_bound", T.DoubleType()),
        T.StructField("lower_bound", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)


def norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0,1), got {p}")
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def _z_for_confidence(confidence_percentage: float) -> float:
    if not 0.0 < confidence_percentage < 100.0:
        raise ValueError(
            f"confidence_percentage must be in (0, 100), got {confidence_percentage}"
        )
    return norm_ppf(0.5 + confidence_percentage / 200.0)


#: Rows scored per task in the chunked AR path. Each task additionally
#: carries up to ``max_training_size`` duplicated prefix rows as history.
AR_CHUNK_SIZE = 4096


def ml_detect_anomalies(
    df: DataFrame,
    metric: str,
    ts: str,
    keys: list[str],
    min_training_size: int = 8,
    max_training_size: int = 50,
    confidence_percentage: float = 95.0,
    enable_stl: bool = False,
    stl_period: int = 0,
    detector: str = "ar",
    output_col: str = "anomaly_result",
    ar_chunk_size: int | None = AR_CHUNK_SIZE,
    ridge_lambda: float = 1e-6,
) -> DataFrame:
    """Append ``output_col`` struct<forecast_value, upper_bound, lower_bound,
    is_anomaly> computed per key over the event-time-ordered metric history.

    ``ar_chunk_size`` bounds the AR detector's per-task row count (see
    ``_ar``; defaults to :data:`AR_CHUNK_SIZE`, ``None`` disables chunking
    — one task per key). ``ridge_lambda`` is the AR fit's ridge stabilizer
    (0.0 = pure OLS, SQL-replayable at p=1). Rows with a NULL metric carry
    no signal and cannot train: they emit the no-verdict struct and do not
    occupy a training-window slot (matching the zscore detector, whose
    window aggregates skip nulls). Note the AR fit needs two residual rows,
    so the first scored row of a key is at index max(min_training_size, 3).
    """
    if detector == "zscore":
        return _zscore(df, metric, ts, keys, min_training_size, max_training_size,
                       confidence_percentage, output_col)
    if detector == "ar":
        nulls = df.filter(F.col(metric).isNull()).withColumn(
            output_col,
            F.struct(
                F.lit(None).cast("double").alias("forecast_value"),
                F.lit(None).cast("double").alias("upper_bound"),
                F.lit(None).cast("double").alias("lower_bound"),
                F.lit(False).alias("is_anomaly"),
            ),
        )
        scored = _ar(df.filter(F.col(metric).isNotNull()), metric, ts, keys,
                     min_training_size, max_training_size,
                     confidence_percentage, enable_stl, stl_period, output_col,
                     chunk_size=ar_chunk_size, ridge_lambda=ridge_lambda)
        return scored.unionByName(nulls)
    raise ValueError(f"unknown detector {detector!r}")


# ---------------------------------------------------------------------------
# zscore: pure built-in window functions (JVM, codegen, no Python)
# ---------------------------------------------------------------------------

def _zscore(df, metric, ts, keys, min_n, max_n, confidence, output_col):
    z = _z_for_confidence(confidence)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(-max_n, -1)
    )
    m = F.avg(F.col(metric).cast("double")).over(w)
    sd = F.stddev_samp(F.col(metric).cast("double")).over(w)
    n = F.count(F.col(metric)).over(w)
    trained = (n >= F.lit(min_n)) & sd.isNotNull()
    forecast = F.when(trained, m)
    upper = F.when(trained, m + F.lit(z) * sd)
    lower = F.when(trained, m - F.lit(z) * sd)
    is_anom = F.when(
        trained,
        # coalesce: a NULL metric compares to NULL, and a NULL is_anomaly
        # would silently vanish from boolean filters — no verdict is False
        F.coalesce(
            (F.col(metric).cast("double") > upper)
            | (F.col(metric).cast("double") < lower),
            F.lit(False),
        ),
    ).otherwise(F.lit(False))
    return df.withColumn(
        output_col,
        F.struct(
            forecast.alias("forecast_value"),
            upper.alias("upper_bound"),
            lower.alias("lower_bound"),
            is_anom.alias("is_anomaly"),
        ),
    )


# ---------------------------------------------------------------------------
# ar: per-key sequential AR(p) refit, Arrow-batched applyInPandas
# ---------------------------------------------------------------------------

def ar_one_step(train, min_n: int, z: float, lam: float = 1e-6):
    """Fit an AR(p) model on ``train`` (oldest→newest) and forecast one step.

    Returns ``(forecast, upper, lower)`` or ``None`` while under-trained.
    Shared by the batch ``applyInPandas`` path and the streaming
    ``applyInPandasWithState`` path so both produce identical bounds for
    identical history windows.

    ``lam`` is the ridge stabilizer; 0.0 gives pure OLS. With
    max_training_size ≤ 7 the lag order is always p = 1, and the OLS
    AR(1) fit is exactly expressible as SQL ``regr_*`` aggregates — the
    ``anomaly_detect_ar1`` query exploits this for a DuckDB value-hash
    oracle of this code path.
    """
    import numpy as np

    train = np.asarray(train, dtype=np.float64)
    t = len(train)
    if t < min_n:
        return None
    p = min(8, t - 1, max(1, t // 4))
    # lag-matrix least squares with intercept, ridge-stabilized
    y = train[p:]
    if len(y) < 2:
        return None
    cols = [np.ones(len(y))]
    for lag in range(1, p + 1):
        cols.append(train[p - lag:t - lag])
    A = np.stack(cols, axis=1)
    AtA = A.T @ A + lam * np.eye(A.shape[1])
    Aty = A.T @ y
    try:
        beta = np.linalg.solve(AtA, Aty)
    except np.linalg.LinAlgError:
        beta = np.zeros(A.shape[1])
        beta[0] = train.mean()
    resid = y - A @ beta
    dof = max(1, len(y) - A.shape[1])
    sigma = float(np.sqrt((resid @ resid) / dof))
    last = train[::-1][:p]  # most recent p values, newest first
    fc = float(beta[0] + (beta[1:] @ last))
    return fc, fc + z * sigma, fc - z * sigma


def _ar_forecast_series(values, min_n, max_n, z, enable_stl, stl_period, start=0,
                        lam=1e-6):
    """numpy implementation; returns (forecast, upper, lower, is_anom) arrays.

    ``start`` skips fitting for indices below it (their outputs stay
    NaN/False) — used by the streaming operator, whose state buffer forms a
    known prefix of the series that only serves as training history.
    """
    import numpy as np

    n = len(values)
    v = np.asarray(values, dtype=np.float64)
    season = np.zeros(n)
    if enable_stl and stl_period and stl_period > 1:
        # Light-weight seasonal adjustment: per-phase means over the WHOLE
        # series — two-pass batch semantics, not causal (appending data can
        # shift earlier rows' seasonal term). The reference accepts
        # enableStl but every use sets FALSE (LAB3-Walkthrough.md:126,
        # LAB4-Walkthrough.md:158), so this stays a batch-only extra; the
        # streaming operator rejects it.
        idx = np.arange(n) % stl_period
        for s in range(stl_period):
            mask = idx == s
            if mask.any():
                season[mask] = v[mask].mean() - v.mean()
    x = v - season

    forecast = np.full(n, np.nan)
    upper = np.full(n, np.nan)
    lower = np.full(n, np.nan)
    is_anom = np.zeros(n, dtype=bool)

    for i in range(start, n):
        lo = max(0, i - max_n)
        step = ar_one_step(x[lo:i], min_n, z, lam=lam)
        if step is None:
            continue
        fc, up, lw = step
        forecast[i] = fc + season[i]
        upper[i] = up + season[i]
        lower[i] = lw + season[i]
        is_anom[i] = (v[i] > upper[i]) or (v[i] < lower[i])
    return forecast, upper, lower, is_anom




def _ar(df, metric, ts, keys, min_n, max_n, confidence, enable_stl, stl_period,
        output_col, chunk_size: int | None = AR_CHUNK_SIZE,
        ridge_lambda: float = 1e-6):
    """Per-key contract: every task holds O(chunk_size + max_training_size)
    rows, NOT a key's full history. Rows are split into time-ordered chunks
    of ``chunk_size``; each chunk is shipped with the previous chunk's last
    ``max_training_size`` rows as a score-suppressed training prefix, so a
    forecast — which only ever looks back ``max_training_size`` rows — is
    bit-identical to the unchunked computation. This also parallelizes a
    single hot key across tasks (years of 5-min windows for one zone no
    longer serialize into one executor).

    ``chunk_size=None`` disables chunking (one task per key, the round-2
    shape). STL seasonal adjustment fits on the whole series, so
    ``enable_stl`` forces the unchunked path.

    Prefix rows are duplicated only from the immediately-preceding chunk,
    so the effective chunk size is clamped to at least ``max_training_size``
    — otherwise a chunk's history would need rows from two chunks back and
    training would silently truncate.
    """
    import pandas as pd

    z = _z_for_confidence(confidence)
    if chunk_size is not None:
        chunk_size = max(chunk_size, max_n)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(output_col, ANOMALY_RESULT_TYPE)]
    )
    in_cols = df.columns
    chunked = chunk_size is not None and not (enable_stl and stl_period > 1)

    def score(pdf: pd.DataFrame, start: int) -> pd.DataFrame:
        fc, up, lo, an = _ar_forecast_series(
            pdf[metric].to_numpy(dtype="float64"), min_n, max_n, z,
            enable_stl, stl_period, start=start, lam=ridge_lambda,
        )

        def cell(i):
            if math.isnan(fc[i]):
                return {"forecast_value": None, "upper_bound": None,
                        "lower_bound": None, "is_anomaly": False}
            return {"forecast_value": float(fc[i]), "upper_bound": float(up[i]),
                    "lower_bound": float(lo[i]), "is_anomaly": bool(an[i])}

        pdf[output_col] = [cell(i) for i in range(len(pdf))]
        return pdf.iloc[start:]

    if not chunked:
        def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts, kind="mergesort").reset_index(drop=True)
            return score(pdf, 0)[in_cols + [output_col]]

        return df.groupBy(*keys).applyInPandas(per_key, schema=out_schema)

    # Chunked path: ONE JVM row_number pass orders the series; each row
    # lands in chunk floor((rn-1)/chunk_size) and, when it sits in its
    # chunk's last max_n rows, ALSO emits a history-only copy into the
    # next chunk via an in-task explode. Emitting both copies from the
    # same evaluated row matters: two independent window branches could
    # rank tied timestamps differently per branch and silently hand the
    # next chunk a different training prefix than the scored tail.
    clash = {"_ar_rn", "_ar_chunk", "_ar_prefix"} & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with helpers: {sorted(clash)}")
    w = Window.partitionBy(*keys).orderBy(ts)
    rn = df.withColumn("_ar_rn", F.row_number().over(w))
    chunk = ((F.col("_ar_rn") - 1) / F.lit(chunk_size)).cast("long")
    in_tail = F.col("_ar_rn") > (chunk + 1) * F.lit(chunk_size) - F.lit(max_n)
    dest = F.explode(
        F.when(
            in_tail,
            F.array(
                F.struct(chunk.alias("c"), F.lit(False).alias("p")),
                F.struct((chunk + 1).alias("c"), F.lit(True).alias("p")),
            ),
        ).otherwise(F.array(F.struct(chunk.alias("c"), F.lit(False).alias("p"))))
    )
    both = (
        rn.withColumn("_t", dest)
        .withColumn("_ar_chunk", F.col("_t.c"))
        .withColumn("_ar_prefix", F.col("_t.p"))
        .drop("_t")
    )

    def per_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ar_rn", kind="mergesort").reset_index(drop=True)
        start = int(pdf["_ar_prefix"].sum())
        return score(pdf, start)[in_cols + [output_col]]

    return both.groupBy(*keys, "_ar_chunk").applyInPandas(
        per_chunk, schema=out_schema
    )
