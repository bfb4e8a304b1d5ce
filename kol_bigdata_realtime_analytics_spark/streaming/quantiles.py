"""Streaming quantiles with BOUNDED state: fixed 256-bin histograms per
key in applyInPandasWithState — completes the streaming-sketch trio after
approx-distinct (HLL max-fold) and heavy hitters (Misra-Gries).

Each key holds ONE fixed array of N_BINS counters over a LITERAL value
domain (the distributed_kth_element bin discipline, plans/advanced.py):
any quantile is then readable off the cumulative histogram with error
bounded by one bin width. State is O(N_BINS) longs per key at ANY stream
length, and because the fold is pure integer addition — associative,
commutative — the state is bit-identical under ANY Arrow chunking or
micro-batch split (the HLL chunking-invariance property, pinned by the
same Hypothesis test style), so the STREAMING query gets a full hash
oracle: DuckDB re-derives the identical bin counts.

The domain is a fixed literal on purpose: an adaptive domain would make
the state depend on arrival ORDER, destroying both mergeability and the
oracle. [0, $1024) in integer cents covers events.value (max ~$560 at
sf0.1) with headroom; out-of-domain values clamp into the edge bins,
which only widens the error bound for quantiles landing there.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

N_BINS = 256
LO_CENTS = 0
HI_CENTS = 102_400  # $1024.00; width = 400 cents = $4 per bin
BIN_WIDTH = (HI_CENTS - LO_CENTS) // N_BINS

OUTPUT_SCHEMA = "event_type string, bin_idx long, cnt long"
STATE_SCHEMA = "bins array<long>"


def bin_col(value: Column) -> Column:
    """Histogram bin of a dollar value — MUST stay in lockstep with
    bin_sql. Cents via the ROUND(x*100) idiom distributed_kth_element
    hash-certified; clamp; floor of an exact small-integer double
    division."""
    c = F.round(value.cast("double") * 100).cast("long")
    clamped = F.least(
        F.greatest(c, F.lit(LO_CENTS)), F.lit(HI_CENTS - 1)
    )
    return F.floor((clamped - F.lit(LO_CENTS)) / F.lit(BIN_WIDTH)).cast("long")


def bin_sql(value_expr: str) -> str:
    """DuckDB expression computing the identical bin index."""
    c = f"CAST(ROUND(CAST({value_expr} AS DOUBLE) * 100) AS BIGINT)"
    clamped = f"LEAST(GREATEST({c}, {LO_CENTS}), {HI_CENTS - 1})"
    return f"CAST(floor(({clamped} - {LO_CENTS}) / {BIN_WIDTH}) AS BIGINT)"


def fold_bins(chunks) -> list[int]:
    """Pure-Python reference fold: add each chunk's bin indices into a
    fresh N_BINS counter array — the associative/commutative integer sum
    the streaming state performs (Hypothesis pins chunking invariance
    against this)."""
    bins = [0] * N_BINS
    for chunk in chunks:
        for b in chunk:
            bins[int(b)] += 1
    return bins


def _q_fn(key, pdfs, state):
    import numpy as np

    bins = (
        np.array(state.get[0], dtype="int64")
        if state.exists
        else np.zeros(N_BINS, dtype="int64")
    )
    for pdf in pdfs:
        bins += np.bincount(
            pdf["bin_idx"].to_numpy(dtype="int64"), minlength=N_BINS
        )
    state.update((bins.tolist(),))
    nz = np.flatnonzero(bins)
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(nz),
            "bin_idx": nz.astype("int64"),
            "cnt": bins[nz],
        }
    )


def quantile_stream(binned: DataFrame) -> DataFrame:
    """Streaming per-key histogram over a frame with (event_type,
    bin_idx) columns: one shuffle per micro-batch (groupBy key), state =
    N_BINS longs per key, emitted rows = the key's nonzero bins."""
    return binned.groupBy("event_type").applyInPandasWithState(
        _q_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
