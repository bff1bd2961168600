"""Streaming Misra-Gries heavy hitters: bounded-state frequent-token
tracking over an unbounded stream — the streaming twin of
``operators/skew.mg_heavy_hitters``.

Sharding model: tokens hash-partition into ``buckets`` state groups;
each group maintains ONE Misra-Gries summary (≤ ``capacity`` counters)
via ``applyInPandasWithState`` and re-emits its full summary every
batch it receives data (update semantics: the latest summary row set
per bucket supersedes earlier ones — land them in a keyed sink or
dedup by max batch sequence). Because the token → bucket assignment is
a hash, each token's counts live in exactly one group, so the
per-group MG bound applies verbatim: any token with global count
> Σ n_b/(capacity+1) = n/(capacity+1) exceeds its OWN bucket's bound
and survives that summary — the union of bucket summaries is a
guaranteed superset of the stream's true heavy hitters, at
``buckets × capacity`` state rows total, forever, no matter the
stream length or vocabulary (the whole point: streaming exact counts
need vocabulary-sized state; this needs a constant).

Order-dependence caveat (inherent to MG, not this implementation):
counter VALUES depend on arrival order; the superset guarantee and
the weight ≥ count − n_b/(capacity+1) bound do not. When capacity ≥ a
bucket's distinct tokens, no decrement ever fires and the summary IS
the exact per-token count — the deterministic case the equivalence
test pins across arbitrary micro-batch splits.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("token", StringType()),
        StructField("mg_weight", LongType()),
        StructField("bucket_n", LongType()),  # exact rows seen by bucket
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("ws", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def streaming_heavy_hitters(
    tokens: DataFrame,
    token_col: str = "token",
    capacity: int = 64,
    buckets: int = 32,
) -> DataFrame:
    """tokens (streaming, one row per occurrence) → per-bucket MG
    summaries re-emitted on every batch. No watermark/timeout: the
    summary is infinite-horizon by design (windowed variants belong to
    the watermarked agg family in ``streaming/events.py``)."""

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        (bucket,) = key
        if state.exists:
            toks, ws, n = state.get
            acc = pd.Series(list(ws), index=list(toks), dtype="int64")
        else:
            acc, n = None, 0
        for pdf in pdf_iter:
            vc = pdf[token_col].value_counts()
            n += int(vc.sum())
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > capacity:
                cut = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc - cut
                acc = acc[acc > 0]
        if acc is None or not len(acc):
            return
        state.update((list(acc.index), [int(w) for w in acc.to_numpy()], n))
        yield pd.DataFrame(
            {
                "bucket": int(bucket),
                "token": acc.index,
                "mg_weight": acc.to_numpy().astype("int64"),
                "bucket_n": int(n),
            }
        )

    src = (
        tokens.filter(F.col(token_col).isNotNull())
        .withColumn(
            "bucket", F.pmod(F.xxhash64(token_col), F.lit(buckets)).cast("int")
        )
        .select("bucket", token_col)
    )
    return src.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=HH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
