"""Streaming KMV (k-minimum-values) distinct sketch: the bottom-k
deterministic hash sample of a key stream, maintained incrementally.

KMV (Bar-Yossef et al. 2002; Beyer et al. 2007 "On synopses for
distinct-value estimation") keeps the k SMALLEST distinct hash values
seen; the k-th smallest, normalized to (0,1), estimates the distinct
count as (k−1)/R_k. Unlike HLL (ts registry: doc_hll_distinct) the
kept hashes double as a uniform sample OF the distinct keys — the
"show me 32 representative users" query — and two sketches merge by
a set-union-then-truncate, which is exactly what a per-partition →
global combine does at 100 TB.

Like circadian, state is ORDER-INDEPENDENT (min-k of a set commutes),
so the drained snapshot after any micro-batch split is bit-identical
to the batch SQL — the rare stateful operator with no in-order
contract. The hash is the engine-portable md5-prefix integer
(llm/hashing.md5_hash64_expr) computed identically in Python here.

State: the sorted bottom-k hash list + the processed-row count (the
monotone snapshot ordinal).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_K = 32

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("rank", T.LongType()),
        T.StructField("h", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

# The KMV estimator finish, shared verbatim with the batch oracle:
# under-full sketches report the EXACT kept count; full sketches the
# (k−1)/R_k estimate with R_k = h_k / 2^60 (the md5-prefix hash is
# uniform on [0, 2^60)).
KMV_EST = (
    f"CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE) "
    f"ELSE round((CAST(n_kept AS DOUBLE) - 1e0) "
    f"* 1152921504606846976e0 / CAST(hk AS DOUBLE), 9) END"
)


def md5_hash64_py(key: int) -> int:
    """The Python twin of llm/hashing.md5_hash64_expr on
    CAST(key AS VARCHAR): first 15 hex digits of md5 of the decimal
    string."""
    return int(
        hashlib.md5(str(int(key)).encode("ascii")).hexdigest()[:15], 16
    )


def kmv_stream(keys_stream: DataFrame, k: int = KMV_K) -> DataFrame:
    """Incremental bottom-k distinct-hash sketch over a streaming
    (user_id) feed. Emits the full current bottom-k per micro-batch
    as (n_seen, rank, h) rows; the snapshot with the largest n_seen
    (monotone) is the batch answer.

    The single sketch key means one state row — the demo topology.
    At 100 TB the same step runs keyed per partition/shard and the
    union-truncate merge (a plain SORT + LIMIT k over the unioned
    snapshots) combines them; KMV is closed under that merge.
    """

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        if state.exists:
            hs, n_seen = list(state.get[0]), int(state.get[1])
        else:
            hs, n_seen = [], 0
        kept = set(hs)
        for uid in rows["user_id"].to_numpy():
            kept.add(md5_hash64_py(int(uid)))
        hs = sorted(kept)[:k]
        n_seen += len(rows)
        state.update((hs, n_seen))
        yield pd.DataFrame(
            {
                "n_seen": [n_seen] * len(hs),
                "rank": list(range(1, len(hs) + 1)),
                "h": hs,
            }
        )

    tagged = keys_stream.selectExpr(
        "CAST(0 AS INT) AS sketch_id", "user_id"
    )
    return tagged.groupBy("sketch_id").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
