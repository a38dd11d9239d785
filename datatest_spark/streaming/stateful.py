"""Stateful streaming operators (applyInPandasWithState).

The batch engine's exact-dedup (operators/dedup.py) answers "which
rows duplicate rows in THIS table"; a streaming ingest pipeline needs
the all-of-history version — "has this content EVER been seen" — which
`validate_stream`'s per-batch rules cannot express (its docstring
flags exactly this gap).  :func:`streaming_dedup` closes it with
Spark's arbitrary-stateful API: one state cell per content hash,
persisted in the streaming state store, so restarts resume dedup
exactly where the checkpoint left off.

Scale shape: state is keyed by ``(xxhash64(content),
xxhash64('dts2', content), length)`` — two independently-derived
64-bit hashes plus the length, ~20 bytes of key + a boolean per
distinct content, never the content itself; within a micro-batch the
rows of one content group arrive together (the state shuffle
co-locates them), so the first-occurrence choice is a tiny per-group
argmin, all Arrow-batched.  A single 64-bit hash would make silent
drops *expected* at the module's stated 10^12-content target (birthday
bound ~2.7% per-pair space exhausted → dozens of collisions); at ~128
bits the collision probability over 10^12 distinct contents is
~2.7e-14 — negligible.

State-store note: the default HDFSBackedStateStoreProvider keeps ALL
state in executor heap — at 10^12 distinct contents that is a
scale-killer.  Run large dedup streams under RocksDB
(:func:`rocksdb_state_conf` returns the one conf to set before
starting the query); state then lives on local disk with a block-cache
budget, checkpointed incrementally.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

__all__ = ["streaming_dedup", "rocksdb_state_conf"]

_HASH_COL = "_dts_h"
_HASH2_COL = "_dts_h2"
_LEN_COL = "_dts_len"

#: Second-hash domain separator: prepending a fixed literal reseeds the
#: xxhash64 fold, so (h1, h2) behave as independent 64-bit hashes.
_HASH2_SALT = "dts2"


def rocksdb_state_conf() -> dict:
    """The session conf that moves streaming state (dedup fingerprints,
    window aggregates) from executor heap to RocksDB-on-local-disk —
    set it BEFORE starting the query::

        for k, v in rocksdb_state_conf().items():
            spark.conf.set(k, v)

    The default HDFSBackedStateStoreProvider holds every state row in
    JVM heap; all-of-history dedup state grows with #distinct contents,
    so at 10^9+ keys per executor the heap becomes the bottleneck.
    RocksDB keeps the working set in native memory + local SST files
    and checkpoints changelogs incrementally — the provider Spark ships
    for exactly this state-bigger-than-heap shape.
    """
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }


def streaming_dedup(stream_df: DataFrame, column: str,
                    id_col: str = "doc_id",
                    state_ttl_ms: int = 0) -> DataFrame:
    """All-of-history exact dedup over a stream.

    Emits each distinct ``column`` content exactly ONCE across the
    whole stream: the first micro-batch that carries a given content
    emits its minimum-``id_col`` row; every later occurrence (same
    batch or any later batch) is dropped.  State per content hash is a
    single boolean in the streaming state store — checkpointed, so a
    restarted query continues deduplicating against everything already
    emitted.

    ``state_ttl_ms``: 0 (default) keeps state forever — exact
    all-of-history dedup, state growing with #distinct contents.  At
    10^12-content scale that is the known cost of exactness; bound it
    by setting a TTL, after which an idle content's state cell expires
    (processing-time timeout) and a LATER re-occurrence is emitted
    again — the standard windowed-dedup tradeoff (exact within any
    TTL-length window, at-least-once beyond it).  Each new sighting of
    a content renews its TTL.

    The emitted *content set* is deterministic (one row per distinct
    content); WHICH duplicate row represents a content that spans
    micro-batches depends on batch arrival order, as in any streaming
    first-wins dedup.

    Returns a streaming DataFrame with ``stream_df``'s columns.
    """
    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    cols = [f.name for f in out_schema.fields]
    ttl = int(state_ttl_ms)

    def dedup_fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
                 state: "GroupState") -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle past TTL — forget the content
            return
        seen = state.exists
        first = None
        if not seen:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                row = pdf.loc[pdf[id_col].idxmin()]
                if first is None or row[id_col] < first[id_col]:
                    first = row
        state.update((True,))
        if ttl:
            state.setTimeoutDuration(ttl)  # renewed on every sighting
        if first is not None:
            yield pd.DataFrame([first[cols]])

    keyed = (
        stream_df.withColumn(_HASH_COL, F.xxhash64(F.col(column)))
        .withColumn(_HASH2_COL,
                    F.xxhash64(F.lit(_HASH2_SALT), F.col(column)))
        .withColumn(_LEN_COL, F.length(F.col(column)))
    )
    return keyed.groupBy(_HASH_COL, _HASH2_COL, _LEN_COL).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if ttl else "NoTimeout",
    )
