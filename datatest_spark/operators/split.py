"""Deterministic corpus splits + token-budget sequence packing.

Two training-pipeline primitives that must be *reproducible across
engines and runs* — both are pure column expressions (zero UDFs, zero
state), so the same document lands in the same split on any Spark
version, any executor count, and any other engine that implements MD5
(the oracle recomputes them in DuckDB verbatim).

**hash_split** — the standard stable train/eval/test assignment:
``bucket = md5(id || salt)[:4]`` (16 bits, uniform, engine-portable —
hex-string comparison avoids any integer-parsing dialect difference),
split by cumulative-fraction thresholds.  Properties that matter at
10^12 rows:

* assignment is a per-row projection — no shuffle, no sampling pass,
  no driver state; appending data never reassigns existing rows;
* changing ``salt`` re-rolls every assignment (fresh eval sets per
  experiment) without touching the data;
* per-stratum proportions hold in expectation (hash uniformity), the
  right trade-off at corpus scale — exact per-stratum counts would
  need a global per-stratum sort.

**pack_sequences** — greedy token-budget packing: documents are laid
out in a deterministic order within each shard and assigned
``bin_id = tokens_before_this_doc // budget`` — the bin a greedy
packer (fill until the budget spills) would start the document in.
Scale shape: ONE window per shard (``partitionBy(shard)``), so
parallelism = shard count and no global sort ever happens; shard by a
hash bucket (``pmod(xxhash64(id), n_shards)``) when there is no
natural stratum.  A document longer than the budget extends its bin
(greedy semantics) — sequence-splitting belongs to the tokenizer, not
the planner.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_split", "split_bucket", "pack_sequences",
           "stratified_sample", "stratified_sample_sql_pred"]

_BUCKETS = 1 << 16  # md5 prefix of 4 hex chars


def split_bucket(id_col: Column, salt: str = "") -> Column:
    """The 4-hex-char md5 bucket a row falls in — lowercase hex string,
    lexicographically uniform over 0000..ffff.  Engine-portable: DuckDB
    ``substr(md5(id || salt), 1, 4)`` computes the identical value."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 4
    )


def hash_split(df: DataFrame, id_col: str,
               fractions: Mapping[str, float], salt: str = "",
               split_col: str = "split") -> DataFrame:
    """Add a deterministic split assignment column.

    ``fractions`` maps split name -> fraction; fractions must sum to 1
    (within 1e-9 — this operator assigns every row; use an explicit
    "rest" split for leftovers).  Iteration order of ``fractions``
    fixes the threshold layout, so pass an ordered mapping and keep it
    stable across runs.  Null ids raise at runtime under ANSI mode in
    neither engine — they land in the FIRST split (md5(null||salt) is
    md5(salt) via concat null-skip); validate id completeness first
    (RequiredPredicate) if that matters.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1 (got {total}); add an explicit "
            "remainder split"
        )
    if not fractions:
        raise ValueError("fractions must not be empty")
    if any(f <= 0 for f in fractions.values()):
        # a 0 fraction pushes an intermediate threshold to 0x10000,
        # whose 5-char hex no longer compares lexicographically with
        # the 4-char buckets — and an empty split is better spelled by
        # omitting it
        raise ValueError("fractions must be positive; omit a split to "
                         "drop it")
    bucket = split_bucket(F.col(id_col), salt)
    names = list(fractions)
    cum = 0.0
    expr = F.lit(names[-1])  # the final split takes everything left
    cases = []
    for name in names[:-1]:
        cum += fractions[name]
        cases.append((name, format(int(cum * _BUCKETS), "04x")))
    for name, threshold in reversed(cases):
        expr = F.when(bucket < threshold, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      fractions: Mapping[str, float],
                      default: float = 0.0, salt: str = "") -> DataFrame:
    """Deterministic per-stratum downsampling — the training-mixture
    control ("keep 20% of en, all of fr, drop the rest"): a row
    survives iff its md5 bucket falls below its stratum's fraction
    threshold.  Same engine-portable properties as :func:`hash_split`:
    a pure projection predicate (no shuffle, no sampling pass, no RNG
    state), append-stable (new rows never reassign old ones), salt
    re-rolls every draw, and any MD5-capable engine reproduces the
    exact row set.  Strata not in ``fractions`` are kept at
    ``default`` (0 = dropped).  Per-stratum proportions hold in
    expectation; exact quotas would need a per-stratum global sort —
    the wrong trade at 10^12 rows.  NULL strata take ``default``."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default must be in [0,1]")
    bucket = split_bucket(F.col(id_col), salt)

    def keep(frac: float):
        if frac >= 1.0:  # "ffff" < format(0x10000) fails lexically
            return F.lit(True)
        return bucket < F.lit(format(int(frac * _BUCKETS), "04x"))

    pred = keep(default)
    for name, frac in fractions.items():
        pred = F.when(F.col(strata_col) == name, keep(frac)).otherwise(pred)
    return df.where(pred)


def stratified_sample_sql_pred(strata_expr: str, id_expr: str,
                               fractions: Mapping[str, float],
                               default: float = 0.0,
                               salt: str = "") -> str:
    """ANSI-SQL twin of :func:`stratified_sample`'s keep-predicate
    (kept beside the implementation so the threshold layouts cannot
    drift; the DuckDB oracle runs it verbatim)."""
    bucket = f"substr(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), 1, 4)"

    def keep(frac: float) -> str:
        if frac >= 1.0:
            return "TRUE"
        return f"{bucket} < '{format(int(frac * _BUCKETS), '04x')}'"

    whens = [
        f"WHEN {strata_expr} = '{name}' THEN {keep(frac)}"
        for name, frac in fractions.items()
    ]
    return "CASE " + " ".join(whens) + f" ELSE {keep(default)} END"


def hash_split_sql_case(id_expr: str, fractions: Mapping[str, float],
                        salt: str = "") -> str:
    """The ANSI-SQL twin of :func:`hash_split`'s assignment expression
    (used by the DuckDB oracle; kept next to the implementation so the
    two threshold layouts cannot drift)."""
    names = list(fractions)
    bucket = f"substr(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), 1, 4)"
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(
            f"WHEN {bucket} < '{format(int(cum * _BUCKETS), '04x')}' "
            f"THEN '{name}'"
        )
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def pack_sequences(df: DataFrame, tokens_col: str, order_col: str,
                   budget: int, shard_col: str,
                   bin_col: str = "bin_id") -> DataFrame:
    """Assign each row the training bin a greedy token-budget packer
    would start it in: ``bin_id = (cumulative tokens of all EARLIER
    rows in the shard) // budget``, rows ordered by ``order_col``
    within ``shard_col``.  Pure window arithmetic — deterministic,
    engine-portable, one shuffle on the shard key."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    # `div` = exact integral division (no double rounding at 10^15+
    # cumulative tokens); DuckDB's `//` is the oracle twin
    return (
        df.withColumn("__tokens_before", before)
        .withColumn(bin_col, F.expr(f"__tokens_before div {int(budget)}"))
        .drop("__tokens_before")
    )
