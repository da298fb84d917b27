"""Deterministic hash-based sampling and dataset splits.

The training-data op Spark's ``df.sample`` cannot give you: ``sample`` is
seeded per-partition, so the SAME row flips in/out of the sample when the
input is repartitioned, compacted, or re-ingested. Hashing the row KEY
instead makes membership a pure function of the data — stable across
partitionings, engines, and re-runs, and automatically consistent between
tables that share the key (join a sampled fact to its sampled dim and the
keys line up).

Mechanics: u(key) = first 60 md5 bits / 2^60 ∈ [0,1) (same hash discipline
as operators/sketches.py); a p-sample keeps u < p; a train/val/test split
cuts [0,1) at the cumulative fractions. All comparisons are against exact
dyadic doubles — cross-engine identical, no rounding grid needed.

Reference parity: the reference has no sampling at all; this is part of the
training-data extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import _rank_value, sql_rank_value

_SCALE = float(1 << 60)


def hash_unit(col: str) -> Column:
    """Deterministic uniform u ∈ [0,1) from a key column."""
    return _rank_value(col) / F.lit(_SCALE)


def sql_hash_unit(col: str) -> str:
    return f"(CAST({sql_rank_value(col)} AS DOUBLE) / CAST({_SCALE!r} AS DOUBLE))"


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows with u(key) < fraction — repartition/rerun-stable."""
    return df.filter(hash_unit(key_col) < F.lit(float(fraction)))


def split_column(key_col: str, fractions: dict[str, float]) -> Column:
    """Label each row with its split by cutting [0,1) at cumulative
    fractions; the last split absorbs the remainder (fractions may sum to
    < 1, never > 1)."""
    names = list(fractions)
    total = sum(fractions.values())
    assert total <= 1.0 + 1e-12, f"split fractions sum to {total} > 1"
    u = hash_unit(key_col)
    expr = F.lit(names[-1])
    cum = 0.0
    cuts = []
    for name, frac in list(fractions.items())[:-1]:
        cum += frac
        cuts.append((name, cum))
    for name, cut in reversed(cuts):
        expr = F.when(u < F.lit(cut), F.lit(name)).otherwise(expr)
    return expr


def sql_split_column(key_col: str, fractions: dict[str, float]) -> str:
    names = list(fractions)
    u = sql_hash_unit(key_col)
    cum = 0.0
    whens = []
    for name, frac in list(fractions.items())[:-1]:
        cum += frac
        whens.append(f"WHEN {u} < CAST({cum!r} AS DOUBLE) THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def stratified_keep(
    key_col: str, strata_col: str, fractions: dict[str, float], default: float = 1.0
) -> Column:
    """Deterministic per-stratum Bernoulli keep flag — corpus BALANCING
    (downsample overrepresented languages/sources by hashing the row key
    against a per-stratum threshold). Same row → same verdict on any
    partitioning/engine/rerun; strata not listed keep ``default``.

    A SALTED hash (key ⊕ stratum-independent salt 'strat|') decorrelates
    this decision from split_column's: a doc at u=0.05 must not be "always
    sampled AND always train" — independent decisions need independent
    hash families.
    """
    u = hash_unit_salted(key_col, "strat|")
    expr: Column = F.lit(float(default))
    for name, frac in fractions.items():
        expr = F.when(F.col(strata_col) == name, F.lit(float(frac))).otherwise(expr)
    return u < expr


def sql_stratified_keep(
    key_col: str, strata_col: str, fractions: dict[str, float], default: float = 1.0
) -> str:
    u = sql_hash_unit_salted(key_col, "strat|")
    whens = " ".join(
        f"WHEN {strata_col} = '{name}' THEN CAST({float(frac)!r} AS DOUBLE)"
        for name, frac in fractions.items()
    )
    return f"({u} < (CASE {whens} ELSE CAST({float(default)!r} AS DOUBLE) END))"


def hash_unit_salted(col: str, salt: str) -> Column:
    """u ∈ [0,1) from md5(salt || key) — an independent hash family per
    salt, for decisions that must be uncorrelated with the unsalted one."""
    base = F.expr(
        f"CAST(conv(substring(md5(concat('{salt}', CAST({col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return base / F.lit(_SCALE)


def sql_hash_unit_salted(col: str, salt: str) -> str:
    return (
        f"(CAST(('0x' || substring(md5(concat('{salt}', CAST({col} AS VARCHAR))), 1, 15))::BIGINT AS DOUBLE)"
        f" / CAST({_SCALE!r} AS DOUBLE))"
    )


def pack_sequences(
    df: DataFrame,
    *,
    seq_len: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Deterministic sequence packing — the concatenate-then-chop layout a
    causal-LM training pipeline feeds its dataloader: documents are laid
    out in a deterministic pseudo-random order and chopped into fixed
    ``seq_len`` token windows; a document may straddle a window boundary
    (the standard GPT-style packing, no padding waste).

    Distribution shape: documents hash-shard into ``shards`` independent
    streams (salted hash → uncorrelated with split/balance decisions);
    within a shard the layout order is (hash, id) and the token offsets
    are one window cumulative sum sharing the shard partitioning — one
    shuffle, one per-shard sort, no driver state. ``shards`` is the
    parallelism knob: at 100 TB set it so a shard's documents fit a task's
    sort (the packing is embarrassingly parallel across shards by
    construction; sequence ids are (shard, seq_id) pairs so shards never
    coordinate).

    Determinism: the layout is a pure function of (id, salt, seq_len,
    shards) — repartition/rerun-stable, same property as split_column.

    Returns one row per input document: (id_col, count_col, shard, seq_id,
    offset, end_seq) where seq_id/offset locate the document's first token
    in its shard's window stream and end_seq is the window holding its
    last token (end_seq > seq_id ⇔ the doc straddles a boundary). Callers
    reconstruct window w of shard s by concatenating docs with
    seq_id ≤ w ≤ end_seq in (u, id) order.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from pyspark.sql import Window

    u = hash_unit_salted(id_col, salt)
    w = Window.partitionBy("shard").orderBy("u", id_col)
    return (
        df.select(id_col, count_col)
        .withColumn("u", u)
        .withColumn("shard", F.floor(F.col("u") * shards).cast("int"))
        .withColumn("start_tok", F.sum(count_col).over(w) - F.col(count_col))
        .select(
            id_col,
            count_col,
            "shard",
            F.floor(F.col("start_tok") / seq_len).cast("bigint").alias("seq_id"),
            (F.col("start_tok") % seq_len).cast("bigint").alias("offset"),
            F.floor(
                (F.col("start_tok") + F.greatest(F.col(count_col), F.lit(1)) - 1)
                / seq_len
            )
            .cast("bigint")
            .alias("end_seq"),
        )
    )
