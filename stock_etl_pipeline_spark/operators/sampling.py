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


def sample_to_token_budget(
    df: DataFrame,
    budget: int,
    *,
    count_col: str = "n_tokens",
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Greedy quality-first corpus selection under a token budget: keep
    documents in (quality DESC, id ASC) order while the running inclusive
    token total stays ≤ ``budget`` — exactly
    ``SUM(count) OVER (ORDER BY quality DESC, id) <= budget``, the standard
    "fill the training mix with the best N tokens" operation.

    The naive form is a GLOBAL ordered window — one task sorts the corpus.
    This implementation keeps the exact same selected SET at any
    partitioning while touching only 1/``buckets`` of the data with an
    ordered window:

    1. one narrow aggregate finds the quality range, a second sums token
       mass per quality bucket (``buckets`` rows to the driver — bounded
       by the parameter, not the data);
    2. buckets whose descending cumulative mass fits the budget are kept
       WHOLESALE (a filter — no sort, no window, no shuffle of their rows);
    3. only the single straddling bucket pays the ordered prefix-sum, with
       the better-buckets' mass as a constant offset.

    The bucket→prefix equivalence needs token counts to be non-negative
    (the running sum is then monotone, so inclusion is a prefix of the
    global order and bucket boundaries cannot cut it incorrectly) and
    counts are summed as BIGINTs (no float drift between the bucket-offset
    and windowed arms). Quality may be any orderable numeric; ties resolve
    by id on both arms. At 100 TB raise ``buckets`` so the straddling
    bucket's rows fit one task's sort — the wholesale-kept mass never gets
    sorted at all.

    NULL contract (matches the SQL twin exactly): a NULL ``count_col``
    contributes 0 tokens (the twin wraps the window sum in COALESCE so a
    leading all-NULL prefix keeps its rows instead of producing a NULL
    cumsum), and NULL ``quality_col`` sorts AFTER every real quality —
    both Spark's and DuckDB's ``DESC`` default is NULLS LAST — so
    NULL-quality docs are kept only with leftover budget. Here those rows
    land in a sentinel bucket below bucket 0 and the straddle window pins
    ``desc_nulls_last`` explicitly.

    The input relation is pipeline-cached (``caching.lazy_cache``): this
    operator drives THREE actions over ``df`` — the quality-range
    aggregate, the bucket-mass collect, and the returned keep/straddle
    union — and when ``df`` is the tail of an expensive pipeline (the
    corpus-construction query feeds it the whole dedup + decontamination
    chain) each action re-runs that chain from the scan; AQE stage reuse
    only dedups within ONE action. The cached projection is narrow —
    (id, count, quality, __n) — so MEMORY_AND_DISK holds it at any corpus
    size where the straddling-bucket sort is viable at all. Same
    diamond-DAG discipline as the dedup/ANN signature relations;
    released at the next pipeline entry, no-op under PLAN_ONLY.
    ``SPARK_GRAFT_SAMPLE_CACHE=0`` keeps the uncached chain as an A/B arm.
    """
    import os

    from pyspark.sql import Window

    from ..caching import lazy_cache

    d = df.withColumn("__n", F.coalesce(F.col(count_col).cast("long"), F.lit(0)))
    if os.environ.get("SPARK_GRAFT_SAMPLE_CACHE", "1") != "0":
        d = lazy_cache(d)
    rng = d.agg(
        F.min(quality_col).alias("mn"), F.max(quality_col).alias("mx")
    ).first()
    if rng is not None and rng["mn"] is not None and float(rng["mx"]) > float(
        rng["mn"]
    ):
        mn, mx = float(rng["mn"]), float(rng["mx"])
        width = (mx - mn) / buckets
        bucket = F.least(
            F.floor((F.col(quality_col) - F.lit(mn)) / F.lit(width)),
            F.lit(buckets - 1),
        ).cast("int")
    else:
        # single distinct quality, or all-NULL quality (rng["mn"] None)
        bucket = F.lit(0)
    # NULL quality → sentinel bucket below every real one (sorts last)
    d = d.withColumn(
        "__b", F.when(F.col(quality_col).isNull(), F.lit(-1)).otherwise(bucket)
    )
    mass = {
        r["__b"]: int(r["m"] or 0)
        for r in d.groupBy("__b").agg(F.sum("__n").alias("m")).collect()
    }
    cum = 0
    full: list[int] = []
    b_star = None
    for bb in sorted(mass, reverse=True):
        if cum + mass[bb] <= budget:
            full.append(bb)
            cum += mass[bb]
        else:
            b_star = bb
            break
    keep = d.filter(F.col("__b").isin(full)) if full else d.limit(0)
    if b_star is not None:
        w = (
            Window.orderBy(F.col(quality_col).desc_nulls_last(), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        straddle = (
            d.filter(F.col("__b") == b_star)
            .withColumn("__cum", F.sum("__n").over(w))
            .filter(F.col("__cum") + F.lit(cum) <= F.lit(budget))
            .drop("__cum")
        )
        keep = keep.unionByName(straddle)
    return keep.drop("__n", "__b")


def sql_sample_to_token_budget(
    table: str,
    budget: int,
    *,
    count_expr: str = "n_tokens",
    quality_expr: str = "quality_score",
    id_col: str = "doc_id",
    select: str = "*",
) -> str:
    """The naive-global-window twin (the SEMANTICS, for engines/oracles
    where a single ordered window is fine). COALESCE keeps the NULL-count
    contract: a leading all-NULL prefix must yield cumsum 0 (rows kept),
    not a NULL cumsum (rows silently dropped by ``NULL <= budget``)."""
    return f"""
SELECT {select} FROM (
  SELECT *, SUM(COALESCE({count_expr}, 0)) OVER (
    ORDER BY {quality_expr} DESC, {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum
  FROM {table}
) WHERE __cum <= {budget}
""".strip()


def sample_to_token_budget_by(
    df: DataFrame,
    budgets: dict[str, int],
    *,
    strata_col: str,
    count_col: str = "n_tokens",
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
    default_budget: int = 0,
) -> DataFrame:
    """Per-stratum token budgets — the mix-ratio form of
    :func:`sample_to_token_budget` ("40 % web, 30 % code, ..." expressed as
    absolute token budgets per language/source): within each stratum keep
    documents in (quality DESC, id ASC) order while the stratum's running
    token total fits ITS budget. Strata not listed get ``default_budget``
    (0 = dropped).

    Unlike the global form, the naive window is already scale-shaped here:
    PARTITION BY stratum spreads the sort across strata, so this runs the
    one-pass partitioned cumsum directly — the bucketed two-phase dance
    only pays off when a single ordered partition must hold the whole
    corpus. A single elephant stratum at 100 TB is the signal to run the
    global form per stratum instead.
    """
    from pyspark.sql import Window

    budget_map = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col(quality_col).desc_nulls_last(), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn(
            "__budget",
            F.coalesce(budget_map[F.col(strata_col)], F.lit(int(default_budget))),
        )
        .withColumn(
            "__cum",
            F.sum(F.coalesce(F.col(count_col).cast("long"), F.lit(0))).over(w),
        )
        .filter(F.col("__cum") <= F.col("__budget"))
        .drop("__budget", "__cum")
    )


def sql_sample_to_token_budget_by(
    table: str,
    budgets: dict[str, int],
    *,
    strata_col: str,
    count_expr: str = "n_tokens",
    quality_expr: str = "quality_score",
    id_col: str = "doc_id",
    default_budget: int = 0,
    select: str = "*",
) -> str:
    whens = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(v)}" for k, v in budgets.items()
    )
    case = f"CASE {whens} ELSE {int(default_budget)} END"
    return f"""
SELECT {select} FROM (
  SELECT *, SUM(COALESCE({count_expr}, 0)) OVER (
    PARTITION BY {strata_col}
    ORDER BY {quality_expr} DESC, {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum
  FROM {table}
) WHERE __cum <= ({case})
""".strip()
