"""Bounded-memory sketch operators with exact verification passes.

The house rule (queries.py header) is cross-engine determinism, which
rules out emitting sketch *estimates* as results. The pattern here is
the two-pass one: a bounded-memory sketch pass produces a CANDIDATE
superset with a proven coverage guarantee, then an exact pass over
only the candidates produces the final — exactly correct — answer.
The sketch's job is to bound memory and shuffle width at 100 TB, not
to appear in the output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, col: str, k_counters: int = 256
) -> DataFrame:
    """Phase 1 of exact heavy hitters: a mergeable Misra-Gries summary
    per partition (Agarwal et al., "Mergeable Summaries", PODS'12).

    Per Arrow batch the update is vectorized: add the batch's
    ``value_counts`` into the running counter dict, then if more than
    ``k_counters`` counters remain, subtract the (k+1)-th largest
    count from all and drop the non-positive — the standard mergeable
    MG step. Total subtracted over a partition stream of N_p items is
    <= N_p/(k_counters+1), so every item with in-partition frequency
    > N_p/(k_counters+1) ends with a positive counter and survives.
    Pigeonhole lifts this to the corpus: an item with global share
    > 1/(k_counters+1) must exceed that share in at least one
    partition, hence appears in the union of partition summaries.

    Memory is O(k_counters) per task regardless of domain size — the
    point at 100 TB, where the token domain is billions and a full
    groupBy of it is the shuffle this avoids. Returns a small
    DataFrame of distinct candidate values (column named ``col``);
    the candidate SET depends on partitioning, but phase 2's exact
    filter makes the final answer partition-invariant.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k_counters:
                cut = sorted(counters.values(), reverse=True)[k_counters]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(mg, schema=f"{col} string").distinct()


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    k_counters: int = 256,
    threshold_den: int = 100,
) -> DataFrame:
    """Exact heavy hitters (share > 1/threshold_den) without shuffling
    the full value domain: Misra-Gries candidates (phase 1, bounded
    memory, map-only) then ONE aggregation that counts candidates
    exactly and totals everything else into a single overflow bucket
    (so N comes from the same pass). Requires
    ``threshold_den < k_counters + 1`` — then the candidate superset
    guarantee (see misra_gries_candidates) makes the output EXACTLY
    ``SELECT col, count(*) GROUP BY col HAVING count(*)*den > N``.

    Returns (col, cnt, share_ppm) with share_ppm = cnt*1e6 div N —
    integer-exact cross-engine.
    """
    if threshold_den >= k_counters + 1:
        raise ValueError(
            "coverage guarantee needs threshold_den < k_counters + 1"
        )
    cands = misra_gries_candidates(df, col, k_counters)
    return heavy_hitters_verify(df, col, cands, threshold_den)


def heavy_hitters_verify(
    df: DataFrame, col: str, cands: DataFrame, threshold_den: int
) -> DataFrame:
    """Phase 2, shared by the batch and streaming MG paths: count ONLY
    the candidate values exactly (everything else folds into one
    overflow bucket so N comes from the same pass) and keep those with
    share > 1/threshold_den. Correct whenever ``cands`` is a superset
    of the true heavy hitters — the MG coverage guarantee."""
    cands = cands.select(col).withColumn("is_cand", F.lit(True))
    keyed = df.select(col).join(F.broadcast(cands), col, "left").select(
        F.when(F.col("is_cand"), F.col(col)).alias("k")
    )
    counts = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n_total"))
    return (
        counts.filter(F.col("k").isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * threshold_den > F.col("n_total"))
        .select(
            F.col("k").alias(col),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("cnt * 1000000 div n_total").cast("bigint").alias(
                "share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------- HLL

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
# rho reads the 54 bits above the register index (md5_long is 60-bit)
HLL_RHO_BITS = 60 - HLL_P
# alpha_64 = 0.709 as a ratio; estimate arithmetic is all-integer:
# est = (709 * m^2 * 2^39) div denom div 1000 with
# denom = sum_j 2^(39 - rho_j)  (scaled 2^-rho, truncated below 2^-39
# identically on both engines). 709 * 4096 * 2^39 = 1.596e18 < 2^63.
_HLL_SCALE = 1 << 39
_HLL_NUM = 709 * HLL_M * HLL_M * _HLL_SCALE


def hll_registers(df: DataFrame, group_col: str, key_col) -> DataFrame:
    """HyperLogLog register build (Flajolet et al. 2007), portable and
    integer-exact: one md5 per key, register index = low p bits,
    rho = 1 + leading zeros of the remaining 54 bits (computed via
    lpad(bin(h), 54, '0') string scan — identical in DuckDB, so the
    oracle reproduces the registers bit-for-bit).

    Returns (group_col, reg, rho) with one row per NON-EMPTY register:
    ``groupBy(group, reg).max(rho)`` — the standard mergeable HLL
    union (max per register is associative/commutative, so partial
    aggregation does the map-side combine and re-aggregating sketches
    from different shards is the same operation). At 100 TB the
    shuffle moves O(groups * m) rows, never O(distinct keys) — the
    whole point vs countDistinct's full key shuffle.
    """
    from etl_everywhere_hub_spark.functions.hashing import md5_long

    h = md5_long(key_col.cast("string"))
    hb = F.shiftright(h, HLL_P)
    rho = F.when(hb == 0, F.lit(HLL_RHO_BITS + 1)).otherwise(
        F.instr(F.lpad(F.bin(hb), HLL_RHO_BITS, "0"), "1")
    )
    return (
        df.select(
            F.col(group_col),
            F.pmod(h, F.lit(HLL_M)).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(group_col, "reg")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_col: str) -> DataFrame:
    """Fold per-group registers into the raw HLL estimate — pure
    integer arithmetic so Spark and the DuckDB oracle agree to the
    last digit. Empty registers contribute 2^-0 = 1 (scaled 2^39) via
    the (m - n_regs) correction term. Returns
    (group_col, n_regs, sum_rho, est_hll); callers join the exact
    count alongside for the audit (q-series contract: sketches are
    audited against exact, never emitted as floats)."""
    term = F.expr(f"shiftright({_HLL_SCALE}L, rho)")
    return (
        registers.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_regs"),
            F.sum("rho").cast("long").alias("sum_rho"),
            F.sum(term).cast("long").alias("denom_part"),
        )
        .select(
            group_col,
            "n_regs",
            "sum_rho",
            F.expr(
                f"{_HLL_NUM}L div "
                f"(denom_part + ({HLL_M} - n_regs) * {_HLL_SCALE}L) div 1000"
            )
            .cast("long")
            .alias("est_hll"),
        )
    )
