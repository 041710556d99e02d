"""Explicit skew handling: two-level (salted) aggregation and a
hot-key-replicated join (BASELINE north rule: "skew from dense urban
cells is handled by two-level salting plus AQE skew-join splitting").

When to use which (see PLANS.md §7):
* counts/sums — Spark's partial aggregation already combines map-side;
  salting adds nothing. Use plain groupBy.
* holistic aggs (collect_list/set, exact distinct per hot key) —
  ``two_level_agg`` splits the hot key across ``salt`` reducers, then
  merges per-key partials.
* joins where ONE side has heavy-hitter keys and the other side is
  small enough to replicate per salt — ``salted_join`` replicates the
  small side ``salt`` times and scatters the big side uniformly, so a
  single hot key spreads over ``salt`` tasks. AQE's skew-join split
  covers the sort-merge case at runtime; this covers broadcast-unsafe
  hash joins planned ahead of time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic uniform salt derived from the whole row (hash, not
    rand() — keeps jobs replayable/resumable)."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(col_name, F.pmod(row_hash, F.lit(salt)).cast("int"))


def two_level_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """groupBy(keys + salt) partial → groupBy(keys) final.

    ``partial_aggs`` run per (key, salt) shard; ``final_aggs`` merge the
    shards (e.g. partial collect_list → final flatten(collect_list)).
    """
    salted = with_salt(df, salt)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate ``small`` per salt value; scatter ``large`` uniformly;
    join on (key, salt). Output equals ``large.join(small, key, how)``
    (asserted in tests) but a hot key's rows land on ``salt`` tasks."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    large_salted = with_salt(large, salt)
    out = large_salted.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")
