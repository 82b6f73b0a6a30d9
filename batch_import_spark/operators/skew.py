"""Skew-defusing salted join.

A shuffle equi-join sends every row of a key to ONE reducer; at
10^12-turn scale one hot conversation / hot entity makes that reducer
the whole job's critical path (the "curse of the last reducer"). AQE
skew-join splitting handles sort-merge cases after the fact; this
operator is the explicit, planner-independent fix for the classic
big-skewed ⋈ small-ish shape:

- LEFT (big, skewed) rows get a deterministic salt in [0, n_salts)
  hashed from the whole row — NO rand(), so retries and re-runs
  produce identical placement (the same discipline as the KG
  pipeline's salted repartition);
- RIGHT rows are replicated once per salt (explode of a literal
  sequence — cost n_salts × |right|, which is why right should be the
  smaller side);
- the join key becomes (key, salt): the hot key's rows now land on
  n_salts reducers instead of one.

Result set is IDENTICAL to the plain join (verified property-style in
tests); only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's
    hot keys spread across ``n_salts`` reducers. Supported ``how``:
    inner and left (the shapes where the left side's skew matters)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(F.xxhash64(F.struct(*left.columns)), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_salted, [*on, "_salt"], how)
    return out.drop("_salt")
