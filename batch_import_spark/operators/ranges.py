"""Range (interval) join — point-in-interval matching at scale.

Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as a
broadcast-nested-loop (O(|L|·|R|) comparisons); this operator
bucketizes time into fixed-width bins, explodes each interval over
the bins it covers, and equi-joins points to intervals on the bin —
candidates are then re-filtered exactly. Cost: |points| +
Σ(interval_span / bin) rows through ONE hash join, shuffle keyed on
the bin (add interval keys to ``extra_keys`` to co-partition by
tenant/user as well). Named in the task contract's custom-operator
examples (as-of join, range join); the same grid trick as the
spatial index (operators/spatial.py), one dimension instead of two.

Pick ``bin_seconds`` near the typical interval length: much smaller
multiplies the interval explosion, much larger grows candidate
fan-in per bin. Skewed bins (a hot hour) split via AQE like any
skewed hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bin_seconds: int = 3600,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (``start <= ts <= end``, inclusive both ends).

    A point lives in exactly one bin and an interval appears at most
    once per bin, so the equi-join produces no duplicate pairs — no
    dedup pass needed.
    """
    keys = list(extra_keys or [])

    def _bin(c: str):
        # NTZ timestamps can't cast straight to long; route via
        # TIMESTAMP (wall time preserved — sessions pin UTC)
        return F.floor(F.col(c).cast("timestamp").cast("long") / bin_seconds)

    p = points.withColumn("_bin", _bin(ts))
    i = intervals.withColumn("_bin", F.explode(F.sequence(_bin(start), _bin(end))))
    return (
        p.join(i, ["_bin", *keys])
        .where(F.col(ts).between(F.col(start), F.col(end)))
        .drop("_bin")
    )
