"""Skew-aware equi-join via key salting.

AQE's skew-join splitting handles moderate skew at runtime; for
pathological hot keys (one wallet/token owning >50% of rows — common in
on-chain data where a router contract dominates), explicit salting
bounds any single task's input deterministically:

- fact side: add ``salt = pmod(hash(<all columns>), n)`` — deterministic,
  no rand() (reruns and retries must produce identical partitioning);
- dim side: explode each row into n copies, one per salt value;
- join on (key, salt).

Cost: dim side inflates n×; use only when the dim is small relative to
the skew being removed (else prefer AQE or a broadcast join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side. Semantics
    identical to ``skewed.join(other, on, how)`` for how in
    ('inner', 'left'); ``on`` columns must exist on both sides."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)),
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted.join(replicated, [*keys, "__salt"], how).drop("__salt")
