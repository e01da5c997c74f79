"""Skew mitigation for hot-key joins.

First choice is AQE's skew-join splitting (on by default in
:mod:`..session` — it splits oversized sort-merge partitions at runtime).
``salted_join`` is the explicit fallback for the cases AQE doesn't reach:
shuffled-hash joins, a medium build side too big to broadcast but cheap to
replicate, or a hot key known in advance (e.g. the empty-document shingle
bucket, a null-ish default id).

Mechanics: the skewed side gets a uniform random salt in ``[0, salt)``
appended to the key, the other side is replicated once per salt value, and
the join runs on ``(key, salt)`` — so one hot key fans out over ``salt``
shuffle partitions instead of one straggler task.  Cost: the replicated
side's shuffle volume × ``salt``; pick the side accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    replicated: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt it, replicate the
    other side ``salt``×, join on key + salt.  Row-for-row equivalent to
    ``skewed.join(replicated, on, how)`` for inner/left joins."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn(_SALT, F.floor(F.rand(seed) * salt).cast("int"))
    r = replicated.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return s.join(r, keys + [_SALT], how).drop(_SALT)
