"""Skew mitigation for hot join keys.

AQE's skew-join split (on in :func:`~interference_spark.engine.build_spark`)
handles most skew by splitting oversized sort-merge partitions at runtime.
Explicit salting remains necessary when the hot key's rows must ALL meet the
same task anyway — a following ``groupBy`` on the join key, a shuffled-hash
build side, or a streaming stateful op — or when one key is so hot that even
a split partition's probe side won't fit.

``salted_join`` replicates the *small* side ``salt`` ways (bounded, explicit
cost: |right| × salt rows) and scatters the large side's hot rows across
``salt`` reducers with a deterministic per-row salt — deterministic so task
retries and speculative execution reproduce identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__ifs_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    ``on`` must be column name(s) present on both sides (equi-join).
    The salt is ``xxhash64`` of the large side's whole row — deterministic,
    uniform, and independent of the join key (which is constant within the
    hot group, so hashing the key alone would not scatter it).

    Only join types whose output is defined per LARGE-side row are
    supported: with the small side replicated ``salt`` ways, a right/full
    outer join would emit every unmatched small-side row once PER SALT
    (salt× duplicates) — rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated small side would duplicate unmatched right rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt))
    l = large.withColumn(_SALT, lsalt.cast("int"))
    r = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, keys + [_SALT], how)
    return out.drop(_SALT)
