"""Null-safe equi-join — the ONE implementation of the house pattern.

NULL group keys are real groups everywhere in this engine (Spark's
groupBy keeps them, the sketch prefilters keep them with dropna=False),
but a plain equi-join never matches NULL = NULL: every branch-join on
group keys must therefore join on eqNullSafe conditions with the right
side's key columns renamed first (so the post-join drop is unambiguous
by NAME — Column-identity drops resolve unreliably through
coalesce/withColumn lineage and can drop the left side's column).

This pattern used to be copy-pasted in four places (plans/raql.py
_join_branch, operators/sampling.py nsjoin, operators/sketch.py
kmv_overlap_pruned and sketch_drift) — the round-11 review extracted
it so the next NULL-handling fix lands once. NULL-key join bugs are
the single most recurrent review class in this repo's history
(rounds 8-10 each fixed one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "left",
    coalesce_keys: bool = False,
    rename_prefix: str = "_nsj_",
) -> DataFrame:
    """Join ``left`` with ``right`` on NULL-SAFE equality of the
    ``on`` columns (present on both sides under the same names).

    The right side's key columns are renamed to ``rename_prefix+name``
    before the join and dropped after (semi/anti joins produce no
    right columns, so nothing to drop there). With
    ``coalesce_keys=True`` (full_outer joins) the output key columns
    are ``coalesce(left, right)`` — a key present on only one side
    keeps its value instead of going NULL.

    ``on=[]`` (the global/one-group form) degenerates to a crossJoin —
    correct only when both sides are single-row relations, which is
    what every caller's global form produces.
    """
    if not on:
        return left.crossJoin(right)
    renamed = {c: rename_prefix + c for c in on}
    r = right
    for c, rc in renamed.items():
        r = r.withColumnRenamed(c, rc)
    cond = None
    for c, rc in renamed.items():
        e = F.col(c).eqNullSafe(F.col(rc))
        cond = e if cond is None else cond & e
    out = left.join(r, cond, how)
    if how in ("leftsemi", "left_semi", "leftanti", "left_anti"):
        return out
    if coalesce_keys:
        rest = [c for c in out.columns if c not in on and c not in renamed.values()]
        return out.select(
            *[
                F.coalesce(F.col(c), F.col(rc)).alias(c)
                for c, rc in renamed.items()
            ],
            *rest,
        )
    return out.drop(*renamed.values())
