"""Data-quality-check framework (reference etl.py:360-411, fixed).

The reference constructs ``Exception(...)`` without ``raise`` on every
failed check, so all its checks are silent no-ops (SURVEY.md §2.11).
Here checks **raise** :class:`DQError`.

Two referential modes:
- subset (default, the sane semantics): every fact key value appears in
  the dim;
- strict_equality (reference parity): distinct fact-key count must equal
  the dim's distinct row count — reproduces etl.py:391-408's comparison,
  which also fails when the fact simply doesn't exercise every dim value.

Scale note: ``referential`` uses a broadcast left-anti join (one scan of
the fact, no shuffle) rather than two distinct-count jobs per key like
the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DQError(Exception):
    """A data-quality check failed."""


class DQCheck:
    def __init__(self) -> None:
        self.passed: list[str] = []

    def non_empty(self, df: DataFrame, name: str) -> "DQCheck":
        """Reference check 1 (etl.py:369-388), raising."""
        if df.isEmpty():
            raise DQError(f"Invalid dataset. Table '{name}' is empty.")
        self.passed.append(f"non_empty:{name}")
        return self

    def referential(
        self,
        fact: DataFrame,
        fact_key: str,
        dim: DataFrame,
        dim_key: str,
        strict_equality: bool = False,
    ) -> "DQCheck":
        """Reference check 2 (etl.py:391-408), raising.

        Default: subset semantics — fact keys missing from the dim fail.
        ``strict_equality=True`` reproduces the reference's distinct-count
        comparison exactly.
        """
        if strict_equality:
            fact_distinct = fact.select(fact_key).distinct().count()
            dim_distinct = dim.distinct().count()
            if fact_distinct != dim_distinct:
                raise DQError(
                    f"'{fact_key}' in fact table inconsistent with dimension "
                    f"({fact_distinct} distinct fact values vs {dim_distinct} dim rows)"
                )
        else:
            orphans = (
                fact.select(F.col(fact_key))
                .where(F.col(fact_key).isNotNull())
                .join(
                    F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
                    on=fact_key,
                    how="left_anti",
                )
            )
            if not orphans.isEmpty():
                sample = [r[0] for r in orphans.limit(5).collect()]
                raise DQError(
                    f"'{fact_key}' contains values missing from dimension "
                    f"'{dim_key}': sample {sample}"
                )
        self.passed.append(f"referential:{fact_key}")
        return self


def constraint_report(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """Deequ-shape declarative constraint suite: evaluate every metric
    in ONE map-combinable aggregate over one scan (conditional counts —
    never one job per constraint, never an Expand from mixing exact
    DISTINCTs into the same aggregate; a uniqueness constraint runs as
    its own pass and cross-joins in, the approx_distinct_summary
    lesson), then unpivot to one (constraint, metric, passed) row each.

    ``constraints`` entries: ("name", kind, column_or_expr, threshold)
    with kind in {"completeness", "satisfies", "uniqueness"} —
    completeness = non-null fraction of a column, satisfies = fraction
    of rows where the boolean Column holds, uniqueness = distinct/total
    of a column. ``passed`` = metric >= threshold. Metrics are single
    IEEE divisions of exact counts — engine-portable by construction."""
    n = F.count(F.lit(1)).cast("double")
    aggs, uniq = [], []
    for name, kind, target, _thr in constraints:
        if kind == "completeness":
            aggs.append((F.count(target) / n).alias(name))
        elif kind == "satisfies":
            aggs.append(
                (F.count(F.when(target, 1)).cast("double") / n).alias(name)
            )
        elif kind == "uniqueness":
            uniq.append((name, target))
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    base = df.agg(*aggs) if aggs else df.agg(n.alias("_n")).drop("_n")
    for name, col in uniq:
        u = df.agg(
            (F.countDistinct(col).cast("double") / F.count(F.lit(1)).cast("double"))
            .alias(name)
        )
        base = base.crossJoin(u)
    pairs = []
    for name, _kind, _target, thr in constraints:
        pairs.append(
            F.struct(
                F.lit(name).alias("constraint"),
                F.col(name).alias("metric"),
                (F.col(name) >= F.lit(float(thr))).alias("passed"),
            )
        )
    return base.select(F.explode(F.array(*pairs)).alias("r")).select(
        "r.constraint", "r.metric", "r.passed"
    )
