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
