"""SAS-date expressions (F1; reference etl.py:236, 240-241).

The reference converts SAS day-offset doubles (days since 1960-01-01) to
ISO strings with a row-at-a-time Python UDF. That UDF forces every row
through the executor↔Python-worker pickle boundary and blocks predicate
pushdown on anything derived from it. Here the same semantics are native
column expressions: whole-stage-codegen-able, pushdown-friendly, and
~100× cheaper per row at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_date_to_date(col: Column | str, compat_falsy_zero: bool = True) -> Column:
    """Days-since-1960 double → DateType.

    ``compat_falsy_zero=True`` replicates the reference's ``if x else None``
    guard (reference etl.py:236): day 0 — 1960-01-01 itself — maps to null,
    exactly like a true null. Set False for the fixed semantics (day 0 →
    1960-01-01), documented divergence per SURVEY.md §7.3 risk 1.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.date_add(F.to_date(F.lit(SAS_EPOCH)), c.cast("int"))
    if compat_falsy_zero:
        return F.when(c.isNull() | (c == 0), F.lit(None).cast("date")).otherwise(d)
    return d


def sas_date_to_iso_string(col: Column | str, compat_falsy_zero: bool = True) -> Column:
    """Bit-compatible variant: ISO-8601 *string* like the reference UDF
    (Python UDFs default to StringType return — SURVEY.md §1.2)."""
    return F.date_format(sas_date_to_date(col, compat_falsy_zero), "yyyy-MM-dd")
