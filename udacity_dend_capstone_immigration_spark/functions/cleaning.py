"""Cleaning expressions (F2-F4; reference etl.py:237, 254-256, 266-269).

Native-expression replacements for the reference's Python UDFs — same
semantics, JVM-side execution (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def valid_birth_year(col: Column | str, as_string: bool = False) -> Column:
    """F2 (reference etl.py:237): keep 1900 <= yr <= 2016 (inclusive both
    ends), else null. The reference UDF also nulls falsy 0.0 — subsumed by
    the range check.

    ``as_string=True`` reproduces the reference's stringified-double output
    (``'1955.0'``); default returns a proper IntegerType.
    """
    c = F.col(col) if isinstance(col, str) else col
    kept = F.when(c.between(1900, 2016), c)
    if as_string:
        return kept.cast("string")
    return kept.cast("int")


def port_city(col: Column | str) -> Column:
    """F3a (reference etl.py:254): text before the first comma, trimmed.

    The reference UDF guards with ``if port_name else None`` — empty
    string (falsy) maps to null, not ''. Pinned here (caught by the
    property suite, tests/test_properties.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit(None).cast("string")).otherwise(
        F.trim(F.element_at(F.split(c, ","), 1))
    )


def port_state_code(col: Column | str) -> Column:
    """F3b (reference etl.py:255-256): text after the first comma if a comma
    exists, trimmed; else null.

    Note: reference takes ``split(',')[1]`` — the *second* element, not the
    rest — so ``'X, Y, Z'`` yields ``'Y'``. Pinned here.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ",")
    return F.when(F.size(parts) > 1, F.trim(F.element_at(parts, 2)))


INVALID_COUNTRY_PATTERN = "^No Country.*|INVALID.*|Collapsed.*"


def invalid_country_to_na(col: Column | str) -> Column:
    """F4 (reference etl.py:266-269): mark invalid country labels as 'NA'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, INVALID_COUNTRY_PATTERN, "NA")
