"""Privacy mechanisms for training-data release (r14 staging: built and
unit-tested this round; query registration awaits window space — the
r13 window is exactly full).

- :func:`randomized_response`: deterministic k-ary randomized response
  (Warner's local-DP mechanism): each row keeps its true categorical
  value with probability ``keep_permille/1000``, else reports a
  uniformly-drawn category. Both coin flips are md5-derived from the
  row's salt column — engine-portable (the `_hex_bucket` discipline:
  bucket by the hash's own prefix), so a DuckDB oracle can replicate
  the mechanism bit-for-bit and the release is reproducible.
- :func:`rr_debias`: the unbiased count estimator for the mechanism —
  E[reported_c] = n_c·keep + n·(1−keep)/k, so
  n̂_c = (reported_c − n·(1−keep)/k) / keep. Pure rational arithmetic
  in fixed-order doubles (no libm transcendentals — the oracle-surface
  ban).
- :func:`suppress_small_groups`: k-anonymity enforcement to pair with
  the `events_k_anonymity_audit` report — drops every row whose
  quasi-identifier group has fewer than ``k`` members. One group-count
  aggregate joined back on the QI key (map-combinable; the join side is
  the QI domain, corpus-size-free for bounded QI spaces).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _permille(seed: str, salt: Column) -> Column:
    """Deterministic uniform integer in [0, 1000) from md5(seed:salt) —
    the hash's own hex prefix, never hash-of-hash."""
    h = F.md5(F.concat_ws(":", F.lit(seed), salt.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 1000).cast("int")


def randomized_response(
    value: Column,
    categories: Sequence[str],
    salt: Column,
    keep_permille: int = 800,
    seed: str = "rr",
) -> Column:
    """The reported (privatized) category for ``value``. ``categories``
    must enumerate the closed domain (the replacement draw is uniform
    over it — including the true value, per the standard mechanism).
    Deterministic given (seed, salt): replays and oracles reproduce the
    exact release."""
    k = len(categories)
    keep = _permille(f"{seed}:keep", salt) < F.lit(int(keep_permille))
    draw_idx = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(f"{seed}:draw"), salt.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % k
    ).cast("int")
    domain = F.array(*[F.lit(c) for c in categories])
    return F.when(keep, value).otherwise(F.element_at(domain, draw_idx + 1))


def rr_debias(
    reported_count: Column, total: Column, k: int, keep_permille: int = 800
) -> Column:
    """Unbiased true-count estimate from a reported (noisy) count.
    Fixed-order double tree over exact integer inputs — portable."""
    keep = F.lit(keep_permille).cast("double") / F.lit(1000.0)
    leak = (F.lit(1.0) - keep) / F.lit(float(k))
    return (reported_count.cast("double") - total.cast("double") * leak) / keep


def suppress_small_groups(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Drop every row whose quasi-identifier group holds < ``k`` rows.
    The enforcement half of the k-anonymity audit: release = the
    surviving rows. One hash aggregate over the QI domain, joined back
    (the aggregate side is group-domain-sized; Catalyst broadcasts it
    when bounded, AQE decides otherwise). The join is NULL-SAFE per QI
    column (``eqNullSafe`` — still an equi-join key, hash-joinable):
    GROUP BY treats NULLs as one group, so a NULL-keyed group with
    >= k rows must SURVIVE the release exactly as a DuckDB HAVING
    oracle keeps it; a plain inner equi-join silently dropped every
    NULL-QI row regardless of size (r13 advice)."""
    import functools
    import operator

    sizes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("_gsz"))
    keyed = sizes.select(
        *[F.col(c).alias(f"_qi_{c}") for c in qi_cols], "_gsz"
    )
    cond = functools.reduce(
        operator.and_,
        [df[c].eqNullSafe(keyed[f"_qi_{c}"]) for c in qi_cols],
    )
    return (
        df.join(keyed, cond)
        .where(F.col("_gsz") >= F.lit(int(k)))
        .drop("_gsz", *[f"_qi_{c}" for c in qi_cols])
    )


def enforce_l_diversity(
    df: DataFrame, qi_cols: Sequence[str], sensitive_col: str, l: int = 4
) -> DataFrame:
    """Distinct l-diversity (Machanavajjhala et al. 2007): drop every
    row whose quasi-identifier group carries fewer than ``l`` DISTINCT
    values of ``sensitive_col`` — the homogeneity-attack fix
    k-anonymity alone misses (a >= k group whose sensitive attribute
    is constant still discloses it for every member). Same executing
    shape as :func:`suppress_small_groups`: one QI-domain aggregate
    (count_distinct partial-aggregates map-side, so the exchange
    carries (QI, sensitive) pairs at most — bounded by the group
    domain × per-group diversity, never row count), joined back
    NULL-SAFE per QI column (GROUP BY folds NULLs into one group; a
    plain equi-join would silently drop every NULL-QI row)."""
    import functools
    import operator

    sizes = df.groupBy(*qi_cols).agg(
        F.count_distinct(F.col(sensitive_col)).alias("_ndv")
    )
    keyed = sizes.select(
        *[F.col(c).alias(f"_qi_{c}") for c in qi_cols], "_ndv"
    )
    cond = functools.reduce(
        operator.and_,
        [df[c].eqNullSafe(keyed[f"_qi_{c}"]) for c in qi_cols],
    )
    return (
        df.join(keyed, cond)
        .where(F.col("_ndv") >= F.lit(int(l)))
        .drop("_ndv", *[f"_qi_{c}" for c in qi_cols])
    )
