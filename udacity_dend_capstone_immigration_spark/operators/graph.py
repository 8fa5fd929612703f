"""Iterative graph algorithms beyond connected components.

PageRank here is the template for fixed-point iteration on Spark: each
iteration is one join + one aggregate (shuffle on the edge key), lineage
is truncated per iteration with a lazy ``localCheckpoint`` so the plan
does not grow with the iteration count, and every floating-point
aggregation uses the exact-decimal-sum trick (``workload.base`` module
doc) so results are bit-identical across engines, partitionings, and
retries — the property that makes an iterative distributed algorithm
debuggable at all.

Dangling nodes (no out-edges) keep only the teleport mass — the
simplified variant without dangling-mass redistribution; documented
because implementations differ and the DuckDB oracle mirrors exactly
this choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``edges`` (src, dst).

    Per iteration: contribution per edge is ``(damping * r_src) / deg_src``
    (per-row double arithmetic — deterministic), the per-node sum is an
    exact decimal sum (order-independent), and the teleport base is
    ``(1 - damping) / N`` computed in double exactly once — the identical
    expression sequence the oracle states, so ranks match DuckDB to the
    last bit after any number of iterations.

    One shuffle per iteration (contribs keyed by dst); degree and rank
    frames stay partitioned by node id, so at 1000 executors each
    iteration is a single co-partitioned exchange, never a broadcast of
    the rank vector.
    """
    n = nodes.count()
    node = nodes.select(F.col(id_col).alias("node"))
    base = (F.lit(1.0) - F.lit(damping)) / F.lit(float(n))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = node.select("node", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                ((F.lit(damping) * F.col("r")) / F.col("deg")).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(28,10)")).cast("double").alias("s")
        )
        ranks = (
            node.join(summed, "node", "left")
            .select("node", (base + F.coalesce(F.col("s"), F.lit(0.0))).alias("r"))
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("node").alias(id_col), F.col("r").alias("pagerank"))
