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


def triangle_counts(edges: DataFrame, a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Per-node triangle counts over an undirected edge list
    (canonical ``a < b`` rows, no duplicates) — DEGREE-oriented wedge
    join (node-iterator++ / Cohen's MapReduce orientation).

    Why degree order and not id order (the r12 verdict's skew flag): a
    wedge join fans out quadratically in the ORIENTING vertex's
    out-degree. Id orientation leaves a low-id hub with out-degree
    ~deg(hub), so one boilerplate doc in d edges makes one task
    evaluate O(d²) wedge pairs. Orienting every edge from its
    lower-(degree, id) endpoint bounds every out-degree by O(√|E|)
    (a vertex keeps an out-edge only toward HIGHER-degree neighbors,
    and there can only be √|E| vertices of degree ≥ √|E|), so total
    wedges ≤ |E|^1.5 no matter how skewed the degree distribution —
    the hub's d² blowup becomes d wedges oriented INTO it. Measured at
    1M edges with a 100k-degree hub: the id-oriented join is a
    single-task 5e9-pair stage; degree-oriented finishes in seconds
    (tools/extrapolate_triangles.py).

    Each triangle {x,y,z} (x<y<z in the degree order) is generated
    exactly once: wedge (x→y, x→z) with key(y)<key(z), closed by the
    oriented edge y→z. Per-node counts explode the three roles.

    The input should be pinned (eagerly checkpointed) by the caller if
    it is the output of an expensive pipeline — it is scanned four
    times (degree pass + three join legs).
    """
    a, b = F.col(a_col), F.col(b_col)
    deg = (
        edges.select(a.alias("v"))
        .unionAll(edges.select(b.alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        edges.join(deg.withColumnRenamed("v", a_col).withColumnRenamed("d", "da"), a_col)
        .join(deg.withColumnRenamed("v", b_col).withColumnRenamed("d", "db"), b_col)
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (a < b)
    )
    oriented = ed.select(
        F.when(a_first, a).otherwise(b).alias("src"),
        F.when(a_first, b).otherwise(a).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    ).localCheckpoint(eager=False)
    w1 = oriented.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    w2 = oriented.select("src", F.col("dst").alias("z"), F.col("ddst").alias("dz"))
    wedges = w1.join(w2, "src").where(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closing = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = wedges.join(closing, ["y", "z"]).select(
        F.col("src").alias("x"), "y", "z"
    )
    roles = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return roles.groupBy("node").agg(F.count(F.lit(1)).alias("tri_cnt"))
