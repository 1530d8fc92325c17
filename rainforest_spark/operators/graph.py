"""Graph analytics operators (extension family).

The repo already runs graph-shaped computations where the reference
needs them (connected-component near-dup clusters in dedup.py,
exact-integer PageRank in text_analysis.textrank_keywords); this module
adds the classic distributed triangle census.  Everything is exact
integers; the ratio outputs follow the round-half-up micro-division
policy from the workload docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_census", "component_census",
           "grid_density_clusters"]


def triangle_census(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Global triangle count, wedge (open-triad) count, and the global
    clustering coefficient ``3·triangles / wedges`` — the standard
    cohesion census over an undirected graph.

    Algorithm (the degree-orientation trick every distributed triangle
    counter uses — e.g. Cohen's MapReduce formulation): orient each
    undirected edge from the endpoint with the SMALLER ``(degree,
    node)`` to the larger.  Every triangle {x,y,z} with π(x)<π(y)<π(z)
    is then counted exactly once as the wedge x→y, x→z closed by the
    oriented edge y→z.  Orientation bounds every out-neighborhood by
    O(√m), so the wedge fan-out is governed by √m — a hub with 10⁶
    neighbors contributes no wedges from its own adjacency (its edges
    all point INTO it), which is what makes this safe on power-law
    graphs at 100 TB.

    Wedges (for the coefficient denominator) are exact per-node
    ``C(d,2)`` sums over the degree dim.  The coefficient is one
    round-half-up integer micro-division.

    Shape: two groupBys on node keys (degree, out-adjacency), the
    wedge fan-out as an in-expression ordered-pair explode over the
    collected O(√m)-bounded out-adjacency (r13 — was a u-keyed
    self-equi-join), one equi-join closure probe on the (y,z) pair —
    all shuffle-on-key, no cartesian.

    Returns one row: ``n_nodes, n_edges, n_triangles, n_wedges,
    clustering_coeff``.
    """
    a, b = F.col(src), F.col(dst)
    # canonicalize: undirected, dedup, no self-loops
    und = (edges.select(F.least(a, b).alias("u"),
                        F.greatest(a, b).alias("v"))
           .filter(F.col("u") != F.col("v")).distinct())
    sym = und.union(und.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long")
                               .alias("d"))
    # π-order: (degree, node); orient low -> high
    e = (sym.join(deg, "u")
         .join(deg.select(F.col("u").alias("v"),
                          F.col("d").alias("dv")), "v")
         .filter((F.col("d") < F.col("dv"))
                 | ((F.col("d") == F.col("dv"))
                    & (F.col("u") < F.col("v"))))
         .select("u", "v", "dv"))
    # wedge pairs ordered by the SAME π-order the closure edge uses —
    # ordering by node id alone would miss triangles whose closing
    # edge runs against the id order.  The out-adjacency is collected
    # per low-π endpoint (O(√m)-bounded by the orientation) sorted by
    # (d, v), and the ordered pairs explode IN-EXPRESSION (r13: this
    # replaces the u-keyed self-equi-join of e with itself — one
    # exchange + one sort fewer; the pair count is identical)
    adj = (e.groupBy("u")
           .agg(F.array_sort(F.collect_list(
               F.struct(F.col("dv").alias("d"),
                        F.col("v").alias("n")))).alias("__adj")))
    arr = F.col("__adj")
    mk = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda j: F.transform(
            F.sequence(j + 1, F.size(arr) - 1),
            lambda i: F.struct(F.get(arr, j)["n"].alias("y"),
                               F.get(arr, i)["n"].alias("z")))))
    wedges = (adj.filter(F.size(arr) >= 2)
              .select(F.explode(mk).alias("__w"))
              .select("__w.y", "__w.z"))
    # NOTE (r13, negative result): a SHUFFLE_HASH hint on the edge
    # side (the q92/q95/q134 corpus-dim pattern) measured WORSE here
    # in both alternating sf10 cycles (181.7 vs 118.6 s, 89.6 vs
    # 71.3 s) and was reverted: the probe side — the wedge stream,
    # C(d,2) rows per node — is far LARGER than the edge dim, so the
    # hint adds a full wedge exchange where the broadcast probe needs
    # none.  The pattern's boundary: hint only when the probe side
    # does not dwarf the dim's broadcast-build cost.
    closed = wedges.join(
        e.select(F.col("u").alias("y"), F.col("v").alias("z")),
        ["y", "z"])
    tri = closed.agg(F.count(F.lit(1)).cast("long").alias("t"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("CAST(sum(d) div 2 AS BIGINT)").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long")
        .alias("n_wedges"))
    out = stats.crossJoin(F.broadcast(tri))
    coeff = F.when(
        F.col("n_wedges") > 0,
        F.expr("(6000000 * t + n_wedges"
               " - pmod(6000000 * t + n_wedges, 2 * n_wedges))"
               " div (2 * n_wedges)").cast("double") / F.lit(1e6))
    return out.select(
        "n_nodes", "n_edges", F.col("t").alias("n_triangles"),
        "n_wedges", coeff.alias("clustering_coeff"))


def component_census(edges: DataFrame, src: str, dst: str,
                     max_iter: int = 25) -> DataFrame:
    """Connected-component census of an undirected graph: per-node
    min-id component labels (the dedup family's
    ``neardup_clusters`` machinery on an arbitrary edge list) rolled
    up to one row per component — ``component_id`` (the min node id),
    ``n_nodes``.  Isolated nodes never reach the edge list and are the
    caller's to count; the census covers every node WITH an edge.

    Shape at 100 TB: O(diameter) rounds of one vertex-keyed shuffle
    each (checkpointed lineage), then ONE map-side-combined groupBy on
    the label.
    """
    from rainforest_spark.operators.dedup import neardup_clusters
    labels = neardup_clusters(edges, src, dst, out_id="v",
                              cluster_col="component_id",
                              max_iter=max_iter)
    return (labels.groupBy("component_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))


def grid_density_clusters(points: DataFrame, x_col: str, y_col: str,
                          key_cols: list[str], cell: int,
                          min_pts: int, max_iter: int = 25) -> DataFrame:
    """Grid-density clustering (a distributed DBSCAN approximation):
    bucket points into ``cell``-sized grid cells, keep cells with
    ≥ ``min_pts`` points (density gate), connect 8-adjacent dense
    cells, and label each dense-cell component with its MIN cell id —
    points in sparse cells come back with a NULL ``cluster_id``
    (noise), never dropped.

    This is the grid-cell relaxation every distributed DBSCAN makes:
    point-level ε-reachability degenerates to an all-pairs join, while
    cell-level density + adjacency is two groupBys, one 9-way literal
    explode on the DENSE-CELL dim, and O(component diameter) label
    rounds (``neardup_clusters``).  Choose ``cell ≈ ε``; coordinates
    are non-negative BIGINTs < 2³¹ (cell ids pack as cx·2³² + cy).

    Returns ``*key_cols, x, y, cluster_id`` (min packed cell id of the
    component; NULL = noise).
    """
    from rainforest_spark.operators.dedup import neardup_clusters
    c = int(cell)
    pts = points.select(*key_cols,
                        F.col(x_col).alias("__x"),
                        F.col(y_col).alias("__y"),
                        F.expr(f"{x_col} div {c}").alias("__cx"),
                        F.expr(f"{y_col} div {c}").alias("__cy"))
    dense = (pts.groupBy("__cx", "__cy")
             .agg(F.count(F.lit(1)).alias("__n"))
             .filter(F.col("__n") >= int(min_pts))
             .withColumn("__cid", F.expr("__cx * 4294967296 + __cy"))
             .select("__cx", "__cy", "__cid"))
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"),
                              F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if not (dx == 0 and dy == 0)])
    reps = (dense.withColumn("__o", F.explode(offs))
            .select((F.col("__cx") + F.col("__o.dx")).alias("__cx"),
                    (F.col("__cy") + F.col("__o.dy")).alias("__cy"),
                    F.col("__cid").alias("__nid")))
    edges = (dense.join(reps, ["__cx", "__cy"])
             .filter(F.col("__cid") < F.col("__nid"))
             .select("__cid", "__nid").distinct())
    labels = neardup_clusters(edges, "__cid", "__nid",
                              out_id="__cid", cluster_col="__lab",
                              max_iter=max_iter)
    # isolated dense cells have no edge — they are their own cluster
    lab = (dense.join(labels, "__cid", "left")
           .select("__cx", "__cy",
                   F.coalesce("__lab", "__cid").alias("cluster_id")))
    return (pts.join(F.broadcast(lab), ["__cx", "__cy"], "left")
            .select(*key_cols, F.col("__x").alias(x_col),
                    F.col("__y").alias(y_col), "cluster_id"))
