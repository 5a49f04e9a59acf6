"""Connected components over a pair graph — dedup-cluster resolution.

Near-dup detection (MinHash LSH, embedding near-dup) yields *pairs*;
turning pairs into dedup groups needs the connected components of the
pair graph (A~B, B~C ⇒ {A,B,C} one cluster, keep one representative).

Implementation: iterative min-label propagation over DataFrames — the
standard large-graph approach when a graph library isn't available
(GraphFrames' own CC is this algorithm). Each round every vertex
adopts the minimum label among itself and its neighbors; convergence
in O(diameter) rounds; each round is one join + one aggregate (both
shuffles on the vertex id, AQE-coalesced). Near-dup graphs are
overwhelmingly tiny cliques (diameter ≤ 2-3), so rounds stay in the
single digits at any scale.

Driver involvement is one convergence count per round (an O(1)
scalar), not data — no collect of vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) — component = min vertex id reachable. Vertices
    with no edges are their own singleton component."""
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        # materialize once: edge derivation is often an expensive upstream
        # pipeline (LSH pair mining) that must not re-run every iteration
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        # convergence check: one scalar to the driver per round
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster docs by near-dup pairs; (doc_id, component, is_representative)."""
    labels = connected_components(
        df.select(id_col), pairs, id_col=id_col, src_col="id_a", dst_col="id_b"
    )
    return labels.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("is_representative"),
    )
