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

from ..materialize import materialize


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
        .transform(materialize)
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
        new_labels = new_labels.transform(materialize)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # labels still moving after the budget: results would be
        # silently wrong (a chain longer than max_iterations keeps
        # multiple labels per true component). Refuse, same contract
        # as the star variant.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} rounds ({changed} labels still moving); "
            f"raise max_iterations or use algorithm='star'"
        )
    return labels


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 15,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — converges in O(log diameter) rounds where min-label
    propagation needs O(diameter), so chain-shaped dup graphs (doc A ~
    doc B ~ doc C ... without A ~ C) stop costing one shuffle round
    per hop.

    Round = two join+agg stages over the edge set only (no vertex
    frame in the loop): large-star hangs every larger neighbor off
    each node's minimum, small-star then flattens the remaining small
    edges. The fixpoint is a star forest with every member pointing
    directly at its component's minimum id. Edge state is
    checkpointed per round (lineage would otherwise double); the
    driver sees one convergence scalar per round.
    """
    u, v = F.col("u"), F.col("v")
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(u != v)
        .select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .distinct()
        .transform(materialize)
    )
    n_edges = e.count()  # cheap: frame is checkpointed
    for _ in range(max_iterations):
        # large-star: emit (bigger-neighbor → min of closed neighborhood)
        sym = e.union(e.select(v.alias("u"), u.alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(m, "u")
            .filter(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
            .distinct()
            # pin: feeds BOTH the small-star aggregate and the flatten
            # join — unpinned, the whole large-star subtree (union +
            # corpus-scale groupBy + join + distinct) evaluates twice
            # per round (r15 opt)
            .transform(materialize)
        )
        # small-star: flatten each node's remaining neighbors (all
        # smaller, by construction above) onto its minimum
        m2 = large.groupBy("u").agg(F.min("v").alias("m"))
        flattened = (
            large.join(m2, "u")
            .select(v.alias("u"), F.col("m").alias("v"))
            .filter(u != v)
        )
        hung = m2.select("u", F.col("m").alias("v"))
        new_e = flattened.union(hung).distinct().transform(materialize)
        # set equality as |new| == |old| plus new ⊆ old (both frames
        # are distinct, so one anti-join direction suffices). ONE job:
        # left-join new→old and count rows + matches together, instead
        # of a count job plus an exceptAll job per converged round —
        # at scale that is one full pass over the edge set, not two.
        stats = (
            new_e.join(e.withColumn("_old", F.lit(1)), ["u", "v"], "left")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("_old").alias("matched"),
            )
            .collect()[0]
        )
        n_new = stats["n"]
        converged = n_new == n_edges and stats["matched"] == n_new
        e, n_edges = new_e, n_new
        if converged:
            break
    else:
        # exhausting the budget WITHOUT reaching the star-forest
        # fixpoint would leave some vertex with two outgoing edges —
        # the final join would then emit duplicate (id, component)
        # rows and downstream keeper elections would silently score a
        # doc in two windows. Refuse instead: at O(log diameter)
        # rounds, hitting this means the budget (or the graph) is
        # genuinely pathological and the caller must decide.
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iterations} rounds ({n_edges} star edges remain); "
            f"raise max_iterations"
        )
    ptr = e.select(u.alias("id"), v.alias("component"))
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(ptr, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "star",
) -> DataFrame:
    """Cluster docs by near-dup pairs; (doc_id, component,
    is_representative). ``algorithm="star"`` (default — O(log d)
    rounds) or ``"label"`` (min-label propagation, O(d) rounds; fine
    when dup clusters are known to be tiny cliques)."""
    impl = connected_components_star if algorithm == "star" else connected_components
    labels = impl(
        df.select(id_col), pairs, id_col=id_col, src_col="id_a", dst_col="id_b"
    )
    return labels.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("is_representative"),
    )


def keep_best_per_component(
    df: DataFrame,
    pairs: DataFrame,
    quality,
    id_col: str = "doc_id",
    algorithm: str = "star",
) -> DataFrame:
    """Dedup-cluster resolution with a QUALITY policy: keep the
    highest-quality member of each duplicate cluster (ties → smaller
    id) instead of the smallest-id representative — the curation
    choice a real pipeline wants (drop the low-quality mirror, keep
    the clean original). ``quality`` is any deterministic Column over
    ``df``'s rows. Returns (id, component, quality, keep).

    Scale shape: the component labels come from the same O(log d)
    star-contraction as dedup_components; the keeper election is one
    window over components — partitioned by component id, and dup
    clusters are tiny (bounded by the pair-mining bands), so no
    single window partition can be corpus-sized."""
    from pyspark.sql import Window

    labels = dedup_components(df, pairs, id_col, algorithm).select(
        id_col, "component"
    )
    scored = df.select(F.col(id_col), quality.alias("quality")).join(
        labels, id_col
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc(id_col)
    )
    return scored.select(
        id_col,
        "component",
        "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )
