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
    from pyspark.sql import Window

    def _sig(df: DataFrame):
        """(row count, xor of xxhash64(u,v), xor of an independently
        seeded second hash) over a distinct edge frame — a set
        signature. One map-only aggregate over the just-checkpointed
        frame (scan of pinned blocks, no shuffle beyond the 1-row
        reduce). xor, not sum: the session runs ANSI mode, where a
        sum of 64-bit hashes would overflow-throw."""
        h1 = F.xxhash64("u", "v")
        h2 = F.xxhash64("v", "u", F.lit(0x9E3779B9))
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(h1), F.lit(0)).alias("x"),
            F.coalesce(F.bit_xor(h2), F.lit(0)).alias("s"),
        ).collect()[0]
        return row["n"], row["x"], row["s"]

    n_edges, x_edges, s_edges = _sig(e)
    wu = Window.partitionBy("u")
    for _ in range(max_iterations):
        # large-star: every bigger neighbor hangs off the minimum of
        # each node's closed neighborhood. min-over-neighborhood as a
        # WINDOW over the symmetric frame (r16, r15 verdict #4): the
        # r15 round ran groupBy(u)+join(sym, m) — two consumers of sym
        # and an extra exchange — where one partition-by-u window
        # computes the per-row min in a single pass of one exchange.
        sym = e.union(e.select(v.alias("u"), u.alias("v")))
        large = (
            sym.withColumn("m", F.least(F.min("v").over(wu), u))
            .filter(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
        )
        # small-star fused the same way: per-node minimum as a window
        # (every neighbor in `large` is smaller than u by construction,
        # so the closed-neighborhood min is just min(v)), then each row
        # (u, v, m) emits its flattened edge (v, m) and its hung edge
        # (u, m); u > v ≥ m throughout, so u != m always holds and the
        # only filter needed is v != m on the flattened copy. The
        # final distinct collapses the per-row duplicate hung edges —
        # the same set the r15 groupBy+join+union produced (proven:
        # flattened = {(v, min) : v ∈ N(u), v != min}, hung =
        # {(u, min)} — identical generators, set-equal after distinct).
        # Per round this saves the `large` pin job, one exchange and
        # two joins; `large` now has exactly ONE consumer.
        lm = large.withColumn("m", F.min("v").over(wu))
        new_e = (
            lm.select(
                F.explode(
                    F.array(
                        F.struct(v.alias("u"), F.col("m").alias("v")),
                        F.struct(u.alias("u"), F.col("m").alias("v")),
                    )
                ).alias("_e")
            )
            .select("_e.u", "_e.v")
            .filter(u != v)
            .distinct()
            .transform(materialize)
        )
        # convergence: set equality of two DISTINCT frames via the
        # (count, xor-hash, sum-hash) signature — one map-only
        # aggregate over the just-pinned frame instead of the r15
        # full join new→old (a corpus-scale shuffle per round at 100
        # TB). Equal counts with both 64-bit signatures colliding on
        # unequal sets is ~2^-128 — far below the engine's documented
        # 60-bit-hash posture (~1e-14) that every hashed-shingle
        # verify already accepts.
        n_new, x_new, s_new = _sig(new_e)
        converged = (n_new, x_new, s_new) == (n_edges, x_edges, s_edges)
        e, n_edges, x_edges, s_edges = new_e, n_new, x_new, s_new
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
