"""Connected components over a pair graph — dedup CLUSTERING.

Near-dup detection yields pairs; the pipeline action (keep one doc per
duplicate group) needs the transitive closure: connected components. This
is the engine's one genuinely ITERATIVE algorithm: a driver loop over
pure-DataFrame rounds with per-round persist/unpersist so lineage (and
task binaries) don't grow with iterations.

Two interchangeable implementations (identical output contract):

- ``connected_components`` — min-label propagation: simple, one
  join+aggregate per round, but advances ONE hop per round, so rounds =
  graph diameter. Raises if the fixpoint isn't reached (a silently
  unconverged labeling would split true dup groups and keep extra
  survivors downstream).
- ``connected_components_star`` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): converges in O(log² n) rounds regardless of diameter — the
  100 TB path for chain-shaped dup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Iterative algorithm hit max_iter before its fixpoint."""


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 20,
    edges_unique: bool = False,
) -> DataFrame:
    """``(doc_id, component)`` for every vertex in ``edges``; component =
    the minimum doc_id reachable. Deterministic.

    Min-label propagation: every vertex repeatedly adopts the smallest
    label among itself and its neighbors; fixpoint = components. The
    convergence check is one small action per round (count of changed
    labels) — the driver only ever sees a scalar.

    Raises ``ConvergenceError`` if ``max_iter`` rounds pass without the
    fixpoint: label propagation moves one hop per round, so a component
    whose diameter exceeds ``max_iter`` would otherwise be silently split
    into several clusters. Use ``connected_components_star`` for
    high-diameter graphs (O(log² n) rounds).

    Convergence detection: labels only ever DECREASE (least of self and
    neighbors). For NUMERIC ids the fixpoint is reached exactly when
    Σ component is unchanged — one cheap aggregate on the just-checkpointed
    labels. For non-numeric ids (string doc ids) Σ is undefined — non-ANSI
    Spark would return NULL and NULL == NULL would declare convergence
    after round 1, silently splitting components — so those fall back to a
    changed-label count join per round (same scalar-only driver contract).
    """
    from pyspark.sql.types import NumericType

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: both directions once. ``edges_unique`` asserts the input
    # is already a set of asymmetric pairs (src < dst, no duplicates) — the
    # contract of every pair generator in operators/dedup.py (their final
    # groupBy(d1, d2) guarantees it) — in which case the two-direction
    # union is duplicate-free BY CONSTRUCTION and the distinct would be a
    # wasted full shuffle of the edge list.
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_unique:
        sym = sym.distinct()
    # localCheckpoint (not persist): sym joins into EVERY round, and a
    # persist only short-circuits execution — Catalyst still re-optimizes
    # sym's full upstream lineage (e.g. the jaccard pair generation) inside
    # each round's plan, which at a few hundred ms per round dwarfs the
    # actual work on the small label frontier. The checkpoint flattens the
    # plan to the materialized blocks once.
    sym = sym.localCheckpoint(eager=True)
    # initialize at min(self, neighbors) — exactly the state the old
    # identity init reached AFTER its first round, for the same one-shuffle
    # cost the identity init paid on its distinct(): one full
    # join+union+agg+checkpoint round (and its driver action) is skipped
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("v"),
            F.least(F.col("a"), F.col("_mb")).alias("component"),
        )
        .persist()
    )
    numeric_ids = isinstance(labels.schema["component"].dataType, NumericType)
    label_sum = labels.agg(F.sum("component")).collect()[0][0] if numeric_ids else None

    converged = False
    for _ in range(max_iter):
        # min over {self label} ∪ {neighbor labels} in ONE aggregation: the
        # self row rides the union, so no separate left join back onto
        # labels — one fewer shuffle per round than the join+groupBy+join
        # form (measured 6.0 s → 4.4 s on the sf0.1 bench fixture).
        msgs = sym.join(labels, sym["b"] == labels["v"]).select(
            F.col("a").alias("v"), "component"
        )
        # localCheckpoint (not persist): each round's labels nest the prior
        # round's join — persist truncates re-execution but not the logical
        # plan, whose tree-string generation alone OOMs the driver past ~10
        # rounds. Checkpointing cuts lineage to the materialized blocks.
        # Lazy (eager=False): the convergence action below materializes it,
        # so each round runs ONE job, not a checkpoint job plus an action.
        new_labels = (
            labels.select("v", "component")
            .unionByName(msgs)
            .groupBy("v")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        if numeric_ids:
            new_sum = new_labels.agg(F.sum("component")).collect()[0][0]
            done = new_sum == label_sum
            label_sum = new_sum
        else:
            done = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
                == 0
            )
        labels.unpersist()
        labels = new_labels
        if done:
            converged = True
            break
    sym.unpersist()
    if not converged:
        labels.unpersist()
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter > max_iter); use connected_components_star "
            f"or raise max_iter"
        )
    return labels.select(F.col("v").alias("doc_id"), "component")


def connected_components_star(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 40,
    edges_unique: bool = False,
) -> DataFrame:
    """Large-star/small-star connected components — same contract as
    ``connected_components`` (vertex → min reachable id), O(log² n) rounds
    on ANY graph shape (Kiveris et al., SoCC'14, Theorem 4).

    Each round is two edge rewrites, each one groupBy over the edge list:

    - large-star: for every vertex u, connect each strictly-larger
      neighbor to m = min(N(u) ∪ {u});
    - small-star: connect each not-larger neighbor (and u) to m.

    Both preserve connectivity and monotonically hang vertices below
    smaller ids; the fixpoint is a star forest whose centers are the
    component minima — read labels straight off the final edges. The
    convergence action per round is one scalar (edge-set change count).
    """
    # localCheckpoint (not persist) the input projection: it feeds BOTH the
    # canonical edge set and the final vertex list, so without it an
    # expensive upstream (e.g. the jaccard pair generation) executes twice —
    # and unlike persist, the checkpoint also FLATTENS the logical plan, so
    # round 0 and the verts read don't pay Catalyst re-optimization of the
    # full upstream lineage on every consumer (measured ~0.9 s of pure
    # planning overhead on the sf0.1 bench fixture's pair graph).
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # canonical undirected form (small, large) — the star rewrites keep
    # edges in this orientation, so equality-by-subtract is well-defined
    cur = e.filter(F.col("a") != F.col("b")).select(
        F.least("a", "b").alias("s"), F.greatest("a", "b").alias("g")
    )
    # see connected_components: asymmetric-unique input pairs ARE the
    # canonical form already — the distinct would re-shuffle for nothing
    if not edges_unique:
        cur = cur.distinct()
    cur = cur.localCheckpoint(eager=False)

    def _star(edges_sl: DataFrame, large: bool) -> DataFrame:
        # neighborhoods as (u, v) both directions; m = min over N(u) ∪ {u}
        nbrs = edges_sl.select(F.col("g").alias("u"), F.col("s").alias("v")).unionByName(
            edges_sl.select(F.col("s").alias("u"), F.col("g").alias("v"))
        )
        grouped = nbrs.groupBy("u").agg(
            F.collect_set("v").alias("vs"),
        )
        m = F.least(F.array_min("vs"), F.col("u"))
        if large:
            # (v, m) for v in N(u) with v > u
            out = grouped.select(
                m.alias("m"), F.explode(F.filter("vs", lambda v: v > F.col("u"))).alias("v")
            )
        else:
            # (v, m) for v in N(u) ∪ {u} with v <= u
            out = grouped.select(
                m.alias("m"),
                F.explode(
                    F.array_union(
                        F.filter("vs", lambda v: v <= F.col("u")), F.array(F.col("u"))
                    )
                ).alias("v"),
            )
        # no trailing distinct: the consumer is either the next star's
        # collect_set (dedups for free) or the per-round distinct below —
        # a distinct here would only add a shuffle per half-round
        return out.filter(F.col("v") != F.col("m")).select(
            F.col("m").alias("s"), F.col("v").alias("g")
        )

    n_cur = cur.count()
    converged = False
    for _ in range(max_iter):
        # localCheckpoint (not persist): each round nests two star rewrites,
        # so the LOGICAL plan doubles per round — persist truncates
        # re-execution but not the plan tree, and plan-string generation
        # alone would OOM the driver by round ~10. Checkpointing cuts
        # lineage to the materialized blocks (on a cluster, use
        # spark.checkpoint to reliable storage for fault tolerance).
        nxt = (
            _star(_star(cur, large=True), large=False)
            .distinct()
            .localCheckpoint(eager=True)
        )
        # exact set-equality at scalar cost: both sides are distinct sets,
        # so |nxt| == |cur| plus nxt ⊆ cur (anti-join, take-1 early exit)
        # implies equality — replaces the old two-sided exceptAll (two full
        # shuffle aggregations per round); when sizes differ the anti-join
        # never runs. (A structural star-forest test on nxt alone would
        # detect the fixpoint one round earlier, but its union+groupBy
        # costs more per round than the saved confirming round — measured
        # 4.1 s vs 3.0 s on the sf0.1 bench fixture.)
        n_nxt = nxt.count()
        done = n_nxt == n_cur and nxt.join(cur, ["s", "g"], "left_anti").isEmpty()
        cur.unpersist()
        cur, n_cur = nxt, n_nxt
        if done:
            converged = True
            break
    if not converged:
        cur.unpersist()
        raise ConvergenceError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # star forest: every non-center vertex g hangs off its component min s;
    # centers label themselves
    labels = cur.select(F.col("g").alias("doc_id"), F.col("s").alias("component")).unionByName(
        cur.select(F.col("s").alias("doc_id"), F.col("s").alias("component"))
    ).distinct()
    # isolated-in-canonical-form vertices (self-pairs in input) label themselves
    verts = (
        e.select(F.col("a").alias("doc_id"))
        .unionByName(e.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    out = verts.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    result = out.localCheckpoint(eager=True)  # pin before releasing inputs
    cur.unpersist()
    e.unpersist()  # releases the input checkpoint's blocks
    return result


def kcore_vertices(
    edges: DataFrame,
    k: int,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Vertices of the k-core: the maximal subgraph where every vertex has
    degree >= k. Classic iterative peeling — repeatedly delete vertices
    with degree < k (deleting one vertex lowers neighbors' degrees, so the
    fixpoint needs iteration). Returns ``(v, deg)`` with each survivor's
    degree INSIDE the core.

    Distributed shape: the edge list is the only corpus-scale state; each
    round is one degree aggregate + one semi-join filter of the edge list
    against surviving vertices (both keyed by vertex — AQE reuses the
    partitioning), and the driver sees a single scalar (surviving edge
    count) per round. Rounds are bounded by the peeling depth (the
    degeneracy ordering's longest chain), typically tens even on web-scale
    graphs; ``max_iter`` guards pathological chains with a loud
    ``ConvergenceError`` rather than returning a non-core silently.
    ``localCheckpoint`` per round keeps the logical plan flat (same
    rationale as ``connected_components``).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        if n_edges == 0:
            return e.sparkSession.createDataFrame([], "v long, deg long")
        deg = (
            e.select(F.col("a").alias("v"))
            .unionByName(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("v")
        nxt = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            return (
                nxt.select(F.col("a").alias("v"))
                .unionByName(nxt.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            )
        e, n_edges = nxt, n_nxt
    raise ConvergenceError(f"kcore did not stabilize in {max_iter} rounds")
