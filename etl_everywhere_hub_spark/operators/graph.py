"""Iterative graph operators — connected components for dedup-cluster
collapse.

Near-dup detection (MinHash/SimHash/cosine, operators/dedup.py &
similarity.py) emits PAIRS; a corpus dedup pipeline must then collapse
pairs into CLUSTERS (keep one doc per component). That closure is
inherently iterative — min-label propagation, one hop per round, the
same dataframe-only formulation GraphFrames uses — so it lives here as
a driver-side loop over pure DataFrame ops: each iteration is one
shuffle (join + groupBy-min), state is two columns per vertex, and
convergence takes graph-diameter rounds. Near-dup graphs have tiny
diameter (duplicates of a doc are mutually similar), so at 100 TB this
is a handful of shuffles, each AQE-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Connected components via large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    every vertex converges to the smallest vertex id in its component.
    Returns (id, component). Identical output contract to
    ``connected_components_labelprop`` (the r1-r3 implementation, kept
    below for differential testing) but converges in O(log n) rounds on
    ANY graph shape — label propagation needs O(diameter) rounds, which
    stalls on chain/path-shaped 100 TB graphs (VERDICT r3 item #3,
    SCALE.md §4.3).

    Per round (2 shuffle stages each, AQE-sized):
    - large-star: every node u connects its LARGER neighbors to
      m(u) = min(Γ(u) ∪ {u}) — long chains fold onto their local minima
      in parallel;
    - small-star: every node u connects its smaller neighbors (and
      itself) to its smallest neighbor — stars flatten.
    The edge set is kept as canonical (src<dst) distinct pairs;
    convergence = the canonical edge set reaches a fixed point (exact
    set equality, deterministic). At the fixed point every edge is
    (component-min, member); labels read off with one groupBy-min.
    """
    v_src = F.col(src).cast("long").alias("src")
    v_dst = F.col(dst).cast("long").alias("dst")
    # ONE materialization of the caller's edge lineage (round 13,
    # guide §5 "the driver should do almost no data work" applied to
    # job COUNT): the canonical pair set is checkpointed WITH
    # self-loops so both the vertex universe and the working edge set
    # derive from it by narrow ops — the previous separate eager
    # checkpoints for verts and e each re-ran the caller's upstream
    # pipeline (q183's cosine pair generation: ~20 s, twice).
    raw = (
        edges.select(
            F.least(v_src, v_dst).alias("src"), F.greatest(v_src, v_dst).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        raw.select("src")
        .union(raw.select(F.col("dst").alias("src")))
        .distinct()
        .withColumnRenamed("src", "id")
    )
    e = raw.filter(F.col("src") != F.col("dst"))
    for _ in range(max_iter):
        # --- large-star: symmetric neighborhoods; for node u emit
        # (m(u), v) for every neighbor v > u, where m(u) is the min of
        # u and its neighbors. m(u) <= u < v keeps pairs canonical.
        sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            sym.filter(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("m").alias("src"), F.col("dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # --- small-star: orient each edge toward its greater endpoint;
        # for node u (the greater), m = min smaller neighbor; connect u
        # and every other smaller neighbor to m.
        gm = large.groupBy("dst").agg(F.min("src").alias("m"))
        e2 = (
            large.join(gm, "dst")
            .select(F.col("m").alias("src"), F.col("src").alias("old_dst"))
            .filter(F.col("src") != F.col("old_dst"))
            .withColumnRenamed("old_dst", "dst")
            .union(gm.select(F.col("m").alias("src"), F.col("dst")))
            .select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # Fixed point in ONE job per round (round 13; was 5 blocking
        # jobs: two eager checkpoint materializations + count + count +
        # exceptAll-count): the checkpoints above are LAZY — this
        # single symmetric-difference count materializes them as a
        # side effect (the pagerank lazy-prep pattern), and two
        # canonical DISTINCT integer sets are equal iff no (src, dst)
        # appears on only one side. Exact and deterministic, like the
        # count+exceptAll pair it replaces.
        mismatch = (
            e.withColumn("__side", F.lit(1))
            .union(e2.withColumn("__side", F.lit(2)))
            .groupBy("src", "dst")
            .agg(F.min("__side").alias("__mn"), F.max("__side").alias("__mx"))
            .filter(F.col("__mn") == F.col("__mx"))
            .count()
        )
        e = e2
        if mismatch == 0:
            break
    member_labels = e.select(F.col("dst").alias("id"), F.col("src").alias("component"))
    root_labels = e.select(F.col("src").alias("id"), F.col("src").alias("component"))
    labels = (
        member_labels.union(root_labels)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    # vertices untouched by contraction (isolated after self-loop
    # removal) label themselves
    return verts.join(labels, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def connected_components_labelprop(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Min-label propagation: every vertex converges to the smallest
    vertex id in its component. Returns (id, component).

    O(diameter) rounds — kept as the differential twin for
    ``connected_components`` (star contraction) and for tiny-diameter
    graphs where its 1-shuffle round is marginally cheaper.

    ``max_iter`` bounds the loop; iteration stops early the first round
    no label changes (an exact, deterministic check — the count is 0 or
    it isn't). Undirectedness is enforced by symmetrizing the edges.
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    # localCheckpoint (not persist): persist caches data but the logical
    # plan still GROWS each iteration, and Catalyst re-analysis of the
    # ever-deeper tree dominates within ~5 rounds (measured 1.6s →
    # 16s/iter). Checkpointing truncates lineage so every round
    # re-optimizes a constant-size plan. On a cluster, prefer
    # reliable checkpoint(dir) for executor-loss tolerance.
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("neigh_component"))
        )
        new_labels = (
            labels.join(neigh_min, labels.id == neigh_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("neigh_component", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
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


def pagerank_exact(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    base_micro: int = 150_000,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer micro-units.

    Ranks, contributions, and damping are all BIGINT arithmetic
    (floor divisions), so the result is bit-identical on any engine
    and any execution order — the portable way to oracle-check an
    iterative double-typed algorithm. ``nodes`` is (id); ``edges`` is
    directed (src, dst). Out-degree is iteration-INVARIANT, so it is
    folded into edge prep once — as a COUNT window over src (round
    11; previously groupBy+self-join): one exchange keyed on src
    produces the annotated edge set directly, already hash-partitioned
    on the probe key, where the join formulation paid a second full
    edge shuffle (VERDICT r7 item #2 removed the per-iteration
    re-join; this removes the prep join too). The materialization is a
    LAZY localCheckpoint: it truncates lineage identically but folds
    into the first iteration's job instead of being a separate
    blocking job of pure scheduling floor (measured at sf0.1:
    0.88 s eager → 0.63 s lazy, identical results bit-for-bit). Per
    iteration the plan stays join + groupBy + left join — the same
    shuffle shape GraphFrames' aggregateMessages lowers to; the left
    side of the rank rebuild is the previous rank snapshot, which
    carries the node universe, so the node table is scanned once, not
    once per round. Lineage is truncated every ``checkpoint_every``
    rounds (see connected_components); ``0`` disables intermediate
    truncation — right for a small FIXED iteration count (a 3-round
    lineage is shallow). Long or until-convergence runs should keep a
    cadence, or the plan and its recovery-recompute cost grow without
    bound. Sink nodes leak rank (no redistribution) — a defined,
    engine-independent contract.
    """
    # expr-string projections (round 12): identical expressions, one
    # py4j round trip per projection instead of one per Column — the
    # loop rebuilds this DAG every call and construction showed up as
    # 0.43 s of q139's bench min (see OPTIMIZATION_r12.md).
    edeg = edges.selectExpr(
        "*", "count(1) OVER (PARTITION BY src) AS out_deg"
    ).localCheckpoint(eager=False)
    ranks = nodes.selectExpr("id", "cast(1000000 AS bigint) AS r")
    rank_expr = (
        f"cast({base_micro} + ({damp_num} * coalesce(in_sum, 0L))"
        f" div {damp_den} AS bigint) AS r"
    )
    for it in range(1, iters + 1):
        contrib = (
            edeg.join(ranks, edeg.src == ranks.id)
            .selectExpr("dst", "r div out_deg AS c")
            .groupBy("dst")
            .agg(F.expr("sum(c) AS in_sum"))
        )
        ranks = (
            ranks.select("id")
            .join(contrib, F.col("id") == contrib.dst, "left")
            .selectExpr("id", rank_expr)
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed vertex,
    bounded by ``max_hops``. Returns (id, hops) for every REACHED
    vertex (seeds at 0; unreached vertices are absent — the caller
    left-joins if it wants nulls). Edges are treated as undirected
    (symmetrized here).

    This is the "influence radius" / contact-tracing primitive over
    the pair graphs the dedup and proximity operators emit (q41 LSH
    pairs, q190 convoy pairs): how far is every document/entity from a
    labeled seed set.

    Scale shape: per hop, ONE equi-join frontier⋈edges (frontier is
    the newly labeled vertices only, never the full visited set), one
    distinct, one anti-join against visited — all key-partitioned;
    rounds = min(max_hops, eccentricity). Per-round MATERIALIZATION is
    the frontier delta only (each hop layer is localCheckpointed once
    and never rewritten; the final result is one union of the layers
    after the loop), so write volume per round tracks the hop
    boundary. The anti-join necessarily *reads* all prior layers —
    already-materialized, lineage-flat scans. Early-exits when a
    frontier is empty (the count is the same job that materializes
    the checkpoint).
    """
    sym = edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
    sym = (
        sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    layer0 = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    layers = [layer0]
    visited_ids = layer0.select("id")
    frontier = layer0.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited_ids, "id", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        layers.append(nxt)
        # metadata-only union of already-checkpointed deltas: no
        # re-materialization of the visited set, lineage stays flat
        visited_ids = visited_ids.union(nxt.select("id"))
        frontier = nxt.select("id")
    out = layers[0]
    for layer in layers[1:]:
        out = out.union(layer)
    return out


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """k-core membership: the maximal subgraph in which every vertex
    has degree >= k, computed by iterative peeling (remove all
    vertices of degree < k, recompute degrees, repeat to fixpoint).
    Returns (id, core_deg) — the surviving vertex set with each
    vertex's degree INSIDE the core. The fixpoint is unique (peeling
    order cannot change the maximal subgraph) and rounds commute with
    extra no-op rounds, so a fixed-round unrolled oracle computes the
    identical set whether or not it converges early.

    The spam/boilerplate-farm detector over near-dup pair graphs:
    genuine duplicate clusters are dense (survive k-core), incidental
    single-pair collisions are not.

    Scale shape: per round, one degree groupBy over the surviving
    canonical edge set and two semi-joins to drop edges incident to
    peeled vertices — all equi-shaped on vertex keys; round count is
    bounded by the degeneracy peel depth, with early-exit when no
    vertex is removed (checked via the edge count of the checkpoint
    materialization). The edge set only SHRINKS, so per-round cost is
    monotonically decreasing.
    """
    e = (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("src"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("src").alias("id"))
        e2 = (
            e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            # lazy: the early-exit count below materializes it — one
            # blocking job per round instead of two (round 13)
            .localCheckpoint(eager=False)
        )
        n2 = e2.count()
        e = e2
        if n2 == n_edges:
            break
        n_edges = n2
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )


def bellman_ford_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Hop-bounded single/multi-source shortest path over positive
    INTEGER edge weights: synchronous Bellman-Ford, where after round
    k every vertex holds the exact minimum cost over walks of <= k
    edges from any seed (for positive weights that equals the min over
    simple paths of <= k edges, so the hop bound is a well-defined,
    engine-independent contract rather than a convergence heuristic).
    Returns (id, dist) for vertices reachable within ``max_hops``;
    edges are treated as undirected. Integer weights keep every
    relaxation exact — no float accumulation order anywhere.

    Scale shape: per round ONE equi-join dist⋈edges on the vertex key
    + one groupBy-min (map-side combinable), lineage truncated per
    round; identical shuffle shape to the BFS/PageRank loops above.
    """
    sym = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    # LAZY checkpoints (round 13): fixed hop count, no convergence
    # check — lineage still truncates per round at build time, but
    # materialization folds into the caller's single action instead of
    # max_hops blocking driver jobs (same as temporal_reachability).
    for _ in range(max_hops):
        relaxed = (
            sym.join(dist.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.union(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def ancestors_doubling(
    parents: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_rounds: int = 8,
) -> DataFrame:
    """Full ancestor closure of a forest (parent pointers, null/missing
    parent = root) by POINTER DOUBLING: R_0 = identity ∪ parent-edges;
    R_{i+1} = R_i ∪ (R_i ∘ R_i). After ceil(log2(depth)) rounds R is
    the complete (node, ancestor) set INCLUDING the node itself — the
    hierarchy-flattening step behind BOM explosion, org-chart rollups
    and taxonomy aggregation. Returns (id, anc).

    Doubling is the scale move: a depth-d hierarchy closes in O(log d)
    self-join rounds instead of d parent-hops (a 1M-deep pathological
    chain needs 20 rounds, not 10^6). Each round is one equi self-join
    + distinct, both key-partitioned; closure size is bounded by
    n·depth (real catalog/org hierarchies are shallow), checked to a
    fixpoint on exact row counts, lineage truncated per round.

    PRECONDITION (enforced): the input is a FOREST — at most one
    parent row per id. On a multi-parent DAG the distinct() collapses
    parallel paths, so path-multiplicity rollups would silently
    undercount (SCALE.md §4.7); this fails loudly instead. The check
    is one tiny groupBy on the parent table — noise next to the
    closure rounds' own fixpoint counts.
    """
    multi = (
        parents.filter(F.col(parent_col).isNotNull())
        .groupBy(F.col(id_col))
        # DISTINCT parents: duplicate (id, parent) edge rows are a
        # legal forest (the closure's distinct() absorbs them)
        .agg(F.countDistinct(F.col(parent_col)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if multi:
        raise ValueError(
            f"ancestors_doubling requires a forest: node {multi[0][0]} has "
            "multiple parents (DAG closure has path-multiplicity semantics "
            "this operator does not implement — see SCALE.md §4.7)"
        )
    ids = parents.select(F.col(id_col).cast("long").alias("id"))
    r = (
        ids.select("id", F.col("id").alias("anc"))
        .union(
            parents.filter(F.col(parent_col).isNotNull())
            .select(
                F.col(id_col).cast("long").alias("id"),
                F.col(parent_col).cast("long").alias("anc"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = r.count()
    for _ in range(max_rounds):
        hop = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.anc") == F.col("b.id"))
            .select(F.col("a.id").alias("id"), F.col("b.anc").alias("anc"))
        )
        # lazy: the fixpoint count below materializes it — one blocking
        # job per doubling round instead of two (round 13)
        r2 = r.union(hop).distinct().localCheckpoint(eager=False)
        n2 = r2.count()
        r = r2
        if n2 == n:
            break
        n = n2
    return r


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 5,
    src: str = "src",
    dst: str = "dst",
    time_col: str = "t",
) -> DataFrame:
    """Time-respecting (earliest-arrival) reachability over TIMED
    contact edges: a vertex is reached only through a path whose edge
    times never decrease — the contact-tracing / influence-spread
    semantics over co-location events (q190's convoy contacts), where
    plain BFS would happily travel backwards in time. Returns
    (id, arrival) = the minimum arrival time within ``max_hops``
    contacts of a seed (seeds carry arrival -1 = "before all
    contacts"); edges are treated as symmetric (a contact exposes both
    parties).

    Min-arrival relaxation is exact here because earlier arrival
    DOMINATES: any edge catchable after a later arrival is catchable
    after an earlier one, so relaxing from each vertex's current
    minimum loses nothing (the classic earliest-arrival-path
    property). Per round: one equi-join frontier⋈edges on the vertex
    key with the time-monotone filter + one groupBy-min — the same
    bounded shuffle shape as bfs_hops/bellman_ford_hops.
    """
    sym = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(time_col).cast("long").alias("t"),
    )
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "t")
    ).localCheckpoint(eager=True)
    arrival = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
        .distinct()
        .withColumn("arrival", F.lit(-1).cast("long"))
        .localCheckpoint(eager=False)
    )
    # LAZY checkpoints (round 13): the hop count is small and FIXED
    # with no convergence check, so there is nothing to early-exit on —
    # each round's checkpoint still truncates the logical plan at build
    # time (LogicalRDD), but materialization folds into the caller's
    # single action instead of max_hops blocking driver jobs (the
    # pagerank r11 lazy-prep finding applied to the relaxation loop).
    for _ in range(max_hops):
        relaxed = (
            sym.join(arrival.withColumnRenamed("id", "src"), "src")
            .filter(F.col("t") >= F.col("arrival"))
            .select(F.col("dst").alias("id"), F.col("t").alias("arrival"))
        )
        arrival = (
            arrival.union(relaxed)
            .groupBy("id")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint(eager=False)
        )
    return arrival


def hits_exact(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration HITS (hubs & authorities, Kleinberg) in exact
    integer micro-units — the link-analysis twin of ``pagerank_exact``
    for DIRECTED bipartite-ish graphs (who-points-at-whom): a hub is
    good because it points at good authorities, an authority is good
    because good hubs point at it.

    Determinism contract: the usual L2 normalization is replaced by
    integer sum-normalization — after each half-step every score is
    ``s * scale div total`` (floor division over non-negative BIGINTs,
    bit-identical on any engine / execution order), so a fixed-round
    unrolled SQL oracle reproduces the result exactly. Rankings are
    unaffected (normalization is monotone).

    ``nodes`` is (id); ``edges`` is directed (src, dst). Per
    half-step: ONE equi join edges⋈scores + one groupBy on the other
    endpoint — the aggregateMessages shuffle shape, partitioned on
    vertex keys throughout; the normalizing total is a single-row
    aggregate broadcast back (never a driver collect). Lineage is
    truncated per round. Returns (id, hub_ppm, auth_ppm).
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    n = nodes.select(F.col("id").cast("long").alias("id"))
    hub = n.select("id", F.lit(scale).cast("bigint").alias("h"))
    auth = None
    for _ in range(iters):
        a_raw = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("s"))
        )
        a_tot = a_raw.agg(F.sum("s").alias("t"))
        auth = (
            n.join(a_raw, "id", "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "id",
                F.expr(f"coalesce(s, 0L) * {scale} div t").cast("bigint").alias("a"),
            )
            # LAZY: truncates lineage identically but materializes
            # inside the consumer's job instead of as a separate
            # blocking job per half-step (round 13; the pagerank r11
            # lazy-prep finding applied to HITS' fixed 2-round loop)
            .localCheckpoint(eager=False)
        )
        h_raw = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("s"))
        )
        h_tot = h_raw.agg(F.sum("s").alias("t"))
        hub = (
            n.join(h_raw, "id", "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "id",
                F.expr(f"coalesce(s, 0L) * {scale} div t").cast("bigint").alias("h"),
            )
            .localCheckpoint(eager=False)  # lazy — see auth above
        )
    return (
        hub.join(auth, "id")
        .select(
            "id",
            F.col("h").cast("long").alias("hub_ppm"),
            F.col("a").cast("long").alias("auth_ppm"),
        )
    )


def scc_pivot_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_peels: int = 64,
) -> DataFrame:
    """Strongly connected components on a DIRECTED graph by pivot
    peeling (the sequential skeleton of the FW-BW decomposition,
    Fleischer et al. 2000): pick the minimum remaining vertex id as
    pivot, compute its forward-reachable and backward-reachable sets
    (two distributed BFS loops — each hop ONE equi-join, distinct,
    anti-join, localCheckpointed frontier delta, the bfs_hops
    discipline), intersect them = the pivot's SCC, peel it off,
    repeat. Deterministic: the min-id pivot makes component labels
    (the pivot id) reproducible.

    Scale posture, honestly: each peel removes one SCC, so the OUTER
    loop is O(#SCCs touched) — right for graphs whose condensation is
    small (a dense trade/link graph collapses to a few big SCCs plus
    singletons; ``max_peels`` guards the pathological chain). The
    fully parallel variant recurses FW-BW on the three remainder
    partitions simultaneously; the per-peel inner work here is already
    the distributed part. Returns (id, component) with component =
    pivot id of the SCC.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    def reach(seed: DataFrame, graph: DataFrame, within: DataFrame) -> DataFrame:
        """All vertices of `within` reachable from seed via graph edges
        restricted to `within` (seed included)."""
        g = graph.join(within.withColumnRenamed("id", "src"), "src").join(
            within.withColumnRenamed("id", "dst"), "dst"
        )
        visited = seed.localCheckpoint(eager=True)
        frontier = visited
        while True:
            nxt = (
                g.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                return visited
            visited = visited.union(nxt).localCheckpoint(eager=True)
            frontier = nxt

    remaining = nodes
    comps: list[DataFrame] = []
    for _ in range(max_peels):
        head = remaining.agg(F.min("id").alias("id"))
        if head.first()["id"] is None:
            break
        pivot = head.localCheckpoint(eager=True).select("id")
        fwd = reach(pivot, e, remaining)
        bwd = reach(pivot, rev, remaining)
        scc = fwd.join(bwd, "id").localCheckpoint(eager=True)
        pid = pivot.first()["id"]
        comps.append(scc.select("id", F.lit(pid).cast("long").alias("component")))
        remaining = remaining.join(scc, "id", "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.isEmpty():
            break
    else:
        # One SCC is peeled per iteration, so >max_peels components
        # would silently drop vertices — surface the truncation (the
        # lsh_candidate_pairs logged-cap convention) by labelling every
        # leftover vertex as its own singleton component instead.
        if not remaining.isEmpty():
            import logging

            logging.getLogger(__name__).warning(
                "scc_pivot_peel: max_peels=%d exhausted with vertices "
                "remaining; labelling leftovers as singleton components",
                max_peels,
            )
            comps.append(remaining.select("id", F.col("id").alias("component")))
    if not comps:
        return nodes.select("id", F.col("id").cast("long").alias("component"))
    out = comps[0]
    for c in comps[1:]:
        out = out.union(c)
    return out
