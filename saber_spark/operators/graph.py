"""Graph analytics over the materialized KG: connected components,
PageRank centrality, and triangle counting.

Downstream of node/edge materialization, entity-resolution and QA workflows
need component structure ("which entities are transitively connected?").
Spark has no native CC; the scalable formulation is hash-min label
propagation (the Pregel/GraphX standard): every node starts labeled with
itself, each round every node takes the min label among itself and its
neighbors, convergence after <= diameter rounds. Each round is ONE join +
ONE aggregation — at 10^12 edges that is the only shape that works; the
driver holds nothing but the loop counter and a converged? flag.

Determinism: labels are the node ids themselves and min() is total on
strings/longs, so the result is engine-portable (DuckDB twin: a recursive
CTE computing min reachable node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: edge cap for the exact driver fast paths (connected_components,
#: bowtie_structure, scan_clusters) — dimension-sized graphs only
DRIVER_EDGE_CAP = 4096


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"),
                                      F.col(src).alias("b")))
            .distinct())


def _propagate(sym_with_self: DataFrame, labels: DataFrame) -> DataFrame:
    """min label over the CLOSED neighborhood (self-loops included in the
    edge set), so ``labels`` is referenced exactly ONCE per round — the
    logical plan grows linearly with rounds. The naive `least(own,
    neighbor-min)` form references labels twice and doubles the plan tree
    every round (exponential analyzer blowup, OOMs near 8 rounds)."""
    return (sym_with_self.join(labels, sym_with_self.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("node2", "node"))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25,
                         rounds: int | None = None,
                         materialize: bool = True) -> DataFrame:
    """undirected edges -> (node, component) with component = min node id
    reachable from node. Isolated nodes (present only as endpoints here)
    keep their own id.

    Two modes:
      rounds=None (default, unknown diameter): iterate to the FIXPOINT —
        one tiny convergence count per round, lineage cut per round with
        localCheckpoint. The 10^12-edge mode; cost = diameter rounds of
        (join + agg).
      rounds=K (known diameter bound): build K lazy propagation rounds and
        run them as ONE job — no per-round actions, no checkpoints. After K
        rounds every node holds the min label within graph distance K, so
        K >= diameter gives the exact components. The right mode for small
        or shallow graphs, where per-round driver actions dominate
        (measured 71s -> seconds at fixture scale under a default
        200-shuffle-partition session).

    materialize=True (default) localCheckpoints the symmetrized edge set
    before iterating: EVERY round's join re-attaches the edge lineage, so
    when ``edges`` is itself a derived table (LSH candidates, linked
    mentions) the un-materialized plan recomputes that whole chain once
    per round (the dedup_clusters measurement: 14.0s -> 0.9s at sf0.01).
    A 100 TB run writes the edge set to a durable checkpoint table
    instead — same shape, resumable.
    """
    sym = _symmetrize(edges, src, dst)
    if materialize:
        sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    # closed neighborhood: self-loops let each round be ONE join
    sym_self = sym.unionByName(
        nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
    labels = nodes.withColumn("label", F.col("node"))

    if rounds is not None:
        for _ in range(rounds):
            labels = _propagate(sym_self, labels)
        return labels.select("node", F.col("label").alias("component"))

    # Fixpoint mode pays ~2 jobs per round (propagate + convergence
    # probe + checkpoint); when the (already-materialized) edge set is
    # dimension-sized — LSH-verified near-dup pairs, sameAs links — the
    # rounds are pure scheduler overhead. One bounded limit+collect and
    # a driver union-find replace the whole loop for graphs up to 4096
    # edges (same fast-path contract as ontology.transitive_closure);
    # the exact min-label components come back as a literal frame.
    # Corpus-scale graphs fall through to the iterative path untouched.
    head = sym.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(head) <= DRIVER_EDGE_CAP:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in head:
            a, b = r["a"], r["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        for n in parent:
            r0 = find(n)
            if r0 not in comp_min or n < comp_min[r0]:
                comp_min[r0] = n
        out = [(n, comp_min[find(n)]) for n in parent]
        spark = edges.sparkSession
        node_type = sym.schema.fields[0].dataType
        schema = T.StructType([
            T.StructField("node", node_type, True),
            T.StructField("component", node_type, True)])
        return spark.createDataFrame(out, schema)

    for _ in range(max_iter):
        new_labels = _propagate(sym_self, labels)
        # fixpoint check: one small count per round (driver holds no data)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
        # cut the growing lineage so round k+1 doesn't recompute rounds 1..k
        labels = labels.localCheckpoint(eager=True)
    # returning unconverged labels would silently split components
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds max_iter); raise max_iter")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, damping: float = 0.85,
             checkpoint_every: int | None = None,
             materialize: bool = True,
             weight_col: str | None = None) -> DataFrame:
    """Undirected edges -> (node, pr) after a fixed number of power
    iterations: pr = (1-d)/N + d * sum_in(pr_u * w_uv / strength_u).

    weight_col=None is classic PageRank (w=1, strength=degree).
    weight_col='n_occurrences' rank-weights by co-occurrence strength —
    an entity connected by 100 shared documents pulls more mass than one
    connected by 1. Weights must be > 0 (validated). Parallel weighted
    edges are SUMMED (the unweighted path deduplicates instead), so
    uniform weights reproduce the unweighted result exactly when the
    input lists each undirected edge once — the dedup_triples contract
    (subj < obj, one row per pair).

    Entity-importance ranking for the KG ("which canonical entities are
    central?"). Scale shape mirrors connected_components: each round is ONE
    join + ONE aggregation against an edge table that carries the source
    outdegree (joined once, reused every round), so the per-round shuffle
    key is the destination node and the rank vector is referenced exactly
    once per round (linear logical-plan growth). Symmetrized input means
    every node has outdeg >= 1 — no dangling-mass correction term needed.

    iterations is fixed (not fixpoint) so the job is lazy end-to-end for
    small K; pass checkpoint_every to cut lineage on long runs (same
    localCheckpoint trade documented on connected_components). Final pr is
    rounded to 6 decimals: the scores are O(1e-1)-scale sums of doubles, so
    cross-engine/partition-order drift (~1e-15) never reaches the rounded
    digit.

    materialize=True localCheckpoints the symmetrized edges before the
    rounds — every iteration's join re-attaches the edge lineage, so a
    derived input (entity co-occurrence over linked mentions) would be
    recomputed per round otherwise (measured 14.4s -> ~1s at sf0.1; same
    defect class as the dedup_clusters note on connected_components).
    """
    if weight_col is None:
        # w = 1.0 exactly: pr * 1.0 / strength is bit-identical to the
        # classic pr / degree, so the unweighted oracle stays valid
        sym = _symmetrize(edges, src, dst).withColumn("w", F.lit(1.0))
    else:
        w = F.col(weight_col).cast("double").alias("w")
        base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w)
        # a NULL weight would silently null the rank of every downstream
        # node; a zero/negative weight yields zero or negative strength
        # (DIVIDE_BY_ZERO under ANSI, nonsense ranks otherwise) — fail
        # loudly instead (same write-time-guard convention as the writers)
        bad = base.filter(F.col("w").isNull() | (F.col("w") <= 0)) \
            .limit(1).count()
        if bad:
            raise ValueError(
                f"pagerank: weight_col '{weight_col}' contains NULL or "
                f"non-positive values; weights must be > 0")
        # self-loops are emitted ONCE (the two-direction union would
        # double their weight, breaking the uniform-weight == unweighted
        # equivalence that distinct() gives the classic path)
        sym = (base.filter(F.col("a") != F.col("b"))
               .unionByName(base.filter(F.col("a") != F.col("b"))
                            .select(F.col("b").alias("a"),
                                    F.col("a").alias("b"), "w"))
               .unionByName(base.filter(F.col("a") == F.col("b")))
               .groupBy("a", "b").agg(F.sum("w").alias("w")))
    if materialize:
        sym = sym.localCheckpoint(eager=True)
    outdeg = sym.groupBy("a").agg(F.sum("w").alias("strength"))
    # (a, b, w, strength-of-a): built once, reused by every iteration
    contrib_edges = sym.join(outdeg, "a")
    n_nodes = outdeg.count()  # one cheap action on the collapsed node set
    if n_nodes == 0:
        # empty graph: an empty (node, pr) result, not a ZeroDivisionError
        return outdeg.select(F.col("a").alias("node"),
                             F.lit(0.0).cast("double").alias("pr"))
    pr = outdeg.select(F.col("a").alias("node"),
                       F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        pr = (contrib_edges.join(pr, contrib_edges.a == pr.node)
              .groupBy(F.col("b").alias("node2"))
              .agg((F.lit(base) + F.lit(damping)
                    * F.sum(F.col("pr") * F.col("w") / F.col("strength"))
                    ).alias("pr"))
              .withColumnRenamed("node2", "node"))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return pr.select("node", F.round("pr", 6).alias("pr"))


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst", materialize: bool = True) -> DataFrame:
    """Undirected edges -> (node, n_triangles), zero-rows included.

    Local clustering signal for KG QA (hub entities embedded in dense
    cliques vs spurious star centers). Algorithm: orient every edge from
    the LOWER-degree endpoint to the higher (ties by node id) — the
    standard skew mitigation: a hub of degree D holds only its
    higher-degree neighbors as out-edges, so the wedge expansion at the
    hub is bounded by the arboricity, not D^2. Then one self-join builds
    wedges (u->v, u->w) and one semi-join checks the closing edge. The
    triangle SET is orientation-independent, so the DuckDB oracle may use
    plain id-ordering while this implementation degree-orders.

    materialize=True localCheckpoints the symmetrized edges: the plan
    references them five ways (degree agg, two orientation joins, both
    wedge sides, the closing check), so a derived input would otherwise be
    recomputed per branch.
    """
    sym = _symmetrize(edges, src, dst)
    if materialize:
        sym = sym.localCheckpoint(eager=True)
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # orientation key: (degree, id) — total order, so exactly one direction
    # of each undirected edge survives
    keyed = (sym.join(deg, "a")
             .withColumnRenamed("deg", "deg_a")
             .join(deg.select(F.col("a").alias("b"),
                              F.col("deg").alias("deg_b")), "b"))
    oriented = keyed.filter(
        (F.col("deg_a") < F.col("deg_b"))
        | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    ).select("a", "b", "deg_b")  # deg_b = degree of head, for wedge ordering
    e1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"),
                         F.col("deg_b").alias("deg_v"))
    e2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"),
                         F.col("deg_b").alias("deg_w"))
    wedges = (e1.join(e2, "u")
              .filter((F.col("deg_v") < F.col("deg_w"))
                      | ((F.col("deg_v") == F.col("deg_w"))
                         & (F.col("v") < F.col("w")))))
    closing = oriented.select(F.col("a").alias("v"), F.col("b").alias("w"))
    triangles = wedges.join(closing, ["v", "w"], "semi").select("u", "v", "w")
    per_node = (triangles
                .select(F.explode(F.array("u", "v", "w")).alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles")))
    nodes = deg.select(F.col("a").alias("node"))
    return (nodes.join(per_node, "node", "left")
            .select("node", F.coalesce("n_triangles", F.lit(0))
                    .cast("long").alias("n_triangles")))


def degree_histogram(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Degree distribution of the undirected KG: (degree, n_entities).

    Degree = number of DISTINCT neighbors (the edge table may carry
    parallel/weighted rows; symmetrize + distinct collapses them, and
    self-loops count once like any neighbor). The histogram is the
    standard KG health profile — a heavy right tail flags hub entities
    that need the salted-canonicalization / skew-join treatments.

    Scale shape: symmetrize is a union + distinct (one shuffle on the
    pair), the per-node degree is a count over rows already grouped by
    that same key (map-side combinable), and the histogram aggregates the
    |V|-sized degree table — two hash aggs total after the distinct, each
    orders of magnitude smaller than the edge input. Hub skew hits only
    the per-node count, which a combiner absorbs (counts, not lists).
    """
    sym = _symmetrize(edges, src, dst)
    deg = sym.groupBy(F.col("a").alias("entity")).agg(
        F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_entities"))
            .select(F.col("degree").cast("long").alias("degree"),
                    "n_entities"))


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      weight_col: str | None = None, rounds: int = 3,
                      checkpoint_every: int | None = None,
                      materialize: bool = True) -> DataFrame:
    """Synchronous weighted label propagation -> (node, community).

    Community detection over the entity co-occurrence KG ("which entities
    form topical clusters?") — the standard near-linear-time method
    (Raghavan et al. 2007), deterministic variant: every node starts
    labeled with itself; each round every node adopts the label with the
    LARGEST total incident edge weight among its neighbors, ties broken by
    the smallest label. Classic LPA breaks ties randomly; the total
    (weight DESC, label ASC) order makes the result engine-portable, so
    the DuckDB twin is an unrolled CTE per round.

    rounds is FIXED (not fixpoint): synchronous LPA can 2-cycle on
    bipartite subgraphs, so a change-count fixpoint need not terminate —
    a bounded round count is the production formulation (GraphFrames'
    LPA maxIter is mandatory for the same reason).

    Scale shape: per round ONE equi-join (labels referenced exactly once —
    linear plan growth, same discipline as _propagate) + ONE hash agg of
    the votes + ONE top-1 window partitioned by node. The window processes
    one row per (node, distinct neighbor label), already collapsed by the
    agg — at 10^12 edges a hub's vote list is bounded by its community
    fan-out, not its degree. weight_col=None counts each neighbor once
    (w=1); parallel weighted edges are summed.
    """
    if weight_col is None:
        sym = _symmetrize(edges, src, dst).withColumn("w", F.lit(1.0))
    else:
        w = F.col(weight_col).cast("double").alias("w")
        base = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w)
                .filter(F.col("a") != F.col("b")))
        sym = (base.unionByName(base.select(F.col("b").alias("a"),
                                            F.col("a").alias("b"), "w"))
               .groupBy("a", "b").agg(F.sum("w").alias("w")))
    # Driver fast path (r6, DRIVER_EDGE_CAP): when every (collapsed)
    # edge weight is INTEGRAL, vote sums are exact in any accumulation
    # order (sums of integer-valued doubles below 2^53), so the fixed
    # rounds run over one bounded collect — adopt the label with the
    # largest neighbor-label weight, ties smallest label. Fractional
    # weights keep the distributed loop (double sums there are
    # order-sensitive and the window's order is the contract).
    _head = sym.limit(DRIVER_EDGE_CAP + 1).collect()
    if (len(_head) <= DRIVER_EDGE_CAP
            and all(float(r2["w"]).is_integer() for r2 in _head)):
        wn: dict = {}
        for r2 in _head:
            wn.setdefault(r2["a"], []).append((r2["b"], int(r2["w"])))
        lab = {n2: n2 for n2 in wn}
        for _ in range(rounds):
            new = {}
            for n2, ns in wn.items():
                votes: dict = {}
                for b2, w2 in ns:
                    lb = lab[b2]
                    votes[lb] = votes.get(lb, 0) + w2
                new[n2] = min(votes, key=lambda x: (-votes[x], x))
            lab = new
        spark = edges.sparkSession
        node_type = sym.schema.fields[0].dataType
        return spark.createDataFrame(
            list(lab.items()), T.StructType([
                T.StructField("node", node_type, True),
                T.StructField("community", node_type, True)]))
    if materialize:
        sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    win = Window.partitionBy("node2").orderBy(F.col("ws").desc(),
                                              F.col("label").asc())
    for i in range(rounds):
        votes = (sym.join(labels, sym.b == labels.node)
                 .groupBy(F.col("a").alias("node2"), "label")
                 .agg(F.sum("w").alias("ws")))
        labels = (votes
                  .withColumn("rn", F.row_number().over(win))
                  .filter(F.col("rn") == 1)
                  .select(F.col("node2").alias("node"), "label"))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def link_prediction(edges: DataFrame, src: str = "src", dst: str = "dst",
                    top_k: int = 20, materialize: bool = True) -> DataFrame:
    """Common-neighbor link prediction -> (a, b, n_common, aa_score):
    the top_k non-adjacent node pairs most likely to be a missing KG edge,
    scored by Adamic-Adar (sum over common neighbors z of 1/ln(deg z)).

    KG completion's standard first-order baseline (Liben-Nowell & Kleinberg
    2003): two entities sharing many low-degree neighbors probably relate.
    Deterministic: aa_score is a sum of exact-count-derived doubles rounded
    to 6; global top_k ordered (aa_score DESC, a ASC, b ASC).

    Scale shape: candidate pairs come from ONE wedge self-join through the
    shared neighbor (z) — never an all-pairs product; the wedge expansion
    at a hub z is its degree squared, the same skew triangle counting
    handles by degree-ordering, here bounded instead by weighting hubs
    down (1/ln deg) and by AQE skew-split on the z key. Existing edges
    drop via a LEFT ANTI join; the global top_k is a single TakeOrdered —
    no full sort materializes.
    """
    sym = _symmetrize(edges, src, dst)
    if materialize:
        sym = sym.localCheckpoint(eager=True)
    return (_aa_candidates(sym)
            .orderBy(F.col("aa_score").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(top_k))


def _aa_candidates(sym: DataFrame) -> DataFrame:
    """symmetric (a, b) edges -> every NON-adjacent id-ordered pair with
    >= 1 common neighbor, Adamic-Adar-scored: (a, b, n_common, aa_score).
    The shared scorer behind link_prediction (top-k) and
    link_prediction_eval (full candidate set vs held-out edges)."""
    # a deg-1 center z forms no wedge AND its weight 1/ln(1) would divide
    # by zero under ANSI — filter deg >= 2 BEFORE the division exists in
    # any projected expression
    deg = (sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
           .filter(F.col("deg") >= 2))
    # (z, neighbor, 1/ln(deg z)): weight attached once at the wedge center
    nbr = (sym.select(F.col("a").alias("z"), F.col("b").alias("n"))
           .join(deg.select(F.col("a").alias("z"),
                            (1.0 / F.ln(F.col("deg").cast("double")))
                            .alias("w")), "z"))
    l, r = nbr.alias("l"), nbr.alias("r")
    wedges = (l.join(r, "z")
              .filter(F.col("l.n") < F.col("r.n"))
              .groupBy(F.col("l.n").alias("a"), F.col("r.n").alias("b"))
              .agg(F.count(F.lit(1)).alias("n_common"),
                   F.round(F.sum("l.w"), 6).alias("aa_score")))
    return wedges.join(
        sym.select(F.col("a"), F.col("b")), ["a", "b"], "anti")


def trending_nodes(observations: DataFrame, node_col: str = "node",
                   snap_col: str = "snap", min_prev: int = 0) -> DataFrame:
    """Snapshot-over-snapshot growth -> (node, snap, n, prev_n, growth):
    burst detection for KG monitoring ("which entities spiked this
    crawl?"). growth = round(n / prev_n, 6) against the node's count in
    the PRECEDING snapshot index (consecutive only — a gap means the
    node was absent, and the reappearance row reports prev_n = 0 with
    growth NULL rather than inventing a rate over the gap).

    ONE count agg + ONE lag window per node (both key on node; the window
    partition carries one row per (node, active snapshot) — bounded by
    corpus lifetime, not observation count). min_prev filters established
    nodes (prev_n >= min_prev) to suppress noise from singletons.
    """
    counts = (observations.groupBy(node_col, snap_col)
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(node_col).orderBy(snap_col)
    prev_n = F.lag("n").over(w)
    prev_snap = F.lag(snap_col).over(w)
    consec = prev_snap == F.col(snap_col) - 1
    return (counts
            .withColumn("prev_n",
                        F.when(consec, prev_n).otherwise(F.lit(0))
                        .cast("long"))
            .withColumn("growth",
                        F.when(consec & (prev_n > 0),
                               F.round(F.col("n") / prev_n, 6)))
            .filter(F.col("prev_n") >= min_prev)
            .select(F.col(node_col).alias("node"),
                    F.col(snap_col).alias("snap"),
                    F.col("n").cast("long").alias("n"), "prev_n", "growth"))


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         rounds: int = 2, materialize: bool = True) -> DataFrame:
    """DIRECTED edges -> (node, hub, auth) after ``rounds`` unnormalized
    HITS power iterations (Kleinberg 1999) in exact BIGINT arithmetic.

    h_0 = 1 everywhere; each round: auth(v) = sum of h(u) over in-edges
    u->v, then hub(u) = sum of auth(v) over out-edges u->v. Skipping the
    usual L2 normalization keeps every intermediate an exact integer —
    the RANKING is identical (normalization is a positive scalar per
    round) and the oracle twin matches bit-for-bit with no float-drift
    caveats. Nodes with no in-edges report auth=0, no out-edges hub=0.

    Overflow bound: values grow <= (max_degree^2)^rounds; at rounds=2
    even a 10^4-degree hub stays ~10^16 < 2^63. For deeper runs switch
    to normalized doubles (pagerank's rounding contract) — at web scale
    2-3 rounds is the published use (hub/authority triage of a crawl
    frontier, complementing pagerank's single authority axis).

    Scale shape mirrors pagerank: per half-round ONE equi-join of the
    score vector against the (deduplicated, materialized) edge table +
    ONE hash agg keyed by the receiving endpoint; linear plan growth,
    no all-pairs anywhere.
    """
    if rounds < 1:
        raise ValueError(f"hits: rounds must be >= 1, got {rounds}")
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
         .distinct())
    # Driver fast path (r6, DRIVER_EDGE_CAP): the unnormalized power
    # iterations are exact BIGINT sums — one bounded collect replaces
    # 2 join+agg jobs per round on a dimension-sized graph.
    _head = e.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(_head) <= DRIVER_EDGE_CAP:
        elist = [(r["u"], r["v"]) for r in _head]
        nset = {u for u, _ in elist} | {v for _, v in elist}
        h = {n2: 1 for n2 in nset}
        a = {n2: 0 for n2 in nset}
        for _ in range(rounds):
            a = {n2: 0 for n2 in nset}
            for u, v in elist:
                a[v] += h[u]
            h = {n2: 0 for n2 in nset}
            for u, v in elist:
                h[u] += a[v]
        spark = edges.sparkSession
        node_type = e.schema.fields[0].dataType
        return spark.createDataFrame(
            [(n2, h[n2], a[n2]) for n2 in nset],
            T.StructType([
                T.StructField("node", node_type, True),
                T.StructField("hub", T.LongType(), True),
                T.StructField("auth", T.LongType(), True)]))
    if materialize:
        e = e.localCheckpoint(eager=True)
    nodes = (e.select(F.col("u").alias("node"))
             .union(e.select("v")).distinct())
    if materialize:
        nodes = nodes.localCheckpoint(eager=True)
    hub = nodes.select("node", F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(rounds):
        auth = (e.join(hub, e.u == hub.node)
                .groupBy(F.col("v").alias("node2"))
                .agg(F.sum("h").alias("a"))
                .withColumnRenamed("node2", "node"))
        auth = (nodes.join(auth, "node", "left")
                .select("node", F.coalesce("a", F.lit(0)).alias("a")))
        hub = (e.join(auth, e.v == auth.node)
               .groupBy(F.col("u").alias("node2"))
               .agg(F.sum("a").alias("h"))
               .withColumnRenamed("node2", "node"))
        hub = (nodes.join(hub, "node", "left")
               .select("node", F.coalesce("h", F.lit(0)).alias("h")))
    return (nodes.join(hub, "node").join(auth, "node")
            .select("node", F.col("h").alias("hub"),
                    F.col("a").alias("auth")))


def khop_distance(edges: DataFrame, seeds: DataFrame, k: int = 3,
                  src: str = "src", dst: str = "dst",
                  seed_col: str = "node") -> DataFrame:
    """Multi-source BFS: -> (node, dist) = minimum number of DIRECTED
    hops from any seed, for every node reachable within k hops
    (seeds themselves report dist 0).

    KG/crawl neighborhood expansion: "everything within 3 clicks of the
    seed hosts" (crawl scoping) or "entities within 2 hops of a query
    entity" (KG subgraph extraction for retrieval). Level-synchronous
    frontier BFS — the MapReduce-era standard shape: round r joins ONLY
    the current frontier (not the whole visited set) against the edge
    table, anti-joins the visited set, and localCheckpoints the new
    frontier so lineage stays flat across rounds. Per round: one
    equi-join keyed on the frontier node + one anti-join; shuffle volume
    is proportional to the frontier's out-edge count, never the graph.

    Early exit: an empty frontier ends the loop (count() per round on
    the checkpointed frontier is the bounded driver action, same
    contract as pagerank's node count).
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    # Driver fast path (r6, DRIVER_EDGE_CAP): level-synchronous BFS is
    # exact set arithmetic — one bounded collect replaces k rounds of
    # join + anti-join + checkpoint + count jobs.
    _head = e.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(_head) <= DRIVER_EDGE_CAP:
        seed_rows = (seeds.select(F.col(seed_col).alias("node"))
                     .distinct().limit(DRIVER_EDGE_CAP + 1).collect())
        if len(seed_rows) <= DRIVER_EDGE_CAP:
            adj: dict = {}
            for r2 in _head:
                adj.setdefault(r2["u"], set()).add(r2["v"])
            visited_d = {r2["node"]: 0 for r2 in seed_rows}
            frontier_s = set(visited_d)
            for r2 in range(1, k + 1):
                nxt = set()
                for x in frontier_s:
                    nxt |= adj.get(x, set())
                nxt -= set(visited_d)
                if not nxt:
                    break
                for x in nxt:
                    visited_d[x] = r2
                frontier_s = nxt
            spark = edges.sparkSession
            node_type = e.schema.fields[0].dataType
            return spark.createDataFrame(
                list(visited_d.items()), T.StructType([
                    T.StructField("node", node_type, True),
                    T.StructField("dist", T.LongType(), False)]))
    frontier = (seeds.select(F.col(seed_col).alias("node")).distinct()
                .localCheckpoint(eager=True))
    visited = frontier.select("node", F.lit(0).cast("long").alias("dist"))
    for r in range(1, k + 1):
        nxt = (e.join(frontier, e.u == frontier.node)
               .select(F.col("v").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(r).cast("long").alias("dist")))
        frontier = nxt
    return visited


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          src: str = "src", dst: str = "dst",
                          seed_col: str = "node", iterations: int = 4,
                          damping: float = 0.85,
                          materialize: bool = True) -> DataFrame:
    """Personalized PageRank: power iteration whose teleport returns to
    the SEED set instead of the uniform vector — pr measures proximity
    to the seeds, the standard KG-retrieval/GraphRAG subgraph scorer
    ("rank entities around the query entities") and the crawl scoper's
    weighted counterpart to khop_distance's hard hop cutoff.

    pr_0 = s;  pr_{r+1}(v) = (1-d)*s(v) + d * sum_in pr(u)/outdeg(u),
    with s uniform over the seeds. Edges are symmetrized and
    deduplicated like classic pagerank (so no dangling-mass term);
    unreachable nodes report pr 0.0 rather than dropping, keeping the
    output a total scoring of the node set.

    Scale shape: identical to pagerank — the degree-carrying edge table
    is built once and localCheckpointed; each round is ONE equi-join of
    the rank vector + ONE hash agg on the destination, then a LEFT join
    back to the (materialized) node set to re-add teleport mass; the
    rank vector is referenced once per round (linear plan growth). The
    seed table enters as a broadcast (it is query-sized, not
    corpus-sized). Final pr rounded to 6dp (pagerank's cross-engine
    contract).
    """
    sym = _symmetrize(edges, src, dst)
    if materialize:
        sym = sym.localCheckpoint(eager=True)
    outdeg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib_edges = sym.join(outdeg, "a")
    nodes = outdeg.select(F.col("a").alias("node"))
    if materialize:
        nodes = nodes.localCheckpoint(eager=True)
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    # a seed absent from the graph would silently shrink total teleport
    # mass below 1 (its 1/n_seeds share lands nowhere) — fail loudly,
    # same guard convention as pagerank's weight validation
    n_absent = seed_nodes.join(nodes, "node", "left_anti").limit(1).count()
    if n_absent:
        raise ValueError(
            "personalized_pagerank: seed(s) not present in the graph's "
            "node set")
    s = (nodes.join(F.broadcast(seed_nodes.withColumn(
            "s", F.lit(1.0 / n_seeds))), "node", "left")
         .select("node", F.coalesce("s", F.lit(0.0)).alias("s")))
    if materialize:
        s = s.localCheckpoint(eager=True)
    pr = s.select("node", F.col("s").alias("pr"))
    for _ in range(iterations):
        contrib = (contrib_edges.join(pr, contrib_edges.a == pr.node)
                   .groupBy(F.col("b").alias("node2"))
                   .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
                   .withColumnRenamed("node2", "node"))
        pr = (s.join(contrib, "node", "left")
              .select("node",
                      (F.lit(1.0 - damping) * F.col("s")
                       + F.lit(damping)
                       * F.coalesce("c", F.lit(0.0))).alias("pr")))
    return pr.select("node", F.round("pr", 6).alias("pr"))


def random_walks(edges: DataFrame, walk_len: int = 4,
                 walks_per_node: int = 2, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """DeepWalk-style walk corpus over the symmetrized graph:
    ``walks_per_node`` walks of ``walk_len`` steps start at every node.

    -> (walk_id, start, step, node): step 0 is the start node itself;
    a walk that reaches a node with no neighbors (impossible after
    symmetrization, kept for safety) simply ends early.

    The "random" next hop is DETERMINISTIC: at step t the walk at node v
    picks the neighbor whose dense per-node rank equals
    md5(start|walk|t|v) % degree(v) — reproducible across runs,
    partitionings, and engines (the weighted_sample / dsir_weights
    portability precedent), which is what makes a 100 TB walk corpus —
    the training input for DeepWalk/node2vec-class graph embeddings —
    auditable and resumable instead of RNG-state-dependent.

    Scale shape: the neighbor table carries a precomputed (row_number
    per node, degree) — built ONCE with one window over the edge list,
    localCheckpointed; each step is then ONE equi-join of the frontier
    against that table on (node, picked_rank) — the join key includes
    the rank, so each walk row matches exactly one neighbor row (no
    fan-out, no skew beyond the graph's own degree distribution). Plan
    growth is linear in walk_len; the result is the union of per-step
    checkpointed frontiers (the khop_distance contract).
    """
    sym = _symmetrize(edges, src, dst).filter(F.col("a") != F.col("b"))
    w = Window.partitionBy("a").orderBy("b")
    nbr = (sym.select("a", "b",
                      (F.row_number().over(w) - 1).alias("rnk"))
           .localCheckpoint(eager=True))
    degs = nbr.groupBy("a").agg(F.count(F.lit(1)).alias("deg")) \
        .localCheckpoint(eager=True)
    nodes = degs.select(F.col("a").alias("start"))
    cur = (nodes.crossJoin(
        F.broadcast(edges.sparkSession.range(walks_per_node)
                    .select(F.col("id").alias("walk"))))
        .select("start", "walk", F.col("start").alias("node")))
    out = cur.select("start", "walk",
                     F.lit(0).cast("long").alias("step"), "node")
    for t in range(1, walk_len + 1):
        pick = (F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.col("start"), F.col("walk"), F.lit(str(t)),
            F.col("node"))), 1, 8), 16, 10).cast("long"))
        # 1:1 degree join first (picked_rank needs deg), then 1:1
        # equi-join on (node, picked_rank) — NO per-neighbor fan-out:
        # a degree-10^6 hub never expands a walk row 10^6 ways
        picked = (cur.join(degs, cur.node == degs.a)
                  .select("start", "walk", "node",
                          (pick % F.col("deg")).alias("prnk")))
        stepped = (picked
                   .join(nbr, (picked.node == nbr.a)
                         & (picked.prnk == nbr.rnk))
                   .select("start", "walk", F.col("b").alias("node"))
                   .localCheckpoint(eager=True))
        out = out.unionByName(
            stepped.select("start", "walk",
                           F.lit(t).cast("long").alias("step"), "node"))
        cur = stepped
    return (out.select(
        F.concat_ws("#", F.col("start"), F.col("walk")).alias("walk_id"),
        "start", "step", "node"))


def kcore_nodes(edges: DataFrame, k: int = 2, max_rounds: int = 30,
                src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core decomposition: iteratively peel nodes with degree < k
    (over the symmetrized, deduplicated, self-loop-free graph) until the
    surviving set is stable. -> (node, core_deg) = the k-core member set
    with each member's degree INSIDE the core.

    The classic web-graph pruning pass: the k-core drops the long tail of
    weakly-connected pages/entities before expensive analytics (the
    2-core alone removes all trees hanging off the graph), and is the
    standard preconditioner for community detection and dense-subgraph
    mining over crawl graphs.

    Scale shape: each peel round is ONE semi-join of the edge table
    against the surviving node set (both endpoints) + ONE degree agg —
    the connected_components per-round contract; the survivor set is
    localCheckpointed so lineage stays flat, and the loop early-exits on
    the first round that removes nothing (peeling is monotone). Raises
    after ``max_rounds`` instead of silently returning an unconverged
    set (the dedup_clusters fixpoint convention); real graphs converge
    in a handful of rounds because each round removes entire dangling
    subtrees, not single nodes.
    """
    sym = (_symmetrize(edges, src, dst)
           .filter(F.col("a") != F.col("b"))
           .localCheckpoint(eager=True))
    # Driver fast path (r6, DRIVER_EDGE_CAP): degree peeling is exact
    # set arithmetic — one bounded collect replaces per-round
    # semi-join + agg + checkpoint jobs; same first-no-removal
    # convergence and RuntimeError semantics.
    _head = sym.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(_head) <= DRIVER_EDGE_CAP:
        nbrs: dict = {}
        for r in _head:
            nbrs.setdefault(r["a"], set()).add(r["b"])
        alive_set = set(nbrs)
        n_alive0 = len(alive_set)
        for _ in range(max_rounds):
            degs = {n2: len(nbrs[n2] & alive_set) for n2 in alive_set}
            nxt = {n2 for n2, d in degs.items() if d >= k}
            if len(nxt) == n_alive0:
                spark = edges.sparkSession
                node_type = sym.schema.fields[0].dataType
                return spark.createDataFrame(
                    [(n2, degs[n2]) for n2 in alive_set],
                    T.StructType([
                        T.StructField("node", node_type, True),
                        T.StructField("core_deg", T.LongType(), False)]))
            alive_set = nxt
            n_alive0 = len(nxt)
        raise RuntimeError(
            f"kcore_nodes: did not converge within {max_rounds} rounds "
            f"(k={k}); raise max_rounds")
    alive = sym.select(F.col("a").alias("node")).distinct() \
        .localCheckpoint(eager=True)
    n_alive = alive.count()
    for _ in range(max_rounds):
        deg = (sym
               .join(alive.select(F.col("node").alias("a")), "a",
                     "left_semi")
               .join(alive.select(F.col("node").alias("b")), "b",
                     "left_semi")
               .groupBy("a").agg(F.count(F.lit(1)).alias("core_deg")))
        nxt = deg.filter(F.col("core_deg") >= k) \
            .select(F.col("a").alias("node"), "core_deg") \
            .localCheckpoint(eager=True)
        n_next = nxt.count()
        if n_next == n_alive:
            return nxt
        alive = nxt.select("node")
        n_alive = n_next
    raise RuntimeError(
        f"kcore_nodes: did not converge within {max_rounds} rounds "
        f"(k={k}); raise max_rounds")


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Undirected edges -> (node, degree, n_triangles, lcc): local
    clustering coefficient lcc = 2*T(v) / (deg(v) * (deg(v) - 1)).

    KG quality triage one step past raw triangle counts: a high-degree
    entity with lcc ~ 0 is a star center (the classic symptom of an
    over-merged canonical id or a stop-word-like surface that linked
    everything), while lcc ~ 1 marks clique-embedded entities whose
    co-occurrence edges corroborate each other. Degree counts DISTINCT
    neighbors with self-loops dropped (a self-loop can close no
    triangle and would silently shift every denominator).

    Degenerate cases are DEFINED, not NULL (the mixture_weights
    convention): deg <= 1 -> lcc = 0.0. Rounded to 6 (portable).

    Scale shape: triangle_count's degree-oriented wedge join (bounded by
    arboricity, not deg^2 — hub-skew safe) plus ONE extra distinct-
    neighbor degree agg and a node-keyed join; nothing here is wider
    than the triangle pass an operator like this already pays for.
    """
    clean = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
             .filter(F.col("s") != F.col("d")))
    tri = triangle_count(clean, "s", "d")
    deg = (_symmetrize(clean, "s", "d")
           .groupBy(F.col("a").alias("node"))
           .agg(F.count(F.lit(1)).alias("degree")))
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(2.0 * F.col("n_triangles")
                / (F.col("degree") * (F.col("degree") - F.lit(1))), 6)
    ).otherwise(F.lit(0.0))
    return (tri.join(deg, "node")
            .select("node", F.col("degree").cast("long").alias("degree"),
                    "n_triangles", lcc.alias("lcc")))


def textrank(tokens: DataFrame, window: int = 2, iterations: int = 3,
             top_k: int = 3, damping: float = 0.85,
             id_col: str = "doc_id", token_col: str = "token",
             pos_col: str = "pos", materialize: bool = True) -> DataFrame:
    """Per-document TextRank keyword salience (Mihalcea & Tarau 2004)
    -> top-k (doc_id, token, score, rank) per document.

    The unsupervised salience signal between raw TF-IDF and the tagger:
    tokens vote for the neighbors they co-occur with (positions within
    ``window``), and ``iterations`` rounds of the weighted PageRank
    update  pr(v) = (1-d) + d * sum_u w(u,v)/wdeg(u) * pr(u)  (classic
    unnormalized form, pr0 = 1.0) concentrate score on tokens embedded
    in dense co-occurrence neighborhoods — for KG triage, the
    entity-bearing tokens worth grounding first.

    All per-doc graphs ride ONE keyspace (doc_id, token): co-occurrence
    pairs come from lead() windows over the tokens table's natural
    (doc_id, pos) sort — no positional self-join — and every iteration
    is one equi-join + one hash agg keyed (doc_id, token), exactly the
    pagerank() per-round contract with the doc id carried through. The
    edge table is localCheckpointed before the loop (referenced every
    round + for wdeg). 10^12 docs just means more keys, never a wider
    plan; within-doc state is bounded by doc length.

    Determinism: rank orders by the 6dp-ROUNDED score (token ASC
    tie-break) — the tfidf_ranked convention that makes a float ranking
    engine-portable. Tokens with no co-occurrence edge (docs shorter
    than 2 distinct tokens in any window) emit no rows.
    """
    w = Window.partitionBy(id_col).orderBy(pos_col)
    # all lead distances in ONE projection -> a single Window exec (one
    # shuffle+sort on the tokens table's natural key), then the pair
    # explode runs on plain columns (generators can't nest windows)
    led = tokens.select(
        F.col(id_col).alias("did"), F.col(token_col).alias("a"),
        *[F.lead(token_col, d).over(w).alias(f"b{d}")
          for d in range(1, window + 1)])
    pair_structs = F.array(*[
        F.struct(F.col("a").alias("a"), F.col(f"b{d}").alias("b"))
        for d in range(1, window + 1)])
    raw = (led
           .select("did", F.explode(pair_structs).alias("p"))
           .select("did", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .filter(F.col("b").isNotNull() & (F.col("a") != F.col("b"))))
    und = raw.unionByName(
        raw.select("did", F.col("b").alias("a"), F.col("a").alias("b")))
    edges = und.groupBy("did", "a", "b").agg(F.count(F.lit(1)).alias("cw"))
    wdeg = edges.groupBy("did", "a").agg(F.sum("cw").alias("wdeg"))
    frac_edges = (edges.join(wdeg, ["did", "a"])
                  .select("did", "a", "b",
                          (F.col("cw") / F.col("wdeg").cast("double"))
                          .alias("frac")))
    # r6: each document's graph is doc-length-bounded, so after ONE
    # doc-keyed shuffle of the normalized edge table every task runs
    # the whole fixed-round weighted-PageRank update for its docs in
    # numpy (segment sums over the local edge arrays) and emits only
    # its docs' top_k rows with ranks — replacing `iterations` rounds
    # of corpus-wide join+agg plus the final window (7.2s -> ~2.5s
    # first-run at sf0.1). Edges sort (did, a, b) before accumulation
    # so the FP sum order is run-deterministic; the 6dp rounding uses
    # exact decimal HALF_UP on the binary double, the same semantics as
    # Spark's round. The update itself is unchanged:
    # pr(v) = (1-d) + d * sum_u frac(u,v) * pr(u), pr0 = 1.
    if materialize:
        # single consumer now, but the eager checkpoint still saves the
        # double-derivation of the edge agg feeding both sides of the
        # wdeg join inside the one job; materialize=False exposes the
        # full lineage for plan audits.
        frac_edges = frac_edges.localCheckpoint(eager=True)
    from pyspark.sql import types as T
    did_type = [f.dataType for f in tokens.schema.fields
                if f.name == id_col][0]
    tok_type = [f.dataType for f in tokens.schema.fields
                if f.name == token_col][0]
    out_schema = T.StructType([
        T.StructField(id_col, did_type, True),
        T.StructField(token_col, tok_type, True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("rank", T.LongType(), False)])
    n_iter, damp, kk = int(iterations), float(damping), int(top_k)

    def rank_docs(batches):
        import decimal

        import numpy as np
        import pandas as pd
        frames = list(batches)
        if not frames:
            return
        pdf = (pd.concat(frames, ignore_index=True)
               .sort_values(["did", "a", "b"], kind="mergesort")
               .reset_index(drop=True))
        m = len(pdf)
        did2 = pd.concat([pdf["did"], pdf["did"]], ignore_index=True)
        tok2 = pd.concat([pdf["a"], pdf["b"]], ignore_index=True)
        dcodes, dvals = pd.factorize(did2)
        tcodes, tvals = pd.factorize(tok2)
        combined = dcodes.astype(np.int64) * len(tvals) + tcodes
        nodes, codes = np.unique(combined, return_inverse=True)
        src, dst = codes[:m], codes[m:]
        frac = pdf["frac"].to_numpy(dtype=np.float64)
        pr = np.ones(len(nodes), dtype=np.float64)
        for _ in range(n_iter):
            s = np.zeros(len(nodes), dtype=np.float64)
            np.add.at(s, dst, frac * pr[src])
            pr = (1.0 - damp) + damp * s
        # Spark's round() parses Double.toString — the SHORTEST decimal
        # that round-trips the double (Python's repr gives the same
        # string) — and half-up rounds THAT; Decimal(float) would use
        # the exact binary expansion and can land one ulp-of-decimal
        # lower (0.9362415 vs 0.93624149999...96).
        q6 = decimal.Decimal("0.000001")
        score = np.fromiter(
            (float(decimal.Decimal(repr(float(x))).quantize(
                q6, rounding=decimal.ROUND_HALF_UP)) for x in pr),
            dtype=np.float64, count=len(pr))
        out = pd.DataFrame({
            "did": dvals.take(nodes // len(tvals)),
            "node": tvals.take(nodes % len(tvals)),
            "score": score})
        out = out.sort_values(["did", "score", "node"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out["rank"] = out.groupby("did", sort=False).cumcount() + 1
        out = out[out["rank"] <= kk]
        yield out.rename(columns={"did": id_col, "node": token_col})

    return (frac_edges.repartition(F.col("did"))
            .mapInPandas(rank_docs, out_schema))


def _edge_supports(es: DataFrame) -> DataFrame:
    """id-ordered distinct edges (a < b) -> (a, b, support): number of
    triangles containing each edge. Degree-ordered wedge enumeration
    (the triangle_count skew bound: a hub expands wedges only toward
    higher-degree neighbors, so cost is arboricity-bounded, never
    deg^2); the emitted triangle's three edges re-normalize to id order
    before the support agg."""
    sym = es.unionByName(es.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    keyed = (sym.join(deg, "a")
             .withColumnRenamed("deg", "deg_a")
             .join(deg.select(F.col("a").alias("b"),
                              F.col("deg").alias("deg_b")), "b"))
    oriented = keyed.filter(
        (F.col("deg_a") < F.col("deg_b"))
        | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    ).select("a", "b", "deg_b")
    e1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"),
                         F.col("deg_b").alias("deg_v"))
    e2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"),
                         F.col("deg_b").alias("deg_w"))
    wedges = (e1.join(e2, "u")
              .filter((F.col("deg_v") < F.col("deg_w"))
                      | ((F.col("deg_v") == F.col("deg_w"))
                         & (F.col("v") < F.col("w")))))
    closing = oriented.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    pair = F.array(
        F.struct(F.least("u", "v").alias("a"),
                 F.greatest("u", "v").alias("b")),
        F.struct(F.least("u", "w").alias("a"),
                 F.greatest("u", "w").alias("b")),
        F.struct(F.least("v", "w").alias("a"),
                 F.greatest("v", "w").alias("b")))
    return (tri.select(F.explode(pair).alias("e"))
            .groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("support")))


def ktruss_edges(edges: DataFrame, k: int = 3, max_rounds: int = 30,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edges -> the k-truss: the maximal subgraph in which
    every surviving edge sits in >= k-2 triangles OF THE SUBGRAPH
    (Cohen 2008) -> (a, b, support) with a < b and the support measured
    on the final stable edge set.

    The EDGE-wise sibling of kcore_nodes and the standard dense-
    community prefilter for KG curation: a 3-truss keeps only edges
    corroborated by at least one surviving triangle, cutting spurious
    one-off co-occurrence links that PMI alone underweights. Peeling is
    monotone, so iteration converges; early exit on the first round
    that removes nothing, loud RuntimeError past ``max_rounds`` (the
    kcore/dedup_clusters fixpoint-honesty convention). Self-loops
    dropped; parallel edges collapse via distinct.

    Scale shape per round: the degree-oriented triangle pass
    (arboricity-bounded wedges, hub-safe) + one support agg + one
    edge-keyed join — the kcore per-round contract with triangles in
    place of degrees; the surviving edge set is localCheckpointed so
    lineage stays flat across rounds.
    """
    es = (edges
          .select(F.least(F.col(src), F.col(dst)).alias("a"),
                  F.greatest(F.col(src), F.col(dst)).alias("b"))
          .filter(F.col("a") != F.col("b"))
          .distinct()
          .localCheckpoint(eager=True))
    # Driver fast path (r6, DRIVER_EDGE_CAP): support counting and
    # peeling are exact set arithmetic — on a dimension-sized edge set
    # the whole fixpoint runs over one bounded collect (support =
    # |N(a) ∩ N(b)|, remove-until-stable) with the same
    # first-no-removal convergence and RuntimeError past max_rounds,
    # instead of per-round wedge-join + agg + checkpoint jobs.
    _head = es.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(_head) <= DRIVER_EDGE_CAP:
        cur = {(r["a"], r["b"]) for r in _head}
        for _ in range(max_rounds):
            nbrs: dict = {}
            for a, b in cur:
                nbrs.setdefault(a, set()).add(b)
                nbrs.setdefault(b, set()).add(a)
            sup = {(a, b): len(nbrs[a] & nbrs[b]) for a, b in cur}
            nxt = {e2 for e2, s in sup.items() if s >= k - 2}
            if len(nxt) == len(cur):
                spark = edges.sparkSession
                node_type = es.schema.fields[0].dataType
                return spark.createDataFrame(
                    [(a, b, sup[(a, b)]) for a, b in cur],
                    T.StructType([
                        T.StructField("a", node_type, True),
                        T.StructField("b", node_type, True),
                        T.StructField("support", T.LongType(), True)]))
            cur = nxt
        raise RuntimeError(
            f"ktruss_edges: did not converge within {max_rounds} "
            f"rounds (k={k}); raise max_rounds")
    n_cur = es.count()
    for _ in range(max_rounds):
        sup = _edge_supports(es)
        nxt_lazy = (es.join(sup, ["a", "b"], "left")
                    .select("a", "b",
                            F.coalesce("support", F.lit(0)).cast("long")
                            .alias("support"))
                    .filter(F.col("support") >= k - 2))
        nxt = nxt_lazy.localCheckpoint(eager=True)
        n_next = nxt.count()
        if n_next == n_cur:
            # return the LAZY final round (over the checkpointed edge
            # set): identical rows, and the consumer/plan audit sees the
            # wedge-join + support-agg shape instead of a checkpoint scan
            return nxt_lazy
        es = nxt.select("a", "b")
        n_cur = n_next
    raise RuntimeError(
        f"ktruss_edges: did not converge within {max_rounds} rounds "
        f"(k={k}); raise max_rounds")


def wl_colors(edges: DataFrame, rounds: int = 2, src: str = "src",
              dst: str = "dst", materialize: bool = True) -> DataFrame:
    """Weisfeiler-Lehman color refinement -> (node, wl): after
    ``rounds`` iterations of  color' = md5(color | sorted neighbor
    colors), truncated to 16 hex chars.

    The classic graph-canonization primitive (1-WL): two nodes get the
    same final color iff their depth-``rounds`` neighborhood trees are
    indistinguishable, so the color HISTOGRAM is a structural
    fingerprint of the whole graph — the KG-diff signature that detects
    "this snapshot's neighborhood structure changed" without comparing
    edges row-by-row, and the entity-context signature for structural
    (rather than surface) entity matching. Initial color = degree.

    Determinism/portability: colors are md5 over a canonical string
    (own color + ',' + comma-joined SORTED neighbor colors) — the DSIR
    hash family, bit-identical in any engine; 16 hex chars keep
    collision odds negligible (64 bits) while halving state.

    Scale shape: each round is ONE join (edge table against the color
    vector, exactly once — linear plan growth) + ONE sorted-collect agg
    per node; per-node state is bounded by degree, and a production run
    on a hub-skewed graph caps the collected list the same way the
    tagger caps batch size (here the KG graphs are canonicalized first,
    which is what bounds hubs). Edges are localCheckpointed once.
    """
    sym = (_symmetrize(edges, src, dst)
           .filter(F.col("a") != F.col("b"))
           .localCheckpoint(eager=True))
    colors = (sym.groupBy(F.col("a").alias("node"))
              .agg(F.count(F.lit(1)).cast("string").alias("wl")))
    for i in range(rounds):
        nb = (sym
              .join(colors.select(F.col("node").alias("b"),
                                  F.col("wl").alias("nb_wl")), "b")
              .groupBy(F.col("a").alias("node"))
              .agg(F.array_join(F.array_sort(F.collect_list("nb_wl")), ",")
                   .alias("nbs")))
        colors = (colors.join(nb, "node")
                  .select("node",
                          F.substring(F.md5(F.concat_ws(",", "wl", "nbs")),
                                      1, 16).alias("wl")))
        # the color vector is referenced TWICE per round (neighbor join +
        # own-color join), so the un-cut plan doubles per round — the
        # _propagate analyzer-blowup class; cut lineage between rounds
        # (final round stays lazy so consumers/plan audits see the shape)
        if materialize and i < rounds - 1:
            colors = colors.localCheckpoint(eager=True)
    return colors


def sssp_weighted(edges: DataFrame, seeds: DataFrame,
                  weight_col: str = "cost", max_rounds: int = 30,
                  src: str = "src", dst: str = "dst",
                  seed_col: str = "node") -> DataFrame:
    """Multi-source single-source-shortest-path over DIRECTED weighted
    edges -> (node, dist): minimum total edge cost from any seed, for
    every reachable node (seeds report 0). Distributed Bellman-Ford —
    the Pregel-standard SSSP: round r relaxes every edge once,
    dist'(v) = min(dist(v), min over edges u->v of dist(u) + w(u, v)),
    converging in <= longest-shortest-path-hops rounds.

    The weighted upgrade of khop_distance: hop counts scope a crawl,
    but KG relatedness and routing want COST (e.g. -log PMI as edge
    length, so short paths = strongly associated entity chains).
    Weights must be NON-NEGATIVE integers (validated): integer min/+
    arithmetic is engine-exact, the same reason hits() is exact-BIGINT
    — no float accumulation to drift across engines.

    Scale shape per round: ONE equi-join of the CURRENT distance table
    against the (checkpointed) edge list + one min-agg, the
    connected_components per-round contract; the distance table is
    referenced once per round via the closed-neighborhood trick
    (self-edges with cost 0 fold "keep my current dist" into the same
    join, linear plan growth) and localCheckpointed between rounds.
    Early exit on the first round with no improvement; RuntimeError
    past max_rounds (negative-cycle-impossible here, so non-convergence
    means max_rounds is too small — loud, never silent).
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                      F.col(weight_col).cast("long").alias("w"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull()))
    bad = e.filter(F.col("w").isNull() | (F.col("w") < 0)).limit(1).count()
    if bad:
        raise ValueError("sssp_weighted: weights must be non-negative "
                         "integers (NULL or negative cost found)")
    e = e.groupBy("u", "v").agg(F.min("w").alias("w"))
    # Driver fast path (r6, DRIVER_EDGE_CAP guard): Bellman-Ford over
    # integer min/+ arithmetic is exact, so on a dimension-sized edge
    # list the whole relaxation loop runs on the driver over one
    # bounded collect — zero per-round join+agg+checkpoint jobs — with
    # the same first-no-change-round convergence and the same
    # RuntimeError past max_rounds. Larger graphs keep the loop.
    _head = e.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(_head) <= DRIVER_EDGE_CAP:
        seed_rows = (seeds.select(F.col(seed_col).alias("node"))
                     .distinct().limit(DRIVER_EDGE_CAP + 1).collect())
        if len(seed_rows) <= DRIVER_EDGE_CAP:
            elist = [(r["u"], r["v"], int(r["w"])) for r in _head]
            # the distributed rounds carry distances forward via
            # zero-cost self-edges of GRAPH nodes only, so a seed
            # absent from the graph drops out after round 1 — mirror
            # that by rebuilding from graph nodes each round
            gnodes = ({u for u, _v, _w in elist}
                      | {v for _u, v, _w in elist})
            dist = {r["node"]: 0 for r in seed_rows}
            for _ in range(max_rounds):
                new = {n: dist[n] for n in gnodes if n in dist}
                for u, v, w in elist:
                    du = dist.get(u)
                    if du is not None:
                        nd = du + w
                        if v not in new or nd < new[v]:
                            new[v] = nd
                if new == dist:
                    spark = edges.sparkSession
                    node_type = e.schema.fields[0].dataType
                    return spark.createDataFrame(
                        list(dist.items()), T.StructType([
                            T.StructField("node", node_type, True),
                            T.StructField("dist", T.LongType(), True)]))
                dist = new
            raise RuntimeError(
                f"sssp_weighted: did not converge within {max_rounds} "
                "rounds; raise max_rounds")
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node"))).distinct())
    # closed neighborhood: zero-cost self-edges mean each round is ONE
    # join + ONE agg with dist referenced exactly once
    e_self = (e.unionByName(nodes.select(F.col("node").alias("u"),
                                         F.col("node").alias("v"),
                                         F.lit(0).cast("long").alias("w")))
              .localCheckpoint(eager=True))
    dist = (seeds.select(F.col(seed_col).alias("node")).distinct()
            .select("node", F.lit(0).cast("long").alias("dist"))
            .localCheckpoint(eager=True))
    n_reached, total = dist.count(), -1
    for _ in range(max_rounds):
        relaxed = (e_self.join(dist, e_self.u == dist.node)
                   .groupBy(F.col("v").alias("node2"))
                   .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
                   .withColumnRenamed("node2", "node")
                   .localCheckpoint(eager=True))
        stats = relaxed.agg(F.count(F.lit(1)).alias("n"),
                            F.sum("dist").alias("s")).collect()[0]
        if (stats["n"], stats["s"]) == (n_reached, total):
            return relaxed
        n_reached, total = stats["n"], stats["s"]
        dist = relaxed
    raise RuntimeError(
        f"sssp_weighted: did not converge within {max_rounds} rounds; "
        "raise max_rounds")


def link_prediction_eval(edges: DataFrame, split_denom: int = 2,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """Held-out evaluation of Adamic-Adar link prediction -> ONE row
    (n_pos, n_neg, auc): hash-split the undirected edge set into train
    (md5(a:b) % split_denom != 0) and test halves, score every
    non-adjacent-in-train candidate pair on the TRAIN graph, and report
    the ROC-AUC of the scores against test-set membership.

    The eval harness KG completion actually needs: link_prediction
    ranks candidates, this says whether the ranking is any good —
    closing the loop the same way eval_prf closes it for the tagger.
    Deterministic split (the portable md5 family), histogram-form
    tie-exact AUC (evaluation.roc_auc), so the whole experiment is
    reproducible and engine-checkable end-to-end.

    Scale shape: the split is per-row arithmetic; candidate scoring is
    the shared _aa_candidates wedge join (never all-pairs); labels are
    ONE left join against the test half; the AUC windows over distinct
    scores (the roc_auc contract). Nothing here is wider than
    link_prediction itself.
    """
    from saber_spark.operators.evaluation import roc_auc
    norm = (edges
            .select(F.least(F.col(src), F.col(dst)).alias("a"),
                    F.greatest(F.col(src), F.col(dst)).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())
    h = F.conv(F.substring(F.md5(F.concat_ws(":", "a", "b")), 1, 8),
               16, 10).cast("long") % split_denom
    train = norm.filter(h != 0)
    test = norm.filter(h == 0)
    sym = (train.unionByName(train.select(F.col("b").alias("a"),
                                          F.col("a").alias("b")))
           .localCheckpoint(eager=True))
    cand = _aa_candidates(sym)
    labeled = (cand
               .join(test.withColumn("lbl", F.lit(True)), ["a", "b"],
                     "left")
               .select(F.coalesce("lbl", F.lit(False)).alias("lbl"),
                       "aa_score", F.lit("all").alias("grp")))
    return (roc_auc(labeled, "lbl", "aa_score", "grp")
            .select("n_pos", "n_neg", "auc"))


def graph_summary(edges: DataFrame, src: str = "src",
                  dst: str = "dst") -> DataFrame:
    """One-row structural profile of a directed graph:
    (n_nodes, n_edges, n_reciprocal, reciprocity, density,
    max_out_degree, max_in_degree, assortativity).

    The ANALYZE-TABLE of the KG/web-graph layer: before pointing PageRank
    or community detection at a new edge table, a pipeline wants its shape
    — reciprocity (what fraction of directed edges are mutual; near-zero
    on the web host graph, near-one on a co-occurrence graph fed both
    orientations), density, hub extremes, and out-in degree assortativity
    (Newman 2002, Phys. Rev. Lett. 89.208701: the Pearson correlation
    between out-degree(src) and in-degree(dst) over edges — negative on
    web-like graphs where many small hosts link a few hubs).

    Determinism: all sums are exact BIGINT over distinct self-loop-free
    edges; reciprocity / density / assortativity are single double
    expressions over those integers, rounded to 6 — engine-portable the
    same way edge_pmi is. Zero-variance degenerate cases are DEFINED:
    assortativity = 0.0 (not NULL/NaN), density over n_nodes<2 = 0.0.

    Scale shape: distinct edges (one shuffle), out-/in-degree aggs on the
    edge table's own keys (map-side combinable), a self-equi-join on the
    reversed pair for reciprocity, two degree joins to annotate each edge
    with (outdeg(src), indeg(dst)), then ONE global agg of six running
    sums. No window over the full edge set, no collect; the only
    unpartitioned step is the final 1-row reduce.
    """
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s") != F.col("d")).distinct()
         .localCheckpoint(eager=True))
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = e.join(rev, ["s", "d"], "left_semi")
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("x"))
    indeg = e.groupBy("d").agg(F.count(F.lit(1)).alias("y"))
    xy = e.join(outdeg, "s").join(indeg, "d")
    sums = xy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    nodes = (e.select(F.col("s").alias("n"))
             .unionByName(e.select(F.col("d").alias("n")))
             .agg(F.countDistinct("n").alias("n_nodes")))
    scalars = (sums.crossJoin(nodes)
               .crossJoin(recip.agg(F.count(F.lit(1)).alias("n_recip")))
               .crossJoin(outdeg.agg(F.max("x").alias("max_out")))
               .crossJoin(indeg.agg(F.max("y").alias("max_in"))))
    varx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    assort = F.when((varx == 0) | (vary == 0), F.lit(0.0)).otherwise(
        cov.cast("double")
        / F.sqrt(varx.cast("double") * vary.cast("double")))
    dens = F.when(F.col("n_nodes") < 2, F.lit(0.0)).otherwise(
        F.col("m").cast("double")
        / (F.col("n_nodes").cast("double")
           * (F.col("n_nodes") - F.lit(1)).cast("double")))
    return scalars.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("m").cast("long").alias("n_edges"),
        F.col("n_recip").cast("long").alias("n_reciprocal"),
        F.round(F.col("n_recip").cast("double") / F.col("m"), 6)
         .alias("reciprocity"),
        F.round(dens, 6).alias("density"),
        F.col("max_out").cast("long").alias("max_out_degree"),
        F.col("max_in").cast("long").alias("max_in_degree"),
        F.round(assort, 6).alias("assortativity"))


def modularity(edges: DataFrame, labels: DataFrame,
               src: str = "src", dst: str = "dst",
               weight_col: str | None = None,
               node_col: str = "node",
               community_col: str = "community") -> DataFrame:
    """Newman modularity per community -> (community, n_nodes,
    internal_weight, degree_sum, q_contrib); sum(q_contrib) is the
    partition's global Q.

    The quality gate for label_propagation's output (Newman & Girvan 2004,
    Phys. Rev. E 69.026113): Q = sum_c [ W_in(c)/m - (D(c)/2m)^2 ] over an
    undirected weighted graph with total edge weight m, intra-community
    weight W_in(c) and community degree mass D(c). A KG build runs LPA,
    scores the partition with Q, and alerts when a data change drops it —
    without this the community table has no health metric.

    Determinism: edges are canonicalized (least,greatest) and summed as
    exact BIGINT weights, so W_in / D / m are integer-exact; q_contrib is
    one double expression per community row, rounded to 6.

    Scale shape: canonicalize + weight-sum is one shuffle; degrees are the
    symmetrized agg; W_in needs the labels table joined to BOTH endpoints
    — two equi-joins on node ids (labels is |V|-sized, typically
    broadcast-eligible after AQE stats); the per-community aggs run on
    |V|- and |E_intra|-sized inputs. No all-pairs anywhere.
    """
    if weight_col is None:
        # unweighted: a graph EDGE exists or it doesn't — reciprocal /
        # parallel input rows collapse to one undirected edge of w=1
        und = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                            F.greatest(F.col(src), F.col(dst)).alias("b"))
               .filter(F.col("a") != F.col("b"))
               .distinct()
               .withColumn("w", F.lit(1))
               .localCheckpoint(eager=True))
    else:
        und = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                            F.greatest(F.col(src), F.col(dst)).alias("b"),
                            F.col(weight_col).cast("long").alias("w"))
               .filter(F.col("a") != F.col("b"))
               .groupBy("a", "b").agg(F.sum("w").alias("w"))
               .localCheckpoint(eager=True))
    lab = labels.select(F.col(node_col).alias("n"),
                        F.col(community_col).alias("c"))
    deg = (und.select(F.col("a").alias("n"), "w")
           .unionByName(und.select(F.col("b").alias("n"), "w"))
           .groupBy("n").agg(F.sum("w").alias("deg")))
    comm = (lab.join(deg, "n")
            .groupBy("c").agg(F.count(F.lit(1)).alias("n_nodes"),
                              F.sum("deg").alias("degree_sum")))
    la = lab.select(F.col("n").alias("a"), F.col("c").alias("ca"))
    lb = lab.select(F.col("n").alias("b"), F.col("c").alias("cb"))
    win = (und.join(la, "a").join(lb, "b")
           .filter(F.col("ca") == F.col("cb"))
           .groupBy(F.col("ca").alias("c"))
           .agg(F.sum("w").alias("internal_weight")))
    m_total = und.agg(F.sum("w").alias("m"))
    two_m = F.col("m").cast("double") * 2.0
    return (comm.join(win, "c", "left").crossJoin(m_total)
            .select(F.col("c").alias("community"),
                    "n_nodes",
                    F.coalesce("internal_weight", F.lit(0)).cast("long")
                     .alias("internal_weight"),
                    F.col("degree_sum").cast("long").alias("degree_sum"),
                    F.round(
                        F.coalesce("internal_weight", F.lit(0))
                         .cast("double") / F.col("m").cast("double")
                        - (F.col("degree_sum").cast("double") / two_m)
                        * (F.col("degree_sum").cast("double") / two_m),
                        6).alias("q_contrib")))


def link_prediction_ranking(edges: DataFrame, split_denom: int = 2,
                            ks=(1, 3, 10), src: str = "src",
                            dst: str = "dst") -> DataFrame:
    """Ranking-form evaluation of Adamic-Adar link prediction -> ONE row
    (n_queries, mrr, hits_1, hits_3, hits_10): the MRR/Hits@k view of
    the SAME held-out experiment link_prediction_eval scores with AUC —
    the metric pair every KG-completion paper reports (Bordes et al.
    2013 lineage), here over the deterministic md5 edge split.

    Semantics: candidates are _aa_candidates over the TRAIN half; each
    candidate pair's QUERY is its smaller endpoint ``a`` (id-ordered
    pairs, so every query's candidate list is well-defined); within a
    query, rank by aa_score DESC then b ASC (aa_score is 6dp-rounded in
    the shared scorer, so ties — and therefore ranks — are
    engine-portable); a query participates iff >= 1 of its candidates
    is a held-out test edge; its reciprocal rank is 1/rank of its BEST
    positive. MRR = mean over participating queries (6dp); hits_k =
    COUNT of queries whose best positive ranks <= k (exact BIGINT).

    Scale shape: split is per-row arithmetic; scoring is the shared
    wedge join (never all-pairs); the rank window partitions by query
    node whose candidate list is bounded by its 2-hop neighborhood;
    the final agg is one row.
    """
    norm = (edges
            .select(F.least(F.col(src), F.col(dst)).alias("a"),
                    F.greatest(F.col(src), F.col(dst)).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())
    h = F.conv(F.substring(F.md5(F.concat_ws(":", "a", "b")), 1, 8),
               16, 10).cast("long") % split_denom
    train = norm.filter(h != 0)
    test = norm.filter(h == 0)
    sym = (train.unionByName(train.select(F.col("b").alias("a"),
                                          F.col("a").alias("b")))
           .localCheckpoint(eager=True))
    labeled = (_aa_candidates(sym)
               .join(test.withColumn("lbl", F.lit(True)), ["a", "b"],
                     "left")
               .select("a", "b", "aa_score",
                       F.coalesce("lbl", F.lit(False)).alias("lbl")))
    w = Window.partitionBy("a").orderBy(F.col("aa_score").desc(),
                                        F.col("b").asc())
    best = (labeled.withColumn("rk", F.row_number().over(w))
            .filter(F.col("lbl"))
            .groupBy("a")
            .agg(F.min("rk").alias("best_rk")))
    aggs = [F.count(F.lit(1)).alias("n_queries"),
            F.round(F.avg(F.lit(1.0) / F.col("best_rk")), 6)
            .alias("mrr")]
    for k in ks:
        # coalesce: zero participating queries -> hits are exactly 0
        # (mrr stays NULL, the linkpred_auc NULL-auc convention)
        aggs.append(F.coalesce(
            F.sum((F.col("best_rk") <= k).cast("long")),
            F.lit(0).cast("long")).alias(f"hits_{k}"))
    return best.agg(*aggs)


def cycle_edges(edges: DataFrame, max_len: int = 4, src: str = "src",
                dst: str = "dst") -> DataFrame:
    """Bounded cycle detection for hierarchy QA -> the input's distinct
    edges flagged (src, dst, cycle_len): cycle_len = length of the
    SHORTEST cycle (<= max_len) the edge lies on, NULL when it closes
    none. An is-a/subclass-of table must be a DAG; edges this flags are
    the ingestion bugs (mutual hypernymy, A<B<C<A rings) a taxonomy
    build repairs before computing closures — the cycle-QA sibling of
    type_closure, which ASSUMES acyclicity.

    Semantics: edge (a, b) lies on a k-cycle iff b reaches a in k-1
    hops (k=1 self-loop). Bounded by max_len — unbounded reachability
    is a different operator (connected_components on the condensation);
    short rings are where real taxonomy bugs live.

    Scale shape: distinct edges first (ONE corpus-size agg); then
    max_len-1 equi-joins growing a (start, node, hops) frontier with
    min-hop dedup per round and localCheckpoint cutting lineage (the
    pagerank iteration discipline). Frontier size is bounded by
    |E| x avg-out-degree^hops — at taxonomy fan-outs (tree-ish, near-1)
    it stays linear; it is NOT the plan for a dense social graph.
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .distinct()
         .localCheckpoint(eager=True))
    # frontier: b reaches node in `hops` steps (hops >= 1)
    frontier = e.select(F.col("a").alias("start"),
                        F.col("b").alias("node"),
                        F.lit(1).alias("hops"))
    reach = frontier
    for _ in range(max_len - 1):
        step = (frontier.join(e, frontier.node == e.a)
                .select("start", F.col("b").alias("node"),
                        (F.col("hops") + 1).alias("hops")))
        reach = (reach.unionByName(step)
                 .groupBy("start", "node")
                 .agg(F.min("hops").alias("hops"))
                 .localCheckpoint(eager=True))
        frontier = reach
    # edge (a,b): shortest cycle = 1 + shortest b->a path; self-loop = 1
    back = reach.select(F.col("start").alias("b2"),
                        F.col("node").alias("a2"), "hops")
    return (e.join(back, (e.a == F.col("a2")) & (e.b == F.col("b2")),
                   "left")
            .select(F.col("a").alias(src), F.col("b").alias(dst),
                    F.when(e.a == e.b, F.lit(1))
                    .otherwise(
                        F.when(F.col("hops") + 1 <= max_len,
                               F.col("hops") + 1))
                    .cast("int").alias("cycle_len")))


def anf_reach(edges: DataFrame, rounds: int = 2, src: str = "src",
              dst: str = "dst") -> DataFrame:
    """Approximate neighborhood function (ANF / HyperBall) -> one row per
    node: (node, sketch, fm_bit, est_reach) — how many nodes each node
    can reach in <= ``rounds`` hops, estimated from a Flajolet-Martin
    bitstring instead of a frontier set.

    Palmer/Gibbons/Faloutsos KDD'02 (ANF) as run by Boldi/Vigna's
    HyperBall: every node starts with one FM bit (position = trailing
    zeros of a 32-bit node hash, capped at 24); each round ORs in the
    sketches of its out-neighbors. After k rounds sketch(v) is the OR of
    the hashes of every node within k hops, and the lowest unset bit b
    estimates |ball(v, k)| ~ 2^b / 0.77351.

    This is THE scale story for per-node reach on 10^12-edge graphs:
    exact k-hop counting (graph.khop_distance) carries a frontier SET per
    node (worst case |V| per node); the sketch is ONE int64 per node, each
    round is one equi-join + one bit_or hash agg, and accuracy is tunable
    by averaging independent sketch registers. Hash = first-8-hex of md5
    (the repo's portable hash family), so the sketch — not just the
    estimate — is engine-reproducible and oracle-checkable bit-for-bit.
    """
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    h = F.conv(F.substring(F.md5(F.col("node")), 1, 8), 16, 10).cast("long")
    # trailing zeros of h = bit_count((h & -h) - 1); h & -h isolates the
    # lowest set bit. h = 0 (1-in-2^32 md5 prefix) caps at bit 24 too.
    cur = (nodes.withColumn("h", h)
           .selectExpr("node",
                       "shiftleft(CAST(1 AS BIGINT), "
                       "least(bit_count((h & -h) - 1), 24)) AS sketch"))
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    for _ in range(rounds):
        nbr = (e.join(cur.select(F.col("node").alias("d"),
                                 F.col("sketch").alias("nsk")), "d")
               .groupBy("s").agg(F.bit_or("nsk").alias("nbr_sk")))
        cur = (cur.join(nbr.withColumnRenamed("s", "node"), "node", "left")
               .select("node",
                       F.col("sketch").bitwiseOR(
                           F.coalesce("nbr_sk", F.lit(0))).alias("sketch")))
    return cur.selectExpr(
        "node", "sketch",
        "CAST(bit_count(sketch ^ (sketch + 1)) - 1 AS INT) AS fm_bit",
        "pow(CAST(2 AS DOUBLE), bit_count(sketch ^ (sketch + 1)) - 1)"
        " / 0.77351 AS est_reach")


def cocitation(edges: DataFrame, src: str = "src", dst: str = "dst",
               min_count: int = 1) -> DataFrame:
    """Co-citation + bibliographic coupling similarity over a directed
    graph -> (a, b, n_cocited, n_coupled) for unordered node pairs.

    The two classic citation-similarity measures (Small 1973 /
    Kessler 1963), the web-graph twins of item-item co-occurrence:
    n_cocited(a,b) = how many pages cite BOTH a and b (shared
    in-neighbors — a strong relatedness prior for entity pages);
    n_coupled(a,b) = how many pages both a and b cite (shared
    out-neighbors). Pairs are canonical (a < b); pairs scoring zero on
    both measures are absent.

    Scale shape: two wedge self-joins through the shared endpoint (the
    triangle-counting join pattern — never all-pairs: a node of degree d
    contributes C(d,2) wedges, so hub caps bound the blow-up upstream),
    each collapsed by one partial+final hash agg, merged with one
    full-outer equi-join on the canonical pair.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    co = (e.alias("x").join(e.alias("y"),
                            (F.col("x.s") == F.col("y.s"))
                            & (F.col("x.d") < F.col("y.d")))
          .groupBy(F.col("x.d").alias("a"), F.col("y.d").alias("b"))
          .agg(F.count(F.lit(1)).alias("n_cocited")))
    bc = (e.alias("x").join(e.alias("y"),
                            (F.col("x.d") == F.col("y.d"))
                            & (F.col("x.s") < F.col("y.s")))
          .groupBy(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
          .agg(F.count(F.lit(1)).alias("n_coupled")))
    return (co.join(bc, ["a", "b"], "full_outer")
            .select("a", "b",
                    F.coalesce("n_cocited", F.lit(0)).cast("long")
                    .alias("n_cocited"),
                    F.coalesce("n_coupled", F.lit(0)).cast("long")
                    .alias("n_coupled"))
            .filter((F.col("n_cocited") >= min_count)
                    | (F.col("n_coupled") >= min_count)))


def partition_quality(edges: DataFrame, k: int = 4, strategies=None,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Graph-partitioning quality audit -> one row per strategy:
    (strategy, k, n_nodes, n_edges, n_cut, cut_fraction, max_load,
    min_load, imbalance).

    Before a 10^12-edge KG is laid out for iterative analytics
    (pagerank / CC / k-hop all shuffle on the node key every round),
    the partitioner choice decides the recurring network bill:
    cut_fraction is the share of edges whose endpoints land in
    different partitions (each costs a cross-partition exchange per
    iteration), imbalance = max_load / (n_nodes / k) is the straggler
    factor. This operator measures both for candidate strategies on
    the actual graph — the partitioning twin of blocking_metrics.

    Default strategies: "hash" (md5-based mod k — engine-portable, the
    uniform baseline) and "range" (contiguous buckets over the sorted
    node ids — locality-preserving when ids embed hosts, e.g. URL-keyed
    graphs where a host's pages interlink).

    ``strategies`` maps name -> function (node Column -> partition-id
    Column valid in [0, k)); "range" is built from ntile over the
    distinct-node dimension (node-cardinality window, not corpus-sized).

    Scale shape: node->partition is ONE projection over the distinct
    nodes; the cut count is two equi-joins of the edge table against
    that (node-dimension) map + one agg — no pair expansion; loads are
    a k-row agg.
    """
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct().localCheckpoint(eager=True))
    n_nodes = nodes.count()
    n_edges = edges.count()

    def md5_mod(c):
        return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8),
                       16, 10).cast("long") % k)

    if strategies is None:
        strategies = {"hash": md5_mod, "range": "ntile"}
    out = None
    for name, fn in strategies.items():
        if fn == "ntile":
            part = nodes.withColumn(
                "part", (F.ntile(k).over(Window.orderBy("node")) - 1)
                .cast("long"))
        else:
            part = nodes.withColumn("part",
                                    fn(F.col("node")).cast("long"))
        pa = part.select(F.col("node").alias("_s"),
                         F.col("part").alias("_ps"))
        pb = part.select(F.col("node").alias("_d"),
                         F.col("part").alias("_pd"))
        cut = (edges.select(F.col(src).alias("_s"),
                            F.col(dst).alias("_d"))
               .join(pa, "_s").join(pb, "_d")
               .agg(F.sum((F.col("_ps") != F.col("_pd")).cast("long"))
                    .alias("n_cut")))
        load = part.groupBy("part").agg(
            F.count(F.lit(1)).alias("nl")).agg(
            F.max("nl").alias("max_load"), F.min("nl").alias("min_load"))
        row = (cut.crossJoin(load)
               .select(F.lit(name).alias("strategy"),
                       F.lit(k).cast("long").alias("k"),
                       F.lit(n_nodes).cast("long").alias("n_nodes"),
                       F.lit(n_edges).cast("long").alias("n_edges"),
                       F.col("n_cut").cast("long"),
                       F.round(F.col("n_cut") / F.lit(n_edges), 6)
                       .alias("cut_fraction"),
                       F.col("max_load").cast("long"),
                       F.col("min_load").cast("long"),
                       F.round(F.col("max_load")
                               / F.lit(n_nodes / float(k)), 6)
                       .alias("imbalance")))
        out = row if out is None else out.unionByName(row)
    return out


def harmonic_centrality(edges: DataFrame, landmarks: DataFrame,
                        max_depth: int = 6, src: str = "src",
                        dst: str = "dst", seed_col: str = "node"
                        ) -> DataFrame:
    """Landmark-sampled harmonic centrality (Boldi & Vigna, "Axioms for
    Centrality" 2014; landmark estimation per Eppstein-Wang 2004):
    H(v) = sum over landmark set L of 1/d(l, v) for the directed hop
    distance d, scaled by |L| into est_harmonic = H(v)/|L| — the
    unreachable-robust cousin of closeness (infinite distances
    contribute 0 instead of poisoning the mean), which is why it is the
    centrality of choice for web-crawl host graphs that are nowhere
    near strongly connected.

    Exact full harmonic centrality needs all-pairs distances — O(V)
    BFS sweeps, unpayable at web scale. The landmark estimator is the
    production answer: |L| deterministic seeds, ONE level-synchronous
    multi-source BFS carrying (landmark, node) state, estimate quality
    O(1/sqrt(|L|)). The BFS frontier is keyed on the pair, so rounds
    shuffle frontier-out-edges only (khop_distance's contract, lifted
    to per-landmark distances rather than min-over-seeds).

    Landmarks themselves report their OWN row too (d(l, l) = 0
    contributes nothing; other landmarks' distances count normally).

    -> (node, n_reached, est_harmonic 6dp): n_reached = landmarks that
    reach the node within max_depth; sorted by the caller.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    lm = (landmarks.select(F.col(seed_col).alias("lmark")).distinct()
          .localCheckpoint(eager=True))
    n_lm = lm.count()
    if n_lm == 0:
        raise ValueError("harmonic_centrality: empty landmark set")
    # visited carries per-landmark distances: (lmark, node, dist)
    frontier = lm.select("lmark", F.col("lmark").alias("node"))
    visited = frontier.select(
        "lmark", "node", F.lit(0).cast("long").alias("dist"))
    for r in range(1, max_depth + 1):
        nxt = (e.join(frontier, e.u == frontier.node)
               .select("lmark", F.col("v").alias("node")).distinct()
               .join(visited.select("lmark", "node"),
                     ["lmark", "node"], "left_anti")
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        visited = visited.unionByName(
            nxt.select("lmark", "node",
                       F.lit(r).cast("long").alias("dist")))
        frontier = nxt
    return (visited.filter(F.col("dist") > 0)
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n_reached"),
                 F.sum(F.lit(1.0) / F.col("dist")).alias("_h"))
            .select("node", F.col("n_reached").cast("long").alias(
                        "n_reached"),
                    F.round(F.col("_h") / F.lit(float(n_lm)), 6)
                    .alias("est_harmonic")))


def cocitation_cosine(edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst",
                      min_common: int = 2) -> DataFrame:
    """Cosine-NORMALIZED co-citation strength (Small, JASIS 1973;
    Salton cosine normalization): the degree-normalized companion of
    ``cocitation`` above, which reports raw shared-neighbor counts
    for both directions — this one answers "are these two hosts
    SPECIFICALLY related" where raw counts just say "both popular".
    Pairs of nodes cited
    BY the same sources, weighted by the number of common citers —
    the bibliometric similarity that needs no content at all (two
    hosts repeatedly linked from the same pages are related even if
    their text shares nothing; the hyperlink twin of pmi_weights'
    co-occurrence edges). Bibliographic coupling (Kessler 1963) is
    the SAME operator on reversed edges — pass
    edges.select(dst as src, src as dst).

    Cosine-normalized strength: n_common / sqrt(deg_a * deg_b)
    (in-degrees), the standard normalization so hub targets don't
    dominate.

    Scale shape: ONE distinct edge projection; the pair expansion is
    a self-join co-partitioned on the CITING side (bounded per citer
    by its out-degree — cap heavy citers upstream if a page can cite
    thousands); in-degree marginals join back by key; canonical
    a < b order halves the table.

    -> (a, b, n_common, cosine 6dp), n_common >= min_common.
    """
    e = edges.select(F.col(src_col).alias("s"),
                     F.col(dst_col).alias("d")).distinct()
    indeg = e.groupBy("d").agg(F.count(F.lit(1)).alias("deg"))
    a = e.select("s", F.col("d").alias("a"))
    b = e.select("s", F.col("d").alias("b"))
    pairs = (a.join(b, "s")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("n_common"))
             .filter(F.col("n_common") >= min_common))
    return (pairs
            .join(F.broadcast(indeg.select(F.col("d").alias("a"),
                                           F.col("deg").alias("da"))),
                  "a")
            .join(F.broadcast(indeg.select(F.col("d").alias("b"),
                                           F.col("deg").alias("db"))),
                  "b")
            .select("a", "b",
                    F.col("n_common").cast("long").alias("n_common"),
                    F.round(F.col("n_common")
                            / F.sqrt(F.col("da") * F.col("db")), 6)
                    .alias("cosine")))


def katz_centrality(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst", alpha: float = 0.1,
                    k_max: int = 6) -> DataFrame:
    """Katz centrality by truncated walk series (Katz, Psychometrika
    1953): c(v) = sum over path lengths k = 1..k_max of alpha^k *
    (# walks of length k ending at v) — the damped-walk influence
    measure BETWEEN degree (k_max = 1) and eigenvector/PageRank
    (k_max -> inf): unlike PageRank it does not normalize by
    out-degree, so a node cited by prolific hubs still accumulates
    credit; the truncated series is exactly computable and converges
    for alpha < 1/lambda_max.

    Exact walk counts grow fast — they stay in DOUBLE from the first
    multiplication by alpha, and both engines evaluate the identical
    expression tree (fixed k_max, no convergence test) -> 6dp.

    Scale shape: the pagerank/markov iteration pattern — each step is
    ONE equi-join of the (localCheckpointed) edge table against the
    |nodes|-row walk vector plus a hash agg; linear plan growth in
    k_max, no driver collect.

    -> (node, katz 6dp) — one row per node reachable as a walk
    endpoint (nodes with zero in-walks carry katz 0 via the node
    spine).
    """
    e = edges.select(F.col(src_col).alias("s"),
                     F.col(dst_col).alias("d")) \
        .localCheckpoint(eager=True)
    nodes = (e.select(F.col("s").alias("node"))
             .union(e.select("d")).distinct()
             .localCheckpoint(eager=True))
    w = nodes.select("node", F.lit(1.0).alias("w"))
    total = None
    for _ in range(k_max):
        w = (e.join(w, e.s == w.node)
             .groupBy(F.col("d").alias("node"))
             .agg((F.lit(alpha) * F.sum("w")).alias("w")))
        total = w if total is None else \
            (total.unionByName(w).groupBy("node")
             .agg(F.sum("w").alias("w")))
    return (nodes.join(total, "node", "left")
            .select("node",
                    F.round(F.coalesce("w", F.lit(0.0)), 6)
                    .alias("katz")))


def bowtie_structure(edges: DataFrame, src: str = "src", dst: str = "dst",
                     max_depth: int = 8, cc_max_iter: int = 25
                     ) -> DataFrame:
    """Bowtie decomposition of a directed web graph (Broder et al.,
    WWW 2000 "Graph structure in the Web"): classify every host into

        CORE          the giant strongly connected component
        IN            reaches the core but is not reached by it
        OUT           reached by the core but does not reach it
        TENDRIL       weakly connected to the core's component but in
                      none of the above (includes Broder's tubes —
                      IN->OUT paths bypassing the core)
        DISCONNECTED  not even weakly connected to the core

    — the standard structural census of a crawl ("how much of the web
    can a crawler starting in the core actually reach?").

    Pivot: the node with the highest total degree (tie: smallest name)
    — in a web graph the top hub is in the giant SCC with near
    certainty (Broder picks an arbitrary giant-SCC member; degree-max
    is the deterministic stand-in).  CORE/IN/OUT then come from ONE
    forward and ONE backward frontier BFS from the pivot
    (khop_distance's level-synchronous shape: per round, one equi-join
    keyed on the frontier + one anti-join — shuffle volume tracks the
    frontier, never the graph), depth-capped at max_depth (both
    engines; a real crawl graph's diameter is far below 8 from a hub
    by the same small-world evidence Broder measures).  Weak
    connectivity reuses connected_components' fixpoint min-label
    propagation.

    -> (component, n_hosts, share 6dp), one row per NON-EMPTY class.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    # Driver fast path (r6): up to the connected_components edge cap
    # the census — degree pivot, two depth-capped BFS, weak CC, class
    # counts — is exact set arithmetic on a dimension-sized edge list;
    # one bounded collect replaces 2 x max_depth lazy frontier rounds
    # plus the CC fixpoint (pure scheduler overhead on a host graph).
    # The 6dp share stays a Spark round over the literal counts.
    # Larger graphs keep the distributed frontier path untouched.
    head = e.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(head) <= DRIVER_EDGE_CAP:
        adj: dict = {}
        radj: dict = {}
        und: dict = {}
        degc: dict = {}
        for r in head:
            u, v = r["u"], r["v"]
            adj.setdefault(u, set()).add(v)
            radj.setdefault(v, set()).add(u)
            und.setdefault(u, set()).add(v)
            und.setdefault(v, set()).add(u)
            degc[u] = degc.get(u, 0) + 1
            degc[v] = degc.get(v, 0) + 1
        all_nodes = set(und)
        if not all_nodes:
            spark = edges.sparkSession
            return spark.createDataFrame(
                [], "component string, n_hosts long, share double")
        pivot_n = min(all_nodes, key=lambda x: (-degc.get(x, 0), x))

        def bfs(start, nbrs, depth_cap):
            seen = {start}
            frontier = {start}
            for _ in range(depth_cap):
                nxt = set()
                for x in frontier:
                    nxt |= nbrs.get(x, set())
                frontier = nxt - seen
                if not frontier:
                    break
                seen |= frontier
            return seen

        fwd_set = bfs(pivot_n, adj, max_depth)
        bwd_set = bfs(pivot_n, radj, max_depth)
        weak = bfs(pivot_n, und, len(all_nodes))
        counts: dict = {}
        for x in all_nodes:
            if x in fwd_set and x in bwd_set:
                c = "CORE"
            elif x in bwd_set:
                c = "IN"
            elif x in fwd_set:
                c = "OUT"
            elif x in weak:
                c = "TENDRIL"
            else:
                c = "DISCONNECTED"
            counts[c] = counts.get(c, 0) + 1
        spark = edges.sparkSession
        tot = len(all_nodes)
        lit = spark.createDataFrame(
            [(c, n, tot) for c, n in counts.items()],
            "component string, n_hosts long, n_total long")
        return lit.select(
            "component", "n_hosts",
            F.round(F.col("n_hosts") / F.col("n_total").cast("double"), 6)
            .alias("share"))
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    # bounded driver action: exactly one row (the pivot)
    pivot = (deg.orderBy(F.col("d").desc(), F.col("node").asc())
             .limit(1).collect()[0]["node"])
    seeds = nodes.filter(F.col("node") == F.lit(pivot))
    fwd = (khop_distance(e, seeds, k=max_depth, src="u", dst="v")
           .select("node", F.lit(True).alias("in_f")))
    bwd = (khop_distance(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")),
                         seeds, k=max_depth, src="u", dst="v")
           .select("node", F.lit(True).alias("in_b")))
    cc = connected_components(e, src="u", dst="v", max_iter=cc_max_iter)
    pivot_comp = (cc.filter(F.col("node") == F.lit(pivot))
                  .select(F.col("component").alias("pivot_component")))
    cls = (nodes
           .join(fwd, "node", "left")
           .join(bwd, "node", "left")
           .join(cc, "node")
           .crossJoin(F.broadcast(pivot_comp))
           .select(F.when(F.col("in_f") & F.col("in_b"), "CORE")
                   .when(F.col("in_b"), "IN")
                   .when(F.col("in_f"), "OUT")
                   .when(F.col("component") == F.col("pivot_component"),
                         "TENDRIL")
                   .otherwise("DISCONNECTED").alias("component")))
    tot = cls.agg(F.count(F.lit(1)).alias("n_total"))
    return (cls.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_hosts"))
            .crossJoin(F.broadcast(tot))
            .select("component", "n_hosts",
                    F.round(F.col("n_hosts")
                            / F.col("n_total").cast("double"), 6)
                    .alias("share")))


def trustrank_spam_mass(edges: DataFrame, seeds: DataFrame,
                        src: str = "src", dst: str = "dst",
                        seed_col: str = "node", iterations: int = 4,
                        damping: float = 0.85,
                        materialize: bool = True) -> DataFrame:
    """TrustRank + relative spam mass (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004 "Combating Web Spam with TrustRank"; spam mass
    per Gyöngyi et al. 2006): run PageRank and TrustRank over the
    DIRECTED link graph in ONE power loop —

        pr_{r+1}(v)    = (1-d)/n       + d * sum_in pr(u)/outdeg(u)
        trust_{r+1}(v) = (1-d)*seed(v) + d * sum_in trust(u)/outdeg(u)

    (seed uniform over the trusted set) — and report per node the
    relative spam mass (pr - trust)/pr: ~1 for pages whose rank comes
    entirely from untrusted regions (link farms), <= 0 for the trusted
    core.  Trust flows ALONG out-links only, so the graph stays
    directed (unlike pagerank/ppr's symmetrized variants).  Dangling
    mass is dropped identically in both engines (no redistribution
    term), which cancels in the ratio.

    Scale shape: both vectors ride in one DataFrame, so each round is
    ONE equi-join of the (pr, trust) vector against the
    localCheckpointed degree-carrying edge table + ONE hash agg on the
    destination computing both sums, then a LEFT join back to the node
    set for teleport — pagerank's linear-plan-growth shape at exactly
    half the joins of running the two rankings separately.  The seed
    table enters as a broadcast.

    -> (node, pr 6dp, trust 6dp, spam_mass 6dp); spam_mass = 0.0 when
    pr rounds to 0 (teleport guarantees pr > 0 for every node).
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
         .distinct())
    if materialize:
        e = e.localCheckpoint(eager=True)
    outdeg = e.groupBy("a").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib_edges = e.join(outdeg, "a")
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct())
    if materialize:
        nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("trustrank_spam_mass: empty trusted seed set")
    n_absent = seed_nodes.join(nodes, "node", "left_anti").limit(1).count()
    if n_absent:
        raise ValueError(
            "trustrank_spam_mass: trusted seed(s) not present in the "
            "graph's node set")
    s = (nodes.join(F.broadcast(seed_nodes.withColumn(
            "seed", F.lit(1.0 / n_seeds))), "node", "left")
         .select("node", F.lit(1.0 / n).alias("u"),
                 F.coalesce("seed", F.lit(0.0)).alias("seed")))
    if materialize:
        s = s.localCheckpoint(eager=True)
    vec = s.select("node", F.col("u").alias("pr"),
                   F.col("seed").alias("trust"))
    for _ in range(iterations):
        contrib = (contrib_edges.join(vec, contrib_edges.a == vec.node)
                   .groupBy(F.col("b").alias("node2"))
                   .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("cp"),
                        F.sum(F.col("trust") / F.col("outdeg")).alias("ct"))
                   .withColumnRenamed("node2", "node"))
        vec = (s.join(contrib, "node", "left")
               .select("node",
                       (F.lit(1.0 - damping) * F.col("u")
                        + F.lit(damping)
                        * F.coalesce("cp", F.lit(0.0))).alias("pr"),
                       (F.lit(1.0 - damping) * F.col("seed")
                        + F.lit(damping)
                        * F.coalesce("ct", F.lit(0.0))).alias("trust")))
    pr6 = F.round("pr", 6)
    tr6 = F.round("trust", 6)
    return vec.select(
        "node", pr6.alias("pr"), tr6.alias("trust"),
        F.when(pr6 > 0, F.round((pr6 - tr6) / pr6, 6))
        .otherwise(F.lit(0.0)).alias("spam_mass"))


def scan_clusters(edges: DataFrame, eps: float = 0.5, mu: int = 3,
                  src: str = "src", dst: str = "dst",
                  cc_max_iter: int = 25) -> DataFrame:
    """SCAN structural graph clustering (Xu, Yuruk, Feng & Schweiger,
    KDD 2007): cluster by NEIGHBORHOOD AGREEMENT instead of mere
    adjacency, and — unlike LPA/modularity partitions — explicitly
    name the nodes that belong to no cluster:

        sigma(u, v) = |G[u] ∩ G[v]| / sqrt(|G[u]| * |G[v]|)

    over CLOSED neighborhoods G[x] = {x} ∪ N(x); v is eps-reachable
    from u when (u, v) is an edge with sigma >= eps; u is a CORE when
    its closed eps-neighborhood (u itself always qualifies,
    sigma(u,u) = 1) has >= mu members.  Clusters are the connected
    components of the core-core eps-edge graph; non-cores attach as
    BORDER to the smallest adjacent core cluster (deterministic tie);
    the rest are HUB (adjacent to >= 2 distinct clusters — the
    inter-community brokers) or OUTLIER (noise).  For a web host graph
    this separates genuine communities from link-farm cores, directory
    hubs, and stray hosts in one pass.

    Scale shape: sigma only ever computed PER EDGE — the common-
    neighbor count is the triangle wedge join (adjacency joined to
    adjacency on the shared endpoint, bounded by degree), never
    all-pairs; core flags are one agg; clusters reuse
    connected_components' fixpoint; border/hub/outlier classification
    is two joins + one agg.  Rounding: sigma compared at 6dp (the
    cross-engine float contract).

    -> (node, role, cluster) — role in {core, border, hub, outlier},
    cluster NULL for hubs/outliers.
    """
    sym = _symmetrize(edges, src, dst).filter(F.col("a") != F.col("b"))
    sym = sym.localCheckpoint(eager=True)
    # Driver fast path (r6, same cap as connected_components): up to
    # 4096 symmetrized edges the whole chain — per-edge sigma, core
    # flags, core CC, border/hub/outlier — is exact set arithmetic plus
    # one correctly-rounded float op per edge (n/sqrt(du*dv): Python
    # and the JVM both evaluate the identical IEEE expression, and the
    # 6dp rounding half-up quantizes the shortest round-trip decimal
    # exactly like Spark's round). Replaces a wedge join, two CC
    # fixpoints' worth of rounds and four checkpoints with one bounded
    # collect. Larger graphs keep the distributed path untouched.
    head = sym.limit(DRIVER_EDGE_CAP + 1).collect()
    if len(head) <= DRIVER_EDGE_CAP:
        import decimal
        import math
        q6 = decimal.Decimal("0.000001")

        def rnd6(x: float) -> float:
            return float(decimal.Decimal(repr(float(x))).quantize(
                q6, rounding=decimal.ROUND_HALF_UP))

        nbrs: dict = {}
        for r in head:
            nbrs.setdefault(r["a"], set()).add(r["b"])
        closed = {x: s | {x} for x, s in nbrs.items()}
        eps_nbrs: dict = {x: set() for x in closed}
        for r in head:
            u, v = r["a"], r["b"]
            sg = rnd6(len(closed[u] & closed[v])
                      / math.sqrt(float(len(closed[u]) * len(closed[v]))))
            if sg >= eps:
                eps_nbrs[u].add(v)
        # a node needs >= 1 eps-edge to enter the core agg at all (the
        # distributed groupBy sees no row for eps-isolated nodes)
        cores = {x for x, s in eps_nbrs.items() if s and len(s) + 1 >= mu}
        parent = {x: x for x in cores}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u in cores:
            for v in eps_nbrs[u]:
                if v in cores:
                    ru, rv = find(u), find(v)
                    if ru != rv:
                        parent[ru] = rv
        comp_min: dict = {}
        for x in cores:
            r0 = find(x)
            if r0 not in comp_min or x < comp_min[r0]:
                comp_min[r0] = x
        cluster = {x: comp_min[find(x)] for x in cores}
        border: dict = {}
        for u in cores:
            for v in eps_nbrs[u]:
                if v not in cores:
                    c = cluster[u]
                    if v not in border or c < border[v]:
                        border[v] = c
        rows = [(x, "core", cluster[x]) for x in cores]
        rows += [(x, "border", c) for x, c in border.items()]
        clustered_set = set(cores) | set(border)
        for x in closed:
            if x in clustered_set:
                continue
            ncl = {cluster[b] if b in cores else border[b]
                   for b in nbrs.get(x, set()) if b in clustered_set}
            rows.append((x, "hub" if len(ncl) >= 2 else "outlier", None))
        from pyspark.sql import types as T
        node_type = sym.schema.fields[0].dataType
        spark = edges.sparkSession
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("node", node_type, True),
            T.StructField("role", T.StringType(), False),
            T.StructField("cluster", node_type, True)]))
    # closed adjacency: every node is its own neighbor
    nodes = sym.select(F.col("a").alias("node")).distinct()
    closed = sym.unionByName(
        nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
    deg = closed.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # per-EDGE common closed neighbors: wedge join through the shared w
    common = (sym.alias("e")
              .join(closed.alias("x"), F.col("e.a") == F.col("x.a"))
              .join(closed.alias("y"),
                    (F.col("e.b") == F.col("y.a"))
                    & (F.col("x.b") == F.col("y.b")))
              .groupBy(F.col("e.a").alias("u"), F.col("e.b").alias("v"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    sigma_edges = (common
                   .join(deg.select(F.col("a").alias("u"),
                                    F.col("deg").alias("du")), "u")
                   .join(deg.select(F.col("a").alias("v"),
                                    F.col("deg").alias("dv")), "v")
                   .select("u", "v",
                           F.round(F.col("n_common")
                                   / F.sqrt(F.col("du").cast("double")
                                            * F.col("dv")), 6)
                           .alias("sigma")))
    eps_edges = (sigma_edges.filter(F.col("sigma") >= eps)
                 .select("u", "v")
                 .localCheckpoint(eager=True))
    # core: closed eps-neighborhood size = eps-neighbors + self
    core = (eps_edges.groupBy(F.col("u").alias("node"))
            .agg((F.count(F.lit(1)) + 1).alias("n_eps"))
            .filter(F.col("n_eps") >= mu)
            .select("node")
            .localCheckpoint(eager=True))
    core_edges = (eps_edges
                  .join(core.select(F.col("node").alias("u")), "u")
                  .join(core.select(F.col("node").alias("v")), "v"))
    # isolated cores (no core-core eps-edge) form singleton clusters
    core_cc = (connected_components(
        core_edges.unionByName(
            core.select(F.col("node").alias("u"),
                        F.col("node").alias("v"))),
        src="u", dst="v", max_iter=cc_max_iter)
        .withColumnRenamed("component", "cluster"))
    # border: non-core eps-reachable from a core; smallest cluster wins
    border = (eps_edges
              .join(core_cc.withColumnRenamed("node", "u"), "u")
              .select(F.col("v").alias("node"), "cluster")
              .join(core_cc.select(F.col("node")), "node", "left_anti")
              .groupBy("node").agg(F.min("cluster").alias("cluster")))
    clustered = (core_cc.select("node", "cluster",
                                F.lit("core").alias("role"))
                 .unionByName(border.select(
                     "node", "cluster", F.lit("border").alias("role")))
                 .localCheckpoint(eager=True))
    # hubs bridge >= 2 clusters among their plain neighbors
    rest = nodes.join(clustered.select("node"), "node", "left_anti")
    bridge = (sym.join(rest.withColumnRenamed("node", "a"), "a")
              .join(clustered.select(F.col("node").alias("b"), "cluster"),
                    "b")
              .groupBy(F.col("a").alias("node"))
              .agg(F.countDistinct("cluster").alias("n_cl")))
    unclustered = (rest.join(bridge, "node", "left")
                   .select("node", F.lit(None).cast(
                       clustered.schema["cluster"].dataType)
                       .alias("cluster"),
                       F.when(F.coalesce("n_cl", F.lit(0)) >= 2, "hub")
                       .otherwise("outlier").alias("role")))
    return (clustered.select("node", "role", "cluster")
            .unionByName(unclustered.select("node", "role", "cluster")))
