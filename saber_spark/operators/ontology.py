"""Ontology/type-hierarchy operators: transitive closure + descendant
rollup.

The reference grounds entities into real ontologies — Disease Ontology,
NCBI Taxonomy, PubChem (saber/constants.py:74-80, grounding namespaces) —
all of which are DAGs with is_a edges; "how many DISO mentions (including
all disease SUBtypes)" is the canonical KG rollup query. Spark has no
recursive CTE, so the scalable closure is iterated path-doubling: after k
join rounds every ancestor within distance 2^k is materialized — log2
(depth) shuffles total, vs depth shuffles for naive one-step expansion.

Scale shape: ontologies are small (DO ~18k terms, NCBI Taxonomy ~2.5M) —
the closure runs on the dimension side and the result broadcasts into the
corpus-side mention-count rollup, so the multi-TB fact table shuffles
exactly once (its own count agg). A >broadcast-threshold ontology
(closure of NCBI Taxonomy is ~50M rows) degrades gracefully to a shuffle
equi-join on the type key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def transitive_closure(edges: DataFrame, child: str = "child",
                       parent: str = "parent",
                       max_depth: int = 64,
                       driver_threshold: int = 4096) -> DataFrame:
    """(child, parent) direct edges -> (child, ancestor) full closure,
    NOT including the reflexive (x, x) pairs.

    Small-dimension fast path: hierarchy tables are SCHEMA-sized in
    every caller (type lattices, subPropertyOf chains — dozens of
    rows), yet the generic fixpoint costs ~2 jobs per round (self-join
    + checkpoint + count), which at schema size is pure scheduler
    overhead. When the deduped edge set fits ``driver_threshold`` rows
    (one bounded limit+collect — the same dimension-table-sized collect
    the repo's model/codebook tables use), the closure is computed as a
    driver-side depth-capped BFS and returned as a literal frame —
    byte-identical pairs, zero iterative jobs.

    Large hierarchies keep path-doubling: each round joins the current
    closure with itself, so reachable distance doubles —
    ceil(log2(max_depth)) rounds cover any DAG of depth <= max_depth,
    each round ONE self-join + distinct. A cycle would make the closure
    loop forever in depth terms but path-doubling still converges to
    the finite pair set — the fixpoint test (no new pairs) terminates
    either way. The BFS depth cap (2^rounds hops) replicates the
    path-doubling reach exactly, so both paths agree even on
    deeper-than-max_depth chains.
    """
    paths0 = (edges.select(F.col(child).alias("c"), F.col(parent).alias("p"))
              .filter(F.col("c") != F.col("p")).distinct())
    rounds = max(1, (max_depth - 1).bit_length())
    head = paths0.limit(driver_threshold + 1).collect()
    if len(head) <= driver_threshold:
        from collections import defaultdict
        adj: dict = defaultdict(set)
        for r in head:
            adj[r["c"]].add(r["p"])
        reach_cap = 1 << rounds
        out = []
        for start in adj:
            seen = {start}
            frontier = [start]
            for _ in range(reach_cap):
                nxt = [q for n in frontier for q in adj.get(n, ())
                       if q not in seen]
                if not nxt:
                    break
                seen.update(nxt)
                frontier = nxt
            out.extend((start, dst) for dst in seen if dst != start)
        spark = edges.sparkSession
        fields = paths0.schema.fields
        schema = T.StructType([
            T.StructField(child, fields[0].dataType, True),
            T.StructField("ancestor", fields[1].dataType, True)])
        return spark.createDataFrame(out, schema)
    paths = paths0.localCheckpoint(eager=True)
    for _ in range(rounds):
        hops = (paths.alias("l")
                .join(paths.alias("r"), F.col("l.p") == F.col("r.c"))
                .select(F.col("l.c").alias("c"), F.col("r.p").alias("p")))
        new_paths = (paths.unionByName(hops)
                     .filter(F.col("c") != F.col("p")).distinct()
                     .localCheckpoint(eager=True))
        if new_paths.count() == paths.count():
            paths = new_paths
            break
        paths = new_paths
    return paths.select(F.col("c").alias(child), F.col("p").alias("ancestor"))


def type_rollup(facts: DataFrame, hierarchy: DataFrame,
                type_col: str = "label", count_col: str = "n",
                child: str = "child", parent: str = "parent",
                max_depth: int = 64) -> DataFrame:
    """Roll fact counts up a type hierarchy -> (ancestor_type, n_total,
    n_direct, n_types): every type's total INCLUDES all descendants.

    facts: (type_col, count_col) — pre-aggregated per-type counts (the
    corpus side has already been reduced by its own single hash agg).
    hierarchy: (child, parent) direct is_a edges; types absent from the
    hierarchy still appear in the output with n_total = n_direct.

    The closure + the reflexive pairs form the bridge table; the rollup is
    bridge ⋈ facts + one hash agg. Both sides are dimension-sized (one
    row per type / type-pair) — the per-type facts side is explicitly
    broadcast; n_types counts contributing DISTINCT descendant types with
    nonzero facts.
    """
    closure = transitive_closure(hierarchy, child, parent, max_depth)
    all_types = (facts.select(F.col(type_col).alias("t"))
                 .unionByName(closure.select(F.col(child).alias("t")))
                 .unionByName(closure.select(F.col("ancestor").alias("t")))
                 .distinct())
    bridge = (closure.select(F.col(child).alias("t"),
                             F.col("ancestor").alias("anc"))
              .unionByName(all_types.select("t", F.col("t").alias("anc"))))
    joined = (bridge.join(
        F.broadcast(facts.select(F.col(type_col).alias("t"),
                                 F.col(count_col).alias("n"))),
        "t", "left"))
    return (joined.groupBy(F.col("anc").alias("ancestor_type"))
            .agg(F.sum("n").alias("n_total"),
                 F.sum(F.when(F.col("t") == F.col("anc"), F.col("n"))
                       ).alias("n_direct"),
                 F.count(F.when(F.col("n").isNotNull(), F.lit(1))
                         ).alias("n_types"))
            .select("ancestor_type",
                    F.coalesce("n_total", F.lit(0)).cast("long")
                    .alias("n_total"),
                    F.coalesce("n_direct", F.lit(0)).cast("long")
                    .alias("n_direct"),
                    F.col("n_types").cast("long").alias("n_types")))


#: schema-row cap for the entailment driver fast paths
DRIVER_SCHEMA_CAP = 4096


def _driver_closure(pairs: list, max_depth: int) -> dict:
    """{node: ancestor set (excl self)} with the exact reach cap of
    transitive_closure's path-doubling (2^ceil(log2(max_depth)) hops),
    so driver and distributed closures agree even on deep chains."""
    from collections import defaultdict
    adj: dict = defaultdict(set)
    for c, p in pairs:
        if c != p:
            adj[c].add(p)
    rounds = max(1, (max_depth - 1).bit_length())
    reach_cap = 1 << rounds
    out: dict = {}
    for start in adj:
        seen = {start}
        frontier = [start]
        for _ in range(reach_cap):
            nxt = [q for n in frontier for q in adj.get(n, ())
                   if q not in seen]
            if not nxt:
                break
            seen.update(nxt)
            frontier = nxt
        res = seen - {start}
        if res:
            out[start] = res
    return out


def rdfs_entail(triples: DataFrame, domains: DataFrame, ranges: DataFrame,
                subclass: DataFrame, subj_col: str = "subj",
                pred_col: str = "pred", obj_col: str = "obj",
                max_depth: int = 64) -> DataFrame:
    """RDFS type entailment materialization — the inference stage between
    triple assembly and domain_range_audit: apply the three type rules of
    the RDFS semantics (W3C RDF 1.1 Semantics §9.2) and materialize every
    entailed (entity, type) assertion as a set:

        rdfs2   (p domain C) + (s p o)        => (s type C)
        rdfs3   (p range  C) + (s p o)        => (o type C)
        rdfs9   (s type C) + (C subClassOf* D) => (s type D)

    domains/ranges: (pred, cls) schema rows; subclass: (child, parent)
    direct edges — all schema-sized, broadcast into the instance joins.
    rdfs9 runs through the path-doubling ``transitive_closure``, so deep
    hierarchies cost log(depth) dimension-side shuffles, and the fact
    table is touched exactly twice (the two broadcast joins) plus one
    distinct — no iteration ever touches corpus-scale data.

    -> (entity, type) DISTINCT (RDFS entailment is defined on the triple
    SET; conflicting types from dirty data — e.g. a self-loop subject
    typed as both Customer and Order — surface as two rows and feed the
    domain_range_audit QA stage downstream).

    Execution (r6): when all three schema tables fit the driver cap
    (they are schema-sized by contract), the full rule set folds into
    ONE per-pred constant emission array — for each predicate, the
    (slot, class) pairs rdfs2/rdfs3 assert plus every rdfs9 ancestor —
    and the store is scanned ONCE (explode + distinct). The former
    join form referenced the store twice and its own union twice,
    re-deriving the store up to 4x in one job. Oversized schemas keep
    the broadcast-join path.
    """
    t = triples.select(subj_col, pred_col, obj_col)
    _cap = DRIVER_SCHEMA_CAP
    d_rows = domains.select("pred", "cls").limit(_cap + 1).collect()
    r_rows = ranges.select("pred", "cls").limit(_cap + 1).collect()
    s_rows = subclass.select("child", "parent").limit(_cap + 1).collect()
    if max(len(d_rows), len(r_rows), len(s_rows)) <= _cap:
        anc = _driver_closure(
            [(r["child"], r["parent"]) for r in s_rows], max_depth)
        emit: dict = {}
        for rows, slot in ((d_rows, 0), (r_rows, 1)):
            for r in rows:
                lst = emit.setdefault(r["pred"], [])
                lst.append((slot, r["cls"]))
                lst.extend((slot, a) for a in sorted(anc.get(r["cls"],
                                                             ())))
        if not emit:
            spark = triples.sparkSession
            etype = t.schema[subj_col].dataType
            from pyspark.sql import types as T
            return spark.createDataFrame([], T.StructType([
                T.StructField("entity", etype, True),
                T.StructField("type",
                              domains.schema["cls"].dataType, True)]))
        expr = None
        for p, lst in emit.items():
            arr = F.array(*[F.struct(F.lit(s).alias("s"),
                                     F.lit(c).alias("c"))
                            for s, c in lst])
            expr = (F.when(F.col(pred_col) == p, arr) if expr is None
                    else expr.when(F.col(pred_col) == p, arr))
        return (t.select(subj_col, obj_col, F.explode(expr).alias("e"))
                .select(F.when(F.col("e.s") == 0, F.col(subj_col))
                        .otherwise(F.col(obj_col)).alias("entity"),
                        F.col("e.c").alias("type"))
                .distinct())
    base = (t.join(F.broadcast(domains.select(
                F.col("pred").alias(pred_col), F.col("cls"))), pred_col)
            .select(F.col(subj_col).alias("entity"), F.col("cls"))
            .unionByName(
                t.join(F.broadcast(ranges.select(
                    F.col("pred").alias(pred_col), F.col("cls"))), pred_col)
                .select(F.col(obj_col).alias("entity"), F.col("cls"))))
    closure = transitive_closure(subclass, "child", "parent", max_depth)
    inherited = (base.join(
        F.broadcast(closure.select(F.col("child").alias("cls"),
                                   F.col("ancestor"))), "cls")
        .select("entity", F.col("ancestor").alias("cls")))
    return (base.unionByName(inherited)
            .select("entity", F.col("cls").alias("type"))
            .distinct())


def shacl_validate(triples: DataFrame, types: DataFrame, shapes: DataFrame,
                   closed_classes: list[str] | None = None,
                   subj_col: str = "subj", pred_col: str = "pred"
                   ) -> DataFrame:
    """SHACL-style node-shape validation (W3C SHACL: sh:minCount /
    sh:maxCount / sh:closed) over a triple table — the constraint gate a
    KG build runs before publishing an extraction batch. The reference
    emits annotations with no schema check at all (its grounding attaches
    every xref unconditionally, saber/utils/grounding_utils.py:53-66); at
    web scale a shape report is how extraction regressions surface
    (a parser change that drops `in_nation` facts shows up as a minCount
    spike, a dedup bug as a maxCount spike).

    Inputs: `triples` (subj, pred, obj) facts; `types` (subj, cls) class
    assignments; `shapes` (cls, pred, min_count, max_count) property
    shapes — NULL max_count = unbounded. `closed_classes`: classes whose
    subjects may only use predicates their shape lists (sh:closed).

    -> (subj, cls, pred, violation, expected, actual) with violation in
    {'minCount', 'maxCount', 'closed'} — one row per violation; a clean
    batch is an empty frame.

    Scale shape: one (subj, pred) hash agg over the fact table (map-side
    combinable), one equi-join with the entity-cardinality `types` table,
    then three dimension-side broadcast joins against `shapes` (shape
    tables are schema-sized). The minCount branch expands `types` by at
    most preds-per-class (a dimension-bounded multiplier over entities,
    never over facts). No windows, no collect.
    """
    closed = closed_classes or []
    counts = (triples.groupBy(F.col(subj_col).alias("subj"),
                              F.col(pred_col).alias("pred"))
              .agg(F.count(F.lit(1)).alias("n"))
              .join(types.select(F.col(subj_col).alias("subj"), "cls"),
                    "subj"))
    sh = shapes.select("cls", "pred",
                       F.col("min_count").cast("long").alias("min_count"),
                       F.col("max_count").cast("long").alias("max_count"))

    maxv = (counts.join(F.broadcast(sh), ["cls", "pred"])
            .filter(F.col("max_count").isNotNull()
                    & (F.col("n") > F.col("max_count")))
            .select("subj", "cls", "pred",
                    F.lit("maxCount").alias("violation"),
                    F.col("max_count").alias("expected"),
                    F.col("n").cast("long").alias("actual")))

    required = (types.select(F.col(subj_col).alias("subj"), "cls")
                .join(F.broadcast(sh.filter(F.col("min_count") > 0)),
                      "cls"))
    minv = (required.join(counts.select("subj", "pred", "n"),
                          ["subj", "pred"], "left")
            .filter(F.coalesce(F.col("n"), F.lit(0))
                    < F.col("min_count"))
            .select("subj", "cls", "pred",
                    F.lit("minCount").alias("violation"),
                    F.col("min_count").alias("expected"),
                    F.coalesce(F.col("n"), F.lit(0)).cast("long")
                    .alias("actual")))

    closedv = (counts.filter(F.col("cls").isin(*closed) if closed
                             else F.lit(False))
               .join(F.broadcast(sh.select("cls", "pred")),
                     ["cls", "pred"], "left_anti")
               .select("subj", "cls", "pred",
                       F.lit("closed").alias("violation"),
                       F.lit(0).cast("long").alias("expected"),
                       F.col("n").cast("long").alias("actual")))

    return maxv.unionByName(minv).unionByName(closedv)


def subprop_entail(triples: DataFrame, subprops: DataFrame,
                   inverses: DataFrame | None = None,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj", max_depth: int = 64) -> DataFrame:
    """Sub-property + inverse entailment materialization — the RELATION
    rules of the RDFS/OWL-RL core, completing rdfs_entail's TYPE rules
    (rdfs2/rdfs3/rdfs9):

        rdfs5  (p subPropertyOf q) + (q subPropertyOf r)
                                        => (p subPropertyOf r)
        rdfs7  (p subPropertyOf* q) + (s p o)  => (s q o)
        inv    (p inverseOf q) + (s p o)       => (o q s)

    subprops: (child, parent) direct property edges; inverses:
    (pred, inverse) rows applied AS GIVEN (declare both directions for
    symmetric materialization). Application order is one
    subproperty -> inverse -> subproperty alternation, which is the
    fixpoint whenever no inverse-produced predicate is itself declared
    inverse of something new (double inversion reproduces rows the
    distinct absorbs); deeper alternating schemas re-enter the operator
    with its own output.

    Scale shape: the subPropertyOf closure is schema-sized path doubling
    (``transitive_closure``); the fact table is touched by two broadcast
    joins (ancestor expansion, inverse map) and ONE final distinct — no
    iteration ever reaches corpus-scale data, mirroring rdfs_entail.

    -> (subj, pred, obj) DISTINCT: the entailed store, ready for
    bgp_match / shacl_validate / domain_range_audit downstream.

    Execution (r6): when the property schema fits the driver cap, the
    whole subproperty -> inverse -> subproperty alternation folds into
    ONE per-pred constant emission array — for each store predicate,
    the forward predicates {p} ∪ anc(p) plus, for every invertible q
    in that set, the swapped predicates {inv(q)} ∪ anc(inv(q)) — and
    the store is scanned ONCE (explode + swap-by-flag + distinct); the
    former join form re-derived the store up to 4x in one job.
    Predicates outside the schema emit themselves (the e1 identity
    leg). Oversized schemas keep the broadcast-join path.
    """
    t = triples.select(subj_col, pred_col, obj_col)
    _cap = DRIVER_SCHEMA_CAP
    sp_rows = subprops.select("child", "parent").limit(_cap + 1).collect()
    inv_rows = ([] if inverses is None else
                inverses.select("pred", "inverse")
                .limit(_cap + 1).collect())
    if max(len(sp_rows), len(inv_rows)) <= _cap:
        anc = _driver_closure(
            [(r["child"], r["parent"]) for r in sp_rows], max_depth)
        inv_map: dict = {}
        for r in inv_rows:
            inv_map.setdefault(r["pred"], []).append(r["inverse"])
        preds = (set(anc) | {a for s in anc.values() for a in s}
                 | set(inv_map))
        emit: dict = {}
        for p in preds:
            fwd = [p] + sorted(anc.get(p, ()))
            bwd = []
            for q in fwd:
                for iv in inv_map.get(q, []):
                    bwd.append(iv)
                    bwd.extend(sorted(anc.get(iv, ())))
            emit[p] = ([(0, x) for x in fwd] + [(1, y) for y in bwd])
        expr = None
        for p, lst in emit.items():
            arr = F.array(*[F.struct(F.lit(s).alias("s"),
                                     F.lit(c).alias("c"))
                            for s, c in lst])
            expr = (F.when(F.col(pred_col) == p, arr) if expr is None
                    else expr.when(F.col(pred_col) == p, arr))
        ident = F.array(F.struct(F.lit(0).alias("s"),
                                 F.col(pred_col).alias("c")))
        expr = ident if expr is None else F.coalesce(expr, ident)
        return (t.select(subj_col, obj_col, F.explode(expr).alias("e"))
                .select(F.when(F.col("e.s") == 0, F.col(subj_col))
                        .otherwise(F.col(obj_col)).alias(subj_col),
                        F.col("e.c").alias(pred_col),
                        F.when(F.col("e.s") == 0, F.col(obj_col))
                        .otherwise(F.col(subj_col)).alias(obj_col))
                .distinct())
    closure = transitive_closure(subprops, "child", "parent", max_depth)
    anc = F.broadcast(closure.select(F.col("child").alias(pred_col),
                                     F.col("ancestor")))

    def expand(facts: DataFrame) -> DataFrame:
        return (facts.join(anc, pred_col)
                .select(subj_col, F.col("ancestor").alias(pred_col),
                        obj_col))

    e1 = t.unionByName(expand(t))
    if inverses is not None:
        inv = F.broadcast(inverses.select(F.col("pred").alias(pred_col),
                                          F.col("inverse")))
        flipped = (e1.join(inv, pred_col)
                   .select(F.col(obj_col).alias(subj_col),
                           F.col("inverse").alias(pred_col),
                           F.col(subj_col).alias(obj_col)))
        e1 = e1.unionByName(flipped).unionByName(expand(flipped))
    return e1.distinct()


def ifp_sameas(triples: DataFrame, ifp_preds: list[str],
               max_fan: int = 64, subj_col: str = "subj",
               pred_col: str = "pred", obj_col: str = "obj") -> DataFrame:
    """OWL-RL prp-ifp: two subjects sharing a value of an
    inverse-functional property are the same entity — the rule that
    turns identity-bearing keys (email, phone, VAT id, DOI, ORCID)
    into owl:sameAs evidence. This is the INFERENCE producer feeding
    triples.sameas_rewrite's consumer (kg_align infers identity from
    fact overlap; this infers it from single designated key predicates
    — the precision end of the alignment spectrum).

    -> (a, b, n_witnesses): unordered entity pairs (a < b) with the
    number of distinct (pred, value) keys that witness the identity
    (2 witnesses = email AND vat agree — fusion-grade evidence).

    Skew/scale contract: real web data always contains PLACEHOLDER key
    values ('info@example.com', '000-000-0000') asserted by thousands
    of subjects; the naive self-join is quadratic in that fan-out. A
    (pred, value) whose distinct-subject count exceeds ``max_fan`` is
    EXCLUDED (logged in production; a placeholder is not evidence of
    identity — the exclusion is semantics, not just safety), bounding
    the self-join at max_fan^2 pairs per key. One (pred, obj) agg for
    the fan filter, one co-partitioned self-join on the same key, one
    pair agg — three shuffles total, no Python.
    """
    if not ifp_preds:
        raise ValueError("ifp_sameas: empty inverse-functional "
                         "predicate list")
    keys = (triples
            .filter(F.col(pred_col).isin(*ifp_preds))
            .select(F.col(subj_col).alias("s"),
                    F.col(pred_col).alias("p"),
                    F.col(obj_col).alias("v"))
            .distinct())
    fan = (keys.groupBy("p", "v")
           .agg(F.count(F.lit(1)).alias("_n"))
           .filter((F.col("_n") >= 2) & (F.col("_n") <= max_fan))
           .select("p", "v"))
    shared = keys.join(fan, ["p", "v"])
    rhs = shared.select(F.col("p"), F.col("v"),
                        F.col("s").alias("s2"))
    pairs = (shared.join(rhs, ["p", "v"])
             .filter(F.col("s") < F.col("s2"))
             .select(F.col("s").alias("a"), F.col("s2").alias("b"),
                     "p", "v"))
    return (pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_witnesses")))


def disjoint_audit(types: DataFrame, axioms: list[tuple[str, str]],
                   ent_col: str = "entity",
                   type_col: str = "type") -> DataFrame:
    """OWL-RL cax-dw: an entity asserted to belong to two classes
    declared owl:disjointWith is a contradiction — the class-level
    consistency gate next to domain_range_audit's property-level one
    and shacl_validate's shape constraints. On a construction KG this
    catches linker collisions (one surface grounded to both a Disease
    and a Gene) before they poison downstream fusion.

    -> (entity, type_a, type_b) violation rows, type_a < type_b
    canonical order; axioms apply symmetrically regardless of the
    order they were declared in.

    Scale shape: ONE co-partitioned self-join of the (entity, type)
    assertion table on the entity key, filtered by the broadcast
    axiom list (axioms are schema-sized). The self-join is bounded by
    types-per-entity (single digits in any real ontology), not
    corpus size. One distinct, no Python.
    """
    if not axioms:
        raise ValueError("disjoint_audit: empty axiom list")
    canon = sorted({(a, b) if a < b else (b, a) for a, b in axioms})
    if any(a == b for a, b in canon):
        raise ValueError("disjoint_audit: a class cannot be disjoint "
                         "with itself")
    ax = F.array(*[F.struct(F.lit(a).alias("ta"), F.lit(b).alias("tb"))
                   for a, b in canon])
    t = (types.select(F.col(ent_col).alias("entity"),
                      F.col(type_col).alias("ty"))
         .distinct())
    rhs = t.select(F.col("entity"), F.col("ty").alias("ty2"))
    return (t.join(rhs, "entity")
            .filter(F.col("ty") < F.col("ty2"))
            .filter(F.array_contains(
                ax, F.struct(F.col("ty").alias("ta"),
                             F.col("ty2").alias("tb"))))
            .select("entity", F.col("ty").alias("type_a"),
                    F.col("ty2").alias("type_b")))
