"""Knowledge-graph-embedding scoring: TransE triple plausibility.

The scoring counterpart of samples.kge_negatives (which builds the
corrupted training pairs): given entity embeddings and per-relation
translation vectors, the TransE energy ||h + r - t|| (Bordes et al.,
NeurIPS 2013) ranks how plausible each stored triple is under the
embedding geometry — the standard KG-completion / fact-validation signal
that runs AFTER construction to flag dubious assertions and propose
missing ones.

Engine-portability: the same integer-quantization contract as
operators/similarity.py — components round to int(x * 1000) and the L1
energy is an exact integer sum, so any engine agrees bit-for-bit.

Scale shape: entities map to embedding rows by a deterministic
arithmetic id (digits of the entity iri + a namespace offset, mod the
table size — production swaps in a real entity->row index with the same
join shape); head and tail each resolve with ONE equi-join against the
quantized embedding table, the per-relation vectors ride in as a
broadcast literal (relation vocabularies are schema-sized), and the
energy is a higher-order zip/aggregate inside codegen. The per-relation
top-k is a window on pred. No Python, no cross join, two shuffles
(the two embedding joins) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.similarity import _quantized

#: entity-iri namespace -> additive offset, decorrelating namespaces that
#: share numeric ids (cust:5 must not collide with order:5).
NAMESPACE_OFFSETS = {"cust": 0, "order": 7, "part": 13, "supp": 29}


def _entity_row_id(col, n_vecs: int):
    num = F.coalesce(
        F.regexp_extract(col, r"([0-9]+)", 1).cast("long"), F.lit(0))
    off = F.lit(0).cast("long")
    for ns, o in NAMESPACE_OFFSETS.items():
        off = F.when(col.startswith(ns + ":"), F.lit(o).cast("long")) \
            .otherwise(off)
    return (num + off) % n_vecs


def _pred_const_array(pred_col: str, vals_by_pred: dict[str, list[int]]):
    """CASE WHEN pred = p THEN array(<int literals>) ... — folds each
    relation's constant vector into the plan so ONE pass over the store
    scores every relation (no per-relation legs, no union, no store
    re-scan)."""
    expr = None
    for p, vals in vals_by_pred.items():
        arr = F.array(*[F.lit(int(v)) for v in vals])
        expr = (F.when(F.col(pred_col) == p, arr) if expr is None
                else expr.when(F.col(pred_col) == p, arr))
    return expr


def _broadcast_threshold_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                         str(10 * 1024 * 1024))
    raw = str(raw).strip().lower()
    mult = 1
    for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30)):
        if raw.endswith(suf):
            raw, mult = raw[: -len(suf)], m
            break
    try:
        return int(float(raw)) * mult
    except ValueError:
        return 10 * 1024 * 1024


def _numpy_topk(base: DataFrame, matrix_rows: list, n_vecs: int, dim: int,
                score_fn, score_field, score_type, asc: bool, top_k: int,
                subj_col: str, pred_col: str, obj_col: str) -> DataFrame:
    """Vectorized scoring fast path shared by the KGE score family.

    ``base`` carries (subj, pred, obj, _hid, _tid); the quantized
    embedding table rides to every task as a broadcast numpy matrix
    (guarded by the caller: only when it fits the session's broadcast
    threshold — the same budget a BroadcastHashJoin of that table would
    spend). Each task scores its partition in numpy (one gather + a few
    vectorized int64 ops per batch instead of a per-row interpreted
    higher-order aggregate) and emits only its LOCAL top_k per relation
    under the final total order (score, subj ASC, obj ASC) — the global
    top-k is a subset of the per-partition top-ks, so the exact window
    downstream runs over ≤ partitions * relations * top_k rows instead
    of the whole store. Triples whose _hid/_tid has no embedding row
    are dropped, matching the inner-join path.

    ``score_fn(H, T, pred) -> np.ndarray`` receives the gathered
    head/tail component matrices for one relation's rows.
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)
    import numpy as np
    from pyspark.sql import types as T

    E = np.zeros((n_vecs, dim), dtype=np.int64)
    seen = np.zeros(n_vecs, dtype=bool)
    for r in matrix_rows:
        i = int(r[0])
        if 0 <= i < n_vecs:
            E[i] = r[1]
            seen[i] = True
    spark = base.sparkSession
    e_bc = spark.sparkContext.broadcast(E)
    seen_bc = spark.sparkContext.broadcast(seen)

    fields = {f.name: f.dataType for f in base.schema.fields}
    out_schema = T.StructType([
        T.StructField(subj_col, fields[subj_col], True),
        T.StructField(pred_col, fields[pred_col], True),
        T.StructField(obj_col, fields[obj_col], True),
        T.StructField(score_field, score_type, True),
    ])

    def score_partition(batches):
        Em = e_bc.value
        ok = seen_bc.value
        acc = []
        for pdf in batches:
            hid = pdf["_hid"].to_numpy(dtype=np.int64)
            tid = pdf["_tid"].to_numpy(dtype=np.int64)
            keep = ok[hid] & ok[tid]
            if not keep.any():
                continue
            pdf = pdf.loc[keep].reset_index(drop=True)
            hid, tid = hid[keep], tid[keep]
            H = Em[hid]
            Tm = Em[tid]
            iscores = None
            for p in pdf[pred_col].unique():
                m = (pdf[pred_col] == p).to_numpy()
                s = score_fn(H[m], Tm[m], p)
                if iscores is None:
                    iscores = np.empty(len(pdf), dtype=s.dtype)
                iscores[m] = s
            out = pdf[[subj_col, pred_col, obj_col]].copy()
            out[score_field] = iscores
            out = (out.sort_values(
                [score_field, subj_col, obj_col],
                ascending=[asc, True, True], kind="mergesort")
                .groupby(pred_col, sort=False).head(top_k))
            acc.append(out)
        if not acc:
            return
        import pandas as pd
        allp = pd.concat(acc, ignore_index=True)
        yield (allp.sort_values(
            [score_field, subj_col, obj_col],
            ascending=[asc, True, True], kind="mergesort")
            .groupby(pred_col, sort=False).head(top_k))

    return base.mapInPandas(score_partition, out_schema)


def _score_fast_inputs(triples: DataFrame, embeddings: DataFrame,
                       pred_vec_ids: dict[str, int], fn_name: str,
                       subj_col: str, pred_col: str, obj_col: str,
                       id_col: str, vec_col: str):
    """Inputs for the numpy fast path, or None when the quantized
    embedding table exceeds the session's broadcast threshold (the same
    memory budget the join path's BroadcastHashJoin would spend on it —
    at that size the distributed equi-join path is the right plan and
    the caller falls back to it). Returns
    (base(subj,pred,obj,_hid,_tid), rel_rows, dim, matrix_rows, n_vecs).
    """
    spark = triples.sparkSession
    n_vecs = embeddings.count()
    if n_vecs == 0:
        return None
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"]) if first and first["d"] is not None else 0
    if dim <= 0:
        return None
    if n_vecs * dim * 8 > _broadcast_threshold_bytes(spark):
        return None
    quant = _quantized(embeddings, id_col, vec_col)
    matrix_rows = [(int(r[0]), list(r[1]))
                   for r in quant.select(id_col, "q").collect()]
    rel_rows = {i: v for i, v in matrix_rows
                if i in {int(x) for x in pred_vec_ids.values()}}
    missing = [p for p, v in pred_vec_ids.items() if int(v) not in rel_rows]
    if missing:
        raise ValueError(
            f"{fn_name}: no embedding row for relation vec ids of "
            f"{missing} (need {id_col} in "
            f"{sorted(int(v) for v in pred_vec_ids.values())})")
    base = (triples.select(subj_col, pred_col, obj_col)
            .filter(F.col(pred_col).isin(*list(pred_vec_ids)))
            .withColumn("_hid", _entity_row_id(F.col(subj_col), n_vecs))
            .withColumn("_tid", _entity_row_id(F.col(obj_col), n_vecs))
            .select(subj_col, pred_col, obj_col, "_hid", "_tid"))
    return base, rel_rows, dim, matrix_rows, n_vecs


def _score_base(triples: DataFrame, embeddings: DataFrame,
                pred_vec_ids: dict[str, int], fn_name: str,
                subj_col: str, pred_col: str, obj_col: str,
                id_col: str, vec_col: str):
    """Shared single-pass scoring scaffold for the KGE score family:
    resolve the quantized relation vectors (schema-sized collect),
    filter the store to the scored relations, attach head/tail rows
    with one equi-join per side. Returns (base_df, rel_rows, dim).

    The per-dimension energy/score is then an ``aggregate`` over a
    constant index ``sequence`` (interpreted HOF, one small JIT-friendly
    loop). The alternative — scalar-expanding dim terms into one giant
    codegen expression — generates a method past HotSpot's JIT'able
    bytecode size at dim=64, runs interpreted, and measured 4x SLOWER
    (6.9s vs 1.7s over the 1.3M-triple store); the r5 "HOFs 6x slower"
    note predates the WindowGroupLimit plan shape and is superseded by
    that A/B."""
    n_vecs = embeddings.count()
    quant = _quantized(embeddings, id_col, vec_col)
    rel_rows = {int(r[id_col]): list(r["q"]) for r in quant.filter(
        F.col(id_col).isin(*[int(v) for v in pred_vec_ids.values()]))
        .collect()}
    missing = [p for p, v in pred_vec_ids.items() if int(v) not in rel_rows]
    if missing:
        raise ValueError(
            f"{fn_name}: no embedding row for relation vec ids of "
            f"{missing} (need {id_col} in {sorted(pred_vec_ids.values())})")
    dim = len(next(iter(rel_rows.values())))
    head = quant.select(F.col(id_col).alias("_hid"), F.col("q").alias("qh"))
    tail = quant.select(F.col(id_col).alias("_tid"), F.col("q").alias("qt"))
    base = (triples.select(subj_col, pred_col, obj_col)
            .filter(F.col(pred_col).isin(*list(pred_vec_ids)))
            .withColumn("_hid", _entity_row_id(F.col(subj_col), n_vecs))
            .withColumn("_tid", _entity_row_id(F.col(obj_col), n_vecs))
            .join(head, "_hid").join(tail, "_tid"))
    return base, rel_rows, dim


def transe_score(triples: DataFrame, embeddings: DataFrame,
                 pred_vec_ids: dict[str, int], top_k: int = 20,
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj", id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Score every (s, p, o) with the exact-integer L1 TransE energy
    sum|q(h) + q(r) - q(t)| and keep each relation's top_k most
    plausible (LOWEST energy) triples.

    pred_vec_ids maps each relation to the embedding row serving as its
    translation vector (deterministic stand-in for trained relation
    embeddings; the join shape is what production reuses).

    -> (subj, pred, obj, energy, rank), rank 1 = most plausible; ties
    broken (subj ASC, obj ASC).

    Execution (r6): when the quantized embedding table fits the
    session's broadcast threshold it rides to every task as a numpy
    matrix and each partition scores itself vectorized (one gather +
    |h + r - t| row-sum per batch) emitting only its local top-k per
    relation — same exact integers, identical result by top-k
    monotonicity, measured 8.3s -> ~2.5s at sf0.1. Larger tables use
    the distributed equi-join + codegen-aggregate path unchanged.
    """
    fast = _score_fast_inputs(
        triples, embeddings, pred_vec_ids, "transe_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    w = Window.partitionBy(pred_col).orderBy(
        F.col("energy").asc(), F.col(subj_col).asc(), F.col(obj_col).asc())
    if fast is not None:
        import numpy as np
        base, rel_rows, dim, matrix_rows, n_vecs = fast
        rel_np = {p: np.asarray(rel_rows[int(v)], dtype=np.int64)
                  for p, v in pred_vec_ids.items()}

        def _transe(H, Tm, p):
            return np.abs(H + rel_np[p] - Tm).sum(axis=1)

        from pyspark.sql import types as T
        pruned = _numpy_topk(base, matrix_rows, n_vecs, dim, _transe,
                             "energy", T.LongType(), True, top_k,
                             subj_col, pred_col, obj_col)
        return (pruned.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= top_k)
                .select(subj_col, pred_col, obj_col, "energy", "rank"))
    base, rel_rows, dim = _score_base(
        triples, embeddings, pred_vec_ids, "transe_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    # Relation vectors fold in as a pred-selected constant array; the L1
    # energy is one aggregate over a constant index sequence — a single
    # pass over the store (no per-relation legs/union, no checkpoint),
    # see _score_base for the HOF-vs-scalar-expansion A/B.
    qr = _pred_const_array(
        pred_col, {p: rel_rows[int(v)] for p, v in pred_vec_ids.items()})
    energy = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)), F.lit(0).cast("long"),
        lambda acc, i: acc + F.abs(F.element_at(F.col("qh"), i)
                                   + F.element_at(F.col("qr"), i)
                                   - F.element_at(F.col("qt"), i)))
    scored = base.withColumn("qr", qr).withColumn("energy", energy)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(subj_col, pred_col, obj_col, "energy", "rank"))


def distmult_score(triples: DataFrame, embeddings: DataFrame,
                   pred_vec_ids: dict[str, int], top_k: int = 20,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj", id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """DistMult bilinear triple plausibility (Yang et al., ICLR 2015):
    score(h, r, t) = sum_i h_i * r_i * t_i — the multiplicative
    counterpart of transe_score's additive energy, and the score family
    (DistMult/ComplEx) that dominates published KG-completion baselines
    for symmetric relations. Keeps each relation's top_k HIGHEST-scoring
    triples (higher = more plausible, the opposite sign convention of
    TransE energy).

    Exact-integer contract: components quantize via round(x * 1000)
    (similarity-module convention) and the trilinear sum is an exact
    integer — any engine agrees bit-for-bit. Per-dimension magnitudes
    are ~(10^3)^3 = 10^9 and dims are bounded (embedding width), so the
    sum stays far below 2^63.

    Scale shape: identical to transe_score — entities resolve with ONE
    equi-join per side against the quantized embedding table, relation
    vectors fold in as per-dimension integer literals that whole-stage
    codegen JITs (h_i * c_i * t_i), the triple store is materialized
    once across relation legs, and the per-relation top-k is a
    WindowGroupLimit-pruned window. No Python, no cross join.

    -> (subj, pred, obj, score, rank), rank 1 = most plausible; ties
    broken (subj ASC, obj ASC).

    Execution (r6): same broadcast-threshold-guarded numpy fast path as
    transe_score (vectorized h*r*t row-sum + per-partition top-k);
    distributed join path unchanged for larger embedding tables.
    """
    fast = _score_fast_inputs(
        triples, embeddings, pred_vec_ids, "distmult_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    w = Window.partitionBy(pred_col).orderBy(
        F.col("score").desc(), F.col(subj_col).asc(), F.col(obj_col).asc())
    if fast is not None:
        import numpy as np
        base, rel_rows, dim, matrix_rows, n_vecs = fast
        rel_np = {p: np.asarray(rel_rows[int(v)], dtype=np.int64)
                  for p, v in pred_vec_ids.items()}

        def _distmult(H, Tm, p):
            return (H * rel_np[p] * Tm).sum(axis=1)

        from pyspark.sql import types as T
        pruned = _numpy_topk(base, matrix_rows, n_vecs, dim, _distmult,
                             "score", T.LongType(), False, top_k,
                             subj_col, pred_col, obj_col)
        return (pruned.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= top_k)
                .select(subj_col, pred_col, obj_col, "score", "rank"))
    base, rel_rows, dim = _score_base(
        triples, embeddings, pred_vec_ids, "distmult_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    # Single pass: pred-selected constant relation array + one aggregate
    # over a constant index sequence (see _score_base docstring).
    qr = _pred_const_array(
        pred_col, {p: rel_rows[int(v)] for p, v in pred_vec_ids.items()})
    score = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)), F.lit(0).cast("long"),
        lambda acc, i: acc + (F.element_at(F.col("qh"), i)
                              * F.element_at(F.col("qr"), i)
                              * F.element_at(F.col("qt"), i)))
    scored = base.withColumn("qr", qr).withColumn("score", score)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(subj_col, pred_col, obj_col, "score", "rank"))


def analogy_eval(embeddings: DataFrame, quads: list[tuple[int, int, int]],
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """word2vec-style analogy probe (Mikolov NAACL 2013: b - a + c ≈ d):
    for each (a, b, c) query, rank every corpus vector by quantized
    cosine against the target t = q(b) - q(a) + q(c) (exact integer
    arithmetic; a/b/c excluded per the standard protocol) and return
    the top-1 — the intrinsic geometry check run on trained entity/word
    embeddings before they gate linking or dedup decisions.

    Scale shape: the query targets are a |quads|-row broadcast literal
    crossed against ONE scan of the quantized corpus (narrow — each
    corpus row scores |quads| targets inside codegen via dim scalar
    terms); the top-1 per quad is a WindowGroupLimit-pruned window.
    No joins on the corpus side, no Python.

    -> (quad_id, a, b, c, predicted, cosine 6dp).
    """
    n_needed = sorted({i for q in quads for i in q})
    quant = _quantized(embeddings, id_col, vec_col)
    rows = {int(r[id_col]): list(r["q"]) for r in
            quant.filter(F.col(id_col).isin(*n_needed)).collect()}
    missing = [i for i in n_needed if i not in rows]
    if missing:
        raise ValueError(f"analogy_eval: no embedding rows for {missing}")
    dim = len(next(iter(rows.values())))

    targets = []
    for qi, (a, b, c) in enumerate(quads):
        t = [rows[b][i] - rows[a][i] + rows[c][i] for i in range(dim)]
        tn = sum(x * x for x in t)
        targets.append((qi, a, b, c, t, tn))

    legs = []
    for qi, a, b, c, t, tn in targets:
        dot = None
        for i, ti in enumerate(t):
            term = F.col("q")[i] * F.lit(int(ti))
            dot = term if dot is None else dot + term
        leg = (quant
               .filter(~F.col(id_col).isin(a, b, c))
               .select(F.lit(qi).cast("int").alias("quad_id"),
                       F.lit(a).cast("long").alias("a"),
                       F.lit(b).cast("long").alias("b"),
                       F.lit(c).cast("long").alias("c"),
                       F.col(id_col).alias("predicted"),
                       (dot / F.sqrt(F.col("norm2").cast("double")
                                     * float(tn))).alias("cos")))
        legs.append(leg)
    scored = legs[0]
    for leg in legs[1:]:
        scored = scored.unionByName(leg)
    w = Window.partitionBy("quad_id").orderBy(
        F.col("cos").desc(), F.col("predicted").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("quad_id", "a", "b", "c", "predicted",
                    F.round("cos", 6).alias("cosine")))

def complex_score(triples: DataFrame, embeddings: DataFrame,
                  pred_vec_ids: dict[str, int], top_k: int = 20,
                  subj_col: str = "subj", pred_col: str = "pred",
                  obj_col: str = "obj", id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """ComplEx triple plausibility (Trouillon et al., ICML 2016):
    score(h, r, t) = Re(<h, r, conj(t)>) with each embedding read as a
    complex vector — first half real parts, second half imaginary parts
    (the standard packing). Expanded per dimension i over halves
    (hr, hi), (rr, ri), (tr, ti):

        hr_i*rr_i*tr_i + hi_i*rr_i*ti_i + hr_i*ri_i*ti_i - hi_i*ri_i*tr_i

    Unlike DistMult (whose bilinear diagonal form is forcibly symmetric
    in h/t), the imaginary cross terms make the score ANTISYMMETRIC-
    capable — it can rank (cust -placed-> order) above its reversal,
    which is exactly what a directed construction KG needs from its
    completion/validation signal. Keeps each relation's top_k
    HIGHEST-scoring triples (DistMult's sign convention).

    Exact-integer contract: components quantize via round(x * 1000)
    (similarity-module convention); each term is a product of three
    bounded ints (~10^9) and dims are bounded, so the BIGINT sum is
    exact — any engine agrees bit-for-bit.

    Scale shape: identical to distmult_score/transe_score — one
    equi-join per entity side against the quantized embedding table,
    relation halves fold in as per-dimension integer literals JIT-ed by
    whole-stage codegen, the store materializes once across relation
    legs, per-relation top-k is a WindowGroupLimit-pruned window.
    No Python, no cross join, two shuffles regardless of corpus size.

    -> (subj, pred, obj, score, rank), rank 1 = most plausible; ties
    broken (subj ASC, obj ASC).

    Execution (r6): same broadcast-threshold-guarded numpy fast path as
    transe_score (vectorized complex trilinear row-sum + per-partition
    top-k); distributed join path unchanged for larger tables.
    """
    fast = _score_fast_inputs(
        triples, embeddings, pred_vec_ids, "complex_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    w = Window.partitionBy(pred_col).orderBy(
        F.col("score").desc(), F.col(subj_col).asc(), F.col(obj_col).asc())
    if fast is not None:
        import numpy as np
        base, rel_rows, dim, matrix_rows, n_vecs = fast
        if dim % 2:
            raise ValueError(
                f"complex_score: embedding dim {dim} is odd — the "
                f"complex packing needs an even dim (first half Re, "
                f"second half Im)")
        halfd = dim // 2
        rel_np = {p: np.asarray(rel_rows[int(v)], dtype=np.int64)
                  for p, v in pred_vec_ids.items()}

        def _complex(H, Tm, p):
            hr, hi = H[:, :halfd], H[:, halfd:]
            tr, ti = Tm[:, :halfd], Tm[:, halfd:]
            rv = rel_np[p]
            rr, ri = rv[:halfd], rv[halfd:]
            return (hr * rr * tr + hi * rr * ti
                    + hr * ri * ti - hi * ri * tr).sum(axis=1)

        from pyspark.sql import types as T
        pruned = _numpy_topk(base, matrix_rows, n_vecs, dim, _complex,
                             "score", T.LongType(), False, top_k,
                             subj_col, pred_col, obj_col)
        return (pruned.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= top_k)
                .select(subj_col, pred_col, obj_col, "score", "rank"))
    base, rel_rows, dim = _score_base(
        triples, embeddings, pred_vec_ids, "complex_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    if dim % 2:
        raise ValueError(
            f"complex_score: embedding dim {dim} is odd — the complex "
            f"packing needs an even dim (first half Re, second half Im)")
    half = dim // 2
    # Single pass: pred-selected constant relation array + one aggregate
    # over the half-dim index sequence, reading Re (i) and Im (i + half)
    # halves by element_at (see _score_base docstring).
    qr = _pred_const_array(
        pred_col, {p: rel_rows[int(v)] for p, v in pred_vec_ids.items()})

    def _term(acc, i):
        hr, hi = F.element_at(F.col("qh"), i), \
            F.element_at(F.col("qh"), i + half)
        rr, ri = F.element_at(F.col("qr"), i), \
            F.element_at(F.col("qr"), i + half)
        tr, ti = F.element_at(F.col("qt"), i), \
            F.element_at(F.col("qt"), i + half)
        return acc + (hr * rr * tr + hi * rr * ti
                      + hr * ri * ti - hi * ri * tr)

    score = F.aggregate(
        F.sequence(F.lit(1), F.lit(half)), F.lit(0).cast("long"), _term)
    scored = base.withColumn("qr", qr).withColumn("score", score)
    w = Window.partitionBy(pred_col).orderBy(
        F.col("score").desc(), F.col(subj_col).asc(), F.col(obj_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(subj_col, pred_col, obj_col, "score", "rank"))


#: the 32 exact unit rotations on the hypotenuse-65 Pythagorean circle:
#: every (c, s) satisfies c^2 + s^2 = 65^2 exactly, so (c + i*s)/65 has
#: unit modulus in RATIONAL arithmetic — RotatE's |r_i| = 1 constraint
#: without trig, keeping the whole energy exact-integer until one final
#: division by 65.  Built from the four primitive legs of hypotenuse 65
#: ((16,63), (33,56), (25,60), (39,52)) under swap and sign.
ROT65: list[tuple[int, int]] = [
    (c, s)
    for p, q in ((16, 63), (33, 56), (25, 60), (39, 52))
    for c, s in ((p, q), (q, p), (p, -q), (q, -p),
                 (-p, q), (-q, p), (-p, -q), (-q, -p))
]
ROT65_DEN = 65


def rotate_score(triples: DataFrame, embeddings: DataFrame,
                 pred_vec_ids: dict[str, int], top_k: int = 20,
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj", id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """RotatE triple plausibility (Sun et al., ICLR 2019): entities are
    complex vectors (first half Re, second half Im — complex_score's
    packing) and each relation is a per-dimension UNIT ROTATION of the
    complex plane; energy(h, r, t) = ||h o r - t||_1, LOWEST energy =
    most plausible (TransE's sign convention).  Rotations compose and
    invert, so RotatE models symmetry, antisymmetry, inversion AND
    composition — the full relation-pattern set the
    TransE/DistMult/ComplEx trio each only partially covers.

    Engine-exactness: RotatE's e^{i*theta} phases would need trig,
    whose last-ulp behavior differs across engines.  Instead each
    dimension's rotation is drawn from ROT65 — the 32 exact unit
    rotations (c + i*s)/65 with c^2 + s^2 = 65^2 — selected by the
    relation row's quantized components: idx_i = (|rv[i]| +
    3 * |rv[half+i]|) % 32.  The rotated-minus-tail residual is then
    the exact BIGINT |qh_re*c - qh_im*s - 65*qt_re| +
    |qh_im*c + qh_re*s - 65*qt_im| per dimension (65 * the true L1
    term), summed exactly and divided by 65 ONCE at the end (6dp) —
    both engines evaluate identical integer arithmetic plus one
    exactly-rounded IEEE division.

    Scale shape: identical to transe_score — one equi-join per entity
    side against the quantized embedding table, rotation constants fold
    in as per-dimension integer literals JIT-ed by whole-stage codegen,
    the store materializes once across relation legs, per-relation
    top-k is a WindowGroupLimit-pruned window.  No Python, no cross
    join, two shuffles regardless of corpus size.

    -> (subj, pred, obj, energy, rank), rank 1 = most plausible (lowest
    energy); ties broken (subj ASC, obj ASC).

    Execution (r6): same broadcast-threshold-guarded numpy fast path as
    transe_score; the 65-denominated energy stays exact-integer in
    numpy and the single 6dp HALF_UP rounding of energy65/65 is done in
    exact integer arithmetic (q = (e65*10^6) div 65, round the
    remainder), which agrees with the join path's
    round(double(e65/65), 6) because the double's error (< 1 ulp of a
    ~1e5 value) is far below the rational's minimum distance 1/(65*10^7)
    to any rounding boundary. Distributed join path unchanged for
    larger tables.
    """
    fast = _score_fast_inputs(
        triples, embeddings, pred_vec_ids, "rotate_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    w = Window.partitionBy(pred_col).orderBy(
        F.col("energy").asc(), F.col(subj_col).asc(), F.col(obj_col).asc())
    if fast is not None:
        import numpy as np
        base, rel_rows, dim, matrix_rows, n_vecs = fast
        if dim % 2:
            raise ValueError(
                f"rotate_score: embedding dim {dim} is odd — the "
                f"complex packing needs an even dim (first half Re, "
                f"second half Im)")
        halfd = dim // 2
        rot_np: dict[str, tuple] = {}
        for p, v in pred_vec_ids.items():
            rv = rel_rows[int(v)]
            cs = [ROT65[(abs(int(rv[i])) + 3 * abs(int(rv[halfd + i])))
                        % len(ROT65)] for i in range(halfd)]
            rot_np[p] = (np.asarray([c for c, _ in cs], dtype=np.int64),
                         np.asarray([s for _, s in cs], dtype=np.int64))

        def _rotate(H, Tm, p):
            hr, hi = H[:, :halfd], H[:, halfd:]
            tr, ti = Tm[:, :halfd], Tm[:, halfd:]
            c, s = rot_np[p]
            e65 = (np.abs(hr * c - hi * s - ROT65_DEN * tr)
                   + np.abs(hi * c + hr * s - ROT65_DEN * ti)).sum(axis=1)
            n6 = e65 * 1_000_000
            q, rem = np.divmod(n6, ROT65_DEN)
            return (q + (2 * rem >= ROT65_DEN)) / 1e6

        from pyspark.sql import types as T
        pruned = _numpy_topk(base, matrix_rows, n_vecs, dim, _rotate,
                             "energy", T.DoubleType(), True, top_k,
                             subj_col, pred_col, obj_col)
        return (pruned.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= top_k)
                .select(subj_col, pred_col, obj_col, "energy", "rank"))
    base, rel_rows, dim = _score_base(
        triples, embeddings, pred_vec_ids, "rotate_score",
        subj_col, pred_col, obj_col, id_col, vec_col)
    if dim % 2:
        raise ValueError(
            f"rotate_score: embedding dim {dim} is odd — the complex "
            f"packing needs an even dim (first half Re, second half Im)")
    half = dim // 2
    # Per-relation rotation constants (cos, sin legs of ROT65) fold in as
    # two pred-selected constant arrays; the energy is one aggregate over
    # the half-dim index sequence (see _score_base docstring).
    rot_c: dict[str, list[int]] = {}
    rot_s: dict[str, list[int]] = {}
    for p, v in pred_vec_ids.items():
        rv = rel_rows[int(v)]
        cs = [ROT65[(abs(int(rv[i])) + 3 * abs(int(rv[half + i])))
                    % len(ROT65)] for i in range(half)]
        rot_c[p] = [c for c, _ in cs]
        rot_s[p] = [s for _, s in cs]

    def _term(acc, i):
        hr, hi = F.element_at(F.col("qh"), i), \
            F.element_at(F.col("qh"), i + half)
        tr, ti = F.element_at(F.col("qt"), i), \
            F.element_at(F.col("qt"), i + half)
        c = F.element_at(F.col("qc"), i)
        s = F.element_at(F.col("qs"), i)
        return acc + (F.abs(hr * c - hi * s - F.lit(ROT65_DEN) * tr)
                      + F.abs(hi * c + hr * s - F.lit(ROT65_DEN) * ti))

    energy65 = F.aggregate(
        F.sequence(F.lit(1), F.lit(half)), F.lit(0).cast("long"), _term)
    scored = (base
              .withColumn("qc", _pred_const_array(pred_col, rot_c))
              .withColumn("qs", _pred_const_array(pred_col, rot_s))
              .withColumn("energy",
                          F.round(energy65 / F.lit(float(ROT65_DEN)), 6)))
    w = Window.partitionBy(pred_col).orderBy(
        F.col("energy").asc(), F.col(subj_col).asc(), F.col(obj_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(subj_col, pred_col, obj_col, "energy", "rank"))
