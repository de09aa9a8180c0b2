"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set, JVM-side dot products via ``aggregate(zip_with(...))``,
  window top-k. The exactness baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane signatures
  (vectorized numpy pandas UDF) bucket the corpus; candidates come from
  matching buckets (with multi-probe via bands), then exact re-rank.
  At 10^12 rows the bucket join replaces the O(N·Q) scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _dot(a, b):
    # cast BEFORE multiplying: float32*float32 then widen loses the low bits
    # the double*double DuckDB oracle keeps
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_COLLECT_QUERIES_MAX = 4096


def _seq_dot(x: "np.ndarray", q: "np.ndarray") -> "np.ndarray":
    """Per-row dot products accumulated dimension-by-dimension — the exact
    left-fold order of the JVM ``aggregate(zip_with(...))`` expression (and
    of DuckDB's list_dot_product), so the doubles are bit-identical to the
    expression form this replaces."""
    acc = np.zeros(len(x), dtype=np.float64)
    for i in range(x.shape[1]):
        acc += x[:, i] * q[i]
    return acc


def _seq_norm_rows(x: "np.ndarray") -> "np.ndarray":
    acc = np.zeros(len(x), dtype=np.float64)
    for i in range(x.shape[1]):
        acc += x[:, i] * x[:, i]
    return np.sqrt(acc)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self):
    (q_id, rank, n_id, cos). Ties broken by neighbor id for determinism.

    The query side is small by contract (it was broadcast before); it is
    now collected once and folded into a single Arrow-batched pandas UDF
    that scores every query against each corpus batch in one numpy pass —
    replacing the broadcast-nested-loop crossJoin whose per-pair
    ``aggregate(zip_with(...))`` expressions re-walked both arrays (and
    recomputed BOTH norms) per pair in the interpreted HOF evaluator
    (guide §4.2: hand whole batches to vectorized native code). The dot
    and norm folds accumulate in dimension order, so every double — and
    the rounded cos — is bit-identical to the expression form; queries
    larger than _COLLECT_QUERIES_MAX fall back to the crossJoin."""
    q_rows = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).limit(_COLLECT_QUERIES_MAX + 1).collect()
    if not q_rows or len(q_rows) > _COLLECT_QUERIES_MAX:
        return _cosine_topk_crossjoin(
            vectors, queries, k, id_col, vec_col, round_digits
        )
    q_ids = [r["q_id"] for r in q_rows]
    q_vecs = [
        None if r["q_vec"] is None else np.asarray(r["q_vec"], dtype=np.float64)
        for r in q_rows
    ]
    q_norms = [
        None if qv is None else float(_seq_norm_rows(qv[None, :])[0])
        for qv in q_vecs
    ]
    nq = len(q_rows)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def scores(embs: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(embs), dtype=object)
        mask = embs.notna().to_numpy()
        if not mask.any():
            return out
        idx = np.flatnonzero(mask)
        vecs = [np.asarray(v, dtype=np.float64) for v in embs.iloc[idx]]
        lens = np.fromiter((len(v) for v in vecs), dtype=np.int64, count=len(vecs))
        # group rows by dimension: np.stack needs uniform dims, and the
        # expression form this replaces yields NULL cos for a pair whose
        # dims differ (zip_with pads the shorter side with nulls) — a
        # mixed-dim table must degrade to those nulls, not crash
        for length in np.unique(lens):
            sel = np.flatnonzero(lens == length)
            x = np.stack([vecs[i] for i in sel])
            n_norm = _seq_norm_rows(x)
            dots = [
                None if (qv is None or len(qv) != length) else _seq_dot(x, qv)
                for qv in q_vecs
            ]
            vals = [
                [float(n_norm[r])]
                + [None if d is None else float(d[r]) for d in dots]
                for r in range(len(sel))
            ]
            out.iloc[idx[sel]] = vals
        return out

    v = vectors.select(
        F.col(id_col).alias("n_id"), scores(F.col(vec_col)).alias("_s")
    )
    qid_arr = F.array(*[F.lit(i) for i in q_ids])
    qnorm_arr = F.array(*[
        F.lit(None).cast("double") if qn is None else F.lit(qn)
        for qn in q_norms
    ])
    # null n_vec rows keep a row per query with null cos (exactly what the
    # crossJoin produced); a null QUERY vector's null norm propagates to a
    # null cos the same way
    scored = (
        v.select(
            "n_id",
            F.element_at("_s", 1).alias("_n_norm"),
            F.posexplode(
                F.when(F.col("_s").isNull(), F.array(*[F.lit(None).cast("double")] * nq))
                .otherwise(F.slice("_s", 2, nq))
            ).alias("_qi", "_dot"),
        )
        .withColumn("q_id", F.element_at(qid_arr, F.col("_qi") + 1))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "_cos",
            F.col("_dot") / (F.element_at(qnorm_arr, F.col("_qi") + 1) * F.col("_n_norm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("_cos", round_digits).alias("cos"))
    )


def _cosine_topk_crossjoin(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Large-query-set fallback: the original broadcast crossJoin, with the
    per-side norms factored out of the per-pair expression (they were
    recomputed for every pair)."""
    v = vectors.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("_n_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("_q_norm"),
    )
    cos = (_dot(F.col("q_vec"), F.col("n_vec")) / (F.col("_q_norm") * F.col("_n_norm"))).alias("_cos")
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cos)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("_cos", round_digits).alias("cos"))
    )


_SIG_SCHEMA = T.ArrayType(T.IntegerType())


def hyperplanes(dim: int, bits: int, seed: int = 42) -> "np.ndarray":
    """The (dim × bits) hyperplane matrix used by the signature UDF — a pure
    function of (seed, dim, bits), exported so an external oracle (DuckDB)
    can re-derive the identical signatures from plane literals."""
    return np.random.default_rng(seed).standard_normal((dim, bits))


def _hyperplane_udf(bits: int, bands: int, seed: int, dim: int | None = None):
    """Arrow-batched hyperplane signatures: the whole batch is stacked into
    one (N×dim) matrix and signed with ONE (N×dim)@(dim×bits) matmul — no
    per-row Python. ``dim`` defaults to the first non-null vector's length
    (planes are a pure function of (seed, dim), so inference is stable)."""
    per_band_max = bits // bands
    assert per_band_max <= 31, "bucket must fit IntegerType"

    @F.pandas_udf(_SIG_SCHEMA)
    def sig(embs: pd.Series) -> pd.Series:
        mask = embs.notna().to_numpy()
        out = pd.Series([None] * len(embs), dtype=object)
        if not mask.any():
            return out
        vals = embs[mask].tolist()
        d = dim if dim is not None else len(vals[0])
        # float64 end to end: the float32->float64 cast is exact, so the
        # plane dot products equal what SQL computes on CAST(... AS DOUBLE[])
        # against the same plane literals — which is what makes the DuckDB
        # oracle for the whole LSH pipeline possible (hyperplanes(dim, ...)
        # exports the identical planes)
        planes = hyperplanes(d, bits, seed)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vals])
        # accumulate dots dimension-by-dimension — the exact fold order of
        # DuckDB's list_dot_product — so dots equal the SQL oracle's doubles
        # bit for bit (a BLAS matmul's blocked summation could flip the sign
        # of a near-zero dot and change a band bucket)
        dots = np.zeros((len(x), bits), dtype=np.float64)
        for i in range(d):
            dots += x[:, i : i + 1] * planes[i]
        per_band = bits // bands
        signs = (dots > 0)[:, : bands * per_band]
        weights = (1 << np.arange(per_band, dtype=np.int64)).astype(np.int32)
        buckets = signs.reshape(len(x), bands, per_band).astype(np.int32) @ weights
        out.iloc[np.flatnonzero(mask)] = list(buckets)
        return out

    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 48,
    bands: int = 6,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: match on any LSH band bucket, exact re-rank of
    candidates. Recall measured against cosine_topk in tests.

    The band exchange carries only (id, band, bucket); vectors are joined
    back BY ID for the exact re-rank (same pattern as embedding_near_dups).
    Exploding vectors through the band join would duplicate every corpus
    vector ``bands``× through the shuffle — at 768-dim float embeddings
    that payload dominates the exchange."""
    sig = _hyperplane_udf(bits, bands, seed, dim)
    v = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    vb = v.select("n_id", F.posexplode(sig(F.col("n_vec"))).alias("band", "bucket"))
    qb = q.select("q_id", F.posexplode(sig(F.col("q_vec"))).alias("band", "bucket"))
    cand_ids = (
        vb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
        .dropDuplicates(["q_id", "n_id"])
    )
    cands = cand_ids.join(v, "n_id").join(F.broadcast(q), "q_id")
    cos = (_dot(F.col("q_vec"), F.col("n_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("n_vec")))).alias("_cos")
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        cands.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("_cos", round_digits).alias("cos"))
    )


def train_centroids(
    sample: "np.ndarray", n_centroids: int, iters: int = 10, seed: int = 42
) -> "np.ndarray":
    """Deterministic Lloyd k-means over unit-normalized vectors (cosine
    IVF): returns unit-normalized centroids (n_centroids × dim), float64.
    Pure numpy on a driver-side SAMPLE — at corpus scale IVF training uses
    ~10⁵ sampled vectors regardless of table size (standard IVF practice);
    assignment and search stay fully distributed."""
    x = np.asarray(sample, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T                      # cosine similarity
        assign = sims.argmax(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 1e-12:
                    cents[j] = c / n
    return cents


def _centroid_scores(cents: "np.ndarray", vc) -> "F.Column":
    """dot(v, c_j) for each centroid as plan-literal JVM expressions
    (whole-stage codegen, no Python in the assignment path)."""
    return F.array(*[
        F.aggregate(
            F.zip_with(
                vc,
                F.array(*[F.lit(float(c)) for c in cents[j]]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for j in range(len(cents))
    ])


def ivf_build(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_limit: int = 4096,
    seed: int = 42,
) -> "tuple[DataFrame, np.ndarray]":
    """Build an IVF index ONCE: train centroids on a deterministic
    driver-side sample, then assign every vector to its max-dot-product
    centroid. Returns ``(index_df, centroids)`` where ``index_df`` is the
    inverted-list table ``(n_id, n_vec, _list)`` — at corpus scale this is
    what you persist (``.write.partitionBy("_list")`` or bucketed), so the
    expensive assignment pass runs once and every search after it touches
    only the probed lists' files (partition pruning on ``_list``)."""
    sample_df = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_limit)
    )
    sample = np.array([r["_v"] for r in sample_df.collect()], dtype=np.float64)
    cents = train_centroids(sample, n_centroids, seed=seed)
    scores = _centroid_scores(cents, F.col(vec_col))
    index_df = vectors.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        # argmax via array_position on the max (ties -> first, deterministic)
        (F.array_position(scores, F.array_max(scores)) - 1).cast("int").alias("_list"),
    )
    return index_df, cents


def ivf_search(
    index_df: DataFrame,
    cents: "np.ndarray",
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Search a built IVF index: each query probes only its ``nprobe``
    nearest centroids' inverted lists (an equi-join on ``_list`` — never
    all-pairs), then candidates are exactly re-ranked by cosine."""
    scores = _centroid_scores(cents, F.col(vec_col))
    qs = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        scores.alias("_scores"),
    )
    idx = F.sequence(F.lit(0), F.lit(len(cents) - 1))
    scored_structs = F.zip_with(
        F.col("_scores"), idx, lambda s, i: F.struct(s.alias("s"), i.alias("i"))
    )
    probe_idx = F.slice(
        F.reverse(F.transform(F.array_sort(scored_structs), lambda st: st["i"])),
        1,
        nprobe,
    )
    q = qs.select("q_id", "q_vec", F.explode(probe_idx).alias("_list"))
    cands = (
        index_df.join(q, "_list")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )
    cos = (_dot(F.col("q_vec"), F.col("n_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("n_vec")))).alias("_cos")
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        cands.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("_cos", round_digits).alias("cos"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_limit: int = 4096,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search — the coarse-
    quantizer scale path next to lsh_topk: :func:`ivf_build` then
    :func:`ivf_search` in one shot (at corpus scale persist the build's
    inverted lists instead of rebuilding per query batch).

    With ``nprobe == n_centroids`` every list is probed, so the result is
    exactly the brute-force top-k (how the DuckDB oracle checks this
    operator end-to-end); pruning behavior is pytest-checked at low nprobe.
    """
    index_df, cents = ivf_build(vectors, n_centroids, id_col, vec_col, train_limit, seed)
    return ivf_search(index_df, cents, queries, nprobe, k, id_col, vec_col, round_digits)


def _band_plan(threshold: float, target_miss: float = 1e-9) -> tuple[int, int]:
    """(bits_per_band, n_bands) such that a pair at cosine == threshold is
    missed by every band with probability ≤ target_miss. Per-bit agreement
    p = 1 - acos(t)/π (sign-LSH, Charikar 2002); bits_per_band targets a
    ~0.5 per-band match at the boundary, then bands repeat to the miss
    budget. Recall is monotone: pairs above the threshold are safer."""
    import math

    t = min(max(threshold, -0.999), 0.999)
    p = 1.0 - math.acos(t) / math.pi
    if p <= 0.0:
        return 1, 1
    b = min(24, max(1, round(math.log(0.5) / math.log(p))))
    q = 1.0 - p**b
    r = max(1, math.ceil(math.log(target_miss) / math.log(q))) if q > 0 else 1
    return b, r


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    target_miss: float = 1e-9,
    seed: int = 42,
    bucket_cap: int | None | str = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH band equi-join
    generates candidates, exact cosine verifies them. Never a cartesian —
    the candidate join is an equi-join on (band, bucket), shuffled by key.

    ``bucket_cap``: drop band buckets larger than this before the
    self-join (same safety valve as dedup.lsh_candidate_pairs) — a
    corpus with thousands of byte-identical embeddings floods one bucket
    and that single join task goes |bucket|² quadratic. ``None`` keeps
    the exact oracle-checked behavior; ``"scale"`` selects the documented
    100-TB preset (``dedup.SCALE_BUCKET_CAP``).

    The band plan is sized from (threshold, target_miss) so a qualifying
    pair is missed with probability ≤ target_miss: over C(N,2) test-scale
    pairs the expected misses are ≪ 1, which is why the output still
    matches the exact all-pairs DuckDB oracle. For realistic near-dup
    thresholds (≥0.8) the buckets prune hard; at low thresholds sign-LSH
    provably cannot prune (candidates approach all pairs) but the plan
    still distributes as an equi-join instead of a nested loop."""
    from .dedup import resolve_bucket_cap

    bucket_cap = resolve_bucket_cap(bucket_cap)
    b, r = _band_plan(threshold, target_miss)
    sig = _hyperplane_udf(bits=b * r, bands=r, seed=seed)
    v = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), sig(F.col(vec_col)).alias("_sig")
    )
    banded = v.select("_id", F.posexplode("_sig").alias("band", "bucket"))
    if bucket_cap is not None:
        keep = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= bucket_cap)
            .select("band", "bucket")
        )
        banded = banded.join(keep, ["band", "bucket"], "left_semi")
    # shuffle-hash hint on both sides (r8, same as dedup.lsh_candidate_
    # pairs): a broadcast self-join would evaluate the signature-UDF
    # subtree twice; shuffled sides have canonically identical exchanges,
    # so ReuseExchange computes the signatures once — and broadcasting
    # all banded signatures is a non-starter at corpus scale anyway.
    cand = (
        banded.alias("x").hint("shuffle_hash")
        .join(
            banded.alias("y").hint("shuffle_hash"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", round_digits).alias("cos"))
    )
