"""Driver-side oracle tables for the xxhash64-based document operators.

MinHash-LSH pairs, SimHash pairs, and rolling-hash fingerprints had no
DuckDB twin in round 1 because DuckDB cannot evaluate Spark's xxhash64.
`oracle_xxh` closes that gap: these builders recompute the per-document
hash artifacts in pure pandas/Python (bit-for-bit, independently of the
Spark column-algebra implementations in `ops/text.py` / `ops/dedup.py`)
and write them to parquet, so the DuckDB oracle can run the *relational*
half — band-bucket candidate joins, all-pairs hamming verification,
exact-Jaccard filters — in plain SQL over them:

- `fingerprints`  (doc_id, fingerprint)      — compared directly.
- `minhash_bands` (id, band_idx, band_hash)  — SQL re-runs the LSH
  band equi-join and the exact shingle-set Jaccard verification.
- `minhash_sh`    (id, sh list<string>)      — distinct 3-gram shingles.
- `simhash_docs`  (id, sim)                  — SQL does the *all-pairs*
  hamming join, which also proves the pigeonhole chunk blocking in the
  Spark op is complete (hamming <= 3 must share one of 4 16-bit chunks).

The tables are built from the driver's correctness-gate scale
(/root/testdata/sf0.01) — the only scale the gate compares at.
Parameters mirror the `doc_*` queries: shingle_n=3, k=32, bands=16,
threshold=0.5 (minhash); fingerprint shingle n=5; simhash 64-bit.
"""

from __future__ import annotations

import os
import re

import pandas as pd

from .oracle_xxh import spark_xxhash64_str, spark_xxhash64_str_int

GATE_DOCS = "/root/testdata/sf0.01/documents.parquet"
DOCS_BASE = "/tmp/ebel_spark_oracle_docs_v1"
_MARKER = "_DOCS_ORACLE_READY"

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")

MINHASH_K = 32
MINHASH_BANDS = 16
MINHASH_SHINGLE_N = 3
FINGERPRINT_N = 5
WINNOW_K = 4
WINNOW_W = 4
#: DSIR hashed-ngram bucket count (ops/text.dsir_importance twin)
DSIR_BUCKETS = 256


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_SPLIT.split(text.lower()) if t]


def _shingles(toks: list[str], n: int) -> list[str]:
    """Distinct word n-gram shingles, first-occurrence order
    (ops/text.shingles semantics)."""
    if len(toks) >= n:
        return list(dict.fromkeys(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)))
    if toks:
        return [" ".join(toks)]
    return []


def ensure_docs_oracle_tables(base: str = DOCS_BASE,
                              docs_parquet: str = GATE_DOCS) -> str:
    """Build the doc-op oracle parquet tables if absent; returns base."""
    # the newest-table check forces a one-time rebuild of dirs created
    # before that table existed (the rebuild rewrites every table,
    # idempotent)
    if (os.path.exists(os.path.join(base, _MARKER))
            and os.path.isdir(os.path.join(base, "winnow"))
            and os.path.isdir(os.path.join(base, "token_buckets"))):
        return base

    docs = pd.read_parquet(docs_parquet, columns=["doc_id", "text"])
    rows_per_band = MINHASH_K // MINHASH_BANDS

    fp_rows, band_rows, sh_rows, sim_rows, win_rows = [], [], [], [], []
    vocab: set[str] = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        toks = _tokens(text)
        vocab.update(toks)

        # winnowing (ops/text.winnow_fingerprints twin): positional k-gram
        # hashes -> min per window of w -> distinct selected values
        if len(toks) >= WINNOW_K:
            grams = [
                spark_xxhash64_str(" ".join(toks[i:i + WINNOW_K]))
                for i in range(len(toks) - WINNOW_K + 1)
            ]
        elif toks:
            grams = [spark_xxhash64_str(" ".join(toks))]
        else:
            grams = []
        if len(grams) >= WINNOW_W:
            sel = sorted({
                min(grams[i:i + WINNOW_W])
                for i in range(len(grams) - WINNOW_W + 1)
            })
        elif grams:
            sel = [min(grams)]
        else:
            sel = []
        win_rows.extend({"doc_id": doc_id, "fp": v} for v in sel)

        # fingerprint: min xxhash64 over 5-gram shingles (1-perm MinHash)
        sh5 = _shingles(toks, FINGERPRINT_N)
        fp_rows.append({
            "doc_id": doc_id,
            "fingerprint": (min(spark_xxhash64_str(s) for s in sh5)
                            if sh5 else None),
        })

        # minhash: sig[i] = min over shingles of xxhash64(shingle, i);
        # band_hash = xxhash64 of the comma-joined signature slice
        sh3 = _shingles(toks, MINHASH_SHINGLE_N)
        if sh3:
            sh_rows.append({"id": doc_id, "sh": sh3})
            per_seed = [
                [spark_xxhash64_str_int(s, i) for s in sh3]
                for i in range(MINHASH_K)
            ]
            sig = [min(hs) for hs in per_seed]
            for b in range(MINHASH_BANDS):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                band_rows.append({
                    "id": doc_id, "band_idx": b,
                    "band_hash": spark_xxhash64_str(
                        ",".join(str(v) for v in chunk)),
                })

        # simhash: per-bit +1/-1 votes over (non-distinct) token hashes
        votes = [0] * 64
        for t in toks:
            h = spark_xxhash64_str(t)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sim = 0
        for i in range(64):
            if votes[i] > 0:
                sim |= 1 << i
        if sim >= (1 << 63):
            sim -= 1 << 64
        sim_rows.append({"id": doc_id, "sim": sim})

    os.makedirs(base, exist_ok=True)
    tables = {
        "fingerprints": pd.DataFrame(fp_rows).astype(
            {"doc_id": "int64", "fingerprint": "Int64"}),
        "minhash_bands": pd.DataFrame(band_rows).astype(
            {"id": "int64", "band_idx": "int32", "band_hash": "int64"}),
        "minhash_sh": pd.DataFrame(sh_rows),
        "simhash_docs": pd.DataFrame(sim_rows).astype(
            {"id": "int64", "sim": "int64"}),
        "winnow": pd.DataFrame(
            win_rows, columns=["doc_id", "fp"]).astype(
            {"doc_id": "int64", "fp": "int64"}),
        # DSIR twin: every distinct gate-corpus token -> its hashed-ngram
        # bucket pmod(xxhash64(token), DSIR_BUCKETS); Python % on the
        # signed value IS Spark's pmod (both floor-mod toward +)
        "token_buckets": pd.DataFrame(
            [{"term": t, "bucket": spark_xxhash64_str(t) % DSIR_BUCKETS}
             for t in sorted(vocab)],
            columns=["term", "bucket"]).astype({"bucket": "int64"}),
    }
    for name, pdf in tables.items():
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        pdf.to_parquet(os.path.join(d, "part-0.parquet"), index=False)
    with open(os.path.join(base, _MARKER), "w") as fd:
        fd.write("ok")
    return base


# ---------------------------------------------------------------------------
# embedding-LSH oracle tables
# ---------------------------------------------------------------------------

GATE_VECS = "/root/testdata/sf0.01/embeddings.parquet"
VECS_BASE = "/tmp/ebel_spark_oracle_vecs_v1"
_VMARKER = "_VECS_ORACLE_READY"


def _spark_fold_dot(vec, plane) -> float:
    """Exact twin of ops/vectors.dot for a float32 vector x double plane:
    Spark's F.aggregate is a sequential left fold in double precision, so
    the sum MUST accumulate in array order (numpy's pairwise/SIMD
    summation would round differently and could flip a sign-bit)."""
    acc = 0.0
    for x, p in zip(vec, plane):
        acc += float(x) * p
    return acc


# IVF twin parameters (mirror the ann_ivf_topk query)
IVF_NLIST = 8
IVF_NPROBE = 3
IVF_ITERS = 2
IVF_DIM = 64


def _l2sq_fold(vec, cent) -> float:
    """Exact twin of ops/vectors._l2sq: zip_with promotes the float32
    element to double, squares in double, and F.aggregate left-folds the
    sum sequentially — so accumulate in array order, scalar Python."""
    acc = 0.0
    for x, c in zip(vec, cent):
        d = float(x) - c
        acc += d * d
    return acc


def _nearest_lists_py(vec, cents: list[list[float]],
                      nprobe: int) -> list[int]:
    """Twin of ops/vectors._nearest_lists: array_sort over (d, i) structs
    == tuple sort (distance, then lower index wins ties)."""
    ranked = sorted((_l2sq_fold(vec, c), i) for i, c in enumerate(cents))
    return [i for _, i in ranked[:nprobe]]


def _ivf_centroids_py(vecs: pd.DataFrame, nlist: int = IVF_NLIST,
                      dim: int = IVF_DIM,
                      iters: int = IVF_ITERS) -> list[list[float]]:
    """Twin of ops/vectors.ivf_train_centroids: seed = nlist vectors with
    the smallest xxhash64(str(id)); `iters` Lloyd rounds where the update
    sums floor(x * IVF_SCALE) as exact integers (order-independent on both
    sides) and divides driver-side — bit-identical to the Spark model."""
    import math

    from .ops.vectors import IVF_SCALE

    order = sorted(
        (spark_xxhash64_str(str(int(vid))), int(vid), emb)
        for vid, emb in zip(vecs["vec_id"], vecs["embedding"])
    )
    cents = [[float(x) for x in emb] for _, _, emb in order[:nlist]]
    for _ in range(iters):
        sums = {}
        for _, _, emb in order:
            li = _nearest_lists_py(emb, cents, 1)[0]
            s = sums.setdefault(li, [0] * (dim + 1))
            s[dim] += 1
            for i, x in enumerate(emb):
                s[i] += math.floor(float(x) * IVF_SCALE)
        cents = [
            [sums[j][i] / (IVF_SCALE * sums[j][dim])
             for i in range(dim)] if j in sums else cents[j]
            for j in range(len(cents))
        ]
    return cents


# PQ twin parameters (mirror the ann_pq_topk query)
PQ_M = 8
PQ_KSUB = 16
PQ_ITERS = 1


def _pq_model_py(vecs: pd.DataFrame, dim: int = IVF_DIM, m: int = PQ_M,
                 ksub: int = PQ_KSUB,
                 iters: int = PQ_ITERS) -> list[list[list[float]]]:
    """Twin of ops/vectors.pq_train: seeds are the ksub smallest-hash
    vectors (each contributing its slice to every subspace); Lloyd
    updates sum floor(x * IVF_SCALE) exact longs per (subspace, code, j)
    — bit-identical to the distributed codebook."""
    import math

    from .ops.vectors import IVF_SCALE

    d = dim // m
    order = sorted(
        (spark_xxhash64_str(str(int(vid))), int(vid), emb)
        for vid, emb in zip(vecs["vec_id"], vecs["embedding"])
    )
    model = [[[float(x) for x in emb[s * d:(s + 1) * d]]
              for _, _, emb in order[:ksub]] for s in range(m)]
    for _ in range(iters):
        sums: dict = {}
        for _, _, emb in order:
            for s in range(m):
                sub = emb[s * d:(s + 1) * d]
                code = min(
                    range(ksub),
                    key=lambda c: (_l2sq_fold(sub, model[s][c]), c))
                a = sums.setdefault((s, code), [0] * (d + 1))
                a[d] += 1
                for j, x in enumerate(sub):
                    a[j] += math.floor(float(x) * IVF_SCALE)
        model = [
            [[sums[(s, c)][j] / (IVF_SCALE * sums[(s, c)][d])
              for j in range(d)] if (s, c) in sums else model[s][c]
             for c in range(ksub)]
            for s in range(m)
        ]
    return model


def _pq_codes_py(emb, model) -> list[int]:
    """Twin of ops/vectors.pq_codes_col: per-subspace argmin with ties
    toward the lower code (the struct array_sort rule)."""
    m = len(model)
    d = len(model[0][0])
    return [
        min(range(len(model[s])),
            key=lambda c: (_l2sq_fold(emb[s * d:(s + 1) * d],
                                      model[s][c]), c))
        for s in range(m)
    ]


def ensure_vecs_oracle_tables(base: str = VECS_BASE,
                              vecs_parquet: str = GATE_VECS) -> str:
    """Driver-side twin of the hyperplane-LSH bucket assignment and the
    IVF coarse quantizer: the planes/seed rule are shared parameters
    (seeded PRNG / xxhash64, like the vocab tables); the dot/sign/bucket
    and k-means list assignments are recomputed independently of the
    Spark column algebra.  SQL then re-runs the relational half — bucket
    and inverted-list equi-joins plus exact cosine re-rank — over these
    parquets."""
    # the ivf/pq checks force a one-time rebuild of dirs created before
    # those tables existed (the rebuild rewrites every table, idempotent)
    if (os.path.exists(os.path.join(base, _VMARKER))
            and os.path.isdir(os.path.join(base, "ivf_corpus_lists"))
            and os.path.isdir(os.path.join(base, "pq_codes"))
            and os.path.isdir(os.path.join(base, "ivf_dists"))
            and os.path.isdir(os.path.join(base, "pqres_codes"))):
        return base

    from .ops.vectors import hyperplanes

    vecs = pd.read_parquet(vecs_parquet, columns=["vec_id", "embedding"])
    tables = {}
    for name, nbits in (("lsh8_buckets", 8), ("lsh6_buckets", 6)):
        planes = hyperplanes(64, nbits, seed=42)
        rows = []
        for vec_id, emb in zip(vecs["vec_id"], vecs["embedding"]):
            bucket = 0
            for i, p in enumerate(planes):
                if _spark_fold_dot(emb, p) > 0:
                    bucket |= 1 << i
            rows.append({"vec_id": int(vec_id), "bucket": bucket})
        tables[name] = pd.DataFrame(rows).astype(
            {"vec_id": "int64", "bucket": "int64"})

    import math as _math

    cents = _ivf_centroids_py(vecs)
    cl_rows, qp_rows, dist_rows = [], [], []
    for vec_id, emb in zip(vecs["vec_id"], vecs["embedding"]):
        vec_id = int(vec_id)
        li = _nearest_lists_py(emb, cents, 1)[0]
        cl_rows.append({"vec_id": vec_id, "list_id": li})
        # centroid distance twin for the outlier query: same fold
        # arithmetic as Spark's unrolled _l2sq (identical IEEE doubles),
        # sqrt is correctly rounded on both engines; stored RAW, rounded
        # in the SQL so the round() parity lives in one dialect pair
        dist_rows.append({"vec_id": vec_id, "list_id": li,
                          "dist": _math.sqrt(_l2sq_fold(emb, cents[li]))})
        if vec_id < 8:
            qp_rows.extend(
                {"vec_id": vec_id, "list_id": li}
                for li in _nearest_lists_py(emb, cents, IVF_NPROBE))
    tables["ivf_corpus_lists"] = pd.DataFrame(cl_rows).astype(
        {"vec_id": "int64", "list_id": "int32"})
    tables["ivf_query_probes"] = pd.DataFrame(qp_rows).astype(
        {"vec_id": "int64", "list_id": "int32"})
    tables["ivf_dists"] = pd.DataFrame(dist_rows).astype(
        {"vec_id": "int64", "list_id": "int32", "dist": "float64"})

    from .ops.vectors import pq_luts_py
    pq_model = _pq_model_py(vecs)
    code_rows, lut_rows = [], []
    for vec_id, emb in zip(vecs["vec_id"], vecs["embedding"]):
        vec_id = int(vec_id)
        code_rows.extend(
            {"vec_id": vec_id, "s": s, "code": c}
            for s, c in enumerate(_pq_codes_py(emb, pq_model)))
        if vec_id < 8:
            luts = pq_luts_py(emb, pq_model)
            lut_rows.extend(
                {"query_id": vec_id, "s": s, "code": c, "slut": luts[s][c]}
                for s in range(PQ_M) for c in range(PQ_KSUB))
    tables["pq_codes"] = pd.DataFrame(code_rows).astype(
        {"vec_id": "int64", "s": "int32", "code": "int32"})
    tables["pq_lut"] = pd.DataFrame(lut_rows).astype(
        {"query_id": "int64", "s": "int32", "code": "int32",
         "slut": "int64"})

    # residual-PQ twins (ann_ivfpq_residual_topk): each vector encodes
    # against v - centroid[own list]; the query-side tables are the LUT
    # of the RAW query vector against the residual codebook plus the
    # per-(query, list) inner-product offset longs — the exact
    # decomposition dot(q, c + r~) = dot(q, c) + dot(q, r~) the Spark
    # path (ops/vectors.ivfpq_topk by_residual=True) scores with.
    from .ops.vectors import ip_offset_py
    own_list = {r["vec_id"]: r["list_id"] for r in cl_rows}
    res_emb = {
        int(vid): [float(x) - cents[own_list[int(vid)]][j]
                   for j, x in enumerate(emb)]
        for vid, emb in zip(vecs["vec_id"], vecs["embedding"])
    }
    res_vecs = pd.DataFrame({
        "vec_id": list(res_emb.keys()),
        "embedding": list(res_emb.values()),
    })
    res_model = _pq_model_py(res_vecs)
    rcode_rows, rlut_rows, off_rows = [], [], []
    for vec_id, emb in zip(vecs["vec_id"], vecs["embedding"]):
        vec_id = int(vec_id)
        rcode_rows.extend(
            {"vec_id": vec_id, "s": s, "code": c}
            for s, c in enumerate(_pq_codes_py(res_emb[vec_id], res_model)))
        if vec_id < 8:
            luts = pq_luts_py(emb, res_model)
            rlut_rows.extend(
                {"query_id": vec_id, "s": s, "code": c, "slut": luts[s][c]}
                for s in range(PQ_M) for c in range(PQ_KSUB))
            off_rows.extend(
                {"query_id": vec_id, "list_id": li,
                 "off": ip_offset_py(emb, cents[li])}
                for li in range(IVF_NLIST))
    tables["pqres_codes"] = pd.DataFrame(rcode_rows).astype(
        {"vec_id": "int64", "s": "int32", "code": "int32"})
    tables["pqres_lut"] = pd.DataFrame(rlut_rows).astype(
        {"query_id": "int64", "s": "int32", "code": "int32",
         "slut": "int64"})
    tables["ivfpq_offsets"] = pd.DataFrame(off_rows).astype(
        {"query_id": "int64", "list_id": "int32", "off": "int64"})

    os.makedirs(base, exist_ok=True)
    for name, pdf in tables.items():
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        pdf.to_parquet(os.path.join(d, "part-0.parquet"), index=False)
    with open(os.path.join(base, _VMARKER), "w") as fd:
        fd.write("ok")
    return base
