"""Property-based differential test for the similarity-search family:
hypothesis plants adversarial embedding corpora — duplicated vectors
(perfect-cosine ties), near-parallel pairs, tiny dimensions — and the
UNMODIFIED brute-force top-k operator must match an exact Python
model.

Exactness: components are multiples of 0.25 (exactly representable in
float32), so dot products and norms are exact in double and the
Python model's left-to-right summation reproduces the Spark
``aggregate(zip_with(...))`` fold bit-for-bit; the only rounding is
the shared round-half-up to 6 decimals.
"""

from __future__ import annotations

import itertools
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from sparketl.operators.llm import llm_similarity_topk
from sparketl.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE_DIR
from tests.test_property_dedup import _round6

_TOPK = 5


def model_topk(vecs: dict[int, list[float]]) -> set[tuple]:
    """Exact expected (query_id, neighbor_id, cos_sim, rnk) rows."""
    rows = set()
    for qid, qv in vecs.items():
        if qid % 25 != 0:
            continue
        qn = 0.0
        for x in qv:
            qn += float(x) * float(x)
        scored = []
        for nid, nv in vecs.items():
            if nid == qid:
                continue
            dot = 0.0
            for x, y in zip(qv, nv):
                dot += float(x) * float(y)
            n2 = 0.0
            for x in nv:
                n2 += float(x) * float(x)
            scored.append((-_round6(dot / math.sqrt(qn * n2)), nid))
        scored.sort()
        for rk, (negcos, nid) in enumerate(scored[:_TOPK], start=1):
            rows.add((qid, nid, -negcos, rk))
    return rows


@st.composite
def embedding_corpus(draw):
    dim = draw(st.integers(3, 6))
    n = draw(st.integers(28, 54))  # queries: vec_id 0, 25 (and maybe 50)
    grid = [i * 0.25 for i in range(-8, 9)]
    vecs: dict[int, list[float]] = {}
    for i in range(n):
        if i > 0 and draw(st.booleans()) and draw(st.booleans()):
            # duplicate an earlier vector: a perfect-cosine tie that
            # must resolve purely by neighbor_id ordering
            vecs[i] = list(vecs[draw(st.integers(0, i - 1))])
            continue
        v = [draw(st.sampled_from(grid)) for _ in range(dim)]
        if not any(v):
            v[0] = 0.25  # keep norms nonzero: cosine needs a direction
        vecs[i] = v
    return vecs


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("prop_ann")
    counter = itertools.count()

    def make(vecs: dict[int, list[float]]) -> str:
        d = base / f"e{next(counter)}"
        d.mkdir()
        for name in TABLE_NAMES:
            if name != "embeddings":
                os.symlink(
                    f"{SF_SMOKE_DIR}/{name}.parquet", d / f"{name}.parquet"
                )
        ids = sorted(vecs)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [vecs[i] for i in ids], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 3 for i in ids], pa.int32()),
            }
        )
        pq.write_table(t, d / "embeddings.parquet")
        return str(d)

    return make


@settings(max_examples=5, deadline=None, derandomize=True)
@given(vecs=embedding_corpus())
def test_brute_force_topk_matches_python_model(spark, emb_dir, vecs):
    sf = emb_dir(vecs)
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rnk)
        for r in llm_similarity_topk(spark, sf).collect()
    }
    want = model_topk(vecs)
    assert got == want


def _round6d(x: float) -> float:
    from tests.test_property_dedup import _round6

    return _round6(x)


def model_ivf_search(vecs: dict[int, list[float]]) -> set[tuple]:
    """Exact expected llm_ivf_search rows: per-label centroids with
    the double-rounding recipe (round6(round6(sum)/count)), nearest-
    centroid assignment by left-to-right L2 fold (ties by label), and
    top-3 cosine within the query's cluster.  With 0.25-grid
    components every sum is exact in double, so the Python fold
    reproduces the Spark aggregate bit-for-bit."""
    labels = {i: i % 3 for i in vecs}
    by_label: dict[int, list[list[float]]] = {}
    for i, v in vecs.items():
        by_label.setdefault(labels[i], []).append(v)
    cens = {}
    for lbl, vs in by_label.items():
        dim = len(vs[0])
        cen = []
        for d in range(dim):
            s = 0.0
            for v in vs:
                s += float(v[d])
            cen.append(_round6d(_round6d(s) / len(vs)))
        cens[lbl] = cen
    assigned = {}
    for i, v in vecs.items():
        best = None
        for lbl in sorted(cens):
            d2 = 0.0
            for x, c in zip(v, cens[lbl]):
                d2 += (float(x) - c) * (float(x) - c)
            if best is None or (d2, lbl) < best:
                best = (d2, lbl)
        assigned[i] = best[1]
    rows = set()
    for qid, qv in vecs.items():
        if qid % 25 != 0:
            continue
        qn = 0.0
        for x in qv:
            qn += float(x) * float(x)
        scored = []
        for nid, nv in vecs.items():
            if nid == qid or assigned[nid] != assigned[qid]:
                continue
            dot = 0.0
            for x, y in zip(qv, nv):
                dot += float(x) * float(y)
            n2 = 0.0
            for x in nv:
                n2 += float(x) * float(x)
            scored.append((-_round6d(dot / math.sqrt(qn * n2)), nid))
        scored.sort()
        for rk, (negcos, nid) in enumerate(scored[:3], start=1):
            rows.add((qid, nid, -negcos, rk))
    return rows


@settings(max_examples=4, deadline=None, derandomize=True)
@given(vecs=embedding_corpus())
def test_ivf_search_matches_python_model(spark, emb_dir, vecs):
    from sparketl.operators.llm import llm_ivf_search

    sf = emb_dir(vecs)
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rnk)
        for r in llm_ivf_search(spark, sf).collect()
    }
    assert got == model_ivf_search(vecs)


def _assign(vecs: dict[int, list[float]]) -> dict[int, int]:
    """Nearest-centroid assignment shared by the kmeans/semdedup
    models: per-label double-rounded centroids (labels are i % 3 per
    emb_dir), left-to-right L2 fold, ties by label asc."""
    labels = {i: i % 3 for i in vecs}
    by_label: dict[int, list[list[float]]] = {}
    for i, v in vecs.items():
        by_label.setdefault(labels[i], []).append(v)
    cens = {}
    for lbl, vs in by_label.items():
        cens[lbl] = [
            _round6d(_round6d(sum(float(v[d]) for v in vs)) / len(vs))
            for d in range(len(vs[0]))
        ]
    assigned = {}
    for i, v in vecs.items():
        best = None
        for lbl in sorted(cens):
            d2 = 0.0
            for x, c in zip(v, cens[lbl]):
                d2 += (float(x) - c) * (float(x) - c)
            if best is None or (d2, lbl) < best:
                best = (d2, lbl)
        assigned[i] = best[1]
    return assigned


def model_kmeans_iterate(vecs: dict[int, list[float]]) -> set[tuple]:
    """Exact expected llm_kmeans_iterate rows (dims capped at 4)."""
    labels = {i: i % 3 for i in vecs}
    assigned = _assign(vecs)
    members: dict[int, list[int]] = {}
    for i, c in assigned.items():
        members.setdefault(c, []).append(i)
    rows = set()
    for c, ids in members.items():
        n = len(ids)
        moved = sum(1 for i in ids if labels[i] != c)
        dim = len(vecs[ids[0]])
        for d in range(min(4, dim)):
            s = 0.0
            for i in sorted(ids):
                s += float(vecs[i][d])
            rows.add((c, d + 1, _round6d(_round6d(s) / n), n, moved))
    return rows


def model_semantic_dedup(vecs: dict[int, list[float]]) -> set[tuple]:
    """Exact expected llm_semantic_dedup rows: within each assigned
    cluster, vec b is dropped when a lower-id member has rounded
    cosine >= 0.35; dup_of = the smallest such witness, -1 if kept."""
    assigned = _assign(vecs)
    norms = {
        i: sum(float(x) * float(x) for x in v) for i, v in vecs.items()
    }
    rows = set()
    for b in vecs:
        dup_of = -1
        for a in sorted(vecs):
            if a >= b or assigned[a] != assigned[b]:
                continue
            dot = 0.0
            for x, y in zip(vecs[a], vecs[b]):
                dot += float(x) * float(y)
            cos = _round6d(dot / math.sqrt(norms[a] * norms[b]))
            if cos >= 0.35:
                dup_of = a
                break
        rows.add((assigned[b], b, dup_of == -1, dup_of))
    return rows


@settings(max_examples=4, deadline=None, derandomize=True)
@given(vecs=embedding_corpus())
def test_kmeans_iterate_matches_python_model(spark, emb_dir, vecs):
    from sparketl.operators.llm import llm_kmeans_iterate

    sf = emb_dir(vecs)
    got = {
        (r.cluster, r.dim, r.centroid_val, r.n_vecs, r.n_moved_in)
        for r in llm_kmeans_iterate(spark, sf).collect()
    }
    assert got == model_kmeans_iterate(vecs)


@settings(max_examples=4, deadline=None, derandomize=True)
@given(vecs=embedding_corpus())
def test_semantic_dedup_matches_python_model(spark, emb_dir, vecs):
    """Duplicated vectors in the corpus strategy are EXACT semantic
    dups (cosine 1.0 after rounding), so the drop path is always
    exercised; near-parallel grid pairs probe the 0.35 boundary."""
    from sparketl.operators.llm import llm_semantic_dedup

    sf = emb_dir(vecs)
    got = {
        (r.cluster, r.vec_id, r.keep, r.dup_of)
        for r in llm_semantic_dedup(spark, sf).collect()
    }
    assert got == model_semantic_dedup(vecs)


def model_kmeans_train(vecs: dict[int, list[float]], iters: int = 5):
    """Exact Python Lloyd driver mirroring kmeans_train: label-seeded
    double-rounded centroids, argmin assignment (ties by cluster asc),
    rounded recompute, exact fixed-point stop.  Empty clusters vanish
    (both sides recompute centroids only for clusters with members)."""
    labels = {i: i % 3 for i in vecs}
    by: dict[int, list[list[float]]] = {}
    for i, v in vecs.items():
        by.setdefault(labels[i], []).append(v)
    cens = {
        lbl: [
            _round6d(_round6d(sum(float(v[d]) for v in vs)) / len(vs))
            for d in range(len(vs[0]))
        ]
        for lbl, vs in by.items()
    }
    cur = sorted((lbl, list(c)) for lbl, c in cens.items())
    for it in range(1, iters + 1):
        cen_map = dict(cur)
        members: dict[int, list[int]] = {}
        for i, v in vecs.items():
            best = None
            for lbl in sorted(cen_map):
                d2 = 0.0
                for x, c in zip(v, cen_map[lbl]):
                    d2 += (float(x) - c) * (float(x) - c)
                if best is None or (d2, lbl) < best:
                    best = (d2, lbl)
            members.setdefault(best[1], []).append(i)
        new = []
        for lbl, ids in members.items():
            dim = len(vecs[ids[0]])
            cen = []
            for d in range(dim):
                s = 0.0
                for i in sorted(ids):
                    s += float(vecs[i][d])
                cen.append(_round6d(_round6d(s) / len(ids)))
            new.append((lbl, cen))
        new.sort()
        if new == cur:
            return cur, it - 1
        cur = new
    return cur, iters


@settings(max_examples=3, deadline=None, derandomize=True)
@given(vecs=embedding_corpus())
def test_kmeans_train_matches_python_model(spark, emb_dir, vecs):
    from sparketl.operators.llm import kmeans_train

    sf = emb_dir(vecs)
    got_cb, got_it = kmeans_train(spark, sf, iters=4)
    want_cb, want_it = model_kmeans_train(vecs, iters=4)
    assert got_it == want_it
    assert got_cb == want_cb


def test_kmeans_train_fixture_smoke(spark):
    """On the real fixture: the loop runs, clusters survive (labels
    are genuine structure per FIXTURES.md), and the returned codebook
    is in _centroids' format — directly inlinable by IVF consumers."""
    from sparketl.operators.llm import kmeans_train

    cb, n_it = kmeans_train(spark, SF_SMOKE_DIR, iters=3)
    assert 1 <= len(cb) <= 10 and 0 <= n_it <= 3
    dims = {len(vec) for _, vec in cb}
    assert dims == {64}
    assert cb == sorted(cb)
