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
