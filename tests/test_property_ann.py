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
