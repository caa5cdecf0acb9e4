"""Content-defined chunking (stages/chunking.py) and the mergeable
top-k heavy-hitter summary (stages/sketch.py)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nifi_ray.stages.chunking import (
    AVG_BITS,
    MAX_SIZE,
    MIN_SIZE,
    chunk_doc_fn,
    chunk_flat_fn,
    chunk_spans,
)
from nifi_ray.stages.sketch import TOPK_EPS_KEY, topk_summary_fn


@given(data=st.binary(min_size=0, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_spans_cover_and_bound(data):
    sp = chunk_spans(data)
    if not data:
        assert sp == [(0, 0)] or sp == []
        return
    # exact cover, in order, no gaps
    assert sp[0][0] == 0 and sp[-1][1] == len(data)
    assert all(a[1] == b[0] for a, b in zip(sp, sp[1:]))
    # size bounds: every chunk ≤ max, every chunk except the last ≥ min
    assert all(e - s <= MAX_SIZE for s, e in sp)
    assert all(e - s >= MIN_SIZE for s, e in sp[:-1])


@given(
    docs=st.lists(st.binary(min_size=0, max_size=600), min_size=1, max_size=8)
)
@settings(max_examples=40, deadline=None)
def test_batch_composition_invariance(docs):
    # the flattened-batch kernel must cut each doc exactly where the
    # single-doc kernel does, regardless of neighbors in the batch
    texts = [d.decode("latin-1") for d in docs]
    batch = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    got = chunk_doc_fn()(batch).to_pylist()
    for i, d in enumerate(docs):
        buf = texts[i].encode("utf-8")
        sp = chunk_spans(buf)
        digests = b"".join(
            hashlib.blake2b(buf[s:e], digest_size=8).digest() for s, e in sp
        )
        assert got[i]["n_chunks"] == len(sp)
        assert got[i]["chunk_sig"] == hashlib.blake2b(
            digests, digest_size=8
        ).hexdigest()


@given(data=st.binary(min_size=600, max_size=3000), shift=st.integers(1, 40))
@settings(max_examples=40, deadline=None)
def test_realignment_after_common_cut(data, shift):
    # content-defined property: once a prefix-shifted copy produces a
    # cut at the same absolute position, every later cut coincides
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, 256, shift, dtype=np.uint8).tobytes()
    c1 = [e for _, e in chunk_spans(data)]
    c2 = [e - shift for _, e in chunk_spans(prefix + data)]
    common = sorted(set(c1) & set(c2))
    if common and common[0] < len(data):
        p = common[0]
        assert [x for x in c1 if x >= p] == [x for x in c2 if x >= p]


def test_flat_fn_counts_match_doc_fn():
    rng = np.random.default_rng(3)
    texts = [
        rng.integers(65, 90, rng.integers(0, 800), dtype=np.uint8)
        .tobytes()
        .decode()
        for _ in range(20)
    ]
    batch = pa.table({"doc_id": list(range(20)), "text": texts})
    per_doc = chunk_doc_fn()(batch)
    flat = chunk_flat_fn()(batch)
    assert (
        sum(flat["occurrences"].to_pylist())
        == sum(per_doc["n_chunks"].to_pylist())
    )


# ---------------------------------------------------------------- top-k


def _true_counts(rows):
    from collections import Counter

    return Counter(f"{u}:{e}" for u, e in rows)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from("abcd")),
        min_size=1,
        max_size=400,
    ),
    k=st.integers(1, 8),
    n_blocks=st.integers(1, 5),
)
@settings(max_examples=60, deadline=None)
def test_topk_summary_merge_bounds(rows, k, n_blocks):
    # partial(key) ≤ true(key) ≤ partial(key) + Σ eps_b, any split
    true = _true_counts(rows)
    cuts = np.linspace(0, len(rows), n_blocks + 1).astype(int)
    partial: dict[str, int] = {}
    total_eps = 0
    fn = topk_summary_fn(["u", "e"], k)
    for a, b in zip(cuts, cuts[1:]):
        blk = rows[a:b]
        t = pa.table(
            {"u": [r[0] for r in blk], "e": [r[1] for r in blk]}
        )
        for r in fn(t).to_pylist():
            if r["key"] == TOPK_EPS_KEY:
                total_eps += r["cnt"]
            else:
                partial[r["key"]] = partial.get(r["key"], 0) + r["cnt"]
    for key, cnt in true.items():
        p = partial.get(key, 0)
        assert p <= cnt <= p + total_eps
    if total_eps == 0:
        assert partial == dict(true)


@pytest.fixture(scope="module")
def skewed_events_dir(tmp_path_factory):
    # zipf-ish skew: key 0 dominates, long flat tail — exercises the
    # truncated-summary recount path with a valid certificate
    d = tmp_path_factory.mktemp("hh")
    rng = np.random.default_rng(11)
    users = np.concatenate(
        [
            np.zeros(500, np.int64),
            np.full(300, 1, np.int64),
            np.full(200, 2, np.int64),
            rng.integers(3, 2000, 4000),
        ]
    )
    types = np.array(["x"] * users.size)
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(users.size),
                "user_id": users,
                "event_type": types,
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return str(d)


def test_heavy_hitters_truncated_path_exact(ray_session, skewed_events_dir):
    import duckdb

    from nifi_ray.pipelines.queries import q_heavy_hitters

    # summary_k=4 forces per-block truncation (eps > 0): the recount +
    # certificate path must still return the EXACT top-3
    got = q_heavy_hitters(
        skewed_events_dir, summary_k=4, top_k=3
    ).to_pylist()
    exp = duckdb.connect().execute(
        "SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key,"
        " count(*) AS cnt FROM read_parquet(?) GROUP BY 1"
        " ORDER BY cnt DESC, key LIMIT 3",
        [os.path.join(skewed_events_dir, "events.parquet")],
    ).fetchall()
    assert [(r["key"], r["cnt"]) for r in got] == exp


def test_heavy_hitters_flat_fallback_exact(ray_session, tmp_path):
    import duckdb

    from nifi_ray.pipelines.queries import q_heavy_hitters

    # perfectly flat data: no certificate can hold — the fallback full
    # groupby must still give the exact (tie-broken) answer
    users = np.repeat(np.arange(50, dtype=np.int64), 3)
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(users.size),
                "user_id": users,
                "event_type": np.array(["x"] * users.size),
            }
        ),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = q_heavy_hitters(str(tmp_path), summary_k=2, top_k=5).to_pylist()
    exp = duckdb.connect().execute(
        "SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key,"
        " count(*) AS cnt FROM read_parquet(?) GROUP BY 1"
        " ORDER BY cnt DESC, key LIMIT 5",
        [os.path.join(tmp_path, "events.parquet")],
    ).fetchall()
    assert [(r["key"], r["cnt"]) for r in got] == exp
