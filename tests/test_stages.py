"""Unit tests for the operator stages — batch bodies are pure functions
over pa.Table (NiFi TestRunner analog: build batch → run transform →
assert rows per output), so most need no Ray."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nifi_ray.stages.attrs import derive, when
from nifi_ray.stages.dedup import SimHasher, content_hash, jaccard_of_texts
from nifi_ray.stages.multimodal import DecodeImage, ResizeImage, synth_media_table
from nifi_ray.stages.quality import Fingerprinter, LangId, quality_stats, token_count
from nifi_ray.stages.route import stamp_route
from nifi_ray.stages.split_merge import defragment_fn, split_text
from nifi_ray.stages.text import (
    attributes_to_json,
    count_matches,
    extract_regex,
    json_path,
    replace_text,
)


def test_derive_and_when():
    t = pa.table({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]})
    out = derive({"c": lambda t: pc.add(t["a"], t["b"])})(t)
    assert out["c"].to_pylist() == [11.0, 22.0, 33.0]
    out2 = when(
        [(lambda t: pc.greater(t["a"], 2.5), "hi"), (lambda t: pc.greater(t["a"], 1.5), "mid")],
        default="lo",
        out="bucket",
    )(t)
    assert out2["bucket"].to_pylist() == ["lo", "mid", "hi"]


def test_stamp_route_first_and_all():
    t = pa.table({"x": [1, 5, 10]})
    first = stamp_route(
        {"big": lambda t: pc.greater(t["x"], 7), "mid": lambda t: pc.greater(t["x"], 3)},
        strategy="first",
    )(t)
    assert first["route"].to_pylist() == ["unmatched", "mid", "big"]
    allm = stamp_route(
        {"a": lambda t: pc.greater(t["x"], 0), "b": lambda t: pc.greater(t["x"], 3)},
        strategy="all",
    )(t)
    assert allm["route"].to_pylist() == ["unmatched", "matched", "matched"]


def test_text_ops():
    t = pa.table({"s": ["abc 123 def", "no digits", None]})
    rep = replace_text("s", "[0-9]+", "#")(t)
    assert rep["s"].to_pylist() == ["abc # def", "no digits", None]
    ext = extract_regex("s", "[0-9]+", "num")(t)
    assert ext["num"].to_pylist() == ["123", None, None]
    cnt = count_matches("s", "[a-z]+", "n")(t)
    assert cnt["n"].to_pylist() == [2, 2, 0]


def test_json_and_attrs_to_json():
    t = pa.table({"p": ['{"k": 5}', '{"k": null}', None], "id": [1, 2, 3]})
    jp = json_path("p", "k", "kv", pa.int64())(t)
    assert jp["kv"].to_pylist() == [5, None, None]
    aj = attributes_to_json(["id"])(t)
    assert aj["json"].to_pylist()[0] == '{"id":1}'


def test_split_text_fragments():
    t = pa.table({"id": ["x", "y"], "s": ["a b  c", "d"]})
    out = split_text("s", r"\s+", out="w", fragments=True)(t)
    assert out["w"].to_pylist() == ["a", "b", "c", "d"]
    assert out["fragment_index"].to_pylist() == [0, 1, 2, 0]
    assert out["fragment_count"].to_pylist() == [3, 3, 3, 1]
    assert out["id"].to_pylist() == ["x", "x", "x", "y"]


def test_defragment():
    g = pa.table(
        {
            "fragment_id": ["f"] * 3,
            "fragment_index": pa.array([2, 0, 1], pa.int32()),
            "fragment_count": pa.array([3, 3, 3], pa.int32()),
            "piece": ["c", "a", "b"],
        }
    )
    out = defragment_fn("piece")(g)
    assert out["merged"].to_pylist() == ["abc"]
    assert out["relationship"].to_pylist() == ["merged"]
    incomplete = g.slice(0, 2)
    out2 = defragment_fn("piece")(incomplete)
    assert out2["relationship"].to_pylist() == ["failure"]


def test_content_hash_matches_duckdb():
    import duckdb

    t = pa.table({"s": ["hello", "wörld"]})
    got = content_hash("s")(t)["content_hash"].to_pylist()
    want = [r[0] for r in duckdb.sql("SELECT md5(x) FROM (VALUES ('hello'), ('wörld')) v(x)").fetchall()]
    assert got == want


def test_jaccard_and_simhash():
    assert jaccard_of_texts("a b c d", "a b c d") == 1.0
    assert jaccard_of_texts("a b c", "x y z") == 0.0
    t = pa.table({"text": ["the quick brown fox jumps", "the quick brown fox jumped", "totally different words here"]})
    out = SimHasher()(t)
    s = out["simhash"].to_pylist()
    from nifi_ray.stages.dedup import hamming64

    d_sim = hamming64(np.array([s[0]], np.uint64), np.array([s[1]], np.uint64))[0]
    d_diff = hamming64(np.array([s[0]], np.uint64), np.array([s[2]], np.uint64))[0]
    assert d_sim < d_diff


def test_quality_and_tokens():
    t = pa.table({"text": ["Hello, world! This is a test sentence.", "x", ",,,,,"]})
    q = quality_stats()(t)
    assert q["n_words"].to_pylist() == [7, 1, 1]
    assert q["passes"].to_pylist() == [True, False, False]
    tc = token_count()(t)
    # Hello , world ! This is a test sentence .  → 10
    assert tc["n_tokens"].to_pylist()[0] == 10


def test_langid():
    t = pa.table(
        {
            "text": [
                "the cat sat on the mat and it was good",
                "der Hund ist in den Garten gelaufen und das war gut",
                "这是一个中文句子",
                "zzz qqq www",
            ]
        }
    )
    out = LangId()(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "zh", "und"]


def test_fingerprinter_stability():
    t = pa.table({"text": ["the quick brown fox", "the quick brown fox", "other doc"]})
    out = Fingerprinter()(t)
    fps = out["fp"].to_pylist()
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert out["fp_min"].to_pylist()[0] == min(fps[0])


def test_multimodal_stub_and_fake():
    t = synth_media_table(4)
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(t)
    out = DecodeImage(fake=True)(t)
    feats = out["features"].to_pylist()
    assert len(feats) == 4 and all(len(f) == 16 for f in feats)
    # deterministic
    again = DecodeImage(fake=True)(t)["features"].to_pylist()
    assert feats == again
    rz = ResizeImage(8, 6, fake=True)(t)
    assert rz["width"].to_pylist() == [8] * 4


def test_bin_pack_entries_size_and_partial():
    """MergeContent bin-packing: max-entries flush, max-size flush, and
    the trailing short bin routing 'partial' (age-out analog)."""
    from nifi_ray.stages.split_merge import bin_pack_fn

    g = pa.table(
        {
            "k": ["u"] * 7,
            "ord": [1, 2, 3, 4, 5, 6, 7],
            "sz": [10, 10, 10, 10, 10, 10, 10],
            "p": list("abcdefg"),
        }
    )
    # entries cap 3, min 3: bins [a,b,c] [d,e,f] merged, [g] partial
    out = bin_pack_fn("k", "ord", min_entries=3, max_entries=3, piece_col="p")(g)
    assert out["n_items"].to_pylist() == [3, 3, 1]
    assert out["relationship"].to_pylist() == ["merged", "merged", "partial"]
    assert out["merged"].to_pylist() == ["abc", "def", "g"]

    # size cap 25 (10+10 fits, +10 would exceed): bins of 2,2,2,1
    out2 = bin_pack_fn(
        "k", "ord", size_col="sz", min_entries=2, max_size=25, piece_col="p"
    )(g)
    assert out2["n_items"].to_pylist() == [2, 2, 2, 1]
    assert out2["total_size"].to_pylist() == [20, 20, 20, 10]
    assert out2["relationship"].to_pylist() == ["merged", "merged", "merged", "partial"]

    # min_size gate: a bin meeting entries but not size is partial
    out3 = bin_pack_fn(
        "k", "ord", size_col="sz", min_entries=1, max_entries=2, min_size=15
    )(g)
    assert out3["relationship"].to_pylist() == ["merged", "merged", "merged", "partial"]


def test_distribute_load_weighted_and_deterministic():
    import numpy as np

    from nifi_ray.stages.route import distribute_load

    t = pa.table({"id": pa.array(range(10000), pa.int64())})
    # keyless round-robin honors 1:2:1 weights exactly per batch
    fn = distribute_load([1, 2, 1])
    out = fn(t)
    counts = np.bincount(out["bucket"].to_numpy(), minlength=3)
    assert counts[1] == 2 * counts[0] == 2 * counts[2]
    # keyed: deterministic and roughly weighted
    fk = distribute_load([1, 3], key="id")
    a = fk(t)["bucket"].to_pylist()
    assert a == fk(t)["bucket"].to_pylist()
    frac = sum(a) / len(a)  # share of bucket 1 ≈ 3/4
    assert 0.65 < frac < 0.85
    import pytest

    with pytest.raises(ValueError):
        distribute_load([])
    with pytest.raises(ValueError):
        distribute_load([1, 0])


def test_redact_pii_counts_and_order():
    """Email digits must not be phone/IP-matched (emails redact first);
    counts reflect the sequential passes."""
    import pyarrow as pa

    from nifi_ray.stages.quality import redact_pii

    t = pa.table(
        {
            "text": [
                "mail a1@b.co and 10.0.0.1 call +1-555-0199",
                "no pii here",
                None,
            ]
        }
    )
    out = redact_pii("text")(t)
    assert out["text_redacted"].to_pylist() == [
        "mail <EMAIL> and <IP> call <PHONE>",
        "no pii here",
        None,
    ]
    assert out["n_pii_email"].to_pylist() == [1, 0, None]
    assert out["n_pii_ip"].to_pylist() == [1, 0, None]
    assert out["n_pii_phone"].to_pylist() == [1, 0, None]


def test_tokenizer_produces_lake_schema():
    import hashlib

    import pyarrow as pa

    from nifi_ray.stages.quality import Tokenizer

    t = pa.table({"text": ["hello world", "", None, "a1 b!"]})
    out = Tokenizer("text")(t)
    assert out.schema.field("tokens").type == pa.list_(pa.int32())
    assert out.schema.field("n_tok").type == pa.int32()
    assert out["n_tok"].to_pylist() == [2, 0, 0, 4]
    hid = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % (1 << 15)
    assert out["tokens"].to_pylist()[0] == [hid("hello"), hid("world")]
    assert out["tokens"].to_pylist()[3] == [hid("a"), hid("1"), hid("b"), hid("!")]


def test_segment_content_fixed_size_roundtrip():
    import pyarrow as pa

    from nifi_ray.stages.split_merge import segment_content

    tbl = pa.table({"fid": ["a", "b", "c"], "content": [b"0123456789", b"xy", None]})
    out = segment_content(segment_size=4)(tbl)
    a = out.filter(pa.compute.equal(out["fid"], "a"))
    assert a["segment"].to_pylist() == [b"0123", b"4567", b"89"]
    assert a["fragment_index"].to_pylist() == [0, 1, 2]
    assert a["fragment_count"].to_pylist() == [3, 3, 3]
    b = out.filter(pa.compute.equal(out["fid"], "b"))
    assert b["segment"].to_pylist() == [b"xy"]
    # reassembly closes the split->merge contract
    joined = b"".join(a["segment"].to_pylist())
    assert joined == b"0123456789"


def test_split_content_byte_sequence_keep_modes():
    import pyarrow as pa

    from nifi_ray.stages.split_merge import split_content

    tbl = pa.table({"content": [b"aa|bb|cc"]})
    assert split_content(byte_sequence=b"|")(tbl)["piece"].to_pylist() == [
        b"aa",
        b"bb",
        b"cc",
    ]
    assert split_content(byte_sequence=b"|", keep="trailing")(tbl)[
        "piece"
    ].to_pylist() == [b"aa|", b"bb|", b"cc"]
    assert split_content(byte_sequence=b"|", keep="leading")(tbl)[
        "piece"
    ].to_pylist() == [b"aa", b"|bb", b"|cc"]
    # keep modes preserve the original bytes on concat
    for keep in ("trailing", "leading"):
        got = b"".join(
            split_content(byte_sequence=b"|", keep=keep)(tbl)["piece"].to_pylist()
        )
        assert got == b"aa|bb|cc"
    # multi-byte sequence + empties dropped by default
    tbl2 = pa.table({"content": [b"x<>y<><>z"]})
    assert split_content(byte_sequence=b"<>")(tbl2)["piece"].to_pylist() == [
        b"x",
        b"y",
        b"z",
    ]


def test_ngram_repetition_edge_cases():
    from nifi_ray.stages.quality import ngram_repetition

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b a b a b",          # top 2-gram 'a b' ×3, 'b a' ×2
                "",                      # empty doc
                "word",                  # single token → no n-grams
                "x y z",                 # all grams unique
                "Go, go; GO!",           # case/punct folding → go go go
            ],
        }
    )
    out = ngram_repetition("text")(t)
    assert out["n_tok"].to_pylist() == [6, 0, 1, 3, 3]
    assert out["n_distinct"].to_pylist() == [2, 0, 1, 3, 1]
    assert out["top2_count"].to_pylist() == [3, 0, 0, 1, 2]
    assert out["n_2grams"].to_pylist() == [5, 0, 0, 2, 2]
    assert out["top3_count"].to_pylist() == [2, 0, 0, 1, 1]
    assert out["n_3grams"].to_pylist() == [4, 0, 0, 1, 1]
    # batch-composition invariance: stats for doc 0 alone are identical
    solo = ngram_repetition("text")(t.slice(0, 1))
    assert solo["top2_count"].to_pylist() == [3]


def test_compression_stats_gate():
    import zlib

    from nifi_ray.stages.quality import compression_stats

    rep = "spam " * 200                  # highly compressible → drop
    nat = "The quick brown fox jumps over the lazy dog. " * 3  # keep-ish
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [rep, nat, "", "short doc"],
        }
    )
    out = compression_stats("text")(t)
    assert out["n_bytes"].to_pylist() == [1000, 135, 0, 9]
    assert out["n_zlib"].to_pylist() == [
        len(zlib.compress(s.encode(), 6)) for s in t["text"].to_pylist()
    ]
    keep = out["keep"].to_pylist()
    assert keep[0] == 0                  # repetitive doc gated out
    assert keep[2] == 1 and keep[3] == 1  # sub-64-byte docs always keep
    # gate is pure integer arithmetic on the emitted columns
    nb, nz = out["n_bytes"].to_pylist(), out["n_zlib"].to_pylist()
    assert keep == [
        1 if (10 * z >= 3 * b or b < 64) else 0 for b, z in zip(nb, nz)
    ]


def test_explode_fixed_lines_and_reassemble():
    from nifi_ray.stages.dedup import (
        explode_fixed_lines,
        first_occurrence,
        reassemble_doc,
    )

    t = pa.table(
        {
            "doc_id": [10, 11, 12],
            "text": [
                "a b c d e f g h i j",   # 2 lines: 8 + 2
                "a b c d e f g h",       # 1 line, duplicate of doc 10's first
                "",                       # empty doc → sentinel only
            ],
        }
    )
    ex = explode_fixed_lines("text")(t)
    # 3 real lines + 3 sentinels
    assert len(ex) == 6
    lines = {
        (r["doc_id"], r["line_idx"]): r["line"] for r in ex.to_pylist()
    }
    assert lines[(10, 0)] == "a b c d e f g h"
    assert lines[(10, 1)] == "i j"
    assert lines[(11, 0)] == "a b c d e f g h"
    assert lines[(12, -1)] == ""
    # first-occurrence over the duplicate line keeps doc 10's copy
    dup_group = ex.filter(pc.equal(ex["dedup_key"], "a b c d e f g h"))
    kept = first_occurrence(dup_group)
    assert kept["doc_id"].to_pylist() == [10]
    # reassembly: doc 11 lost its only line → n_kept 0, md5('')
    import hashlib

    doc11 = ex.filter(
        pc.and_(pc.equal(ex["doc_id"], 11), pc.equal(ex["line_idx"], -1))
    )
    out = reassemble_doc(doc11)
    assert out["n_kept"].to_pylist() == [0]
    assert out["n_lines"].to_pylist() == [1]
    assert out["dedup_md5"].to_pylist() == [hashlib.md5(b"").hexdigest()]


def test_unigram_lm_and_tfidf(ray_session):
    import math

    import ray

    from nifi_ray.stages.quality import UnigramLM, tfidf_top_terms

    # corpus: 'a' ×3, 'b' ×2, 'c' ×1 → total 6
    t = pa.table({"doc_id": [0, 1, 2], "text": ["a a b", "A b; c!", ""]})
    ref = ray.put({"a": 3, "b": 2, "c": 1})
    out = UnigramLM(ref)(t)
    assert out["n_tok"].to_pylist() == [3, 3, 0]
    want0 = -(2 * math.log(3 / 6) + math.log(2 / 6)) / 3
    want1 = -(math.log(3 / 6) + math.log(2 / 6) + math.log(1 / 6)) / 3
    got = out["avg_nll"].to_pylist()
    assert abs(got[0] - want0) < 1e-12 and abs(got[1] - want1) < 1e-12
    assert got[2] == 0.0

    # tfidf: df(a)=2, df(b)=2, df(c)=1 over N=3
    idf = {w: int(np.floor(np.log(3 / d) * 1e6 + 0.5))
           for w, d in {"a": 2, "b": 2, "c": 1}.items()}
    top = tfidf_top_terms(idf, "text", k=3)(t)
    rows = [(r["doc_id"], r["rank"], r["term"]) for r in top.to_pylist()]
    # doc 0: a(tf2) > b(tf1); doc 1: c (idf ln3) > a = b (tie → term asc)
    assert rows == [(0, 1, "a"), (0, 2, "b"),
                    (1, 1, "c"), (1, 2, "a"), (1, 3, "b")]


def test_simhash_band_pairs_exact_recall():
    """4×16-bit banding + bucket Hamming verify must equal the O(n²)
    all-pairs scan at radius 3 (pigeonhole recall), including empty docs
    (signature 0) and pairs differing in a single band."""
    import itertools

    import ray.data as rd

    from nifi_ray.stages.dedup import (
        SimHasher, distinct_pairs, hamming64, simhash_band_rows,
        simhash_bucket_pairs,
    )

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = []
    for i in range(40):
        base = [words[j] for j in rng.integers(0, len(words), 12)]
        texts.append(" ".join(base))
    texts += ["", "", texts[0] + " alpha", texts[1]]  # dups + empties
    ids = [f"d{i:03d}" for i in range(len(texts))]
    t = pa.table({"doc_id": ids, "text": texts})

    sig_t = SimHasher()(t)
    sigs = np.array(sig_t["simhash"].to_pylist(), np.uint64)
    want = set()
    for i, j in itertools.combinations(range(len(ids)), 2):
        h = int(hamming64(sigs[i : i + 1], sigs[j : j + 1])[0])
        if h <= 3:
            a, b = sorted((ids[i], ids[j]))
            want.add((a, b, h))
    assert want, "fixture must produce at least one near pair"

    bands = rd.from_arrow(sig_t.select(["doc_id", "simhash"])).map_batches(
        simhash_band_rows(bands=4), batch_format="pyarrow"
    )
    pairs = distinct_pairs(
        simhash_bucket_pairs(bands, max_ham=3), cols=("a", "b", "hamming")
    )
    got = {
        (r["a"], r["b"], r["hamming"]) for r in pairs.take_all()
    }
    assert got == want


def test_simhash_degenerate_bucket_exact(ray_session):
    """A bucket larger than the old 1024 cap but made of IDENTICAL
    signatures (the 'every empty doc at signature 0' case) must emit
    ALL intra-cluster pairs — the signature-collapse path never drops
    candidates (r4 ADVICE: capping silently broke the exact-recall
    claim)."""
    import ray.data as rd

    from nifi_ray.stages.dedup import simhash_band_rows, simhash_bucket_pairs

    n = 1200  # > the old max_bucket=1024
    t = pa.table(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "simhash": pa.array([0] * n, pa.uint64()),
        }
    )
    # one band → one bucket; no distinct pass needed (each pair appears
    # once), so the test is O(output) and checks the bucket kernel alone
    bands = rd.from_arrow(t).map_batches(
        simhash_band_rows(bands=1), batch_format="pyarrow"
    )
    pairs = simhash_bucket_pairs(bands, max_ham=3)
    assert pairs.count() == n * (n - 1) // 2
    one = pairs.take(1)[0]
    assert one["hamming"] == 0


def test_simhash_unique_sig_overflow_raises(ray_session):
    """>max_bucket UNIQUE signatures in one band bucket must raise
    loudly, never silently drop candidate pairs."""
    import pytest
    import ray.data as rd

    from nifi_ray.stages.dedup import simhash_band_rows, simhash_bucket_pairs

    n = 12  # distinct high bits, identical band 0 (low 16 bits)
    t = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "simhash": pa.array([i << 16 for i in range(n)], pa.uint64()),
        }
    )
    bands = rd.from_arrow(t).map_batches(
        simhash_band_rows(bands=4), batch_format="pyarrow"
    )
    with pytest.raises(Exception, match="unique signatures"):
        simhash_bucket_pairs(bands, max_ham=3, max_bucket=8).take_all()


def test_dedup_spans_fallback_matches_broadcast(ray_session, monkeypatch):
    """The partitioned semi-join fallback (budget exceeded) must produce
    byte-identical output to the broadcast-set path."""
    from nifi_ray.oracle_expected import expected_dedup_spans
    from nifi_ray.pipelines.queries import q_dedup_spans

    sf = "/root/testdata/sf0.001"
    want = (
        expected_dedup_spans(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setenv("NIFI_RAY_BROADCAST_BUDGET", "1")  # force fallback
    got = (
        q_dedup_spans(sf)
        .to_pandas()[["doc_id", "text_clean", "n_removed"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want[["doc_id", "text_clean", "n_removed"]])


def test_pagerank_tiny_graph(ray_session):
    """3-node cycle + 1 dangling sink: ranks must sum to ~1 and the
    sink (receiving from every node's dangling redistribution plus one
    in-edge) must outrank the cycle members feeding it."""
    import ray.data as rd

    from nifi_ray.stages.components import pagerank_ds

    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3, 1], pa.int64()),
                "dst": pa.array([2, 3, 1, 4], pa.int64()),
            }
        )
    )
    out = {r["node"]: r["r"] for r in pagerank_ds(edges, iters=10).take_all()}
    assert set(out) == {1, 2, 3, 4}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    # 2 and 4 each receive exactly half of 1's vote → identical ranks;
    # 1 receives 3's whole vote → strictly above both
    assert out[4] == out[2]
    assert out[1] > out[2]
    assert all(v > 0 for v in out.values())
