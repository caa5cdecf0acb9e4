"""Bloom-filter decontamination: no false negatives vs the exact-set
probe, bounded false positives, vectorized gram hashing equals a
scalar dual implementation."""

import re

import numpy as np
import pyarrow as pa
import pytest

from nifi_ray.stages.bloom import (
    BloomDecontaminator,
    BloomFilter,
    gram_hashes,
    _words_per_doc,
)
from nifi_ray.stages.packing import NgramDecontaminator


def _scalar_words(t):
    return re.findall(r"[a-z0-9]+", (t or "").lower())


def test_words_per_doc_matches_re_findall():
    docs = [
        "Hello, World! 123",
        "",
        None,
        "a--b__c  d",
        "!!!",
        "ALLCAPS lower 42x7",
    ]
    flat, lens = _words_per_doc(pa.array(docs, pa.string()))
    got = flat.to_pylist()
    exp = [w for d in docs for w in _scalar_words(d)]
    assert got == exp
    assert lens.tolist() == [len(_scalar_words(d)) for d in docs]


def test_gram_hashes_doc_boundaries_and_short_docs():
    # doc with < n words contributes zero grams; grams never span docs
    docs = ["a b c d e", "x y", "p q r s t u"]
    h, glens = gram_hashes(pa.array(docs), n=5)
    assert glens.tolist() == [1, 0, 2]
    assert len(h) == 3
    # the same gram text in different docs hashes identically
    h2, _ = gram_hashes(pa.array(["a b c d e", "z z a b c d e"]), n=5)
    assert h2[0] == h[0]
    # and the trailing gram of doc2 ("a b c d e") equals it too
    assert h2[-1] == h[0]
    # distinct grams hash distinctly (collision would be 2^-64)
    assert len(np.unique(h)) == 3


def test_bloom_no_false_negatives_vs_exact_probe(ray_session):
    import ray
    import ray.data

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    bench = [
        " ".join(rng.choice(vocab, size=12)) for _ in range(50)
    ]
    # corpus: half contain a full benchmark 5-gram, half are clean
    corpus = []
    for i in range(100):
        filler = " ".join(rng.choice(vocab, size=20))
        if i % 2 == 0:
            snip = " ".join(_scalar_words(bench[i % 50])[:5])
            corpus.append(f"{filler} {snip} {filler}")
        else:
            corpus.append(" ".join(f"clean{i}x{j}" for j in range(20)))
    bloom = BloomFilter.build_from_texts(bench, n=5, fp_rate=0.001)
    bloom_ref = ray.put(bloom)
    bench_grams = {
        " ".join(ws[i : i + 5])
        for b in bench
        for ws in [_scalar_words(b)]
        for i in range(len(ws) - 4)
    }
    ds = ray.data.from_arrow(pa.table({"text": corpus}))
    exact = ds.map_batches(
        NgramDecontaminator,
        fn_constructor_args=[ray.put(bench_grams)],
        concurrency=1,
        batch_format="pyarrow",
    ).take_all()
    bloomed = ds.map_batches(
        BloomDecontaminator,
        fn_constructor_args=[bloom_ref],
        concurrency=1,
        batch_format="pyarrow",
    ).take_all()
    exact_flags = [r["contaminated"] for r in exact]
    bloom_flags = [r["contaminated"] for r in bloomed]
    assert all(e <= b for e, b in zip(exact_flags, bloom_flags))  # superset
    assert [i % 2 == 0 for i in range(100)] == exact_flags
    # on this corpus the bloom answer is exact too (fp_rate is tiny)
    assert bloom_flags == exact_flags


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(3)
    bench = [" ".join(f"b{rng.integers(1e9)}" for _ in range(10)) for _ in range(200)]
    bloom = BloomFilter.build_from_texts(bench, n=5, fp_rate=0.01)
    # 20k probe grams guaranteed absent (disjoint vocabulary)
    probes = pa.array(
        [" ".join(f"q{i}x{j}" for j in range(5)) for i in range(20000)]
    )
    h, _ = gram_hashes(probes, n=5)
    fp = bloom.contains_hashes(h).mean()
    assert fp < 0.03  # 3x headroom over the configured 1%


def test_bloom_memory_is_bits_not_strings():
    bench = [" ".join(f"t{i}g{j}" for j in range(30)) for i in range(1000)]
    bloom = BloomFilter.build_from_texts(bench, n=5, fp_rate=0.001)
    n_grams = 1000 * 26
    assert bloom.nbytes < n_grams * 4  # ~1.8 bytes/gram at 0.1% fp
    assert bloom.k >= 5


def test_empty_and_null_batches():
    bloom = BloomFilter.build_from_texts(["a b c d e"], n=5)
    dec = BloomDecontaminator(bloom)
    out = dec(pa.table({"text": pa.array([None, "", "short doc"], pa.string())}))
    assert out["contaminated"].to_pylist() == [False, False, False]
    out2 = dec(pa.table({"text": pa.array(["x a b c d e y"], pa.string())}))
    assert out2["contaminated"].to_pylist() == [True]


def test_token_gram_hashes_matches_scalar_dual():
    from nifi_ray.stages.bloom import token_gram_hashes
    from nifi_ray.util.hashing import mix_u64

    docs = [[1, 2, 3, 4, 5, 6], [7, 8], None, [], [9, 10, 11, 12, 13]]
    h, glens = token_gram_hashes(pa.array(docs, pa.list_(pa.int32())), n=5)
    assert glens.tolist() == [2, 0, 0, 0, 1]

    def scalar(gram):
        GOLDEN = np.uint64(0x9E3779B97F4A7C15)
        ws = [mix_u64(np.array([t], np.uint64))[0] for t in gram]
        acc = ws[0]
        for w in ws[1:]:
            acc = mix_u64(np.array([acc * GOLDEN ^ w], np.uint64))[0]
        return acc

    with np.errstate(over="ignore"):
        exp = [scalar([1, 2, 3, 4, 5]), scalar([2, 3, 4, 5, 6]), scalar([9, 10, 11, 12, 13])]
    assert h.tolist() == exp


def test_token_mode_decontaminator_on_lake_schema():
    from nifi_ray.stages.bloom import BloomFilter, token_gram_hashes

    bench_tokens = pa.array([[5, 6, 7, 8, 9, 10]], pa.list_(pa.int32()))
    h, _ = token_gram_hashes(bench_tokens, n=5)
    bloom = BloomFilter(len(np.unique(h)))
    bloom.add_hashes(np.unique(h))
    dec = BloomDecontaminator(bloom, col="tokens", n=5, mode="tokens")
    batch = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array(
                [[1, 2, 5, 6, 7, 8, 9, 3], [1, 2, 3, 4, 5, 6], None],
                pa.list_(pa.int32()),
            ),
        }
    )
    assert dec(batch)["contaminated"].to_pylist() == [True, False, False]


def test_case_fold_parity_exact_vs_bloom_nonascii():
    """One shared case fold (Arrow utf8_lower) on BOTH decontamination
    paths: full-mapping str.lower tokenizes 'AİB' as ['ai̇b'] ≠ the
    simple mapping's ['aib'], so a mixed fold would let bloom and the
    exact set disagree on non-ASCII text (ADVICE r3)."""
    bench = ["AİB c d e f", "ΣA b c d e"]
    corpus = ["aib c d e f tail", "σa b c d e tail", "clean doc with words here"]
    n = 5
    from nifi_ray.stages.packing import doc_ngrams

    bench_t = pa.table({"text": pa.array(bench, pa.string())})
    grams = {
        g
        for lst in doc_ngrams("text", n=n)(bench_t)["ngrams"].to_pylist()
        for g in lst
    }
    exact = NgramDecontaminator(grams, n=n)
    t = pa.table({"text": pa.array(corpus, pa.string())})
    exact_flags = exact(t)["contaminated"].to_pylist()

    bloom = BloomFilter.build_from_texts(pa.array(bench, pa.string()), n=n, fp_rate=1e-9)
    bloom_flags = BloomDecontaminator(bloom, n=n)(t)["contaminated"].to_pylist()

    assert exact_flags == bloom_flags == [True, True, False]


def test_u64set_exact_membership():
    from nifi_ray.stages.bloom import U64Set

    bench = [" ".join(f"s{i}w{j}" for j in range(10)) for i in range(100)]
    uset = U64Set.build_from_texts(bench, n=5)
    present, _ = gram_hashes(pa.array(bench), n=5)
    assert uset.contains_hashes(present).all()
    # disjoint vocabulary: EXACT means zero positives, not fp-bounded
    absent, _ = gram_hashes(
        pa.array([" ".join(f"q{i}x{j}" for j in range(5)) for i in range(20000)]),
        n=5,
    )
    assert not uset.contains_hashes(absent).any()
    # probes past the end of the sorted array (max-valued hashes) are safe
    assert not uset.contains_hashes(np.array([np.iinfo(np.uint64).max], np.uint64)).any()
    empty = U64Set(np.empty(0, np.uint64))
    assert not empty.contains_hashes(present).any()
    assert uset.contains_hashes(np.empty(0, np.uint64)).size == 0


def test_u64set_decontaminator_equals_exact_plain_callable():
    # BloomDecontaminator duck-types the filter: U64Set drops in, and as
    # a plain pa.Table callable (no Ray session needed)
    from nifi_ray.stages.bloom import U64Set

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    bench = [" ".join(rng.choice(vocab, size=12)) for _ in range(50)]
    corpus = []
    for i in range(100):
        filler = " ".join(rng.choice(vocab, size=20))
        if i % 2 == 0:
            snip = " ".join(_scalar_words(bench[i % 50])[:5])
            corpus.append(f"{filler} {snip} {filler}")
        else:
            corpus.append(" ".join(f"clean{i}x{j}" for j in range(20)))
    uset = U64Set.build_from_texts(bench, n=5)
    dec = BloomDecontaminator(uset)
    out = dec(pa.table({"text": pa.array(corpus, pa.string())}))
    assert out["contaminated"].to_pylist() == [i % 2 == 0 for i in range(100)]


def test_u64set_memory_8_bytes_per_gram():
    from nifi_ray.stages.bloom import U64Set

    bench = [" ".join(f"t{i}g{j}" for j in range(30)) for i in range(1000)]
    uset = U64Set.build_from_texts(bench, n=5)
    n_grams = 1000 * 26
    assert uset.nbytes <= n_grams * 8
    assert uset.nbytes >= uset.sorted.size * 8
