"""Unit tests for the training-export stages (stages/packing.py):
sequence packing, deterministic shuffle keys, weighted mixing,
n-gram decontamination."""

import pyarrow as pa

from nifi_ray.stages.packing import (
    NgramDecontaminator,
    derived_weight,
    doc_ngrams,
    pack_group,
    shuffle_key,
    weighted_mix_filter,
)


def test_pack_group_concat_and_chunk():
    g = pa.table({
        "lang": ["en"] * 3,
        "doc_id": [2, 0, 1],  # unsorted on purpose: fn must order by doc_id
        "tokens": [[20, 21], [1, 2, 3], [10]],
    })
    out = pack_group(4)(g)
    # concat order is doc_id asc: 1 2 3 | 10 | 20 21 -> [1,2,3,10], [20,21]
    assert out["seq_idx"].to_pylist() == [0, 1]
    assert out["tokens"].to_pylist() == [[1, 2, 3, 10], [20, 21]]
    assert out["n_tok"].to_pylist() == [4, 2]
    assert out["tok_sum"].to_pylist() == [16, 41]
    assert out["lang"].to_pylist() == ["en", "en"]
    assert out.schema.field("tokens").type == pa.list_(pa.int32())


def test_pack_group_empty_and_exact_boundary():
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "tokens": pa.array([], pa.list_(pa.int32()))})
    assert pack_group(4)(empty).num_rows == 0
    g = pa.table({"lang": ["en"], "doc_id": [0], "tokens": [[1, 2, 3, 4]]})
    out = pack_group(4)(g)
    assert out["n_tok"].to_pylist() == [4]  # no empty trailing sequence


def test_shuffle_key_seeded_and_deterministic():
    t = pa.table({"doc_id": [1, 2, 3]})
    a = shuffle_key("doc_id", seed=7)(t)["shuffle_key"].to_pylist()
    b = shuffle_key("doc_id", seed=7)(t)["shuffle_key"].to_pylist()
    c = shuffle_key("doc_id", seed=8)(t)["shuffle_key"].to_pylist()
    assert a == b and a != c
    assert len(set(a)) == 3


def test_weighted_mix_filter_replayable_and_unknown_source_dropped():
    t = pa.table({"doc_id": list(range(100)),
                  "source": ["a"] * 50 + ["zzz"] * 50})
    out = weighted_mix_filter({"a": 1.0})(t)
    assert out["source"].to_pylist() == ["a"] * 50  # w=1 keeps all, unknown w=0 drops
    half = weighted_mix_filter({"a": 0.5})(t)
    assert 0 < half.num_rows < 50
    again = weighted_mix_filter({"a": 0.5})(t)
    assert half["doc_id"].to_pylist() == again["doc_id"].to_pylist()
    assert 0.25 <= derived_weight("any-name") <= 1.0


def test_ngram_decontaminator_flags_overlap():
    t = pa.table({"text": [
        "the quick brown fox jumps over dogs",   # shares 5-gram with bench
        "completely different words here now ok",
        "short one",                             # < n words -> never flagged
        None,
    ]})
    bench = doc_ngrams("text", n=5)(pa.table({
        "text": ["xx the quick brown fox jumps yy"]}))
    grams = set(pa.compute.list_flatten(bench["ngrams"]).to_pylist())
    out = NgramDecontaminator(grams, "text", 5)(t)
    assert out["contaminated"].to_pylist() == [True, False, False, False]


def test_temperature_mix_weights_balance_sources():
    # the temperature recipe: rarest source keeps everything, head
    # sources downsample toward balance, monotone in count
    counts = {"rare": 100, "mid": 1000, "head": 10000}
    c_min = min(counts.values())
    alpha = 0.3
    w = {s: min(1.0, (c_min / c) ** (1.0 - alpha)) for s, c in counts.items()}
    assert w["rare"] == 1.0
    assert w["head"] < w["mid"] < 1.0
    # expected kept mass c_s * w_s = c_min^(1-a) * c_s^a grows sublinearly
    kept = {s: counts[s] * w[s] for s in counts}
    assert kept["head"] / kept["rare"] < counts["head"] / counts["rare"] / 10


def test_weighted_sample_key_matches_scalar_and_prunes():
    import hashlib

    import numpy as np

    from nifi_ray.stages.packing import weighted_sample_key_fn

    ids = list(range(40))
    w = [10 + (i % 7) * 50 for i in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "n_chars": pa.array(w, pa.int64())})
    out = weighted_sample_key_fn("n_chars", "doc_id", k=5)(t)
    # local prune: only k rows survive the block
    assert out.num_rows == 5
    # scalar replay of the A-ES key for every input row
    def key(i, wi):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
        u = (h + 0.5) / 2.0**32
        import math
        return math.floor(math.log(u) / wi * 1e9 + 0.5)
    keys = sorted(((key(i, wi), -i) for i, wi in zip(ids, w)), reverse=True)[:5]
    expect = sorted(-neg_i for _, neg_i in keys)
    assert sorted(out["doc_id"].to_pylist()) == expect
    assert out["key_micro"].to_pylist() == [key(i, dict(zip(ids, w))[i]) for i in out["doc_id"].to_pylist()]
    # batch-split invariance of the global winner set: union of two
    # block-local top-5s contains the global top-5
    a = weighted_sample_key_fn("n_chars", "doc_id", k=5)(t.slice(0, 17))
    b = weighted_sample_key_fn("n_chars", "doc_id", k=5)(t.slice(17))
    union = set(a["doc_id"].to_pylist()) | set(b["doc_id"].to_pylist())
    assert set(expect) <= union


# ----------------------------------------------------------------- DSIR


def test_dsir_weights_batch_composition_invariant():
    import numpy as np
    import pyarrow as pa

    from nifi_ray.stages.packing import (
        DSIR_B,
        DsirScore,
        dsir_count_partials_fn,
        dsir_log_ratio_micro,
    )

    texts = [
        "the quick brown fox", "le renard brun", "hello world hello",
        "", "the the the", None, "zz9 top",
    ]
    langs = ["en", "fr", "en", "en", "fr", "en", "fr"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": langs,
        }
    ).append_column(
        "is_tgt", pa.array([l == "en" for l in langs])
    )

    fn = dsir_count_partials_fn("text", "is_tgt")
    whole = fn(tbl)
    tgt_w = np.asarray(whole["tgt"][0].as_py(), np.int64)
    raw_w = np.asarray(whole["raw"][0].as_py(), np.int64)
    # any split merges to the same counts (incl. trailing empty/null doc)
    for cut in (1, 3, 5, 6):
        a, b = fn(tbl.slice(0, cut)), fn(tbl.slice(cut))
        assert np.array_equal(
            np.asarray(a["tgt"][0].as_py()) + np.asarray(b["tgt"][0].as_py()),
            tgt_w,
        )
        assert np.array_equal(
            np.asarray(a["raw"][0].as_py()) + np.asarray(b["raw"][0].as_py()),
            raw_w,
        )

    lr = dsir_log_ratio_micro(tgt_w, raw_w)
    score = DsirScore(lr)
    w_whole = score(tbl)["dsir_w"].to_pylist()
    for cut in (1, 4, 6):
        w_split = (
            score(tbl.slice(0, cut))["dsir_w"].to_pylist()
            + score(tbl.slice(cut))["dsir_w"].to_pylist()
        )
        assert w_split == w_whole
    # empty and null docs weigh exactly 0
    assert w_whole[3] == 0 and w_whole[5] == 0
