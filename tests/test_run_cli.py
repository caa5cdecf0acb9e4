from nifi_ray.gen import GenConfig, write_base, write_events
from nifi_ray.pipelines.run import main
from nifi_ray.state.manifest import load_manifest

CFG = GenConfig(seed=23, n_docs=120, n_events=700)


def test_cli_init_replay_resume(ray_session, tmp_path, capsys):
    base, ev, lake = (str(tmp_path / d) for d in ("b", "e", "l"))
    write_base(CFG, base, shards=1)
    write_events(CFG, ev, shards=2)
    rc = main(["--base", base, "--events", ev, "--lake", lake, "--partitions", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"event": "INIT"' in out and '"event": "TICK"' in out and '"event": "LAG"' in out
    m = load_manifest(lake)
    assert m.applied_through == CFG.n_events
    # second invocation: nothing to do, still exits 0, no new tick
    rc = main(["--events", ev, "--lake", lake])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert '"event": "TICK"' not in out2
    assert '"lag": 0' in out2


def test_cli_ticked_with_gc(ray_session, tmp_path, capsys):
    base, ev, lake = (str(tmp_path / d) for d in ("b", "e", "l"))
    write_base(CFG, base, shards=1)
    write_events(CFG, ev, shards=2)
    rc = main(
        ["--base", base, "--events", ev, "--lake", lake, "--partitions", "4",
         "--tick", "250", "--gc"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count('"event": "TICK"') == 3  # 700 events / 250 per tick
    assert '"event": "GC"' in out
    m = load_manifest(lake)
    assert m.applied_through == CFG.n_events


def test_cli_missing_base_errors(ray_session, tmp_path):
    ev = str(tmp_path / "e")
    write_events(CFG, ev, shards=1)
    rc = main(["--events", ev, "--lake", str(tmp_path / "nolake")])
    assert rc == 2


def test_cli_export_shards(ray_session, tmp_path, capsys):
    import json
    import os

    base, ev, lake, out = (str(tmp_path / d) for d in ("b", "e", "l", "shards"))
    write_base(CFG, base, shards=1)
    write_events(CFG, ev, shards=2)
    rc = main(["--base", base, "--events", ev, "--lake", lake, "--partitions", "4",
               "--export-shards", out, "--max-seq-len", "64"])
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    exp = next(e for e in lines if e["event"] == "EXPORT")
    assert exp["shards"] == 4 and exp["n_seqs"] > 0
    assert len([f for r, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")]) == 4


def test_cli_maintain_creates_and_refreshes_consumers(ray_session, tmp_path, capsys):
    """--maintain on a first run creates the view + both indexes; on a
    later run (new events) it refreshes them to the new version."""
    from nifi_ray.pipelines.ann_index import _load_manifest as ann_manifest
    from nifi_ray.pipelines.dedup_index import load_index_manifest
    from nifi_ray.pipelines.matview import read_aggregate

    base, ev, lake = (str(tmp_path / d) for d in ("b", "e", "l"))
    write_base(CFG, base, shards=1)
    write_events(CFG, ev, shards=2)
    rc = main(
        ["--base", base, "--events", ev, "--lake", lake, "--partitions", "4",
         "--lsn-end", "400", "--mode", "delta", "--maintain"]
    )
    assert rc == 0
    assert '"event": "MAINTAIN"' in capsys.readouterr().out
    from nifi_ray.pipelines.cdc import CDCLake

    lk = CDCLake(lake)
    v1 = lk.manifest().version
    assert load_index_manifest(lake, "nd")["version"] == v1
    assert ann_manifest(lake, "ann")["version"] == v1

    rc = main(["--events", ev, "--lake", lake, "--mode", "delta", "--maintain"])
    assert rc == 0
    v2 = lk.manifest().version
    assert v2 > v1
    assert load_index_manifest(lake, "nd")["version"] == v2
    assert ann_manifest(lake, "ann")["version"] == v2
    agg = read_aggregate(lk, "by_source")
    assert agg.num_rows > 0
