"""Registry-representation lint: no graded oracle table may carry a
full-range uint64 column. Driver-side value hashing coerces through
signed/float paths, so values > 2^63 flip on one side — queries must
ship 64-bit signatures as fixed-width hex strings (the r3 simhash /
winnow_fingerprints driver hash-fails). This pins the EXPECTED side;
tools/check_correctness.py applies the same lint to the query side."""

import pyarrow as pa

from nifi_ray.oracle_expected import EXPECTED_BUILDERS

SF = "/root/testdata/sf0.001"


def test_no_uint64_in_expected_tables():
    bad = {}
    for name, builder in EXPECTED_BUILDERS.items():
        tbl = builder(SF)
        u64 = [
            f.name for f in tbl.schema
            if f.type in (pa.uint64(), pa.uint32())
        ]
        if u64:
            bad[name] = u64
    assert not bad, f"unsigned-wide columns in expected tables: {bad}"


def test_no_duplicate_toplevel_defs_or_dict_keys():
    """A same-named top-level def/class silently shadows the earlier
    one (this broke session_windows/lag_prev_value in round 4 when a
    second sessionize_fn/lag_fn was appended); a repeated literal dict
    key silently drops the earlier entry. Reject both everywhere."""
    import ast
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "nifi_ray")
    bad = []
    for f in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        tree = ast.parse(open(f).read())
        seen = set()
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                if node.name in seen:
                    bad.append((f, node.name))
                seen.add(node.name)
        for node in ast.walk(tree):
            if isinstance(node, ast.Dict):
                keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
                bad.extend((f, k) for k in {k for k in keys if keys.count(k) > 1})
    assert not bad, bad
