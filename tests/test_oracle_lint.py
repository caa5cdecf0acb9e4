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
