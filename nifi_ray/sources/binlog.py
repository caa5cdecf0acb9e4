"""WAL/binlog-tail source: incremental, watermark-bounded event reads.

Semantics recreated from the reference (NOT the implementation):

- TailFile resumes a rolling file from a checkpointed position and
  detects rollover (reference
  nifi-standard-processors/.../standard/TailFile.java:463-527): here the
  "position" is the lake's ``applied_through`` LSN and "rollover" is a
  new event file appearing in the log directory.
- QueryDatabaseTable issues ``WHERE maxcol > $state`` with the state in
  Scope.CLUSTER (reference
  nifi-standard-processors/.../standard/QueryDatabaseTable.java:186-348):
  here the predicate is an Arrow dataset filter pushed into Parquet
  row-group pruning.
- ListFile's listing watermark (only newer files re-listed, reference
  nifi-standard-processors/.../standard/AbstractListProcessor.java:148-316):
  here whole files are skipped via their Parquet FOOTER max(lsn)
  statistics — no data pages are read for fully-applied files.

At 100 TB the footer prune is load-bearing: a tail poll that has to
open yesterday's event files is a non-starter; metadata-only pruning
makes each tick O(new data).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.parquet as pq


@dataclass
class FilePruneStats:
    total: int
    kept: int
    skipped_by_footer: int


def list_event_files(path: str | list[str]) -> list[str]:
    """Expand a log directory (or explicit paths) into sorted parquet files."""
    if isinstance(path, str):
        paths = [path]
    else:
        paths = list(path)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            out.append(p)
    return out


def file_lsn_range(path: str, column: str = "lsn") -> tuple[int | None, int | None]:
    """(min, max) of ``column`` from the parquet footer statistics only."""
    md = pq.read_metadata(path)
    # get_field_index returns -1 (never raises) for a missing column
    ci = md.schema.to_arrow_schema().get_field_index(column)
    if ci < 0:
        return None, None
    lo = hi = None
    for rg in range(md.num_row_groups):
        stats = md.row_group(rg).column(ci).statistics
        if stats is None or not stats.has_min_max:
            return None, None  # no stats → cannot prune safely
        lo = stats.min if lo is None else min(lo, stats.min)
        hi = stats.max if hi is None else max(hi, stats.max)
    return lo, hi


def prune_event_files(
    paths: list[str], watermark: int, lsn_hi: int | None = None
) -> tuple[list[str], FilePruneStats]:
    """Keep only files that can contain events in (watermark, lsn_hi]."""
    kept = []
    for p in paths:
        lo, hi = file_lsn_range(p)
        if hi is not None and hi <= watermark:
            continue
        if lsn_hi is not None and lo is not None and lo > lsn_hi:
            continue
        kept.append(p)
    return kept, FilePruneStats(
        total=len(paths), kept=len(kept), skipped_by_footer=len(paths) - len(kept)
    )


def check_lsn_continuity(
    paths: list[str], expect_from: int
) -> tuple[bool, list[tuple[int, int]]]:
    """TailFile's checksum-resume analog: verify the file set covers a
    contiguous LSN range starting at ``expect_from`` (gaps are allowed
    by the LSN contract but a MISSING FILE between watermark and the
    first available lsn means lost events). Returns (ok, gaps) where
    gaps are (covered_up_to, next_available) holes between files."""
    ranges = sorted(
        r for p in paths if (r := file_lsn_range(p)) and r[0] is not None
    )
    gaps: list[tuple[int, int]] = []
    cur = expect_from
    for lo, hi in ranges:
        if lo > cur + 1:
            gaps.append((cur, lo))
        cur = max(cur, hi)
    return not gaps, gaps
