"""External-command stages — ExecuteStreamCommand / ExecuteProcess /
LogAttribute analogs (reference nifi-standard-processors/src/main/java/
org/apache/nifi/processors/standard/ExecuteStreamCommand.java:131-135
writes execution.command/.command.args/.status/.error attributes;
ExecuteProcess.java turns a command's stdout into new flowfiles;
LogAttribute.java logs and passes through unchanged).

``ExecuteStreamCommand`` is an actor-pool ``map_batches`` stage: one
subprocess per ROW (one per flowfile in the reference too — the
parallelism axis is the actor pool, not a per-batch shell). Stdout
becomes the ``cmd_output`` column (content destination) or a truncated
attribute column (the reference's Output Destination Attribute + Max
Attribute Length), stderr tail and exit status become
``execution_error`` / ``execution_status`` so nonzero exits route
downstream instead of raising — at 100 TB one bad record must never
kill a block retry. Per-row argument templating (``{col}`` placeholders
filled from the row) mirrors the reference's EL-in-arguments.

This is inherently a process-per-record operator; it exists for parity
and glue, not hot paths — a vectorized Arrow kernel is always the
right hot-path spelling (see stages/codec.py, stages/text.py).
"""

from __future__ import annotations

import pyarrow as pa

_STDERR_CAP = 4000  # reference caps execution.error at ~4KB of stderr


class ExecuteStreamCommand:
    """Pipe each row's ``content_col`` through ``argv``; argv entries
    may hold ``{column}`` placeholders filled per row. Appends
    ``cmd_output`` (binary | truncated string per ``output``),
    ``execution_status`` (int32, -1 spawn/timeout/template failure) and
    ``execution_error`` (string | null).

    SECURITY: row data interpolated into a ``sh -c`` argv entry is
    shell-interpreted — with untrusted row content that is command
    injection. Template into a plain argv element (each element is one
    execve arg, never shell-parsed) or pre-sanitize the column; this
    mirrors the reference's EL-in-arguments caveat
    (ExecuteStreamCommand.java Command Arguments property)."""

    def __init__(
        self,
        argv: list[str],
        content_col: str = "content",
        output: str = "content",  # "content" | "attribute"
        max_attr_len: int = 256,
        ignore_stdin: bool = False,
        timeout: float = 60.0,
        cwd: str | None = None,
    ):
        if output not in ("content", "attribute"):
            raise ValueError("output must be 'content' or 'attribute'")
        self.argv = list(argv)
        self.content_col, self.output = content_col, output
        self.max_attr_len, self.ignore_stdin = max_attr_len, ignore_stdin
        self.timeout, self.cwd = timeout, cwd
        self.templated = any("{" in a for a in self.argv)

    def _one(self, content, row: dict) -> tuple[bytes | None, int, str | None]:
        import subprocess

        # templating must honor the never-raise contract: a missing
        # column, stray '{' or bad format spec in an argv entry routes
        # to execution_status = -1 like any other per-row fault instead
        # of killing the whole block retry
        try:
            argv = (
                [a.format(**row) if "{" in a else a for a in self.argv]
                if self.templated
                else self.argv
            )
        except Exception as e:  # noqa: BLE001 — str.format can also raise
            # AttributeError ('{x.y}') / TypeError ('{x[0]}' on a
            # non-subscriptable value); the contract is NEVER raise
            return None, -1, f"argv template error: {type(e).__name__}: {e}"
        stdin = None
        if not self.ignore_stdin:
            if content is None:
                return None, -1, "null content"
            stdin = content.encode() if isinstance(content, str) else bytes(content)
        try:
            proc = subprocess.run(
                argv,
                input=stdin,
                capture_output=True,
                timeout=self.timeout,
                cwd=self.cwd,
            )
        except subprocess.TimeoutExpired:
            return None, -1, f"timeout after {self.timeout}s"
        except OSError as e:
            return None, -1, f"{type(e).__name__}: {e}"
        err = proc.stderr[-_STDERR_CAP:].decode("utf-8", "replace") or None
        return proc.stdout, proc.returncode, err

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = (
            batch[self.content_col].to_pylist()
            if self.content_col in batch.column_names
            else [None] * batch.num_rows
        )
        rows = batch.to_pylist() if self.templated else [{}] * batch.num_rows
        outs, stats, errs = [], [], []
        for content, row in zip(contents, rows):
            o, s, e = self._one(content, row)
            outs.append(o), stats.append(s), errs.append(e)
        if self.output == "attribute":
            out_col = pa.array(
                [
                    None if o is None else o.decode("utf-8", "replace")[: self.max_attr_len]
                    for o in outs
                ],
                pa.string(),
            )
        else:
            out_col = pa.array(outs, pa.binary())
        return (
            batch.append_column("cmd_output", out_col)
            .append_column("execution_status", pa.array(stats, pa.int32()))
            .append_column("execution_error", pa.array(errs, pa.string()))
        )


def execute_process(
    argv: list[str],
    split_lines: bool = True,
    redirect_stderr: bool = False,
    timeout: float = 60.0,
    cwd: str | None = None,
) -> pa.Table:
    """ExecuteProcess.java analog (source): run ``argv`` once and return
    its stdout as a table — one row per line when ``split_lines`` (the
    reference's batch framing) else one row holding the whole stream.
    ``redirect_stderr`` merges stderr into the content exactly like the
    reference's Redirect Error Stream property. Wrap with
    ``ray.data.from_arrow`` to enter a pipeline; schedule re-runs the
    way the reference schedules the processor."""
    import subprocess

    proc = subprocess.run(
        argv,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT if redirect_stderr else subprocess.PIPE,
        timeout=timeout,
        cwd=cwd,
    )
    if split_lines:
        text = proc.stdout.decode("utf-8", "replace")
        lines = text.splitlines()
        content = pa.array(lines, pa.string())
    else:
        content = pa.array([proc.stdout], pa.binary())
    n = len(content)
    return pa.table(
        {
            "content": content,
            "execution_status": pa.array([proc.returncode] * n, pa.int32()),
        }
    )


def log_attributes(
    cols: list[str] | None = None,
    level: int = 20,  # logging.INFO
    prefix: str = "LogAttribute",
    sample_rows: int = 3,
):
    """LogAttribute.java analog: log and pass the batch through
    unchanged. The reference logs every flowfile's attribute map; at
    10^10 rows that is its own denial-of-service, so the batch analog
    logs one line per BATCH — row count, schema, and the first
    ``sample_rows`` rows of the chosen columns — which keeps the
    observability without a per-row hot-path cost."""
    import logging

    log = logging.getLogger("nifi_ray.log_attribute")

    def fn(batch: pa.Table) -> pa.Table:
        sel = [c for c in (cols or batch.column_names) if c in batch.column_names]
        sample = batch.select(sel).slice(0, sample_rows).to_pylist() if sel else []
        log.log(
            level,
            "%s: %d rows, cols=%s, sample=%s",
            prefix,
            batch.num_rows,
            sel,
            sample,
        )
        return batch

    return fn
