"""Process-scoped scratch directories for staged-parquet operators.

Several operators stage intermediate parquet to the system temp dir —
either because a fact-scale frame feeds multiple consumers (the
BPE-rounds / basket trade: stage once, serve all consumers from slim
files) or because the operator MODELS persistent storage (the bucketed
sink whose reuse key reads it back, the incremental dedup index whose
day-2 probe must find it).  Those dirs must outlive the query — the
reuse keys depend on them — but before r10 nothing ever removed them:
every process left one copy of its staging per run (~700 leaked dirs
observed in /tmp across nine rounds; the r9 advisor flagged the JSONL
instance, the pattern was repo-wide).

``scratch_dir`` keeps the per-run tag discipline (tags embed the pid,
so concurrent processes never collide) and registers ONE atexit
removal per path: within-process reuse keeps working, and the process
cleans up after itself on exit.  Operators whose staging is consumed
by a single small result still delete eagerly (localCheckpoint the
rollup, rmtree immediately) — this helper is the backstop for the
dirs that must persist until exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_TRACKED: set[str] = set()


def scratch_dir(prefix: str, tag: str) -> str:
    """Return the per-run scratch path for ``prefix``/``tag`` and
    schedule its removal at process exit (idempotent per path)."""
    root = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    if root not in _TRACKED:
        _TRACKED.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def store_tag(sf_dir: str, table_file: str) -> str:
    """Source fingerprint + PID for a persisted derived store — the
    X12/X60/X62 staleness discipline shared by every pay-once store
    (theta sketches, the minhash signature/band store): the tag hashes
    the source table's path + mtime + size, so a store built from
    yesterday's corpus can never serve today's, and embeds the pid so
    concurrent processes never collide.  One definition (r15 review):
    the theta and minhash stores each carried a verbatim copy, and a
    future change to the discipline (e.g. hashing per-part mtimes)
    must land everywhere at once or the stores diverge in staleness
    behavior."""
    import hashlib

    p = os.path.join(sf_dir, table_file)
    st = os.stat(p)
    fp = hashlib.md5(
        f"{p}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]
    return f"{fp}_{os.getpid()}"
