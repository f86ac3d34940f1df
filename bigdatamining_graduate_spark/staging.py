"""Session-scoped staging root for plans that must materialize files.

Several operators stage parquet stores / stream sources under a temp
directory and return a LAZY plan that reads them back — the staged
files must outlive the function call (the caller's ``.collect()``
happens later), so per-call ``rmtree`` is impossible.  Previously each
call leaked one ``tempfile.mkdtemp`` tree per invocation (ADVICE r9:
bench/driver sweeps rerun these every round).  All sites now allocate
under ONE process-scoped root that an ``atexit`` hook removes, so a
bench or driver sweep leaves nothing behind while every staged file
stays valid for the lifetime of the SparkSession that reads it.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def staging_dir(prefix: str) -> str:
    """A fresh directory under the session staging root (created on
    first use, removed at interpreter exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="bdm_staging_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
