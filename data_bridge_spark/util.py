"""Small process-lifetime utilities shared across operators and sinks."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_TRACKED: list[str] = []


def _cleanup_tracked() -> None:
    while _TRACKED:
        shutil.rmtree(_TRACKED.pop(), ignore_errors=True)


atexit.register(_cleanup_tracked)


def tracked_tempdir(prefix: str) -> str:
    """A mkdtemp whose removal is registered atexit.

    For staging dirs that must outlive the function that created them —
    e.g. a CSV artifact a returned lazy DataFrame still reads from, or a
    file-stream source directory a StreamingQuery is attached to. Callers
    that can scope the lifetime themselves should prefer
    ``tempfile.TemporaryDirectory``/explicit cleanup instead.
    """
    d = tempfile.mkdtemp(prefix=prefix)
    _TRACKED.append(d)
    return d
