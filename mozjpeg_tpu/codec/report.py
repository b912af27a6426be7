"""Progress reporting and message tracing.

TPU-native analog of the reference's two observability channels
(SURVEY.md §5): the `jpeg_progress_mgr` callback updated per pass
(/root/reference/jcmaster.c:711-714, cdjpeg.c:29-59 progress_monitor)
and the error-manager trace stream (`cinfo->err->trace_level` with
TRACEMS macros; the scan-size "SCAN c: Ss Se Ah Al" lines of
jcmaster.c:747-754).

Because the encoder here is a phase pipeline (device dispatch → trellis →
per-scan entropy) rather than a scanline loop, progress is reported at
pass granularity: each device phase, each candidate scan of the
optimize_scans search, and each output scan counts as one pass.  The
total grows as phases discover their pass counts (the reference computes
a static total in jinit_c_master_control jcmaster.c:1121-1139; ours is
dynamic but monotone).

Hooks are installed per-thread with the `reporting` context manager, so
concurrent encodes don't interleave reports.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Callable, Optional


class Reporter:
    """Collects progress/trace callbacks for one encode call."""

    __slots__ = ("progress", "trace_fn", "trace_level", "completed", "total")

    def __init__(self, progress: Optional[Callable] = None,
                 trace: Optional[Callable] = None, trace_level: int = 0):
        self.progress = progress
        self.trace_fn = trace
        self.trace_level = trace_level if trace is not None else 0
        self.completed = 0
        self.total = 0


_current: contextvars.ContextVar[Optional[Reporter]] = \
    contextvars.ContextVar("mozjpeg_tpu_reporter", default=None)


@contextlib.contextmanager
def reporting(progress: Optional[Callable] = None,
              trace: Optional[Callable] = None, trace_level: int = 1):
    """Install progress/trace hooks for the enclosed encode.

    progress(completed_passes, total_passes, desc) is called after each
    pass; trace(message) receives reference-format trace lines when
    trace_level > 0.
    """
    if progress is None and trace is None:
        yield None
        return
    rep = Reporter(progress, trace, trace_level)
    tok = _current.set(rep)
    try:
        yield rep
    finally:
        _current.reset(tok)


def add_passes(n: int) -> None:
    rep = _current.get()
    if rep is not None:
        rep.total += n


def pass_done(desc: str = "") -> None:
    rep = _current.get()
    if rep is not None:
        rep.completed += 1
        if rep.total < rep.completed:
            rep.total = rep.completed
        if rep.progress is not None:
            rep.progress(rep.completed, rep.total, desc)


def trace(level: int, msg: str) -> None:
    """Emit a trace message at the given level (TRACEMS analog)."""
    rep = _current.get()
    if rep is not None and rep.trace_fn is not None \
            and rep.trace_level >= level:
        rep.trace_fn(msg)


def trace_scan(comps, Ss: int, Se: int, Ah: int, Al: int) -> None:
    """Reference scan-size trace line (jcmaster.c:747-754):
    'SCAN c[,c...]: Ss Se Ah Al'."""
    trace(1, "SCAN %s: %d %d %d %d"
          % (",".join(str(c) for c in comps), Ss, Se, Ah, Al))
