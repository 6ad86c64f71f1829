"""Global message-verbosity switch (NGSolve ``ngsglobals`` analog).

The reference gates its informational output with ``ngsglobals.msg_level``
(``IM(n)`` log levels throughout, e.g. xfem/cutinfo.cpp, spacetime/
SpaceTimeFESpace.cpp:32-34; tests set it in tests/ngsxfem_report.py:9).
Here the same knob gates the library's Python-level warnings/notes:
``msg_level == 0`` silences them, higher values keep them (numerical-guard
warnings such as Newton non-convergence always fire at level >= 1).
"""
from __future__ import annotations


class _NgsGlobals:
    msg_level: int = 1

    def __repr__(self):
        return f"ngsglobals(msg_level={self.msg_level})"


ngsglobals = _NgsGlobals()


def message(level: int, *args):
    """Print iff ngsglobals.msg_level >= level (the IM(n) analog)."""
    if ngsglobals.msg_level >= level:
        print(*args)
