"""Runtime numerical-failure diagnostics (SURVEY §5 "numerical guards").

The reference warns on Newton non-convergence in the facet-patch point map
and the shifted evaluation and falls back to a lower-order rule
(symboliccutbfi.cpp:1184-1192, shiftedevaluate.cpp:68-95).  Here the
fixed-iteration batched Newton performs the same fallback via masks inside
the compiled program; with ``config.newton_debug`` enabled the
non-converged count is additionally surfaced from the running program as a
Python :class:`NewtonNonConvergenceWarning` through ``jax.debug.callback``
(fires at EXECUTION time, so callers must block on the result before
asserting on the warning).  The callback is gated behind the flag because a
host callback in the HLO would sit on the facet-patch assembly hot path.
"""
from __future__ import annotations

import warnings
from functools import partial


class NewtonNonConvergenceWarning(UserWarning):
    """A fixed-iteration Newton point search missed its tolerance somewhere
    and the documented low-order fallback was used for those points."""


def warn_nonconverged(label, fallback, n, total=None):
    """Host side: warn iff the non-converged count is positive."""
    n = int(n)
    if n > 0:
        tot = f"/{int(total)}" if total is not None else ""
        warnings.warn(
            f"{label}: {n}{tot} Newton points non-converged; "
            f"falling back to {fallback} there",
            NewtonNonConvergenceWarning, stacklevel=2)


def emit_nonconverged(label, fallback, nonconv_count, total):
    """Call under jit: emits :func:`warn_nonconverged` from the compiled
    program via ``jax.debug.callback`` (async; fires when the program
    actually runs)."""
    import jax

    jax.debug.callback(partial(warn_nonconverged, label, fallback,
                               total=int(total)), nonconv_count)
