"""Numerical sanitizers (SURVEY.md §5 "race detection / sanitizers" row).

The reference is single-threaded Python with no sanitizers; the TPU
equivalents here:

  checked(fn)        — checkify wrapper raising on NaN/Inf/OOB inside a
                       jitted function (the "asan" for traced code)
  assert_finite(x)   — host-side pytree finiteness check for tests/CLIs
  interpret mode     — the Pallas kernels accept interpret=True, which
                       executes kernel logic unvectorized with Python
                       semantics (the kernel "sanitizer"; used by the
                       CPU test suite, see render/pallas_kernels.py)
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap fn so NaN/Inf produced anywhere inside it raise a
    JaxRuntimeError with the offending location. Works under jit."""
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side finiteness assert over a pytree (tests/CLI guards)."""
    bad = []

    def visit(path, x):
        if isinstance(x, (jax.Array, np.ndarray)):
            arr = np.asarray(x)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                bad.append(f"{name}{jax.tree_util.keystr(path)}: "
                           f"{np.size(arr) - np.isfinite(arr).sum()} non-finite")

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise AssertionError("; ".join(bad))
