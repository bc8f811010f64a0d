"""Device/backend helpers for the execution providers."""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def is_interpret_backend() -> bool:
    """Pallas kernels need interpret mode on non-TPU (e.g. CPU test) backends."""
    import jax

    return jax.default_backend() != "tpu"
