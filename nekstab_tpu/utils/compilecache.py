"""Persistent XLA compilation cache.

Remote-relay TPU compiles are expensive (O(100 s) for a full propagator
scan); enabling jax's persistent cache makes every repeated launch of the
examples / bench / driver near-instant on recompile. Call `enable()` early
(before the first jit execution). Opt-in per entry point rather than a
package import side effect.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "NEKSTAB_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
