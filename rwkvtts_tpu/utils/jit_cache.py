"""Persistent XLA compilation cache setup.

First compiles over the axon tunnel take minutes; the persistent cache makes
re-runs of the driver entry points / bench near-instant. Call early, before
the first jit.
"""
from __future__ import annotations

import os


def enable(cache_dir: str = "/root/repo/.jax_cache") -> None:
    try:
        import jax

        if jax.default_backend() == "cpu":
            # XLA:CPU AOT reload is BROKEN on this host (machine-feature
            # mismatch -> SIGILL/abort in ThunkExecutor when loading cached
            # executables; see CLAUDE.md / tests/conftest.py) — the cache
            # is a TPU-tunnel fast path only.
            try:
                jax.config.update("jax_enable_compilation_cache", False)
            except Exception:
                pass
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is a fast-path only; never fail the caller
