"""Persistent XLA compilation cache for the CLI entry points.

JAX can serialize compiled executables to disk and reload them in later
processes (keyed by HLO + compile options + backend version), but only when
``jax_compilation_cache_dir`` is set — by default nothing persists and every
CLI invocation pays the full remote compile again. Measured on the axon
v5-lite chip (production 400px bf16 Pallas pose renderer, fresh process):
compile 6.2 s cold -> **0.2 s** from a warm cache (the chip *claim* is the
remaining cold-start cost and is not cacheable).

Every CLI calls :func:`enable_compilation_cache` at startup. Override the
location with ``JAX_COMPILATION_CACHE_DIR`` (JAX's own knob) or
``NERF_COMPILE_CACHE`` (set to ``off``/``0`` to disable).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join("~", ".cache", "nerf_tpu", "jaxcache")
_OFF = ("0", "off", "none", "false")


def enable_compilation_cache() -> str:
    """Point JAX's persistent compilation cache at a stable default dir.

    Returns the cache path, or "" when disabled. Must run before the first
    compilation (any time before is fine — the config is read per-compile).
    Safe to call when JAX_COMPILATION_CACHE_DIR is already set (that value
    wins). Entries are keyed by HLO + compile options + runtime version, so
    a stale cache can only miss, never corrupt.
    """
    knob = os.environ.get("NERF_COMPILE_CACHE", "")
    if knob.lower() in _OFF and knob != "":
        return ""
    path = os.path.expanduser(
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or (knob if knob else None)
        or _DEFAULT
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return ""  # unwritable location: run uncached rather than crash
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path
