"""Compile-latency control: persistent cache + AOT prewarming.

Two facts about this TPU environment (measured on susan.svati 512x512,
single v5e chip through the axon tunnel):

- The EXECUTE-path compile (what a plain jitted call triggers on first
  dispatch) takes minutes (250-580s observed, service-queue dependent).
- The AOT path (`jitted.lower(...).compile()`) compiles the identical
  program terminal-side in ~13s, and — with a persistent compilation cache
  configured — writes an artifact the execute path then HITS, making the
  first real dispatch ~2s.

So the recipe for interactive cold starts is: enable the persistent cache,
then AOT-prewarm each (program, shapes) before its first dispatch. This
module packages both; render.render_scene applies them automatically on TPU.
"""

from __future__ import annotations

import os

import jax

_PREWARMED: set = set()


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    $RGT_JAX_CACHE or ~/.cache/raytracing_gpu_tpu/jax). Safe to call
    repeatedly; returns the directory in use."""
    path = path or os.environ.get(
        "RGT_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "raytracing_gpu_tpu", "jax"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path


def cache_configured() -> bool:
    return bool(jax.config.jax_compilation_cache_dir)


def aot_prewarm(jitted, key, *args, **kwargs) -> bool:
    """AOT-compile `jitted(*args, **kwargs)` once per `key` (hashable
    program identity: shapes + static config), so the subsequent dispatch
    hits the persistent cache instead of the minutes-long execute-path
    compile. No-op off-TPU, without a persistent cache, or on repeat keys.
    Returns True when a prewarm compile actually ran."""
    if key in _PREWARMED:
        return False
    if jax.default_backend() != "tpu" or not cache_configured():
        return False
    jitted.lower(*args, **kwargs).compile()
    _PREWARMED.add(key)
    return True
