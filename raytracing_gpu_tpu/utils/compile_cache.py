"""Compile-latency control: persistent cache + AOT compile + direct dispatch.

Cold-start anatomy in this TPU environment (single v5e chip through the
axon tunnel), measured on susan.svati 512x512 and on a trivial
`jnp.zeros((8,)) + 1` program (2026-08-20):

1. **Compile** — `jitted.lower(...).compile()` runs terminal-side
   (PALLAS_AXON_REMOTE_COMPILE) in ~13-14s cold, ~5s on a persistent-cache
   hit. This is program-size dependent and fully under our control.
2. **Device claim** — the FIRST dispatch of ANY program in a fresh process
   pays the axon pool's device-claim latency: 100-700s observed, identical
   for a trivial one-op program and for the full renderer. It is a property
   of the tunnel service queue, not of this framework's programs, and is
   paid exactly once per process.
3. **Execute-path recompile** — re-entering the *jitted* function after an
   AOT compile was observed to recompile through the tunnel in the driver's
   environment (612.9s in BENCH_r02) even when the persistent cache held
   the artifact. Dispatching the AOT-compiled executable object directly
   (`compiled(args)`) can never recompile, so `aot_compiled()` below
   returns that executable and render_scene dispatches it.

Recipe: enable the persistent cache, `aot_compiled()` each (program,
shapes), dispatch the returned executable, and — in latency-sensitive
entrypoints like bench.py — fire a trivial async dispatch FIRST so the
device claim (2.) overlaps the compile (1.) instead of serializing after it.
"""

from __future__ import annotations

import os

import jax

_PREWARMED: set = set()
_COMPILED: dict = {}


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


def aot_compiled(jitted, key, *args, **kwargs):
    """AOT-compile `jitted(*args, **kwargs)` once per `key` and return the
    compiled executable. Callers dispatch it with the NON-static arguments
    only (`compiled(scene)`), which structurally cannot trigger the
    execute-path recompile a re-entered jitted call risks (observed 612.9s
    through the tunnel in BENCH_r02 despite a persistent-cache hit).

    Returns None off-TPU (the jitted call is the right path there: CPU
    compiles are fast and `compiled` objects pin concrete devices)."""
    if key in _COMPILED:
        return _COMPILED[key]
    if jax.default_backend() != "tpu":
        return None
    compiled = jitted.lower(*args, **kwargs).compile()
    _COMPILED[key] = compiled
    _PREWARMED.add(key)
    return compiled


def begin_device_claim():
    """Fire one trivial async dispatch so the axon pool's device-claim
    latency (100-700s observed; paid once per process, identical for any
    program) starts NOW and overlaps subsequent host work (parsing, AOT
    compiles, oracle builds) instead of serializing after them. Returns
    the in-flight array; `jax.block_until_ready` it to measure the claim."""
    import jax.numpy as jnp

    return jnp.zeros((8,), jnp.float32) + 1.0
