"""Persistent XLA/Mosaic compilation cache (the RegridStore-caching win
applied to compilation).

The reference pays no compile cost — its weights ARE the program and ESMF
is prebuilt. A JAX run re-lowers and re-compiles every jitted shape; on the
remote-compile tunnels this environment uses, the CONUS fused-kernel
compile alone is ~76 s (BENCH_r02 ``full_mesh.t_compile_s``). Pointing
``jax_compilation_cache_dir`` at a persistent directory makes every compile
a one-time cost, exactly as weights/cache.py amortizes weight generation
(no reference analog — cited against /root/reference/interp.F90:123-128,
whose RegridStore cost the weight cache amortizes the same way).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("mpassit_tpu")

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "mpassit_tpu", "xla")


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Idempotent.

    ``cache_dir`` defaults to ``$MPASSIT_COMPILE_CACHE`` or
    ``~/.cache/mpassit_tpu/xla``; pass "" (or set the env var to "") to
    disable. Returns the directory in effect, or None when disabled."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("MPASSIT_COMPILE_CACHE", _DEFAULT)
    if not cache_dir:
        return None
    if jax.config.jax_compilation_cache_dir == cache_dir:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile: the default 1 s floor would skip the many small
    # per-width shapes whose remote lowering still costs real wall-clock
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    log.info("- compilation cache: %s", cache_dir)
    return cache_dir
