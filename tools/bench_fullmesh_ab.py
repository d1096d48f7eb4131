"""A/B the full-mesh apply: prestacked-A kernel vs ELL-direct kernel.

Round-4 scratch tool for VERDICT item 1 (full-mesh gather gap). Builds the
2.6M-cell problem (cached under .bench_cache) and times both fused-kernel
variants at the bench full_mesh configuration.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_conus_problem, _checksum_fetch
    from mpassit_tpu.compilecache import enable_compile_cache
    from mpassit_tpu.weights.cache import WeightCache

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache")
    enable_compile_cache(os.path.join(cache_dir, "xla"))
    cache = WeightCache(cache_dir)
    ncells = int(os.environ.get("AB_NCELLS", 2_600_000))
    passes = int(os.environ.get("AB_PASSES", 5))
    FCOLS = int(os.environ.get("AB_COLS", 512))
    t0 = time.perf_counter()
    _, _, fmesh, (fb, _, _), tw = build_conus_problem(
        ncells, 1801, 1061, 2, 1, cache)
    print("setup", round(time.perf_counter() - t0, 1), tw, flush=True)

    from mpassit_tpu.ops.matmul_apply import SlabMatmulRegridder
    from mpassit_tpu.ops.pallas_matmul import fused_apply, fused_apply_packed

    mm = SlabMatmulRegridder(fb, precision="split_bf16",
                             cache_dir=cache_dir)
    print("W =", mm.W, "n_tiles =", mm.n_tiles, flush=True)
    rng = np.random.default_rng(0)
    src = rng.standard_normal((fmesh.ncells, FCOLS)).astype(np.float32)
    dev = jax.devices()[0]
    src_d = jax.device_put(jnp.asarray(src), dev)
    nty, ntx = mm.nty, mm.ntx
    T = 1801 * 1061

    def loop(body):
        @jax.jit
        def run(*args):
            def one(i, acc):
                return acc + body(i, acc, *args)
            return jax.lax.fori_loop(0, passes, one,
                                     jnp.zeros((), jnp.float32))
        return run

    def time_it(name, fn, args):
        t0 = time.perf_counter()
        _checksum_fetch(fn(*args))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        _checksum_fetch(fn(*args))
        dt = (time.perf_counter() - t0) / passes
        print(f"{name}: {dt*1e3:.2f} ms/pass  {T*FCOLS/dt/1e9:.1f} B pv/s "
              f"(compile+1st {tc:.1f}s)", flush=True)
        return dt

    # --- prestacked-A kernel (round-3 configuration) ---------------------
    A = mm.A

    def body_pre(i, acc, A, si, s):
        slab = jnp.take(s, si, axis=0) * (1.0 + 1e-12 * acc)
        out = fused_apply(A, slab, nty=nty, ntx=ntx, precision="split_bf16")
        return (out * out).sum()

    time_it("prestacked", loop(body_pre), (A, mm.slab_idx, src_d))

    # --- ELL-direct kernel ----------------------------------------------
    loc, w = mm._ell_dev()
    Cp = FCOLS

    def body_ell(i, acc, loc, w, si, s):
        slab = jnp.take(s, si, axis=0) * (1.0 + 1e-12 * acc)
        out = fused_apply_packed(
            None, slab, ranges=((0, Cp),), nty=nty, ntx=ntx,
            precision="split_bf16", locs=(loc,), ws=(w,))
        return (out * out).sum()

    time_it("ell-direct", loop(body_ell), (loc, w, mm.slab_idx, src_d))

    # cross-check outputs agree
    slab = jnp.take(src_d, mm.slab_idx, axis=0)
    o1 = fused_apply(A, slab, nty=nty, ntx=ntx, precision="split_bf16")
    o2 = fused_apply_packed(None, slab, ranges=((0, Cp),), nty=nty,
                            ntx=ntx, precision="split_bf16",
                            locs=(loc,), ws=(w,))
    d = float(np.asarray(jnp.max(jnp.abs(o1 - o2))))
    print("max |prestacked - ell| =", d, flush=True)


if __name__ == "__main__":
    main()
