"""Kernel-structure experiments for the full-mesh ELL apply (round 4).

Times variants of the ELL-direct kernel on the 2.6M-cell problem:
  v0: library baseline (concat-stacked operands, full-width blocks)
  v1: three separate dots (no concat relayouts)
  v2: column-chunked grid (nty, ntx, nc) with A built once into scratch

CAVEAT (round-4 lesson, recorded in DESIGN.md): these loops hold every
operand fixed, so XLA HOISTS the loop-invariant pallas_call out of the
fori_loop — the numbers measure one kernel run amortized over `passes`
plus the checksum re-reads, NOT per-pass cost. For honest per-pass
numbers tie the operands to the accumulator with
``jax.lax.optimization_barrier((operand, acc))`` as bench.py's full-mesh
section now does. Kept as-is for the record of the pitfall."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
TY = TX = 32


def make_v1(nty, ntx, W, Cp):
    """Three separate dots, no concat: Ah@Sh + Ah@Sl + Al@Sh."""

    def kern(loc_ref, w_ref, slab_ref, out_ref):
        L = loc_ref[0]
        Wt = w_ref[0]
        K = L.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, TILE), 0)
        A = jnp.zeros((W, TILE), jnp.float32)
        for k in range(K):
            A = A + jnp.where(iota == L[k:k + 1, :], Wt[k:k + 1, :], 0.0)
        Ah = A.astype(jnp.bfloat16)
        Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
        s = slab_ref[0]
        Sh = s.astype(jnp.bfloat16)
        Sl = (s - Sh.astype(jnp.float32)).astype(jnp.bfloat16)
        for lo in range(0, Cp, 256):
            cw = min(256, Cp - lo)
            dn = (((0,), (0,)), ((), ()))
            out = jax.lax.dot_general(Ah, Sh[:, lo:lo + cw], dn,
                                      preferred_element_type=jnp.float32)
            out += jax.lax.dot_general(Ah, Sl[:, lo:lo + cw], dn,
                                       preferred_element_type=jnp.float32)
            out += jax.lax.dot_general(Al, Sh[:, lo:lo + cw], dn,
                                       preferred_element_type=jnp.float32)
            out_ref[:, :, lo:lo + cw] = out.reshape(TY, TX, cw)

    @jax.jit
    def run(loc, w, slab):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nty * TY, ntx * TX, Cp),
                                           jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(nty, ntx),
                in_specs=[
                    pl.BlockSpec((1,) + loc.shape[1:],
                                 lambda i, j: (i * ntx + j, 0, 0)),
                    pl.BlockSpec((1,) + w.shape[1:],
                                 lambda i, j: (i * ntx + j, 0, 0)),
                    pl.BlockSpec((1, W, Cp),
                                 lambda i, j: (i * ntx + j, 0, 0)),
                ],
                out_specs=pl.BlockSpec((TY, TX, Cp), lambda i, j: (i, j, 0))),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(loc, w, slab)
    return run


def make_v2(nty, ntx, W, Cp, CC=128):
    """Column-chunked grid with A built once per tile into scratch."""
    nc = Cp // CC

    def kern(loc_ref, w_ref, slab_ref, out_ref, a3_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _build():
            L = loc_ref[0]
            Wt = w_ref[0]
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, TILE), 0)
            A = jnp.zeros((W, TILE), jnp.float32)
            for kk in range(L.shape[0]):
                A = A + jnp.where(iota == L[kk:kk + 1, :],
                                  Wt[kk:kk + 1, :], 0.0)
            Ah = A.astype(jnp.bfloat16)
            Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
            a3_ref[...] = jnp.concatenate([Ah, Ah, Al], axis=0)

        s = slab_ref[0]
        Sh = s.astype(jnp.bfloat16)
        Sl = (s - Sh.astype(jnp.float32)).astype(jnp.bfloat16)
        s3 = jnp.concatenate([Sh, Sl, Sh], axis=0)
        out = jax.lax.dot_general(
            a3_ref[...], s3, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[...] = out.reshape(TY, TX, CC)

    @jax.jit
    def run(loc, w, slab):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nty * TY, ntx * TX, Cp),
                                           jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(nty, ntx, nc),
                in_specs=[
                    pl.BlockSpec((1,) + loc.shape[1:],
                                 lambda i, j, k: (i * ntx + j, 0, 0)),
                    pl.BlockSpec((1,) + w.shape[1:],
                                 lambda i, j, k: (i * ntx + j, 0, 0)),
                    pl.BlockSpec((1, W, CC),
                                 lambda i, j, k: (i * ntx + j, 0, k)),
                ],
                out_specs=pl.BlockSpec((TY, TX, CC),
                                       lambda i, j, k: (i, j, k)),
                scratch_shapes=[pltpu.VMEM((3 * W, TILE), jnp.bfloat16)]),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(loc, w, slab)
    return run


def main():
    from bench import build_conus_problem, _checksum_fetch
    from mpassit_tpu.compilecache import enable_compile_cache
    from mpassit_tpu.weights.cache import WeightCache
    from mpassit_tpu.ops.matmul_apply import SlabMatmulRegridder
    from mpassit_tpu.ops.pallas_matmul import fused_apply_packed

    cache_dir = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
    enable_compile_cache(os.path.join(cache_dir, "xla"))
    cache = WeightCache(cache_dir)
    cfg, grid, fmesh, (fb, _, _), tw = build_conus_problem(
        2_600_000, 1801, 1061, 2, 1, cache)
    mm = SlabMatmulRegridder(fb, precision="split_bf16", cache_dir=cache_dir)
    rng = np.random.default_rng(0)
    FCOLS, passes = 512, 5
    src = rng.standard_normal((fmesh.ncells, FCOLS)).astype(np.float32)
    src_d = jax.device_put(jnp.asarray(src), jax.devices()[0])
    loc, w = mm._ell_dev()
    slab0 = jnp.take(src_d, mm.slab_idx, axis=0)
    nty, ntx, W = mm.nty, mm.ntx, mm.W
    T = 1801 * 1061

    def loop(apply_fn):
        @jax.jit
        def run(loc, w, slab):
            def one(i, acc):
                out = apply_fn(loc, w, slab)
                return acc + (out * out).sum() + 1e-12 * acc
            return jax.lax.fori_loop(0, passes, one,
                                     jnp.zeros((), jnp.float32))
        return run

    def timed(name, fn):
        t0 = time.perf_counter()
        _checksum_fetch(fn(loc, w, slab0))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        _checksum_fetch(fn(loc, w, slab0))
        dt = (time.perf_counter() - t0) / passes
        print(f"{name}: {dt*1e3:.2f} ms/pass  {T*FCOLS/dt/1e9:.1f} B pv/s "
              f"(compile {tc:.1f}s)", flush=True)

    v0 = lambda l, ww, s: fused_apply_packed(
        None, s, ranges=((0, FCOLS),), nty=nty, ntx=ntx,
        precision="split_bf16", locs=(l,), ws=(ww,))
    timed("v0 baseline", loop(v0))
    timed("v1 separate-dots", loop(make_v1(nty, ntx, W, FCOLS)))
    for cc in (128, 256):
        timed(f"v2 col-chunked CC={cc}", loop(make_v2(nty, ntx, W, FCOLS,
                                                      cc)))
    # correctness spot-check of variants vs baseline
    ref = np.asarray(v0(loc, w, slab0)[:64, :64, :8])
    for name, fn in (("v1", make_v1(nty, ntx, W, FCOLS)),
                     ("v2", make_v2(nty, ntx, W, FCOLS, 128))):
        got = np.asarray(fn(loc, w, slab0)[:64, :64, :8])
        print(name, "max|diff| =", float(np.abs(got - ref).max()), flush=True)


if __name__ == "__main__":
    main()
