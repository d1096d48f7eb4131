"""Scratch experiment: component roofline of the materialized apply pass.

Times, on the real chip:
  - slab gather alone
  - matmul+barrier+checksum at CB in {256, 512, 1024}
  - matmul+barrier, checksum of a single element (write-mostly)
  - pure HBM copy bandwidth probe (read+write)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpassit_tpu.ops.matmul_apply import _tile_matmul

NCELLS = 150_000
N_TILES = 1938
W = 16
C = 1024
PASSES = 5


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    _ = float(np.asarray(jnp.sum(r) if hasattr(r, 'shape') and r.size > 1 else r))
    t0 = time.perf_counter()
    r = fn(*args)
    _ = float(np.asarray(jnp.sum(r) if hasattr(r, 'shape') and r.size > 1 else r))
    return (time.perf_counter() - t0) / PASSES


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    src = jax.device_put(
        rng.standard_normal((NCELLS, C)).astype(np.float32), dev)
    # morton-like nearly-sorted slab indices
    base = np.sort(rng.integers(0, NCELLS - W, N_TILES))[:, None]
    si = jax.device_put((base + np.arange(W)[None, :]).astype(np.int32), dev)
    A = jax.device_put(
        rng.standard_normal((N_TILES, 3 * W, 1024)).astype(np.float32)
        .astype(jnp.bfloat16), dev)
    Ah = jax.device_put(
        rng.standard_normal((N_TILES, W, 1024)).astype(np.float32), dev)

    @jax.jit
    def gather_only(s, si):
        def one(i, acc):
            slab = jnp.take(s, si, axis=0) * (1.0 + 1e-12 * acc)
            return acc + slab[0, 0, 0]
        return jax.lax.fori_loop(0, PASSES, one, jnp.float32(0))

    t = timeit(gather_only, src, si)
    print(f"gather only: {t*1e3:.2f} ms  ({N_TILES*W*C*4*2/t/1e9:.0f} GB/s eff)")

    def mk_mm(cb, prec, full_checksum=True):
        n_chunks = C // cb

        @jax.jit
        def f(A, s, si):
            def one(i, acc):
                slab = jnp.take(s, si, axis=0) * (1.0 + 1e-12 * acc)
                def body(a, j):
                    blk = jax.lax.dynamic_slice_in_dim(slab, j * cb, cb, 2)
                    out = jax.lax.optimization_barrier(
                        _tile_matmul(A, blk, precision=prec))
                    if full_checksum:
                        return a + (out * out).sum(), None
                    return a + out[0, 0, 0], None
                acc2, _ = jax.lax.scan(body, acc, jnp.arange(n_chunks))
                return acc2
            return jax.lax.fori_loop(0, PASSES, one, jnp.float32(0))
        return f

    for cb in (256, 512, 1024):
        t = timeit(mk_mm(cb, "split_bf16"), A, src, si)
        gb = N_TILES * 1024 * C * 4 * 2 / 1e9  # out write+read
        print(f"split_bf16 CB={cb} full-cksum: {t*1e3:.2f} ms "
              f"({gb/t:.0f} GB/s out-traffic)")
    t = timeit(mk_mm(256, "split_bf16", full_checksum=False), A, src, si)
    print(f"split_bf16 CB=256 elem-cksum (write-mostly): {t*1e3:.2f} ms "
          f"({N_TILES*1024*C*4/1e9/t:.0f} GB/s write)")
    t = timeit(mk_mm(256, "highest"), Ah, src, si)
    print(f"highest   CB=256 full-cksum: {t*1e3:.2f} ms")

    # raw HBM copy probe
    big = jax.device_put(rng.standard_normal(
        (N_TILES * 1024, C)).astype(np.float32), dev)

    @jax.jit
    def copy_probe(x):
        def one(i, acc):
            y = jax.lax.optimization_barrier(x * (1.0 + 1e-12 * acc))
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, PASSES, one, jnp.float32(0))

    t = timeit(copy_probe, big)
    print(f"copy probe: {t*1e3:.2f} ms ({big.nbytes*2/t/1e9:.0f} GB/s rw)")

    @jax.jit
    def reduce_probe(x):
        def one(i, acc):
            return acc + (x * (1.0 + 1e-12 * acc) * x).sum()
        return jax.lax.fori_loop(0, PASSES, one, jnp.float32(0))

    t = timeit(reduce_probe, big)
    print(f"reduce probe: {t*1e3:.2f} ms ({big.nbytes/t/1e9:.0f} GB/s read)")


if __name__ == "__main__":
    main()
