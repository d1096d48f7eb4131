"""Headline benchmark: grid-points/s regrid throughput on the 3-km
1801x1061 CONUS diag+hist pipeline (BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

- value = target-grid point-values produced per second in steady state
  (T * total stacked columns of the default diag+hist+soil variable load,
  divided by wall time per full pipeline apply pass) on the default JAX
  device (the TPU chip when present).
- vs_baseline = value / (a measured single-host NumPy f64 apply on the same
  operator, scaled from a row subset) — the reference publishes no numbers
  (BASELINE.json "published": {}), so the oracle CPU implementation is the
  stand-in baseline.

Environment knobs: BENCH_NCELLS, BENCH_NX, BENCH_NY, BENCH_NZ, BENCH_PASSES,
BENCH_SMALL=1 (quick CI-sized run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def getenv_int(name, default):
    return int(os.environ.get(name, default))


def main() -> int:
    small = os.environ.get("BENCH_SMALL") == "1"
    ncells = getenv_int("BENCH_NCELLS", 20_000 if small else 150_000)
    nx = getenv_int("BENCH_NX", 181 if small else 1801)
    ny = getenv_int("BENCH_NY", 107 if small else 1061)
    nz = getenv_int("BENCH_NZ", 8 if small else 55)
    nsoil = 4
    passes = getenv_int("BENCH_PASSES", 3 if small else 5)

    import jax
    import jax.numpy as jnp

    from mpassit_tpu.config import Config
    from mpassit_tpu.grids.target import build_target_grid
    from mpassit_tpu.mesh.synthetic import synthetic_voronoi_mesh
    from mpassit_tpu.ops.rotate import rotate_winds
    from mpassit_tpu.weights.bilinear import bilinear_cell_weights
    from mpassit_tpu.weights.conservative import conservative_weights
    from mpassit_tpu.weights.nearest import nearest_weights

    dev = jax.devices()[0]
    t0 = time.perf_counter()

    cfg = Config.from_dict({
        "target_grid_type": "lambert", "nx": nx + 1, "ny": ny + 1,
        "dx": 3000.0 * (1801 / nx), "dy": 3000.0 * (1801 / nx),
        "ref_lat": 38.5, "ref_lon": -97.5, "truelat1": 38.5,
        "stand_lon": -97.5,
    })
    grid = build_target_grid(cfg)
    mesh = synthetic_voronoi_mesh(ncells=ncells, nz=nz, nsoil=nsoil, seed=1)
    t_setup = time.perf_counter() - t0

    # ---- weight generation (the RegridStore-equivalent cost) -------------
    # cached across bench invocations (same synthetic mesh/grid) so repeat
    # runs measure apply throughput without paying weight-gen each time;
    # cold times are reported whenever they are actually generated.
    from mpassit_tpu.weights.cache import WeightCache, grid_fingerprint

    cache = WeightCache(os.environ.get("BENCH_CACHE", "/tmp/mpassit_bench_cache"))
    fpm, fpg = mesh.fingerprint(), grid_fingerprint(grid)

    t0 = time.perf_counter()
    ell_b = cache.get_or_build(
        "bilinear", fpm, fpg, lambda: bilinear_cell_weights(mesh, grid.lat, grid.lon))
    t_bilinear = time.perf_counter() - t0
    t0 = time.perf_counter()
    ell_n = cache.get_or_build(
        "nearest", fpm, fpg, lambda: nearest_weights(mesh, grid.lat, grid.lon))
    t_nearest = time.perf_counter() - t0
    t0 = time.perf_counter()
    ell_c = cache.get_or_build(
        "conserve", fpm, fpg, lambda: conservative_weights(mesh, grid))
    t_conserve = time.perf_counter() - t0

    # ---- the default variable load (parm/ lists) -------------------------
    # diag: 18 2-D + 1 3-D(nz); hist 2d: 3 patch + 2 cons + 1 nstd;
    # hist 3d: 11 nz + 2 nzp1 + 1 vert + u + v; soil: 3 x nsoil
    cols_bilinear = 18 + nz + 3 + 11 * nz + 2 * (nz + 1) + 2 * nz
    cols_vert = nz            # vorticity (vertex op ~ same cost class)
    cols_cons = 2
    cols_nstd = 1 + 3 * nsoil  # nstd + soil (quirk Q3: soil is nearest)
    total_cols = cols_bilinear + cols_vert + cols_cons + cols_nstd

    rng = np.random.default_rng(0)
    src = rng.standard_normal((mesh.ncells, cols_bilinear + cols_vert)).astype(np.float32)
    src_small = rng.standard_normal((mesh.ncells, cols_cons + cols_nstd)).astype(np.float32)

    src_d = jax.device_put(jnp.asarray(src), dev)
    src_s = jax.device_put(jnp.asarray(src_small), dev)

    CHUNK = 256
    # pad the bilinear stack to a CHUNK multiple so every matmul step has
    # the same shape
    pad = (-src.shape[1]) % CHUNK
    if pad:
        src = np.pad(src, ((0, 0), (0, pad)))
        src_d = jax.device_put(jnp.asarray(src), dev)
    n_chunks = src.shape[1] // CHUNK

    # Every method rides the MXU slab-matmul path (what run_pipeline uses):
    # one wide HBM row-gather packs each 32x32 target tile's unique source
    # rows, then batched one-hot matmuls on the MXU produce the tile outputs.
    from mpassit_tpu.ops.matmul_apply import (
        TILE,
        SlabMatmulRegridder,
        _tile_matmul,
        _tile_block,
    )

    mm_b = SlabMatmulRegridder(ell_b)
    mm_n = SlabMatmulRegridder(ell_n)
    mm_c = SlabMatmulRegridder(ell_c)
    # rotation angles in tile-blocked layout (n_tiles, TILE, 1)
    cs = np.zeros((mm_b.nty * 32, mm_b.ntx * 32, 2), np.float32)
    cs[:ny, :nx, 0] = grid.cosa.reshape(ny, nx)
    cs[:ny, :nx, 1] = grid.sina.reshape(ny, nx)
    cs_t = _tile_block(cs, mm_b.nty, mm_b.ntx, 2).reshape(mm_b.n_tiles, TILE, 2)
    # (nt, TILE) so rotate_winds broadcasts over the level axis
    cosa_t = jax.device_put(jnp.asarray(cs_t[:, :, 0]), dev)
    sina_t = jax.device_put(jnp.asarray(cs_t[:, :, 1]), dev)

    def make_pipeline(n_passes):
        # NOTE measurement integrity: the checksum is sum(out*out) — a LINEAR
        # checksum (out.sum()) lets XLA factor the reduction through the
        # gather (sum columns first, then gather scalars), eliding ~all HBM
        # traffic and inflating throughput ~1000x. Each outer iteration also
        # perturbs the source so loop-invariant code motion can't hoist the
        # body. Big arrays are explicit jit args: the remote-compile tunnel
        # rejects large captured constants.

        @jax.jit
        def pipeline(A_b, si_b, A_n, si_n, A_c, si_c,
                     src, src_s, cosa_t, sina_t):
            def one_pass(i, acc0):
                scale = 1.0 + 1e-12 * i.astype(jnp.float32)

                # bilinear stack: ONE wide gather, then chunked MXU matmuls
                slab = jnp.take(src, si_b, axis=0) * scale  # (nt, W, C)

                def body(acc, j):
                    blk = jax.lax.dynamic_slice_in_dim(
                        slab, j * CHUNK, CHUNK, axis=2)
                    out = _tile_matmul(A_b, blk)
                    return acc + (out * out).sum(), None

                acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))

                # winds: first nz columns = u levels, next nz = v levels;
                # rotate on the tile-blocked grid (interp.F90:291-293).
                # Slice just the wind columns (128-aligned) for the restagger
                # matmul instead of redoing the full stack.
                wcols = -(-2 * nz // 128) * 128
                out0 = _tile_matmul(
                    A_b, jax.lax.dynamic_slice_in_dim(slab, 0, wcols, 2))
                u, v = out0[:, :, :nz], out0[:, :, nz:2 * nz]
                ur, vr = rotate_winds(u, v, cosa_t, sina_t)
                acc = acc + (ur * ur).sum() + (vr * vr).sum()

                # nearest (incl. soil, quirk Q3) + conservative slabs
                slab_n = jnp.take(src_s, si_n, axis=0) * scale
                out = _tile_matmul(A_n, slab_n)
                acc = acc + (out * out).sum()
                slab_c = jnp.take(src_s[:, :cols_cons], si_c, axis=0) * scale
                out = _tile_matmul(A_c, slab_c)
                acc = acc + (out * out).sum()
                return acc

            return jax.lax.fori_loop(0, n_passes, one_pass,
                                     jnp.zeros((), jnp.float32))
        return pipeline

    args = (mm_b.A, mm_b.slab_idx, mm_n.A, mm_n.slab_idx, mm_c.A,
            mm_c.slab_idx, src_d, src_s, cosa_t, sina_t)
    # NOTE: through this environment's TPU tunnel, block_until_ready() does
    # NOT synchronize with remote execution — only fetching the value does.
    # All timings force a host fetch of the scalar checksum.
    timed = make_pipeline(passes)
    t0 = time.perf_counter()
    float(np.asarray(timed(*args)))  # compile + warm run
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    checksum = float(np.asarray(timed(*args)))
    t_apply = (time.perf_counter() - t0) / passes

    T = nx * ny
    value = T * total_cols / t_apply

    # ---- NumPy baseline (oracle implementation, subset-scaled) -----------
    sub = min(T, 200_000)
    idx_s, w_s = ell_b.idx[:sub], ell_b.w[:sub]
    srcf = src.astype(np.float64)
    t0 = time.perf_counter()
    out = (w_s[:, :, None] * srcf[idx_s]).sum(axis=1)
    t_np = (time.perf_counter() - t0) * (T / sub)
    np_value = T * src.shape[1] / t_np  # columns it processed, scaled

    # HBM traffic model for the slab path: per method, slab gather write+read,
    # A re-read per 256-col chunk, tile outputs consumed fused (no HBM write).
    def slab_bytes(mm, C):
        chunks = max(1, -(-C // CHUNK))
        return 4.0 * (2 * mm.n_tiles * mm.W * C               # slab wr+rd
                      + chunks * mm.n_tiles * 1024 * mm.W)    # A per chunk
    bytes_pass = (slab_bytes(mm_b, src.shape[1])
                  + slab_bytes(mm_n, src_small.shape[1])
                  + slab_bytes(mm_c, cols_cons))
    result = {
        "metric": "grid-points/s regrid throughput "
                  f"({nx}x{ny} CONUS-class diag+hist stack, {total_cols} cols)",
        "value": round(value, 1),
        "unit": "point-values/s",
        "vs_baseline": round(value / np_value, 2),
        "implied_hbm_gbps": round(bytes_pass / t_apply / 1e9, 1),
        "device": str(dev),
        "t_apply_pass_s": round(t_apply, 4),
        "t_compile_s": round(t_compile, 2),
        "t_weightgen_s": {"bilinear": round(t_bilinear, 2),
                          "nearest": round(t_nearest, 2),
                          "conserve": round(t_conserve, 2)},
        "t_setup_s": round(t_setup, 2),
        "ncells": ncells, "nz": nz, "passes": passes,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
