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
    from mpassit_tpu.ops.apply import apply_ell
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

    idx_b = jax.device_put(jnp.asarray(ell_b.idx), dev)
    w_b = jax.device_put(jnp.asarray(ell_b.w, dtype=jnp.float32), dev)
    idx_n = jax.device_put(jnp.asarray(ell_n.idx), dev)
    w_n = jax.device_put(jnp.asarray(ell_n.w, dtype=jnp.float32), dev)
    idx_c = jax.device_put(jnp.asarray(ell_c.idx), dev)
    w_c = jax.device_put(jnp.asarray(ell_c.w, dtype=jnp.float32), dev)
    src_d = jax.device_put(jnp.asarray(src), dev)
    src_s = jax.device_put(jnp.asarray(src_small), dev)
    cosa = jax.device_put(jnp.asarray(grid.cosa.reshape(-1, 1), dtype=jnp.float32), dev)
    sina = jax.device_put(jnp.asarray(grid.sina.reshape(-1, 1), dtype=jnp.float32), dev)

    CHUNK = 128
    # pad the bilinear stack to a CHUNK multiple so every scan step has the
    # same shape and XLA reuses one chunk buffer (peak HBM ~= 1 chunk)
    pad = (-src.shape[1]) % CHUNK
    if pad:
        src = np.pad(src, ((0, 0), (0, pad)))
    n_chunks = src.shape[1] // CHUNK

    # MXU slab-matmul fast path for bilinear (the dominant column load);
    # nearest/conservative ride the plain gather (few columns)
    from mpassit_tpu.ops.matmul_apply import SlabMatmulRegridder

    mm = SlabMatmulRegridder(ell_b)
    A_d = mm.A
    slab_idx_d = mm.slab_idx

    def make_pipeline(n_passes):
        # NOTE measurement integrity: the checksum is sum(out*out) — a LINEAR
        # checksum (out.sum()) lets XLA factor the reduction through the
        # gather (sum columns first, then gather scalars), eliding ~all HBM
        # traffic and inflating throughput ~1000x. Each outer iteration also
        # perturbs the weights so loop-invariant code motion can't hoist the
        # body.
        from mpassit_tpu.ops.matmul_apply import _tile_matmul

        @jax.jit
        def pipeline(A, slab_idx, idx_b, w_b, idx_n, w_n, idx_c, w_c,
                     src, src_s, cosa, sina):
            def one_pass(i, acc0):
                scale = 1.0 + 1e-12 * i.astype(jnp.float32)

                def body(acc, j):
                    blk = jax.lax.dynamic_slice_in_dim(
                        src, j * CHUNK, CHUNK, axis=1)
                    slab = jnp.take(blk, slab_idx, axis=0).reshape(
                        mm.n_tiles, mm.W, -1)
                    # perturb the (small) slab, not the 1-GB A matrix
                    out = _tile_matmul(A, slab * scale, precision="highest")
                    return acc + (out * out).sum(), None

                acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
                # winds: one level-stack rotation
                u = apply_ell(idx_b, w_b * scale, src[:, :1])
                v = apply_ell(idx_b, w_b * scale, src[:, 1:2])
                ur, vr = rotate_winds(u, v, cosa, sina)
                acc = acc + (ur * ur).sum() + (vr * vr).sum()
                out = apply_ell(idx_n, w_n * scale, src_s)
                acc = acc + (out * out).sum()
                out = apply_ell(idx_c, w_c * scale, src_s[:, :cols_cons])
                acc = acc + (out * out).sum()
                return acc

            return jax.lax.fori_loop(0, n_passes, one_pass,
                                     jnp.zeros((), jnp.float32))
        return pipeline

    args = (A_d, slab_idx_d, idx_b, w_b, idx_n, w_n, idx_c, w_c, src_d,
            src_s, cosa, sina)
    # NOTE: through this environment's TPU tunnel, block_until_ready() does
    # NOT synchronize with remote execution — only fetching the value does.
    # All timings force a host fetch of the scalar checksum.
    t0 = time.perf_counter()
    float(np.asarray(make_pipeline(1)(*args)))
    t_compile = time.perf_counter() - t0

    timed = make_pipeline(passes)
    float(np.asarray(timed(*args)))  # compile the n-pass variant
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

    # implied HBM traffic sanity figure: gathers (K rows/target) + weights
    K_b, K_c = ell_b.idx.shape[1], ell_c.idx.shape[1]
    bytes_pass = 4.0 * T * (
        K_b * (src.shape[1] + 2) + src.shape[1]          # bilinear gather+out
        + (1 + K_c) * src_small.shape[1]                  # nstd + cons
        + 2 * (K_b + 1)                                   # idx+w
    )
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
