"""Windowed Pallas apply vs the XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpassit_tpu.mesh.reorder import (
    apply_perm,
    latitude_band_order,
    reorder_cells_by_latitude,
    reorder_cells_morton,
)
from mpassit_tpu.mesh.synthetic import synthetic_voronoi_mesh
from mpassit_tpu.ops.apply import Regridder
from mpassit_tpu.ops.pallas_apply import WindowedRegridder
from mpassit_tpu.weights.bilinear import bilinear_cell_weights

from test_weights import coarse_lambert_grid


@pytest.fixture(scope="module")
def problem():
    mesh = synthetic_voronoi_mesh(ncells=3000, nz=3, nsoil=1, seed=9)
    grid = coarse_lambert_grid(nx=64, ny=40, dx=80e3)
    ro = reorder_cells_morton(mesh, grid.proj)
    ell = bilinear_cell_weights(ro.mesh, grid.lat, grid.lon)
    return mesh, ro, grid, ell


def test_reorder_preserves_geometry(problem):
    mesh, ro, grid, ell = problem
    m2 = ro.mesh
    assert np.allclose(np.sort(m2.lat_cell), np.sort(mesh.lat_cell))
    # connectivity still inverts
    for v in (0, 100, m2.nvertices - 1):
        for c in m2.cells_on_vertex[v]:
            assert v in m2.vertices_on_cell[c]
    # band ordering: lat nondecreasing across band starts
    order = latitude_band_order(mesh.lat_cell, mesh.lon_cell, 5.0)
    assert (np.diff(np.floor((mesh.lat_cell[order] + 90) / 5.0)) >= 0).all()


def test_reorder_equivalent_result(problem):
    """Regrid through the reordered mesh == regrid through the original."""
    mesh, ro, grid, ell = problem
    ell0 = bilinear_cell_weights(mesh, grid.lat, grid.lon)
    f = np.sin(np.deg2rad(mesh.lat_cell)) * np.cos(np.deg2rad(mesh.lon_cell))
    out0 = Regridder(ell0, dtype=jnp.float64).apply_np(f)
    out1 = Regridder(ell, dtype=jnp.float64).apply_np(apply_perm(f, ro.perm))
    np.testing.assert_allclose(out1, out0, atol=1e-12)


def test_windowed_matches_xla(problem):
    mesh, ro, grid, ell = problem
    rng = np.random.default_rng(0)
    src = rng.standard_normal((ro.mesh.ncells, 4)).astype(np.float32)
    ref = Regridder(ell, dtype=jnp.float32).apply_np(src)
    wr = WindowedRegridder(ell, interpret=True)
    out = wr.apply_np(src)
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=1e-6)


def test_windowed_1d_source(problem):
    mesh, ro, grid, ell = problem
    src = np.arange(ro.mesh.ncells, dtype=np.float32)
    ref = Regridder(ell, dtype=jnp.float32).apply_np(src)
    out = WindowedRegridder(ell, interpret=True).apply_np(src)
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=1e-5)


def test_windowed_rejects_too_many_uniques(problem):
    """A fully scattered operator exceeds the per-tile unique-row cap."""
    mesh, ro, grid, ell = problem
    import dataclasses

    rng = np.random.default_rng(1)
    scrambled = dataclasses.replace(ell, idx=rng.integers(
        0, ell.n_src, size=ell.idx.shape).astype(np.int32))
    with pytest.raises(ValueError, match="unique source rows"):
        WindowedRegridder(scrambled, interpret=True)


def test_windowed_works_without_reorder(problem):
    """The slab design has no ordering requirement — original mesh ids
    work too (ordering only helps slab-gather coherence)."""
    mesh, ro, grid, ell = problem
    ell0 = bilinear_cell_weights(mesh, grid.lat, grid.lon)
    src = np.random.default_rng(3).standard_normal(
        (mesh.ncells, 2)).astype(np.float32)
    ref = Regridder(ell0, dtype=jnp.float32).apply_np(src)
    out = WindowedRegridder(ell0, interpret=True).apply_np(src)
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=1e-6)


def test_slab_matmul_matches_xla(problem):
    from mpassit_tpu.ops.matmul_apply import SlabMatmulRegridder

    mesh, ro, grid, ell = problem
    rng = np.random.default_rng(4)
    src = rng.standard_normal((ro.mesh.ncells, 5)).astype(np.float32)
    ref = Regridder(ell, dtype=jnp.float32).apply_np(src)
    # default mode is "highest": f32 operands, Precision.HIGHEST (parity-safe)
    mm = SlabMatmulRegridder(ell)
    assert mm.precision == "highest"
    out = mm.apply_np(src)
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-5)
    # 1-D source
    out1 = mm.apply_np(src[:, 0])
    np.testing.assert_allclose(out1, ref[:, :, 0], rtol=2e-6, atol=2e-5)
    # opt-in speed mode: one MXU pass, compensated bf16x3 product
    out_b = SlabMatmulRegridder(ell, precision="split_bf16").apply_np(src)
    np.testing.assert_allclose(out_b, ref, rtol=1e-4, atol=1e-4)


def test_slab_matmul_column_chunking(problem):
    from mpassit_tpu.ops.matmul_apply import CB, SlabMatmulRegridder

    mesh, ro, grid, ell = problem
    rng = np.random.default_rng(5)
    src = rng.standard_normal((ro.mesh.ncells, CB + 7)).astype(np.float32)
    ref = Regridder(ell, dtype=jnp.float32).apply_np(src)
    out = SlabMatmulRegridder(ell).apply_np(src)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_precision_error_bounds(problem):
    """Backs the documented error claims (ops/matmul_apply.py docstring,
    CMakeLists.txt:80 reference f64 compute): vs an f64 oracle apply,
    precision="highest" carries ~1e-7 relative error (f32 rounding) and
    precision="split_bf16" ~1e-5 (compensated bf16x3 product)."""
    from mpassit_tpu.ops.matmul_apply import SlabMatmulRegridder

    mesh, ro, grid, ell = problem
    rng = np.random.default_rng(7)
    src64 = rng.standard_normal((ro.mesh.ncells, 8))
    ref = Regridder(ell, dtype=jnp.float64).apply_np(src64)
    src32 = src64.astype(np.float32)
    scale = np.abs(ref) + 1.0  # rng values are O(1); guards unmapped zeros

    err_h = np.abs(SlabMatmulRegridder(ell, precision="highest")
                   .apply_np(src32) - ref) / scale
    err_b = np.abs(SlabMatmulRegridder(ell, precision="split_bf16")
                   .apply_np(src32) - ref) / scale
    assert np.quantile(err_h, 0.99) < 5e-7, err_h.max()
    assert err_h.max() < 5e-6
    assert np.quantile(err_b, 0.99) < 5e-5, err_b.max()
    assert err_b.max() < 1e-3
    # the speed mode really is coarser — otherwise the bounds prove nothing
    assert err_b.max() > err_h.max()


def test_split_hilo_residual_survives_jit():
    """Guards the optimization_barrier in _split_hilo: XLA:TPU's algebraic
    simplifier folds f32->bf16->f32 round-trips to identity, zeroing the
    compensation term and silently degrading split_bf16 to plain bf16."""
    import jax
    from mpassit_tpu.ops.matmul_apply import _split_hilo

    x = jnp.asarray(np.float32(1.0) + np.float32(1e-3) *
                    np.arange(1, 257, dtype=np.float32))
    hi, lo = jax.jit(_split_hilo)(x)
    lo32 = np.asarray(lo, np.float32)
    assert (np.abs(lo32) > 0).any(), "residual folded to zero under jit"
    recon = np.asarray(hi, np.float32) + lo32
    np.testing.assert_allclose(recon, np.asarray(x), rtol=2e-5)
    # hi alone must NOT reconstruct (otherwise the test proves nothing)
    assert np.abs(np.asarray(hi, np.float32) - np.asarray(x)).max() > 1e-4
