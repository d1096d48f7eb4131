"""Fused Mosaic apply kernel (ops/pallas_matmul.py) vs the XLA path.

The kernel must be arithmetically identical to matmul_apply's
_tile_matmul + _unblock composition in both precision modes: same MXU
operand stacking, same output layout. On CPU it runs in interpret mode
(exact emulation); on real TPU hardware test_tpu_native (skipped here)
exercises the Mosaic lowering.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpassit_tpu.ops.matmul_apply import (
    SlabMatmulRegridder,
    _stack_A,
    _tile_matmul,
    _unblock,
)
from mpassit_tpu.ops.pallas_matmul import TILE, fused_apply, fused_available
from mpassit_tpu.weights.bilinear import bilinear_cell_weights


def _rand_problem(rng, nty=2, ntx=3, W=16, Cp=512):
    n_tiles = nty * ntx
    # one-hot-ish non-negative A like production (rows sum <= 1)
    A = rng.random((n_tiles, W, TILE)).astype(np.float32)
    A *= rng.random((n_tiles, W, TILE)) < 3.0 / W
    slab = rng.standard_normal((n_tiles, W, Cp)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(slab)


def test_fused_matches_xla_highest(rng):
    A, slab = _rand_problem(rng)
    ref = _unblock(_tile_matmul(A, slab, precision="highest"), 2, 3)
    got = fused_apply(A, slab, nty=2, ntx=3, precision="highest",
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_matches_xla_split_bf16(rng):
    A, slab = _rand_problem(rng)
    A3 = jax.jit(lambda a: _stack_A(a, axis=1))(A)
    ref = _unblock(_tile_matmul(A3, slab, precision="split_bf16"), 2, 3)
    got = fused_apply(A3, slab, nty=2, ntx=3, precision="split_bf16",
                      interpret=True)
    # identical operand prep -> identical products (interpret emulates
    # the same bf16 split the XLA graph materializes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_fused_matches_xla_split6_bf16(rng):
    from mpassit_tpu.ops.matmul_apply import _stack_A6

    A, slab = _rand_problem(rng)
    A6 = jax.jit(lambda a: _stack_A6(a, axis=1))(A)
    ref = _unblock(_tile_matmul(A6, slab, precision="split6_bf16"), 2, 3)
    got = fused_apply(A6, slab, nty=2, ntx=3, precision="split6_bf16",
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
    # parity-grade accuracy: the six stacked terms land in the same error
    # class as Precision.HIGHEST's six passes
    truth = np.einsum("twp,twc->tpc", np.asarray(A, np.float64),
                      np.asarray(slab, np.float64))
    hi = np.asarray(_unblock(_tile_matmul(A, slab, precision="highest"),
                             2, 3), np.float64)
    t = np.asarray(_unblock(jnp.asarray(truth.astype(np.float32)), 2, 3),
                   np.float64)
    scale = np.abs(t) + 1.0
    err6 = (np.abs(np.asarray(got, np.float64) - t) / scale).max()
    errh = (np.abs(hi - t) / scale).max()
    assert err6 < 5e-6, (err6, errh)


def test_fused_split_is_compensated(rng):
    """The in-kernel hi/lo split must survive compilation: plain-bf16
    products err at ~1e-2; the compensated stack stays under ~1e-4."""
    A, slab = _rand_problem(rng, W=8, Cp=256)
    A3 = jax.jit(lambda a: _stack_A(a, axis=1))(A)
    got = fused_apply(A3, slab, nty=2, ntx=3, precision="split_bf16",
                      interpret=True)
    truth = jnp.einsum("twp,twc->tpc", A.astype(jnp.float64),
                       slab.astype(jnp.float64))
    ref = np.asarray(_unblock(truth.astype(jnp.float32), 2, 3))
    scale = np.abs(slab).max()
    rel = np.abs(np.asarray(got) - ref) / scale
    assert rel.max() < 2e-4, rel.max()


def test_regridder_pallas_backend_matches_xla(small_mesh, rng):
    """End-to-end through SlabMatmulRegridder with backend='pallas'
    (interpret mode on CPU) vs backend='xla' on real bilinear weights."""
    ny, nx = 33, 34       # forces tile padding on both axes
    lat = np.linspace(-25, 25, ny)[:, None] + np.zeros((1, nx))
    lon = np.linspace(-40, 40, nx)[None, :] + np.zeros((ny, 1))
    ell = bilinear_cell_weights(small_mesh, lat.ravel(), lon.ravel())
    ell = dataclasses.replace(ell, dst_shape=(ny, nx))
    src = rng.standard_normal((small_mesh.ncells, 3)).astype(np.float32)

    for precision in ("highest", "split_bf16"):
        rg_x = SlabMatmulRegridder(ell, precision=precision, backend="xla")
        rg_p = SlabMatmulRegridder(ell, precision=precision,
                                   backend="pallas")
        np.testing.assert_allclose(
            rg_p.apply_np(src), rg_x.apply_np(src), rtol=1e-6, atol=1e-7)


def test_fused_packed_checksum_matches_output(rng):
    """with_checksum must (a) leave the written output bit-identical to the
    plain packed call and (b) return per-tile sums equal to sum(out*out)
    over each written 32x32xCp block — the benchmark's materialization
    guard computes the checksum in-kernel instead of re-reading the output
    from HBM."""
    from mpassit_tpu.ops.pallas_matmul import fused_apply_packed

    nty, ntx, W, Cp = 2, 3, 16, 256
    n_tiles = nty * ntx
    A1 = jnp.asarray(rng.random((n_tiles, W, TILE)).astype(np.float32))
    A2 = jnp.asarray(rng.random((n_tiles, W, TILE)).astype(np.float32))
    slab = jnp.asarray(
        rng.standard_normal((n_tiles, W, Cp)).astype(np.float32))
    ranges = ((0, 200), (200, 230))        # tail 230..256 zeroed
    plain = fused_apply_packed((A1, A2), slab, ranges=ranges, nty=nty,
                               ntx=ntx, precision="highest", interpret=True)
    out, ts = fused_apply_packed((A1, A2), slab, ranges=ranges, nty=nty,
                                 ntx=ntx, precision="highest",
                                 interpret=True, with_checksum=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))
    assert ts.shape == (nty, ntx)
    o = np.asarray(out, np.float64)
    ref = np.array([[(o[i * 32:(i + 1) * 32, j * 32:(j + 1) * 32] ** 2).sum()
                     for j in range(ntx)] for i in range(nty)])
    np.testing.assert_allclose(np.asarray(ts, np.float64), ref,
                               rtol=1e-4)


@pytest.mark.parametrize("precision", ["highest", "split_bf16",
                                       "split6_bf16"])
def test_ell_direct_matches_prestacked(rng, precision):
    """The ELL-direct packed kernel (A built in VMEM from loc/w) must be
    bit-identical to the prestacked-A kernel: same f32 one-hot
    accumulation order, same bf16 stacking — only the HBM traffic moves
    (~950 MB/pass of A reads collapse to ~30 MB of loc/w at production
    slab widths)."""
    from mpassit_tpu.ops.matmul_apply import _prep_A
    from mpassit_tpu.ops.pallas_matmul import fused_apply_packed

    nty, ntx, W, Cp = 2, 3, 24, 256
    n_tiles = nty * ntx
    Ks = (3, 2)
    ranges = ((0, 130), (130, 140))
    locs, ws, As = [], [], []
    for K in Ks:
        loc = rng.integers(0, W, size=(n_tiles, K, TILE)).astype(np.int32)
        w = rng.random((n_tiles, K, TILE)).astype(np.float32)
        w *= rng.random((n_tiles, K, TILE)) < 0.8
        locs.append(jnp.asarray(loc))
        ws.append(jnp.asarray(w))
        # prestacked reference A via the setup-time builder
        from mpassit_tpu.ops.matmul_apply import _build_A_T

        A = _build_A_T(jnp.asarray(loc.transpose(0, 2, 1).reshape(-1, K)),
                       jnp.asarray(w.transpose(0, 2, 1).reshape(-1, K)),
                       n_tiles=n_tiles, w_width=W)
        As.append(_prep_A(A, precision, jnp.float32))
    slab = jnp.asarray(
        rng.standard_normal((n_tiles, W, Cp)).astype(np.float32))
    ref = fused_apply_packed(tuple(As), slab, ranges=ranges, nty=nty,
                             ntx=ntx, precision=precision, interpret=True)
    got = fused_apply_packed(None, slab, ranges=ranges, nty=nty, ntx=ntx,
                             precision=precision, interpret=True,
                             locs=tuple(locs), ws=tuple(ws))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # checksum + ELL compose
    out, ts = fused_apply_packed(None, slab, ranges=ranges, nty=nty,
                                 ntx=ntx, precision=precision,
                                 interpret=True, locs=tuple(locs),
                                 ws=tuple(ws), with_checksum=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("precision", ["highest", "split_bf16"])
def test_gather_kernel_matches_take(rng, precision):
    """fused_apply_packed_gather (slab gathered IN-KERNEL by chunked-run
    DMAs) must match the jnp.take + ELL-kernel composition on the same
    operator — the layouts (_chunk_slab) differ, the math must not."""
    from mpassit_tpu.ops.matmul_apply import (
        CH,
        TILE,
        _pack_compact,
        _pack_union,
    )
    from mpassit_tpu.ops.pallas_matmul import (
        fused_apply_packed,
        fused_apply_packed_gather,
    )

    ny, nx, n_src, K, Cp = 40, 70, 500, 3, 128
    T = ny * nx
    idx = np.sort(rng.integers(0, n_src, size=(T, K)).astype(np.int64),
                  axis=1)
    w = rng.random((T, K))
    w[rng.random((T, K)) < 0.15] = 0.0
    (slab_idx, loc, loc_w, W, nty, ntx, n_tiles, ntd, nty_p, ch_src,
     loc8, W8) = _pack_compact(_pack_union(idx, w, ny, nx, n_src))
    src = rng.standard_normal((n_src, Cp)).astype(np.float32)
    src_pad = jnp.asarray(np.pad(src, ((0, CH), (0, 0))))
    loc3 = jnp.asarray(loc.reshape(n_tiles, TILE, K)
                       .transpose(0, 2, 1).astype(np.int32))
    loc83 = jnp.asarray(loc8.reshape(n_tiles, TILE, K)
                        .transpose(0, 2, 1).astype(np.int32))
    w3 = jnp.asarray(loc_w.reshape(n_tiles, TILE, K)
                     .transpose(0, 2, 1).astype(np.float32))
    slab = jnp.take(jnp.asarray(src), jnp.asarray(slab_idx), axis=0)
    ref = fused_apply_packed(None, slab, ranges=((0, Cp),), nty=nty,
                             ntx=ntx, precision=precision, interpret=True,
                             locs=(loc3,), ws=(w3,))
    got = fused_apply_packed_gather(
        src_pad, jnp.asarray(ch_src.astype(np.int32)), (loc83,), (w3,),
        W8=W8, ranges=((0, Cp),), nty=nty, ntx=ntx, precision=precision,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # checksum variant composes
    out, ts = fused_apply_packed_gather(
        src_pad, jnp.asarray(ch_src.astype(np.int32)), (loc83,), (w3,),
        W8=W8, ranges=((0, Cp),), nty=nty, ntx=ntx, precision=precision,
        interpret=True, with_checksum=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(got))


def test_fused_available_guard():
    assert fused_available(16, "split_bf16")
    assert fused_available(512, "highest")
    assert not fused_available(32768, "highest")


def test_backend_validation(small_mesh):
    lat = np.zeros((8, 8)) + 1.0
    lon = np.zeros((8, 8)) + 1.0
    ell = bilinear_cell_weights(small_mesh, lat.ravel(), lon.ravel())
    ell = dataclasses.replace(ell, dst_shape=(8, 8))
    with pytest.raises(ValueError, match="backend"):
        SlabMatmulRegridder(ell, backend="cuda")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs real TPU for Mosaic lowering")
def test_tpu_native(rng):
    A, slab = _rand_problem(rng)
    ref = np.asarray(_unblock(_tile_matmul(A, slab, precision="highest"),
                              2, 3))
    got = np.asarray(fused_apply(A, slab, nty=2, ntx=3,
                                 precision="highest"))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs real TPU for Mosaic lowering")
def test_tpu_native_packed_rotate(rng):
    """Mosaic-lowers the packed kernel WITH in-kernel rotation on hardware —
    interpret mode does not enforce TPU block-shape rules (a (TY, TX) block
    of a flat 2-D cosa array passes interpret but fails Mosaic; the
    tile-blocked (1, TY, TX) layout is load-bearing)."""
    from mpassit_tpu.ops.pallas_matmul import fused_apply_packed

    nty, ntx, W, Cp = 2, 3, 16, 256
    n_tiles = nty * ntx
    A1 = jnp.asarray(rng.random((n_tiles, W, TILE)).astype(np.float32))
    A2 = jnp.asarray(rng.random((n_tiles, W, TILE)).astype(np.float32))
    slab = jnp.asarray(
        rng.standard_normal((n_tiles, W, Cp)).astype(np.float32))
    ranges = ((0, 200), (200, 230))
    alpha = rng.uniform(-0.3, 0.3, (n_tiles, 32, 32)).astype(np.float32)
    cosa, sina = jnp.asarray(np.cos(alpha)), jnp.asarray(np.sin(alpha))
    rot = ((0, 4, 4),)
    base = fused_apply_packed((A1, A2), slab, ranges=ranges, nty=nty,
                              ntx=ntx, precision="highest")
    got = fused_apply_packed((A1, A2), slab, ranges=ranges, nty=nty,
                             ntx=ntx, precision="highest",
                             rotate=rot, cosa=cosa, sina=sina)
    from mpassit_tpu.ops.rotate import rotate_winds

    cg = np.asarray(cosa).reshape(nty, ntx, 32, 32).transpose(
        0, 2, 1, 3).reshape(nty * 32, ntx * 32)
    sg = np.asarray(sina).reshape(nty, ntx, 32, 32).transpose(
        0, 2, 1, 3).reshape(nty * 32, ntx * 32)
    u, v = rotate_winds(base[:, :, 0:4], base[:, :, 4:8],
                        jnp.asarray(cg), jnp.asarray(sg))
    np.testing.assert_allclose(np.asarray(got[:, :, 0:4]), np.asarray(u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[:, :, 4:8]), np.asarray(v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[:, :, 8:]),
                                  np.asarray(base[:, :, 8:]))
