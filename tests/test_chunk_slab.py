"""Chunked-run gather layout (_chunk_slab) invariants.

The in-kernel gather copies, per tile, NC fixed (CH, Cp) source windows
at CH-aligned starts into a slab scratch; loc8 indexes that scratch. The
contract: for EVERY nonzero-weight ELL entry, the chunk-layout slab slot
holds exactly the source row the original packed slab referenced — for
any run structure (singleton runs, runs crossing CH boundaries, unaligned
starts, pad chunks).
"""

import numpy as np
import pytest

from mpassit_tpu.ops.matmul_apply import CH, TILE, _pack_compact, _pack_union


def _emulate_and_check(idx, w, ny, nx, n_src):
    (slab_idx, loc, loc_w, W, nty, ntx, n_tiles, ntd, nty_p, ch_src,
     loc8, W8) = _pack_compact(_pack_union(idx, w, ny, nx, n_src))
    NC = ch_src.shape[1]
    assert W8 == NC * CH
    assert (ch_src >= 0).all() and (ch_src * CH < n_src).all()
    K = idx.shape[1]
    src = np.arange(n_src, dtype=np.float64)      # row id as payload
    src_pad = np.pad(src, (0, CH))
    # emulate the kernel's DMA copies
    slab8 = np.zeros((n_tiles, W8), np.float64)
    for c in range(NC):
        starts = ch_src[:, c].astype(np.int64) * CH
        for t in range(n_tiles):
            slab8[t, c * CH:(c + 1) * CH] = src_pad[starts[t]:starts[t] + CH]
    lw = loc_w.reshape(n_tiles, TILE * K)
    l8 = loc8.reshape(n_tiles, TILE * K).astype(np.int64)
    lold = loc.reshape(n_tiles, TILE * K).astype(np.int64)
    for t in range(n_tiles):
        val = lw[t] != 0
        want = slab_idx[t][lold[t][val]]          # global source rows
        got = slab8[t, l8[t][val]]
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,n_src", [(0, 3000), (1, 400), (2, 37),
                                        (3, 1900)])
def test_chunk_layout_reproduces_slab(seed, n_src):
    rng = np.random.default_rng(seed)
    ny, nx, K = 40, 70, 3
    T = ny * nx
    idx = np.sort(rng.integers(0, n_src, size=(T, K)).astype(np.int64),
                  axis=1)
    w = rng.random((T, K))
    w[rng.random((T, K)) < 0.2] = 0.0
    _emulate_and_check(idx, w, ny, nx, n_src)


def test_chunk_layout_coherent_rows():
    """Morton-like coherent indices (long runs crossing CH boundaries)."""
    rng = np.random.default_rng(7)
    ny, nx, K, n_src = 64, 64, 4, 5000
    T = ny * nx
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    base = ((jj // 4) * (nx // 4) + ii // 4).reshape(-1) * 3 % (n_src - K - 8)
    idx = base[:, None] + np.arange(K)[None, :]
    w = rng.random((T, K))
    w[rng.random((T, K)) < 0.1] = 0.0
    _emulate_and_check(idx.astype(np.int64), w, ny, nx, n_src)


def test_chunk_layout_row_zero_and_unmapped():
    """Row 0 referenced with real weight (the bug class caught in round
    4: pad entries clipped to position 0 must not clobber its used flag)
    plus fully-unmapped tiles."""
    ny, nx, K, n_src = 33, 34, 3, 100
    T = ny * nx
    idx = np.zeros((T, K), np.int64)
    w = np.zeros((T, K))
    w[: T // 2, 0] = 1.0                  # half the targets: row 0, w=1
    _emulate_and_check(idx, w, ny, nx, n_src)
