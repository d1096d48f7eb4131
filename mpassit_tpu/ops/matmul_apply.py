"""MXU-native ELL apply: per-tile one-hot matmul over packed source slabs.

The ELL apply is a random K-row gather per target — XLA's HBM gather runs at
~10% of peak on v5e, and Mosaic's in-VMEM dynamic_gather is VPU-bound and
slower still. But the operator is spatially coherent: a 32x32 tile of
target points references only ~12-40 unique source rows (post-processing
grids are finer than the source mesh). That turns the gather into dense
linear algebra:

    A[t]    (W x TILE)   one-hot-weighted, TRANSPOSED layout:
                         A[t, r, p] = sum_k w[p, k] over k with
                         loc[p, k] == r  (built ONCE, on device)
    slab[t] (W x C)      = src[slab_idx[t]]         (one coherent gather)
    out[t]  (TILE x C)   = A[t]^T @ slab[t]         (batched MXU matmul)

Layout matters twice on TPU:

- W sits on the SUBLANE dim of both operands (pad-to-8/16), not the lane
  dim (pad-to-128): with W=16 typical, the old (TILE, W)-layout A padded
  8x in HBM and forced a 128-deep contraction. Transposed, A and slab
  shrink to their true W.
- precision: the default "split_bf16" mode splits A and slab into
  bf16 (hi, lo) pairs STACKED along the contraction dim — A as
  (Ah, Ah, Al), slab as (Sh, Sl, Sh) — so ONE default-precision MXU pass
  over 3W computes Ah@Sh + Ah@Sl + Al@Sh, the bf16x3 compensated product
  (max rel err ~2e-5, p99 ~1e-5 vs the f64 oracle on CONUS weights; the
  f32 file output the reference writes carries 6e-8). One bf16 pass
  (3W <= 128) replaces the 6 passes of precision=highest: measured
  6.8 ms vs 27.5 ms per 1024-col CONUS pass on v5e. "highest" mode (f32
  operands, Precision.HIGHEST) is kept for strict-parity runs
  (p99 rel err ~1e-7).

Host->device traffic at setup is only the (T, K) loc/w arrays (~46 MB);
A is materialized on device by K one-hot accumulations (important: the
TPU tunnel in this environment makes large host transfers very slow).
"""

from __future__ import annotations

import hashlib
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TY = 32
TX = 32
TILE = TY * TX
# column padding quantum: the f32 lane width — the narrowest column count
# the TPU stores at full efficiency. Padding further (the old CB=256
# quantum) is pure HBM write amplification: a 2-col conservative bundle
# wrote 128x its useful bytes. Distinct padded widths each compile once;
# the persistent XLA compilation cache amortizes that across runs.
LANE = 128
# columns per MXU sub-chunk / host-fetch strip (wide batched matmuls
# compile pathologically slowly through remote Mosaic tunnels).
CB = 256
# columns per fused-kernel launch in apply_np: bounds peak device residency
# to one (nyp, nxp, FETCH) output group.
FETCH = 512
W_STEP = 8          # slab width quantum (f32 sublane)
# max unique source rows per tile: a 32x32 EDGE-stagger tile regridding
# from the structured mass grid references a (33, 33) window = 1089 rows,
# so the cap sits above that; VMEM routing (fused_available/ell_fits_vmem)
# decides kernel vs XLA per W, and truly pathological operators still fall
# back to the gather engine
W_CAP = 2048

#: apply numerics:
#: - "split6_bf16": 3-way bf16 operand split, the SIX compensated product
#:   terms stacked along the contraction dim — ONE default-precision MXU
#:   pass delivers ~1e-7 rel err (the same six terms XLA's
#:   Precision.HIGHEST computes in six separate passes; with W=16 the
#:   6W=96 stack still pads to the MXU's 128 depth, so parity-grade
#:   accuracy costs exactly one pass). The pipeline default.
#: - "highest": f32 operands at Precision.HIGHEST (XLA's own bf16_6x,
#:   six MXU passes, ~1e-7) — the strict-parity reference implementation
#:   the split6 mode is validated against.
#: - "split_bf16": 2-way split, three stacked terms, ~1e-5 rel err — the
#:   fastest mode when W is large enough that the 6W stack costs extra
#:   MXU passes (6W > 128).
PRECISIONS = ("split_bf16", "split6_bf16", "highest")


@partial(jax.jit, static_argnames=("n_tiles", "w_width"))
def _build_A_T(loc, w, n_tiles, w_width):
    """(T, K) local indices + weights -> (n_tiles, W, TILE) one-hot sums
    (transposed layout: W on the sublane/contraction dim)."""
    T, K = loc.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, w_width), 1)
    A = jnp.zeros((T, w_width), jnp.float32)
    for k in range(K):
        A = A + jnp.where(cols == loc[:, k:k + 1], w[:, k:k + 1], 0.0)
    return A.reshape(n_tiles, TILE, w_width).swapaxes(1, 2)


GRID_AXIS = "grid"   # mesh axis name shared with parallel/sharding.py


@partial(jax.jit, donate_argnums=0)
def _insert_cols(buf, block, off):
    zero = jnp.zeros((), dtype=jnp.asarray(off).dtype)
    return jax.lax.dynamic_update_slice(buf, block, (zero, off))


def _src_to_device(src, Cp, sharding=None):
    """Host source -> (n_src, Cp) f32 device array, zero-padded columns.

    Accepts one (n_src, C) array OR a list of column blocks summing to C:
    blocks upload individually into a DONATED device buffer
    (dynamic_update_slice in place), so the host never materializes the
    concatenated matrix (~10 GB at 2.6M cells x 973 cols) and device peak
    is buffer + one block (VERDICT r3 item 3; the reference's analog frees
    each scratch array after scattering, input_data.F90:191-196)."""
    if not isinstance(src, (list, tuple)):
        src = np.asarray(src, dtype=np.float32)
        pad = Cp - src.shape[1]
        if pad:
            src = np.pad(src, ((0, 0), (0, pad)))
        dev = jnp.asarray(src)
        return jax.device_put(dev, sharding) if sharding is not None else dev
    n_src = src[0].shape[0]
    buf = jnp.zeros((n_src, Cp), jnp.float32)
    if sharding is not None:
        buf = jax.device_put(buf, sharding)
    off = 0
    for b in src:
        b = np.ascontiguousarray(np.asarray(b, dtype=np.float32))
        if b.ndim == 1:
            b = b[:, None]
        bd = jnp.asarray(b)
        if sharding is not None:
            bd = jax.device_put(bd, sharding)
        buf = _insert_cols(buf, bd, off)
        off += b.shape[1]
    return buf


def _src_window_to_device(src, lo, gw, sharding=None):
    """Packed-column window [lo, lo+gw) of a host block list -> (n_src, gw)
    f32 device buffer (zero-padded past the data columns). The
    device-memory-bounded production apply uploads one column group at a
    time instead of the full (n_src, Cp) matrix (10.6 GB at 2.6M cells x
    1024 packed cols — more than half of a v5e's HBM)."""
    blocks = src if isinstance(src, (list, tuple)) else [src]
    n_src = np.asarray(blocks[0]).shape[0]
    buf = jnp.zeros((n_src, gw), jnp.float32)
    if sharding is not None:
        buf = jax.device_put(buf, sharding)
    off = 0
    for b in blocks:
        bw = 1 if np.asarray(b).ndim == 1 else np.asarray(b).shape[1]
        a, c = max(off, lo), min(off + bw, lo + gw)
        if a < c:
            bb = np.asarray(b, dtype=np.float32)
            bb = bb[:, None] if bb.ndim == 1 else bb[:, a - off:c - off]
            bd = jnp.asarray(np.ascontiguousarray(bb))
            if sharding is not None:
                bd = jax.device_put(bd, sharding)
            buf = _insert_cols(buf, bd, a - lo)
        off += bw
    return buf


def _split_hilo(x):
    """f32 -> (hi, lo) bf16 pair with x ~= hi + lo.

    The optimization_barrier is load-bearing: XLA:TPU's algebraic
    simplifier folds the f32->bf16->f32 round-trip to identity, which
    silently turns ``lo`` into exact zero and the compensated product into
    plain bf16 (measured: max rel err 1.9e-2 instead of ~1e-5)."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _stack_A(A, axis):
    """A f32 -> (Ah, Ah, Al) stacked bf16: pairs with (Sh, Sl, Sh) so the
    stacked contraction computes Ah@Sh + Ah@Sl + Al@Sh — the three leading
    terms of the compensated f32 product (the dropped Al@Sl term is
    O(2^-18) relative)."""
    hi, lo = _split_hilo(A)
    return jnp.concatenate([hi, hi, lo], axis=axis)


def _stack_S(S, axis):
    """S f32 -> (Sh, Sl, Sh) stacked bf16 (see _stack_A)."""
    hi, lo = _split_hilo(S)
    return jnp.concatenate([hi, lo, hi], axis=axis)


def _split_3way(x):
    """f32 -> (b0, b1, b2) bf16 triple with x ~= b0 + b1 + b2 to ~2^-24.

    Same optimization_barrier rationale as _split_hilo: without it the
    round-trips fold to identity and the residuals collapse to zero."""
    b0 = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r1 = x - b0.astype(jnp.float32)
    b1 = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return b0, b1, b2


def _stack_A6(A, axis):
    """A f32 -> (A0, A0, A1, A0, A1, A2) stacked bf16: pairs with
    (S0, S1, S0, S2, S1, S0) so ONE stacked contraction computes
    A0S0 + A0S1 + A1S0 + A0S2 + A1S1 + A2S0 — the six leading terms of
    the compensated f32 product (what XLA's Precision.HIGHEST computes in
    six separate MXU passes; the dropped A1S2+A2S1+A2S2 terms are
    O(2^-24) relative, so rel err lands at ~1e-7)."""
    a0, a1, a2 = _split_3way(A)
    return jnp.concatenate([a0, a0, a1, a0, a1, a2], axis=axis)


def _stack_S6(S, axis):
    """S f32 -> (S0, S1, S0, S2, S1, S0) stacked bf16 (see _stack_A6)."""
    s0, s1, s2 = _split_3way(S)
    return jnp.concatenate([s0, s1, s0, s2, s1, s0], axis=axis)


def _prep_A(A, precision, dtype):
    """Pre-split/cast a freshly-built f32 A for the chosen precision."""
    if precision == "split_bf16":
        return jax.jit(partial(_stack_A, axis=1))(A)
    if precision == "split6_bf16":
        return jax.jit(partial(_stack_A6, axis=1))(A)
    return A.astype(dtype)


@partial(jax.jit, static_argnames=("precision",))
def _tile_matmul(A, slab, precision="split_bf16"):
    """Batched per-tile apply: out (n_tiles, TILE, C).

    A: (n_tiles, 3W, TILE) bf16 pre-split  when precision == "split_bf16"
       (n_tiles, 6W, TILE) bf16 pre-split  when precision == "split6_bf16"
       (n_tiles,  W, TILE) f32             when precision == "highest"
    slab: (n_tiles, W, C) f32 — split on the fly in split modes.

    split modes: one default-precision bf16 MXU pass over the stacked
    contraction dim computes the compensated product (see _stack_A /
    _stack_A6); f32 accumulation via preferred_element_type.
    """
    if precision == "split_bf16":
        slab = _stack_S(slab, axis=1)
        prec = jax.lax.Precision("default")
    elif precision == "split6_bf16":
        slab = _stack_S6(slab, axis=1)
        prec = jax.lax.Precision("default")
    else:
        prec = jax.lax.Precision(precision)
    return jax.lax.dot_general(
        A, slab,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


@partial(jax.jit, static_argnames=("nty", "ntx"))
def _unblock(out_tiles, nty, ntx):
    """(n_tiles, TILE, C) -> (nty*TY, ntx*TX, C)."""
    C = out_tiles.shape[2]
    a = out_tiles.reshape(nty, ntx, TY, TX, C)
    return a.transpose(0, 2, 1, 3, 4).reshape(nty * TY, ntx * TX, C)


def _tile_block(arr_g, nty, ntx, K):
    return arr_g.reshape(nty, TY, ntx, TX, K).transpose(
        0, 2, 1, 3, 4).reshape(-1, K)


def _pack_union(idx, w, ny, nx, n_src, mesh=None):
    """Tile-block an ELL operator (or the K-concatenation of several over
    the same source row space) and compute, per 32x32 target tile, the
    packed union of unique source rows plus each entry's local slab index.

    Returns (slab_idx (n_tiles, W), loc (n_tiles, TILE*K), loc_w, W, nty,
    ntx, n_tiles, n_tiles_data, nty_p)."""
    K = idx.shape[1]
    nty = -(-ny // TY)
    ntx = -(-nx // TX)
    nyp, nxp = nty * TY, ntx * TX
    idx_g = np.zeros((nyp, nxp, K), np.int64)
    w_g = np.zeros((nyp, nxp, K), np.float64)
    idx_g[:ny, :nx] = idx.reshape(ny, nx, K)
    w_g[:ny, :nx] = w.reshape(ny, nx, K)
    idx_b = _tile_block(idx_g, nty, ntx, K)
    w_b = _tile_block(w_g, nty, ntx, K)

    n_tiles = nty * ntx
    S1 = n_src + 1                            # per-tile sentinel spacing
    tid = idx_b.reshape(n_tiles, TILE * K)
    valid = (w_b != 0).reshape(n_tiles, TILE * K)

    # --- vectorized per-tile unique + searchsorted ---------------------
    # offset each tile's ids into a disjoint range, sentinel = tile max
    offs = (np.arange(n_tiles, dtype=np.int64) * S1)[:, None]
    coded = np.where(valid, tid, n_src) + offs           # (n_tiles, T*K)
    s = np.sort(coded, axis=1)
    first = np.ones_like(s, dtype=bool)
    first[:, 1:] = s[:, 1:] != s[:, :-1]
    is_real = (s - offs) < n_src
    uniq_mask = first & is_real
    counts = uniq_mask.sum(axis=1)
    max_u = max(int(counts.max()), 1)
    if max_u > W_CAP:
        raise ValueError(
            f"tile references {max_u} unique source rows > {W_CAP}")
    W = -(-max_u // W_STEP) * W_STEP

    # packed sorted unique ids per tile (sentinel-padded)
    slab_coded = np.full((n_tiles, W), -1, dtype=np.int64)
    pos = np.cumsum(uniq_mask, axis=1) - 1
    trows = np.broadcast_to(np.arange(n_tiles)[:, None], s.shape)
    slab_coded[trows[uniq_mask], pos[uniq_mask]] = s[uniq_mask]
    pad = slab_coded < 0
    slab_coded[pad] = (offs + n_src).repeat(W, axis=1)[pad]

    # global searchsorted over the disjointly-offset key space: each
    # tile's sorted uniques are < its sentinel pads (offs + n_src),
    # which are < the next tile's smallest key (offs + n_src + 1), so
    # the flattened key array is globally nondecreasing
    flat_keys = slab_coded.reshape(-1)
    loc_flat = np.searchsorted(flat_keys, coded.reshape(-1))
    loc = (loc_flat - np.repeat(np.arange(n_tiles), TILE * K) * W).astype(
        np.int32).reshape(n_tiles, TILE * K)
    loc = np.clip(np.where(valid, loc, 0), 0, W - 1)

    slab_idx = np.where(pad, 0, slab_coded - offs).astype(np.int64)
    loc_w = np.where(valid, w_b.reshape(n_tiles, TILE * K), 0.0)

    # pad whole TILE-ROWS to a device multiple when sharding, so each
    # device's tile shard is a horizontal band of the target grid — the
    # layout both the XLA path and the fused kernel (which needs a
    # rectangular (nty_local, ntx) grid per device) can consume, and the
    # analog of ESMF's regDecomp row bands (model_grid.F90:694)
    n_tiles_data = n_tiles
    nty_p = nty
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        tpad_rows = (-nty) % n_dev
        if tpad_rows:
            tpad = tpad_rows * ntx
            slab_idx = np.concatenate(
                [slab_idx, np.zeros((tpad, W), np.int64)], axis=0)
            loc = np.concatenate(
                [loc, np.zeros((tpad, TILE * K), np.int32)], axis=0)
            loc_w = np.concatenate(
                [loc_w, np.zeros((tpad, TILE * K), np.float64)], axis=0)
            n_tiles += tpad
            nty_p = nty + tpad_rows

    return slab_idx, loc, loc_w, W, nty, ntx, n_tiles, n_tiles_data, nty_p


#: rows per in-kernel gather DMA chunk (f32 sublane granule)
CH = 8


def _chunk_slab(slab_idx, loc, loc_w, W):
    """Chunked-run layout for the in-kernel gather: per tile, the sorted
    unique source rows cluster into contiguous runs under Morton ordering
    (measured: ~20 runs / ~25 8-row chunks per tile at the 2.6M-cell
    W=80 load; ~7 at CONUS W=16). Each run becomes ceil(L/CH) fixed-size
    (CH, Cp) DMA copies from src into a per-tile slab scratch whose slots
    are CH-padded per run — the whole slab gather is ~25 descriptor
    issues per tile instead of a separate XLA gather pass over HBM.

    Chunk starts are CH-ALIGNED source rows (stored divided by CH —
    Mosaic can only prove the (8, 128)-tiled HBM slice legal when the
    row offset is an explicit multiple of 8), so each run's copies cover
    [floor(r0/CH)*CH, r0+L) and its rows land at slot base + (r0 - a0)
    + i.

    Returns (ch_src (n_tiles, NC) int32 chunk starts DIVIDED BY CH (pad
    chunks point at row 0 and land in slots no weight references), loc8
    (n_tiles, TILE*K) remapped local indices, W8 = NC*CH)."""
    n_tiles, W_ = slab_idx.shape
    lw = np.asarray(loc_w).reshape(n_tiles, -1)
    lc = np.asarray(loc).reshape(n_tiles, -1).astype(np.int64)
    used = np.zeros((n_tiles, W_), bool)
    # set-only-True scatter: loc has duplicates (several ELL entries per
    # row, plus w=0 pads clipped to position 0) — put_along_axis would
    # let a later pad overwrite a real row's True
    sel = lw != 0
    flat = (np.arange(n_tiles)[:, None] * W_ + lc)[sel]
    used.reshape(-1)[flat] = True
    chunks = []
    pos_maps = np.zeros((n_tiles, W_), np.int64)
    for t in range(n_tiles):
        rows_t = np.asarray(slab_idx[t])
        u = used[t]
        # slab rows are sorted unique; runs = consecutive-row groups
        upos = np.nonzero(u)[0]
        ch_t = []
        if len(upos):
            rows = rows_t[upos]
            brk = np.nonzero(np.diff(rows) != 1)[0]
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk + 1, [len(rows)]))
            pm = np.zeros(W_, np.int64)
            for s0, e0 in zip(starts, ends):
                base = len(ch_t) * CH
                r0 = int(rows[s0])
                a0 = (r0 // CH) * CH          # aligned coverage start
                for a in range(a0, int(rows[e0 - 1]) + 1, CH):
                    ch_t.append(a // CH)
                pm[upos[s0:e0]] = base + (r0 - a0) + np.arange(e0 - s0)
            pos_maps[t] = pm
        chunks.append(ch_t)
    NC = max(1, max(len(c) for c in chunks))
    ch_src = np.zeros((n_tiles, NC), np.int32)
    for t, c in enumerate(chunks):
        ch_src[t, :len(c)] = c
    loc8 = np.take_along_axis(pos_maps, lc, axis=1)
    W8 = NC * CH
    ldt = np.uint8 if W8 <= 256 else (np.int16 if W8 <= 32767 else np.int32)
    return ch_src, loc8.astype(ldt), W8


#: pack-cache layout version — bump when _pack_union's output changes
_PACK_VERSION = 4


def _pack_cache_path(cache_dir, ell_fps, ny, nx, n_dev):
    h = hashlib.sha256()
    h.update(f"v{_PACK_VERSION}|{TY}x{TX}|{W_STEP}|{W_CAP}|"
             f"{ny}x{nx}|{n_dev}".encode())
    for fp in ell_fps:
        h.update(b"|" + fp.encode())
    return os.path.join(cache_dir, f"pack_{h.hexdigest()[:20]}")


def _pack_compact(out):
    """Shrink _pack_union's output to the dtypes the consumers need (loc
    values are < W — uint8/int16 instead of int32, also the host->device
    bytes; loc_w only ever feeds the f32 A build) and derive the
    chunked-run gather layout (_chunk_slab)."""
    slab_idx, loc, loc_w, W, nty, ntx, n_tiles, ntd, nty_p = out
    ldt = np.uint8 if W <= 256 else (np.int16 if W <= 32767 else np.int32)
    ch_src, loc8, W8 = _chunk_slab(slab_idx, loc, loc_w, W)
    return (slab_idx, loc.astype(ldt), loc_w.astype(np.float32), W, nty,
            ntx, n_tiles, ntd, nty_p, ch_src, loc8, W8)


def _pack_union_cached(idx_w_fn, ny, nx, n_src, mesh=None, cache_dir=None,
                       ell_fps=None):
    """Disk-cached _pack_union (VERDICT r3 item 4): the host-side union
    pack is a pure function of the ELL operators and the tile geometry —
    ~8 s per warm run at CONUS scale that the reference re-pays every run
    inside RegridStore (interp.F90:123-128) but a rerun-oriented tool
    should not. Keyed by the ELLs' content fingerprints so any weight
    change invalidates. ``idx_w_fn`` is a thunk returning the (idx, w)
    K-concatenation — only evaluated on a miss (the concatenation itself
    is ~1 s of host time at CONUS scale)."""
    from ..diskcache import load_arrays, save_arrays

    n_dev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    path = None
    if cache_dir and ell_fps:
        os.makedirs(cache_dir, exist_ok=True)
        path = _pack_cache_path(cache_dir, ell_fps, ny, nx, n_dev)
        hit = load_arrays(path)
        if hit is not None:
            try:
                meta, arrs = hit
                return (arrs["slab_idx"], arrs["loc"], arrs["loc_w"],
                        int(meta["W"]), int(meta["nty"]), int(meta["ntx"]),
                        int(meta["n_tiles"]), int(meta["n_tiles_data"]),
                        int(meta["nty_p"]), arrs["ch_src"], arrs["loc8"],
                        int(meta["W8"]))
            except KeyError:
                pass  # incomplete entry: rebuild
    idx, w = idx_w_fn()
    out = _pack_compact(_pack_union(idx, w, ny, nx, n_src, mesh=mesh))
    if path is not None:
        (slab_idx, loc, loc_w, W, nty, ntx, n_tiles, ntd, nty_p,
         ch_src, loc8, W8) = out
        save_arrays(
            path,
            {"W": W, "nty": nty, "ntx": ntx, "n_tiles": n_tiles,
             "n_tiles_data": ntd, "nty_p": nty_p, "W8": W8},
            {"slab_idx": slab_idx, "loc": loc, "loc_w": loc_w,
             "ch_src": ch_src, "loc8": loc8})
    return out


class SlabMatmulRegridder:
    """Tile-blocked ELL operator applied as batched one-hot matmuls.

    Raises ValueError when a tile references more than W_CAP unique source
    rows (fallback: ops.apply.Regridder).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the tile axis of A and
    slab_idx is sharded across devices and the source stays replicated —
    the multi-chip configuration: each chip gathers and multiplies only its
    own tiles, no collectives on the hot path (the reference's equivalent is
    the ESMF target-grid decomposition, model_grid.F90:687-703).

    ``backend`` selects the apply engine: "pallas" = the fused Mosaic kernel
    (ops/pallas_matmul.py — unblock + bf16 split fused, A VMEM-resident;
    single-device only), "xla" = the portable dot_general path, "auto"
    (default) = pallas on an unsharded TPU backend when the tile working set
    fits VMEM, xla otherwise.
    """

    #: apply_np accepts a list of column blocks (device-side assembly)
    accepts_blocks = True

    def __init__(self, ell, dtype=jnp.float32, precision: str = "highest",
                 mesh=None, backend: str = "auto", cache_dir=None):
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        if precision not in PRECISIONS:
            raise ValueError(f"precision must be one of {PRECISIONS}")
        self.precision = precision
        self.mesh = mesh
        self.cache_dir = cache_dir
        if len(ell.dst_shape) != 2:
            raise ValueError("SlabMatmulRegridder needs a 2-D dst_shape")
        ny, nx = ell.dst_shape
        K = ell.idx.shape[1]
        self.n_src = ell.n_src
        self.dst_shape = (ny, nx)

        (slab_idx, loc, loc_w, W, self.nty, self.ntx, n_tiles,
         self.n_tiles_data, self.nty_p, self._ch_src, self._loc8,
         self.W8) = _pack_union_cached(
            lambda: (np.asarray(ell.idx, dtype=np.int64),
                     np.asarray(ell.w, dtype=np.float64)),
            ny, nx, self.n_src, mesh=mesh, cache_dir=cache_dir,
            ell_fps=(ell.fingerprint(),) if cache_dir else None)

        self.W = W
        self.n_tiles = n_tiles
        self._tile3_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            self._tile_sharding = NamedSharding(mesh, P(axis, None))
            self._tile3_sharding = NamedSharding(mesh, P(axis, None, None))
            self._src_sharding = NamedSharding(mesh, P())
            # device_put the HOST array directly: placing an already
            # device-committed array onto a cross-process sharding is not
            # multi-controller safe
            self.slab_idx = jax.device_put(slab_idx, self._tile_sharding)
        else:
            self._src_sharding = None
            self.slab_idx = jnp.asarray(slab_idx)
        self._dtype = dtype
        self._K = K
        self._loc_host, self._w_host = loc, loc_w
        # ELL-direct fused kernel (default): the kernel builds A in VMEM
        # from (n_tiles, K, TILE) loc/w blocks — ~8K HBM bytes per target
        # instead of 6W/12W for a prestacked A, the dominant non-output
        # traffic at production slab widths (W=80: ~950 MB/pass saved).
        # MPASSIT_ELL_KERNEL=0 restores the prestacked-A kernel; the XLA
        # path always uses the prestacked A (built lazily on first use).
        self._ell_kernel = os.environ.get("MPASSIT_ELL_KERNEL", "1") != "0"
        self._A = None
        self._locw_dev = None
        self.duplication = n_tiles * W / max(ell.n_src, 1)
        # jitted shard_map wrappers for the fused sharded path, built lazily
        # ONCE per use_ell mode and reused — rebuilding per call would
        # re-trace/re-compile on the hot per-bundle path (ADVICE r2);
        # keyed by use_ell because it depends on the per-call Cp (ADVICE r4)
        self._fused_sharded = {}

    @property
    def A(self):
        """Prestacked one-hot operator, built on device on first use (the
        XLA path and the non-ELL kernel consume it; the ELL-direct kernel
        never materializes it)."""
        if self._A is None:
            if self.mesh is not None:
                build = jax.jit(
                    _build_A_T, static_argnames=("n_tiles", "w_width"),
                    out_shardings=self._tile3_sharding)
            else:
                build = _build_A_T
            A = build(
                jnp.asarray(np.ascontiguousarray(
                    self._loc_host.reshape(-1, self._K))),
                jnp.asarray(np.ascontiguousarray(
                    self._w_host.reshape(-1, self._K)), dtype=jnp.float32),
                n_tiles=self.n_tiles, w_width=self.W,
            )
            self._A = _prep_A(A, self.precision, self._dtype)
        return self._A

    def _ell_dev(self):
        """loc/w in the kernel's (n_tiles, K, TILE) layout, on device."""
        if self._locw_dev is None:
            loc3 = np.ascontiguousarray(
                np.asarray(self._loc_host)
                .reshape(self.n_tiles, TILE, self._K)
                .transpose(0, 2, 1)).astype(np.int32)
            w3 = np.ascontiguousarray(
                np.asarray(self._w_host)
                .reshape(self.n_tiles, TILE, self._K)
                .transpose(0, 2, 1)).astype(np.float32)
            if self.mesh is not None:
                self._locw_dev = (
                    jax.device_put(loc3, self._tile3_sharding),
                    jax.device_put(w3, self._tile3_sharding))
            else:
                self._locw_dev = (jnp.asarray(loc3), jnp.asarray(w3))
        return self._locw_dev

    def _gather_dev(self):
        """(ch_src, loc8, w) device arrays for the in-kernel-gather
        kernel (chunk starts + chunk-layout local indices)."""
        if getattr(self, "_gather_cache", None) is None:
            loc83 = np.ascontiguousarray(
                np.asarray(self._loc8)
                .reshape(self.n_tiles, TILE, self._K)
                .transpose(0, 2, 1)).astype(np.int32)
            w3 = np.ascontiguousarray(
                np.asarray(self._w_host)
                .reshape(self.n_tiles, TILE, self._K)
                .transpose(0, 2, 1)).astype(np.float32)
            self._gather_cache = (
                jnp.asarray(np.asarray(self._ch_src, np.int32)),
                jnp.asarray(loc83), jnp.asarray(w3))
        return self._gather_cache

    def _use_gather(self, Cp) -> bool:
        """Route to the in-kernel-gather kernel? OPT-IN
        (MPASSIT_GATHER_KERNEL=1): honest A/B on v5e measured the chunk
        DMA descriptors costing ~4 us/tile even double-buffered
        (20.0 ms/pass vs 16.5 for take+kernel at the 2.6M-cell load) —
        the hardware scatter-gather engine behind XLA's take beats ~35
        per-tile descriptor issues. Kept as a variant: it removes the HBM
        slab array entirely (peak-memory lever) and its economics flip if
        W grows or descriptor issue gets cheaper. Real-TPU single-device
        only."""
        from .pallas_matmul import gather_fits_vmem

        return (self._ell_kernel and self.mesh is None
                and self.backend != "xla"
                and os.environ.get("MPASSIT_GATHER_KERNEL", "0") == "1"
                and jax.default_backend() == "tpu"
                and gather_fits_vmem(self.W8, (self._K,), Cp,
                                     self.precision))

    def _gather_full(self, src_dev_padded, Cp):
        """(n_src+CH, Cp) src -> (nyp_p, nxp, Cp) with the slab gathered
        in-kernel (fused_apply_packed_gather)."""
        from .pallas_matmul import fused_apply_packed_gather

        ch, loc8, w = self._gather_dev()
        return fused_apply_packed_gather(
            src_dev_padded, ch, (loc8,), (w,), W8=self.W8,
            ranges=((0, Cp),), nty=self.nty, ntx=self.ntx,
            precision=self.precision)

    def _use_fused(self) -> bool:
        """Route to the fused Pallas kernel? With a mesh, each device runs
        the kernel on its own tile-row band inside a shard_map."""
        if self.backend == "xla":
            return False
        from .pallas_matmul import fused_available

        if self.backend == "pallas":
            return True
        return (jax.default_backend() == "tpu"
                and fused_available(self.W, self.precision))

    def _fused_full(self, slab):
        """(n_tiles, W, Cp) slab -> (nyp_p, nxp, Cp) via the Mosaic kernel.

        Off-TPU (tests forcing backend="pallas") the kernel runs in
        interpret mode — bit-identical semantics, Python-loop speed.
        With a mesh, the kernel runs per device on its (nty_p / n_dev)
        tile-row band under shard_map; the row-sharded output needs no
        collective (the reference's target decomposition,
        model_grid.F90:687-703)."""
        from .pallas_matmul import ell_fits_vmem, fused_apply, fused_apply_packed

        interpret = jax.default_backend() != "tpu"
        Cp = slab.shape[2]
        use_ell = self._ell_kernel and ell_fits_vmem(
            self.W, (self._K,), Cp, self.precision)
        if self.mesh is None:
            if use_ell:
                loc, w = self._ell_dev()
                return fused_apply_packed(
                    None, slab, ranges=((0, Cp),), nty=self.nty,
                    ntx=self.ntx, precision=self.precision,
                    interpret=interpret, locs=(loc,), ws=(w,))
            return fused_apply(self.A, slab, nty=self.nty, ntx=self.ntx,
                               precision=self.precision, interpret=interpret)
        # the wrapper cache is keyed by use_ell: it depends on the per-call
        # Cp (a later, wider bundle can fail ell_fits_vmem after a narrow
        # first call built the ELL wrapper — routing it to the ELL kernel
        # at the wider Cp would blow vmem_limit_bytes; ADVICE r4 #1)
        if use_ell not in self._fused_sharded:
            from jax.sharding import PartitionSpec as P

            ax = self.mesh.axis_names[0]
            n_dev = int(np.prod(list(self.mesh.shape.values())))
            nty_l = self.nty_p // n_dev
            if use_ell:
                def fn(loc, w, s):
                    return fused_apply_packed(
                        None, s, ranges=((0, s.shape[2]),), nty=nty_l,
                        ntx=self.ntx, precision=self.precision,
                        interpret=interpret, locs=(loc,), ws=(w,))
            else:
                fn = partial(fused_apply, nty=nty_l, ntx=self.ntx,
                             precision=self.precision, interpret=interpret)
            n_in = 3 if use_ell else 2
            self._fused_sharded[use_ell] = jax.jit(jax.shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(P(ax, None, None),) * n_in,
                out_specs=P(ax, None, None),
                # pallas_call's out_shape carries no varying-mesh-axes info
                check_vma=False))
        if use_ell:
            loc, w = self._ell_dev()
            return self._fused_sharded[use_ell](loc, w, slab)
        return self._fused_sharded[use_ell](self.A, slab)

    def __call__(self, src_dev):
        """src (n_src, C) on device. Returns (nyp, nxp, C) device array."""
        if src_dev.ndim == 1:
            src_dev = src_dev[:, None]
        if self._src_sharding is not None:
            src_dev = jax.device_put(src_dev, self._src_sharding)
        C = src_dev.shape[1]
        # pad the column count to the LANE quantum (128, the f32 lane
        # width) — the narrowest shape Mosaic stores efficiently. Padding
        # to more than that is measured write amplification at HBM (a
        # 2-col conservative bundle padded to 256 wrote 128x its useful
        # bytes); distinct padded widths each compile once, amortized by
        # the persistent compilation cache.
        pad = (-C) % LANE
        if pad:
            src_dev = jnp.pad(src_dev, ((0, 0), (0, pad)))
        Cp = C + pad
        # ONE wide gather for all columns: the HBM row-gather has a large
        # fixed per-row cost (measured ~2.7x cheaper than per-chunk gathers
        # on v5e), then the MXU runs over CB-column slices of the slab.
        # slab (n_tiles, W, Cp) is sharded over tiles when a mesh is set
        # (indices sharded, source replicated).
        if self._use_fused() and self._use_gather(Cp):
            # in-kernel gather: no XLA take, no HBM slab array at all
            src_pad = jnp.pad(src_dev, ((0, CH), (0, 0)))
            return self._gather_full(src_pad, Cp)[: self.nty * TY, :, :C]
        slab = jnp.take(src_dev, self.slab_idx, axis=0)
        if self._use_fused():
            # crop sharding-padded tile rows so both backends honor the
            # (nyp, nxp, C) contract (ADVICE r2)
            return self._fused_full(slab)[: self.nty * TY, :, :C]
        outs = [
            _tile_matmul(self.A, slab[:, :, lo:lo + min(CB, Cp - lo)],
                         precision=self.precision)
            for lo in range(0, Cp, CB)
        ]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
        return _unblock(out[: self.n_tiles_data], self.nty, self.ntx)[:, :, :C]

    def apply_np(self, src, root_only: bool = False, strip_sink=None):
        """Host-array apply with bounded device memory: the slab is gathered
        once, then each CB-column chunk is matmul'd, unblocked, and fetched
        to host before the next chunk allocates — peak device residency is
        one output chunk (the device-side concat of a ~600-column 3-D stack
        would otherwise double a multi-GB buffer and OOM a 16 GB chip).
        The host fetch mirrors the reference's gather-to-rank-0 for the
        serial NetCDF write (write_data.F90:1006); with ``root_only`` only
        process 0 materializes the host array, the others return a
        zero-stride broadcast view (terminal fields only).

        ``src`` may be a list of column blocks (assembled on device, never
        concatenated on host — see _src_to_device). With ``strip_sink``,
        each fetched (ny, nx, cb) strip is handed to
        ``strip_sink(col_lo, strip)`` instead of being assembled into one
        host array (the streaming NetCDF write path; peak host memory is
        one strip) and None is returned; non-primary processes under
        root_only still participate in the fetch collectives but never
        call the sink."""
        from ..parallel.multihost import fetch_to_host, is_primary

        def ncols(b):
            return 1 if np.asarray(b).ndim == 1 else np.asarray(b).shape[1]

        is_blocks = isinstance(src, (list, tuple))
        squeeze = not is_blocks and np.asarray(src).ndim == 1
        C = sum(ncols(b) for b in src) if is_blocks else ncols(src)
        Cp = C + ((-C) % LANE)
        src_dev = _src_to_device(
            [src] if squeeze else src, Cp, self._src_sharding)
        ny, nx = self.dst_shape
        materialize = (not root_only or is_primary()) and strip_sink is None
        deliver = strip_sink is not None and (not root_only or is_primary())
        out = (np.empty((ny, nx, C), np.float32) if materialize
               else np.broadcast_to(np.float32(0.0), (ny, nx, C)))

        if self._use_fused() and Cp <= FETCH and self._use_gather(Cp):
            # in-kernel gather (single output group): no take, no slab
            out_g = self._gather_full(jnp.pad(src_dev, ((0, CH), (0, 0))),
                                      Cp)
            for lo in range(0, C, CB):
                cb_eff = min(CB, C - lo)
                fetched = fetch_to_host(out_g[:ny, :nx, lo:lo + cb_eff],
                                        root_only=root_only)
                if materialize:
                    out[:, :, lo:lo + cb_eff] = fetched
                elif deliver:
                    strip_sink(lo, fetched)
            if strip_sink is not None:
                return None
            return out[:, :, 0] if squeeze else out

        slab = jnp.take(src_dev, self.slab_idx, axis=0)
        if self._use_fused():
            # The kernel writes the final layout per FETCH-column group
            # (bounds device residency to one group's (nyp, nxp, FETCH)
            # output — a 1024-col mega-bundle at CONUS size would otherwise
            # hold 8 GB); fetch in CB strips so the host-bound crop copies
            # stay small.
            for g in range(0, Cp, FETCH):
                gw = min(FETCH, Cp - g)
                out_g = self._fused_full(slab[:, :, g:g + gw])
                for lo in range(g, min(g + gw, C), CB):
                    cb_eff = min(CB, C - lo, g + gw - lo)
                    fetched = fetch_to_host(
                        out_g[:ny, :nx, lo - g:lo - g + cb_eff],
                        root_only=root_only)
                    if materialize:
                        out[:, :, lo:lo + cb_eff] = fetched
                    elif deliver:
                        strip_sink(lo, fetched)
            if strip_sink is not None:
                return None
            return out[:, :, 0] if squeeze else out

        for lo in range(0, Cp, CB):
            cw = min(CB, Cp - lo)
            o = _tile_matmul(self.A, slab[:, :, lo:lo + cw],
                             precision=self.precision)
            o = _unblock(o[: self.n_tiles_data], self.nty, self.ntx)
            cb_eff = min(cw, C - lo)
            if cb_eff <= 0:
                break
            # multi-controller: the tile-sharded chunk spans processes, so
            # the host fetch is a gather-to-all (fetch_to_host), the
            # FieldGather analog of write_data.F90:1006
            fetched = fetch_to_host(o[:ny, :nx, :cb_eff],
                                    root_only=root_only)
            if materialize:
                out[:, :, lo:lo + cb_eff] = fetched
            elif deliver:
                strip_sink(lo, fetched)
        if strip_sink is not None:
            return None
        return out[:, :, 0] if squeeze else out


class PackedSlabRegridder:
    """Several ELL operators over the SAME source row space and target
    grid, applied as ONE kernel pass writing ONE packed output.

    The production variable load routes columns to three methods (bilinear
    958 cols, nearest 13, conservative 2 at the default CONUS lists). Run
    separately, each method pays its own slab gather, kernel launch, and
    LANE-padded HBM write (1024 + 128 + 128 columns written for 973
    useful). Packed, the per-tile slab is the UNION of the methods' unique
    source rows (one gather — the union is barely wider than bilinear's
    own), each method keeps its own one-hot A over that union, and the
    kernel writes each method's product into its column range of a single
    (ny, nx, C_total->LANE) array: 1024 columns written, zero extra
    launches. HBM writes are the measured wall on v5e (~370 GB/s pure-write
    ceiling, see DESIGN.md), so written bytes ~= pass time.

    ``ells_and_cols``: list of (ELLWeights, n_cols) in column order; the
    apply consumes one (n_src, sum(n_cols)) source matrix laid out the same
    way. All ELLs must share n_src and dst_shape. (Reference analog: the
    per-bundle route handles of interp.F90:119-447, here fused across
    bundles, not just within one.)

    ``rotate_spec``: optional (windows, cosa, sina) — windows is a tuple of
    (cu, cv, n) packed-column triples (u levels at [cu, cu+n), v at
    [cv, cv+n)); cosa/sina are (ny, nx) host arrays. The Q4 wind rotation
    (interp.F90:689-749) is applied to those columns INSIDE the apply —
    in-kernel on the fused path, immediately post-unblock on the XLA path —
    so rotated winds come out of the same pass that produced them (the
    reference pays a separate sweep, interp.F90:291-293; a post-hoc rotate
    here would re-read and re-write every wind level from HBM).
    """

    #: apply_np accepts a list of column blocks (device-side assembly)
    accepts_blocks = True

    def __init__(self, ells_and_cols, dtype=jnp.float32,
                 precision: str = "highest", mesh=None,
                 backend: str = "auto", rotate_spec=None, cache_dir=None):
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        if precision not in PRECISIONS:
            raise ValueError(f"precision must be one of {PRECISIONS}")
        self.backend = backend
        self.precision = precision
        self.mesh = mesh
        self.cache_dir = cache_dir
        ells = [e for e, _ in ells_and_cols]
        self.col_counts = [int(c) for _, c in ells_and_cols]
        if len({e.n_src for e in ells}) != 1:
            raise ValueError("packed operators must share one source space")
        if len({tuple(e.dst_shape) for e in ells}) != 1:
            raise ValueError("packed operators must share the target grid")
        ny, nx = ells[0].dst_shape
        self.n_src = ells[0].n_src
        self.dst_shape = (ny, nx)
        self.C_total = sum(self.col_counts)
        # column ranges per method within the packed output
        self.ranges = []
        off = 0
        for c in self.col_counts:
            self.ranges.append((off, off + c))
            off += c
        # validate rotate windows BEFORE the expensive union pack: callers
        # fall back to a rotation-free regridder on ValueError, and a late
        # raise would make them pay _pack_union twice. The CB-sub-chunk
        # window constraint is the FUSED kernel's; the XLA path's
        # post-unblock _rotate_post handles arbitrary windows, so an
        # explicit backend="xla" skips the check (ADVICE r3).
        if rotate_spec is not None and backend != "xla":
            from .pallas_matmul import _validate_rotate

            _validate_rotate(tuple(rotate_spec[0]), tuple(self.ranges),
                             self.Cp)

        # union slab over the K-concatenation of all methods
        Ks = [e.idx.shape[1] for e in ells]

        def _cat():
            return (np.concatenate(
                        [np.asarray(e.idx, np.int64) for e in ells], axis=1),
                    np.concatenate(
                        [np.asarray(e.w, np.float64) for e in ells], axis=1))

        (slab_idx, loc, loc_w, W, self.nty, self.ntx, n_tiles,
         self.n_tiles_data, self.nty_p, self._ch_src, self._loc8,
         self.W8) = _pack_union_cached(
            _cat, ny, nx, self.n_src, mesh=mesh, cache_dir=cache_dir,
            ell_fps=(tuple(e.fingerprint() for e in ells)
                     if cache_dir else None))
        self.W = W
        self.n_tiles = n_tiles

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            self._tile_sharding = NamedSharding(mesh, P(axis, None))
            self._tile3_sharding = NamedSharding(mesh, P(axis, None, None))
            self._src_sharding = NamedSharding(mesh, P())
            self.slab_idx = jax.device_put(slab_idx, self._tile_sharding)
        else:
            self._tile3_sharding = None
            self._src_sharding = None
            self.slab_idx = jnp.asarray(slab_idx)

        # per-method loc/w slices over the union slab (following the
        # K-concatenation order); the prestacked As and the kernel-layout
        # loc/w device arrays are both derived lazily from these
        self._Ks = Ks
        self._dtype = dtype
        self._loc3 = loc.reshape(n_tiles, TILE, sum(Ks))
        self._w3 = loc_w.reshape(n_tiles, TILE, sum(Ks))
        self._ell_kernel = os.environ.get("MPASSIT_ELL_KERNEL", "1") != "0"
        self._As = None
        self._locws = None
        self._fused_sharded = None

        # in-apply wind rotation (quirk Q4): cosa/sina padded with the
        # IDENTITY rotation (cosa=1, sina=0) outside the data region —
        # zero-padding would put 0/0 NaNs in the padded rows. Two layouts:
        # grid-shaped (nyp_p, nxp) for the XLA path's post-unblock rotate,
        # tile-blocked (n_tiles, TY, TX) for the fused kernel (Mosaic
        # rejects (TY, TX) blocks of a flat 2-D array: the lane dim must be
        # 128-divisible or equal the array dim).
        self.rotate = ()
        self._cosa = self._sina = None
        self._cosa_t = self._sina_t = None
        if rotate_spec is not None:
            windows, cosa, sina = rotate_spec
            nyp_p, nxp = self.nty_p * TY, self.ntx * TX
            cs = np.zeros((nyp_p, nxp, 2), np.float32)
            cs[:, :, 0] = 1.0
            cs[:ny, :nx, 0] = np.asarray(cosa, np.float32).reshape(ny, nx)
            cs[:ny, :nx, 1] = np.asarray(sina, np.float32).reshape(ny, nx)
            cs_t = _tile_block(cs, self.nty_p, self.ntx, 2).reshape(
                n_tiles, TY, TX, 2)
            self.rotate = tuple(tuple(w) for w in windows)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                row_shard = NamedSharding(mesh, P(mesh.axis_names[0], None))
                tile_shard = NamedSharding(
                    mesh, P(mesh.axis_names[0], None, None))
                self._cosa = jax.device_put(cs[:, :, 0], row_shard)
                self._sina = jax.device_put(cs[:, :, 1], row_shard)
                self._cosa_t = jax.device_put(cs_t[..., 0], tile_shard)
                self._sina_t = jax.device_put(cs_t[..., 1], tile_shard)
            else:
                self._cosa = jnp.asarray(cs[:, :, 0])
                self._sina = jnp.asarray(cs[:, :, 1])
                self._cosa_t = jnp.asarray(cs_t[..., 0])
                self._sina_t = jnp.asarray(cs_t[..., 1])

    @property
    def As(self):
        """Prestacked per-method one-hot operators, built on first use
        (XLA path and non-ELL kernel only)."""
        if self._As is None:
            if self.mesh is not None:
                build = jax.jit(
                    _build_A_T, static_argnames=("n_tiles", "w_width"),
                    out_shardings=self._tile3_sharding)
            else:
                build = _build_A_T
            self._As = []
            koff = 0
            for K in self._Ks:
                loc_m = np.ascontiguousarray(
                    self._loc3[:, :, koff:koff + K]).reshape(-1, K)
                w_m = np.ascontiguousarray(
                    self._w3[:, :, koff:koff + K]).reshape(-1, K)
                A = build(jnp.asarray(loc_m),
                          jnp.asarray(w_m, dtype=jnp.float32),
                          n_tiles=self.n_tiles, w_width=self.W)
                self._As.append(_prep_A(A, self.precision, self._dtype))
                koff += K
        return self._As

    def _ell_dev(self):
        """Per-method (n_tiles, K, TILE) loc/w device arrays for the
        ELL-direct kernel."""
        if self._locws is None:
            locs, ws = [], []
            koff = 0
            for K in self._Ks:
                lm = np.ascontiguousarray(
                    np.asarray(self._loc3[:, :, koff:koff + K])
                    .transpose(0, 2, 1)).astype(np.int32)
                wm = np.ascontiguousarray(
                    np.asarray(self._w3[:, :, koff:koff + K])
                    .transpose(0, 2, 1)).astype(np.float32)
                if self.mesh is not None:
                    locs.append(jax.device_put(lm, self._tile3_sharding))
                    ws.append(jax.device_put(wm, self._tile3_sharding))
                else:
                    locs.append(jnp.asarray(lm))
                    ws.append(jnp.asarray(wm))
                koff += K
            self._locws = (tuple(locs), tuple(ws))
        return self._locws

    def _gather_dev(self):
        """(ch_src, locs8, ws) device arrays for the in-kernel-gather
        kernel, per method."""
        if getattr(self, "_gather_cache", None) is None:
            locs, ws = [], []
            koff = 0
            loc83 = np.asarray(self._loc8).reshape(
                self.n_tiles, TILE, sum(self._Ks))
            for K in self._Ks:
                locs.append(jnp.asarray(np.ascontiguousarray(
                    loc83[:, :, koff:koff + K].transpose(0, 2, 1))
                    .astype(np.int32)))
                ws.append(jnp.asarray(np.ascontiguousarray(
                    np.asarray(self._w3[:, :, koff:koff + K])
                    .transpose(0, 2, 1)).astype(np.float32)))
                koff += K
            self._gather_cache = (
                jnp.asarray(np.asarray(self._ch_src, np.int32)),
                tuple(locs), tuple(ws))
        return self._gather_cache

    def _use_gather(self, Cp) -> bool:
        # opt-in variant — see SlabMatmulRegridder._use_gather
        from .pallas_matmul import gather_fits_vmem

        return (self._ell_kernel and self.mesh is None
                and self.backend != "xla"
                and os.environ.get("MPASSIT_GATHER_KERNEL", "0") == "1"
                and jax.default_backend() == "tpu"
                and gather_fits_vmem(self.W8, tuple(self._Ks), Cp,
                                     self.precision))

    def _gather_full(self, src_dev_padded):
        """(n_src+CH, Cp) src -> (nyp_p, nxp, Cp), slab gathered
        in-kernel; same rotation/zero-tail semantics as _fused_full."""
        from .pallas_matmul import fused_apply_packed_gather

        ch, locs, ws = self._gather_dev()
        kw = {}
        if self.rotate:
            kw = {"rotate": self.rotate, "cosa": self._cosa_t,
                  "sina": self._sina_t}
        return fused_apply_packed_gather(
            src_dev_padded, ch, locs, ws, W8=self.W8,
            ranges=tuple(self.ranges), nty=self.nty, ntx=self.ntx,
            precision=self.precision, **kw)

    def _use_fused(self) -> bool:
        if self.backend == "xla":
            return False
        from .pallas_matmul import fused_available

        if self.backend == "pallas":
            return True
        return (jax.default_backend() == "tpu"
                and fused_available(self.W, self.precision))

    def _use_ell(self) -> bool:
        from .pallas_matmul import ell_fits_vmem

        return self._ell_kernel and ell_fits_vmem(
            self.W, tuple(self._Ks), self.Cp, self.precision)

    @property
    def Cp(self) -> int:
        return self.C_total + ((-self.C_total) % LANE)

    def _fused_full(self, slab):
        """(n_tiles, W, Cp) union slab -> (nyp_p, nxp, Cp); columns past
        C_total are zeroed by the kernel."""
        from .pallas_matmul import fused_apply_packed

        interpret = jax.default_backend() != "tpu"
        ranges = tuple(self.ranges)
        rot = self.rotate
        use_ell = self._use_ell()
        if use_ell:
            locs, ws = self._ell_dev()
            ops, nA = list(locs) + list(ws), 2 * len(self._Ks)
        else:
            ops, nA = list(self.As), len(self._Ks)
        if self.mesh is None:
            kw = ({"locs": locs, "ws": ws} if use_ell else {})
            return fused_apply_packed(
                None if use_ell else tuple(ops), slab, ranges=ranges,
                nty=self.nty, ntx=self.ntx, precision=self.precision,
                interpret=interpret, rotate=rot, cosa=self._cosa_t,
                sina=self._sina_t, **kw)
        if self._fused_sharded is None:
            from jax.sharding import PartitionSpec as P

            ax = self.mesh.axis_names[0]
            n_dev = int(np.prod(list(self.mesh.shape.values())))
            nty_l = self.nty_p // n_dev
            nm = len(self._Ks)

            def shard_fn(*args):
                kw = {}
                if rot:
                    kw = {"rotate": rot, "cosa": args[nA + 1],
                          "sina": args[nA + 2]}
                if use_ell:
                    kw["locs"] = tuple(args[:nm])
                    kw["ws"] = tuple(args[nm:2 * nm])
                    A_arg = None
                else:
                    A_arg = tuple(args[:nA])
                return fused_apply_packed(
                    A_arg, args[nA], ranges=ranges, nty=nty_l,
                    ntx=self.ntx, precision=self.precision,
                    interpret=interpret, **kw)

            n_in = nA + 1 + (2 if rot else 0)
            specs = [P(ax, None, None)] * n_in
            self._fused_sharded = jax.jit(jax.shard_map(
                shard_fn,
                mesh=self.mesh,
                in_specs=tuple(specs),
                out_specs=P(ax, None, None),
                check_vma=False))
        extra = (self._cosa_t, self._sina_t) if rot else ()
        return self._fused_sharded(*ops, slab, *extra)

    def _rotate_post(self, o):
        """XLA-path equivalent of the in-kernel rotation: same elementwise
        Q4 formula on the unblocked (nyp, nxp, C) array — bit-identical to
        the kernel's per-block computation."""
        if not self.rotate:
            return o
        from .rotate import rotate_winds

        nyp = o.shape[0]
        cosa, sina = self._cosa[:nyp], self._sina[:nyp]
        for (cu, cv, n) in self.rotate:
            u, v = rotate_winds(o[:, :, cu:cu + n], o[:, :, cv:cv + n],
                                cosa, sina)
            parts = []
            if cu > 0:
                parts.append(o[:, :, :cu])
            parts.append(u)
            if cv > cu + n:
                parts.append(o[:, :, cu + n:cv])
            parts.append(v)
            if cv + n < o.shape[2]:
                parts.append(o[:, :, cv + n:])
            o = jnp.concatenate(parts, axis=2)
        return o

    def _xla_full(self, slab):
        """Portable path: per-method tile matmuls placed into one padded
        (n_tiles, TILE, Cp) block (CPU tests, non-fused fallbacks)."""
        outs = []
        for A, (c0, c1) in zip(self.As, self.ranges):
            for lo in range(c0, c1, CB):
                cw = min(CB, c1 - lo)
                outs.append(_tile_matmul(A, slab[:, :, lo:lo + cw],
                                         precision=self.precision))
        pad = self.Cp - self.C_total
        if pad:
            outs.append(jnp.zeros(
                (slab.shape[0], TILE, pad), jnp.float32))
        return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]

    def __call__(self, src_dev):
        """src (n_src, C_total) on device, columns laid out per
        ``ells_and_cols``. Returns (nyp, nxp, C_total)."""
        if src_dev.shape[1] != self.C_total:
            raise ValueError(
                f"packed source has {src_dev.shape[1]} columns, operator "
                f"expects {self.C_total}")
        if self._src_sharding is not None:
            src_dev = jax.device_put(src_dev, self._src_sharding)
        pad = self.Cp - self.C_total
        if pad:
            src_dev = jnp.pad(src_dev, ((0, 0), (0, pad)))
        if self._use_fused() and self._use_gather(self.Cp):
            src_pad = jnp.pad(src_dev, ((0, CH), (0, 0)))
            return self._gather_full(src_pad)[: self.nty * TY, :,
                                              :self.C_total]
        slab = jnp.take(src_dev, self.slab_idx, axis=0)
        if self._use_fused():
            return self._fused_full(slab)[: self.nty * TY, :, :self.C_total]
        out = self._xla_full(slab)
        full = self._rotate_post(
            _unblock(out[: self.n_tiles_data], self.nty, self.ntx))
        return full[:, :, :self.C_total]

    def _grouped_width(self) -> int:
        """Column-group width for the device-memory-bounded apply, or 0
        when the full-width single-pass apply fits the device budget.

        At the production envelope (2.6M cells x 1024 packed cols x
        1801x1061 target) the one-pass apply needs src 10.6 GB + slab
        ~0.7 GB + out 8.1 GB > a v5e's 16 GB HBM. When the estimate
        exceeds MPASSIT_DEVICE_BUDGET_GB (default 12), the apply runs in
        column groups: upload the group's source window, gather its slab,
        one kernel pass, fetch, free — peak device residency is one
        group. Single-device only (a sharded run divides the tile axis
        instead)."""
        if self.mesh is not None or self.Cp <= FETCH:
            return 0
        per_col = 4 * (self.n_src + self.n_tiles * self.W
                       + self.nty_p * TY * self.ntx * TX)
        budget = float(os.environ.get(
            "MPASSIT_DEVICE_BUDGET_GB", "12")) * 1e9
        if self.Cp * per_col <= budget:
            return 0
        gw = FETCH
        # 2x margin for transient copies (take output, unblock on the
        # XLA path); rotation windows are validated to the CB sub-chunk,
        # so the first group must keep at least CB columns
        while gw > LANE and 2 * gw * per_col > budget:
            gw //= 2
        if self.rotate:
            gw = max(gw, max(cv + n for (_, cv, n) in self.rotate))
            gw = max(gw, CB)
        return gw

    def _apply_np_grouped(self, src, gw, root_only, strip_sink):
        """Column-grouped host apply (see _grouped_width): per group, a
        windowed source upload + slab gather + one packed kernel pass over
        the group's method sub-ranges; the Q4 rotation windows ride group
        0 (they are confined to the first CB sub-chunk)."""
        from ..parallel.multihost import fetch_to_host, is_primary
        from .pallas_matmul import ell_fits_vmem, fused_apply_packed

        C = self.C_total
        ny, nx = self.dst_shape
        materialize = (not root_only or is_primary()) and strip_sink is None
        deliver = strip_sink is not None and (not root_only or is_primary())
        out = (np.empty((ny, nx, C), np.float32) if materialize
               else np.broadcast_to(np.float32(0.0), (ny, nx, C)))
        fused = self._use_fused()
        interpret = jax.default_backend() != "tpu"
        use_ell = fused and self._ell_kernel and ell_fits_vmem(
            self.W, tuple(self._Ks), gw, self.precision)
        if use_ell:
            locs_all, ws_all = self._ell_dev()
        else:
            _ = self.As             # build once, outside the group loop
        for g in range(0, self.Cp, gw):
            w_g = min(gw, self.Cp - g)
            sub_ranges, m_idx = [], []
            for m, (lo, hi) in enumerate(self.ranges):
                a, b = max(lo, g), min(hi, g + w_g)
                if a < b:
                    sub_ranges.append((a - g, b - g))
                    m_idx.append(m)
            if not m_idx:
                break                       # LANE-pad tail only
            rot = self.rotate if g == 0 else ()
            src_g = _src_window_to_device(src, g, w_g, self._src_sharding)
            slab_g = jnp.take(src_g, self.slab_idx, axis=0)
            if fused:
                kw = ({"rotate": rot, "cosa": self._cosa_t,
                       "sina": self._sina_t} if rot else {})
                if use_ell:
                    o = fused_apply_packed(
                        None, slab_g, ranges=tuple(sub_ranges),
                        nty=self.nty, ntx=self.ntx,
                        precision=self.precision, interpret=interpret,
                        locs=tuple(locs_all[m] for m in m_idx),
                        ws=tuple(ws_all[m] for m in m_idx), **kw)
                else:
                    o = fused_apply_packed(
                        tuple(self.As[m] for m in m_idx), slab_g,
                        ranges=tuple(sub_ranges), nty=self.nty,
                        ntx=self.ntx, precision=self.precision,
                        interpret=interpret, **kw)
            else:
                outs = []
                for m, (c0, c1) in zip(m_idx, sub_ranges):
                    for lo in range(c0, c1, CB):
                        cw = min(CB, c1 - lo)
                        outs.append(_tile_matmul(
                            self.As[m], slab_g[:, :, lo:lo + cw],
                            precision=self.precision))
                cover = max(c1 for _, c1 in sub_ranges)
                if w_g > cover:
                    outs.append(jnp.zeros(
                        (slab_g.shape[0], TILE, w_g - cover), jnp.float32))
                o = (jnp.concatenate(outs, axis=2) if len(outs) > 1
                     else outs[0])
                o = _unblock(o[: self.n_tiles_data], self.nty, self.ntx)
                if rot:
                    o = self._rotate_post(o)
            for lo in range(g, min(g + w_g, C), CB):
                cb_eff = min(CB, C - lo, g + w_g - lo)
                fetched = fetch_to_host(o[:ny, :nx, lo - g:lo - g + cb_eff],
                                        root_only=root_only)
                if materialize:
                    out[:, :, lo:lo + cb_eff] = fetched
                elif deliver:
                    strip_sink(lo, fetched)
            del o, slab_g, src_g
        if strip_sink is not None:
            return None
        return out

    def apply_np(self, src, root_only: bool = False, strip_sink=None):
        """Host apply, fetched in CB strips (see SlabMatmulRegridder).
        ``src`` may be a list of column blocks (device-side assembly);
        with ``strip_sink`` each strip streams to the sink instead of
        materializing the (ny, nx, C_total) host array. When the one-pass
        device working set exceeds the device budget, the apply runs in
        column groups (_apply_np_grouped) — the production-envelope
        configuration."""
        from ..parallel.multihost import fetch_to_host, is_primary

        C = self.C_total
        ny, nx = self.dst_shape
        gw = 0 if self._use_gather(self.Cp) else self._grouped_width()
        if gw:
            return self._apply_np_grouped(src, gw, root_only, strip_sink)
        materialize = (not root_only or is_primary()) and strip_sink is None
        deliver = strip_sink is not None and (not root_only or is_primary())
        out = (np.empty((ny, nx, C), np.float32) if materialize
               else np.broadcast_to(np.float32(0.0), (ny, nx, C)))
        src_dev = _src_to_device(src, self.Cp, self._src_sharding)
        if self._use_fused() and self._use_gather(self.Cp):
            # in-kernel gather: no XLA take, no HBM slab array
            o = self._gather_full(jnp.pad(src_dev, ((0, CH), (0, 0))))
        elif self._use_fused():
            # the packed kernel writes the FULL packed width in one pass
            # (column ranges are absolute); fetch in CB strips
            slab = jnp.take(src_dev, self.slab_idx, axis=0)
            o = self._fused_full(slab)
        else:
            slab = jnp.take(src_dev, self.slab_idx, axis=0)
            out_t = self._xla_full(slab)
            o = self._rotate_post(
                _unblock(out_t[: self.n_tiles_data], self.nty, self.ntx))
        for lo in range(0, C, CB):
            cb_eff = min(CB, C - lo)
            fetched = fetch_to_host(o[:ny, :nx, lo:lo + cb_eff],
                                    root_only=root_only)
            if materialize:
                out[:, :, lo:lo + cb_eff] = fetched
            elif deliver:
                strip_sink(lo, fetched)
        if strip_sink is not None:
            return None
        return out
