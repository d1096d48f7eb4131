"""Fused MXU tile-matmul Pallas kernel: one-hot apply + unblock in one pass.

This is the production TPU apply for SlabMatmulRegridder (the XLA path in
matmul_apply.py remains the portable fallback and the multi-device
shard_map building block). It computes, per 32x32 target tile t,

    out[t]  (TILE x CB) = A[t]^T (W x TILE) @ slab[t] (W x CB)

exactly like matmul_apply._tile_matmul, but removes three sources of HBM
traffic the XLA graph pays (the reference's equivalent stage is ESMF's
route-handle SMM apply, interp.F90:123-136; the layout work below has no
reference counterpart — it exists because the TPU output must land in the
row-major (ny, nx, C) order write_data.F90 writes):

1. **Fused unblock.** XLA materializes the tile-blocked (n_tiles, TILE, C)
   product and then `_unblock` re-reads + re-writes all of it to produce the
   row-major (ny, nx, C) array — 2 extra full passes over the output, which
   dominates traffic (out is ~25x larger than A + slab per pass at CONUS
   sizes). Here the kernel's out BlockSpec maps tile (i, j) straight to
   rows [i*32, i*32+32) x cols [j*32, j*32+32) of the final array: the
   reshape (TILE, CB) -> (TY, TX, CB) is a sublane-dim split (32 % 8 == 0),
   free in Mosaic, and the product is DMA'd once to its final location.
2. **In-register bf16 split.** split_bf16 mode feeds the MXU the stacked
   compensated operands (see matmul_apply._stack_A). XLA materializes the
   (3W, CB) bf16 slab stack per chunk; here hi/lo extraction + concat happen
   on the VPU between the VMEM slab block and the MXU — the slab is read
   from HBM once, as f32, width W not 3W.
3. **VMEM-resident A.** Grid order is (tile_y, tile_x, chunk) with chunks
   innermost; A's block index does not depend on the chunk, so Mosaic keeps
   each tile's A in VMEM across all column chunks instead of re-streaming
   it per (tile, chunk) pair.

Numerics match the XLA path: split_bf16 computes Ah@Sh + Ah@Sl + Al@Sh in
one default-precision bf16 MXU pass over the 3W stacked contraction
(~1e-5 rel err); "highest" runs f32 operands at Precision.HIGHEST
(~1e-7). Tested equal to the XLA path to tight tolerances in
tests/test_pallas_matmul.py (interpret mode on CPU, native on TPU).

VMEM budget per grid step (double-buffered by Mosaic): A (3W x 1024 bf16 or
W x 1024 f32), slab (W x CB f32), out (32 x 32 x CB f32). At the W_CAP=1024
extreme that is ~2*(6 + 1 + 1) = 16 MB, within the 128 MB physical VMEM;
`fused_available` guards the practical limit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 32
TX = 32
TILE = TY * TX
LANE = 128          # column quantum (matches matmul_apply.LANE)
CB = 256            # MXU sub-chunk (matches matmul_apply.CB)

_VMEM_BYTES = 100 * 1024 * 1024


def _stack_slab(s, mode):
    """In-kernel (VPU) compensated stacking of the f32 slab block for the
    split modes — the slab is read from HBM once, as f32, width W; the
    bf16 parts live only in VMEM between the read and the MXU.

    split_bf16:  (Sh, Sl, Sh)               pairs A's (Ah, Ah, Al)
    split6_bf16: (S0, S1, S0, S2, S1, S0)   pairs A's (A0, A0, A1, A0,
                 A1, A2) — the six Precision.HIGHEST terms in ONE stacked
                 contraction (see matmul_apply._stack_A6)."""
    if mode == "split_bf16":
        hi = s.astype(jnp.bfloat16)
        lo = (s - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo, hi], axis=0)          # (3W, Cp)
    b0 = s.astype(jnp.bfloat16)
    r1 = s - b0.astype(jnp.float32)
    b1 = r1.astype(jnp.bfloat16)
    b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([b0, b1, b0, b2, b1, b0], axis=0)  # (6W, Cp)


def _kernel_split(a_ref, slab_ref, out_ref, *, mode):
    """split modes: a_ref (1, kW, TILE) bf16 pre-stacked (k = 3 or 6);
    slab (1, W, Cp) f32, stacked on the VPU to match.

    The MXU dots run over CB-column sub-chunks of the VMEM-resident slab
    (wide batched matmuls compile pathologically slowly through remote
    Mosaic); the out block spans the full Cp so each tile row lands in HBM
    as one contiguous run."""
    s = slab_ref[0]
    s3 = _stack_slab(s, mode)
    Cp = s.shape[1]
    for lo_c in range(0, Cp, CB):
        cw = min(CB, Cp - lo_c)
        out = jax.lax.dot_general(
            a_ref[0], s3[:, lo_c:lo_c + cw],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:, :, lo_c:lo_c + cw] = out.reshape(
            out_ref.shape[0], out_ref.shape[1], cw)


def _kernel_highest(a_ref, slab_ref, out_ref):
    """highest: a_ref (1, W, TILE) f32; slab (1, W, Cp) f32."""
    Cp = slab_ref.shape[2]
    for lo_c in range(0, Cp, CB):
        cw = min(CB, Cp - lo_c)
        out = jax.lax.dot_general(
            a_ref[0], slab_ref[0, :, lo_c:lo_c + cw],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:, :, lo_c:lo_c + cw] = out.reshape(
            out_ref.shape[0], out_ref.shape[1], cw)


@partial(jax.jit, static_argnames=("nty", "ntx", "precision", "interpret"))
def fused_apply(A, slab, *, nty, ntx, precision="split_bf16",
                interpret=False):
    """A (n_tiles, Wa, TILE), slab (n_tiles, W, Cp) f32, Cp % CB == 0.

    Returns (nty*TY, ntx*TX, Cp) f32 in final row-major target layout.
    """
    n_tiles, W, Cp = slab.shape
    if n_tiles != nty * ntx:
        raise ValueError(f"slab has {n_tiles} tiles, grid wants {nty * ntx}")
    if Cp % LANE:
        raise ValueError(f"column count {Cp} not a multiple of {LANE}")
    kernel = (partial(_kernel_split, mode=precision)
              if precision.startswith("split") else _kernel_highest)
    Wa = A.shape[1]
    # One grid step per tile; the block spans the FULL column width so each
    # of the tile's 32 y-rows is one contiguous (TX * Cp * 4)-byte HBM run —
    # column-chunked out blocks degrade the write DMA to 1 KB strided runs.
    # When the full-width working set would not fit VMEM, fall back to a
    # column-chunked grid (same kernels: they sub-chunk internally).
    chunked = not _fits_vmem(Wa, W, Cp, A.dtype)
    if chunked:
        grid = (nty, ntx, Cp // LANE)
        in_specs = [
            pl.BlockSpec((1, Wa, TILE), lambda i, j, k: (i * ntx + j, 0, 0)),
            pl.BlockSpec((1, W, LANE), lambda i, j, k: (i * ntx + j, 0, k)),
        ]
        out_specs = pl.BlockSpec((TY, TX, LANE), lambda i, j, k: (i, j, k))
        semantics = ("parallel", "parallel", "arbitrary")
    else:
        grid = (nty, ntx)
        in_specs = [
            pl.BlockSpec((1, Wa, TILE), lambda i, j: (i * ntx + j, 0, 0)),
            pl.BlockSpec((1, W, Cp), lambda i, j: (i * ntx + j, 0, 0)),
        ]
        out_specs = pl.BlockSpec((TY, TX, Cp), lambda i, j: (i, j, 0))
        semantics = ("parallel", "parallel")
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=_VMEM_BYTES)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nty * TY, ntx * TX, Cp),
                                       jnp.float32),
        grid_spec=pl.GridSpec(grid=grid, in_specs=in_specs,
                              out_specs=out_specs),
        interpret=interpret,
        **kwargs,
    )(A, slab)


def _stack_A_vmem(A, mode):
    """In-kernel compensated stacking of a freshly-built f32 A — the A-side
    patterns (matmul_apply._stack_A/_stack_A6) that pair with _stack_slab's
    slab-side patterns:

    split_bf16:  (Ah, Ah, Al)                pairs (Sh, Sl, Sh)
    split6_bf16: (A0, A0, A1, A0, A1, A2)    pairs (S0, S1, S0, S2, S1, S0)
    """
    if mode == "split_bf16":
        hi = A.astype(jnp.bfloat16)
        lo = (A - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, hi, lo], axis=0)
    a0 = A.astype(jnp.bfloat16)
    r1 = A - a0.astype(jnp.float32)
    a1 = r1.astype(jnp.bfloat16)
    a2 = (r1 - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([a0, a0, a1, a0, a1, a2], axis=0)


def _build_A_vmem(loc_ref, w_ref, W, split):
    """Build one method's stacked one-hot A (kW, TILE) IN VMEM from its
    ELL arrays: loc (1, K, TILE) int32 + w (1, K, TILE) f32.

    This replaces streaming a prestacked (kW, TILE) bf16 A from HBM —
    per target point the ELL pair is 8K bytes vs 6W (split) / 12W
    (split6) for the A: at the production full-mesh W=80 the A stream was
    ~950 MB/pass, ~16% of all HBM traffic, vs ~30 MB for loc/w. The
    K one-hot accumulations are W x TILE x K VPU select-adds per tile —
    noise next to the tile's MXU work (the same trade _build_A_T makes at
    setup, moved into the kernel where it costs no HBM)."""
    L = loc_ref[0]                       # (K, TILE) int32
    Wt = w_ref[0]                        # (K, TILE) f32
    K = L.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, TILE), 0)
    A = jnp.zeros((W, TILE), jnp.float32)
    for k in range(K):
        A = A + jnp.where(iota == L[k:k + 1, :], Wt[k:k + 1, :], 0.0)
    return _stack_A_vmem(A, split) if split else A


def _kernel_packed(*refs, ranges, split, checksum=False, rotate=(),
                   ell_Ks=None, W=None):
    """Multi-method packed kernel: refs = (*a_refs, slab_ref[, cosa_ref,
    sina_ref], out_ref[, cs_ref]) — or, with ``ell_Ks`` set,
    (*loc_refs, *w_refs, slab_ref[, ...]) and each method's A is built in
    VMEM by _build_A_vmem instead of streamed from HBM.

    Each a_ref is one method's A over the shared UNION slab; method m's
    product lands in out columns [c0, c1) = ranges[m]. Unaligned range
    boundaries (958, 971, ...) lower to masked VMEM stores — rare (two per
    tile at the default load) and far cheaper than the LANE-padded HBM
    writes separate per-method launches pay. Columns past ranges[-1][1]
    are zeroed (they are crop-padding; leaving them undefined would poison
    whole-output checksums).

    With ``rotate`` (tuple of (cu, cv, n) windows), the earth->grid wind
    rotation (interp.F90:689-749, quirk Q4's sequential u-then-v update)
    is applied on the VPU to the computed product before it is written:
    columns [cu, cu+n) are u levels, [cv, cv+n) v levels, and cosa/sina
    arrive TILE-BLOCKED as (1, TY, TX) per-tile blocks (Mosaic requires
    block minor dims divisible by (8, 128) or equal to the array dims, so
    a (TY, TX) block of a flat (nyp, nxp) array cannot lower — the blocked
    layout makes the block == the array's minor dims). This removes the
    separate
    rotate pass's full read+write of the wind levels (and, in the
    pipeline, a host->device round trip of the mass winds). Both windows
    of each entry must lie inside one CB sub-chunk (validated by the
    caller).

    With ``checksum``, every computed (post-rotation) element is folded
    into a per-tile sum(out*out) on the VPU while the value is still in
    VMEM — the benchmark's materialized-output guard without a full HBM
    re-read of the output (the VPU multiply-adds overlap the out-block
    DMA)."""
    nm = len(ranges)
    if ell_Ks is None:
        a_refs = list(refs[:nm])
        rest = list(refs[nm:])
        As = [a_ref[0] for a_ref in a_refs]
    else:
        loc_refs, w_refs = refs[:nm], refs[nm:2 * nm]
        rest = list(refs[2 * nm:])
        As = [_build_A_vmem(loc_refs[m], w_refs[m], W, split)
              for m in range(nm)]
    slab_ref = rest.pop(0)
    cosa_ref = sina_ref = None
    if rotate:
        cosa_ref, sina_ref = rest.pop(0), rest.pop(0)
    out_ref = rest.pop(0)
    cs_ref = rest.pop(0) if checksum else None
    _packed_core(As, slab_ref[0], out_ref, cs_ref, cosa_ref, sina_ref,
                 ranges=ranges, split=split, checksum=checksum,
                 rotate=rotate)


def _packed_core(As, s, out_ref, cs_ref, cosa_ref, sina_ref, *, ranges,
                 split, checksum, rotate):
    """The packed compute: stacked-operand MXU dots per method range,
    optional in-kernel Q4 rotation, tail zeroing, per-tile checksum."""
    s3 = _stack_slab(s, split) if split else s
    prec = None if split else jax.lax.Precision.HIGHEST
    acc = jnp.zeros((), jnp.float32)
    TYk, TXk = out_ref.shape[0], out_ref.shape[1]
    for A_m, (c0, c1) in zip(As, ranges):
        for lo_c in range(c0, c1, CB):
            cw = min(CB, c1 - lo_c)
            out = jax.lax.dot_general(
                A_m, s3[:, lo_c:lo_c + cw],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            out = out.reshape(TYk, TXk, cw)
            for (cu, cv, n) in rotate:
                if not (lo_c <= cu and cv + n <= lo_c + cw):
                    continue
                a, b = cu - lo_c, cv - lo_c
                u = out[:, :, a:a + n]
                v = out[:, :, b:b + n]
                cosa = cosa_ref[0][:, :, None]
                sina = sina_ref[0][:, :, None]
                # quirk Q4: u updated first, v from the ROTATED u
                tana = sina / cosa
                u_new = (u + v * tana) / (cosa + sina * tana)
                v_new = (v - u_new * sina) / cosa
                # zero-width slices (e.g. a == 0) lower to 0-size vectors
                # Mosaic rejects; emit only non-empty parts
                parts = []
                if a > 0:
                    parts.append(out[:, :, :a])
                parts.append(u_new)
                if b > a + n:
                    parts.append(out[:, :, a + n:b])
                parts.append(v_new)
                if b + n < cw:
                    parts.append(out[:, :, b + n:])
                out = jnp.concatenate(parts, axis=2)
            if checksum:
                acc = acc + (out * out).sum()
            out_ref[:, :, lo_c:lo_c + cw] = out
    tail = ranges[-1][1]
    Cp = out_ref.shape[2]
    if tail < Cp:
        out_ref[:, :, tail:] = jnp.zeros(
            (out_ref.shape[0], out_ref.shape[1], Cp - tail), jnp.float32)
    if checksum:
        # the block is a VMEM (8, 128) vreg tile (Mosaic's minimum f32
        # block); the partial sum sits at [0, 0], the rest is zero
        ii = jax.lax.broadcasted_iota(jnp.int32, cs_ref.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, cs_ref.shape, 1)
        cs_ref[...] = jnp.where((ii == 0) & (jj == 0), acc, 0.0)


CH = 8              # rows per gather DMA chunk (matches matmul_apply.CH)


def _kernel_packed_gather(ch_ref, *refs, ranges, split, checksum, rotate,
                          ell_Ks, W8, NC, ntx, n_tiles):
    """ELL-direct packed kernel with the slab gather INSIDE the kernel:
    per tile, NC fixed-size (CH, Cp) DMA copies bring the tile's
    chunked-run source rows (matmul_apply._chunk_slab) from HBM straight
    into a VMEM slab scratch — no XLA gather pass, no HBM slab array at
    all. The scratch is DOUBLE-BUFFERED across tiles: at tile t the
    kernel first issues tile t+1's copies into the other slot, so the
    descriptor issues and the transfers hide under tile t's compute and
    out-block DMA (issued serially they measured ~6 us/tile — half the
    pass). The grid runs with "arbitrary" semantics so the t -> t+1
    hand-off order is guaranteed.

    refs = (*loc_refs, *w_refs, src_ref(HBM)[, cosa, sina], out_ref
    [, cs_ref], slab_scratch(2, W8, Cp), sems(2, NC))."""
    nm = len(ranges)
    loc_refs, w_refs = refs[:nm], refs[nm:2 * nm]
    rest = list(refs[2 * nm:])
    src_ref = rest.pop(0)
    cosa_ref = sina_ref = None
    if rotate:
        cosa_ref, sina_ref = rest.pop(0), rest.pop(0)
    out_ref = rest.pop(0)
    cs_ref = rest.pop(0) if checksum else None
    slab_scr, sems = rest
    t = pl.program_id(0) * ntx + pl.program_id(1)
    p = jax.lax.rem(t, jnp.asarray(2, t.dtype))

    def _copies(tt, slot):
        # ch entries are chunk starts / CH: the explicit * CH lets Mosaic
        # prove the (8, 128)-tiled HBM row slice is tile-aligned
        for c in range(NC):
            yield pltpu.make_async_copy(
                src_ref.at[pl.ds(ch_ref[tt * NC + c] * CH, CH)],
                slab_scr.at[slot, pl.ds(c * CH, CH)],
                sems.at[slot, c])

    @pl.when(t == 0)
    def _first():
        for cp in _copies(t, p):
            cp.start()

    @pl.when(t + 1 < n_tiles)
    def _prefetch_next():
        for cp in _copies(t + 1, 1 - p):
            cp.start()

    # A builds (VPU) overlap the in-flight copies
    As = [_build_A_vmem(loc_refs[m], w_refs[m], W8, split)
          for m in range(nm)]
    for cp in _copies(t, p):
        cp.wait()
    _packed_core(As, slab_scr[p], out_ref, cs_ref, cosa_ref, sina_ref,
                 ranges=ranges, split=split, checksum=checksum,
                 rotate=rotate)


@partial(jax.jit,
         static_argnames=("ranges", "nty", "ntx", "precision", "interpret",
                          "with_checksum", "rotate", "W8"))
def fused_apply_packed_gather(src, ch_src, locs, ws, *, W8, ranges, nty,
                              ntx, precision="split_bf16", interpret=False,
                              with_checksum=False, rotate=(), cosa=None,
                              sina=None):
    """fused_apply_packed with the slab gather fused in: ``src``
    (n_src_padded, Cp) f32 stays in HBM (pad n_src by CH rows so the last
    chunk of a run may over-read), ``ch_src`` (n_tiles, NC) int32 chunk
    source-row starts, locs/ws per method in the chunk-padded W8 local
    index space (matmul_apply._chunk_slab). Same outputs/rotation/
    checksum semantics as fused_apply_packed."""
    n_tiles = nty * ntx
    NC = ch_src.shape[1]
    Cp = src.shape[1]
    if Cp % LANE:
        raise ValueError(f"column count {Cp} not a multiple of {LANE}")
    if W8 != NC * CH:
        raise ValueError(f"W8 {W8} != NC*CH {NC * CH}")
    prev = 0
    for c0, c1 in ranges:
        if c0 != prev or c1 <= c0:
            raise ValueError(f"ranges must tile [0, C) contiguously: {ranges}")
        prev = c1
    if prev > Cp:
        raise ValueError(f"ranges end {prev} exceeds padded width {Cp}")
    if rotate:
        _validate_rotate(rotate, ranges, Cp)
        if cosa is None or sina is None:
            raise ValueError("rotate windows require cosa and sina")
    split = precision if precision.startswith("split") else None
    ell_Ks = tuple(l.shape[1] for l in locs)
    kernel = partial(_kernel_packed_gather, ranges=ranges, split=split,
                     checksum=with_checksum, rotate=rotate, ell_Ks=ell_Ks,
                     W8=W8, NC=NC, ntx=ntx, n_tiles=n_tiles)
    in_specs = [
        pl.BlockSpec((1, K, TILE), lambda i, j, ch: (i * ntx + j, 0, 0))
        for K in ell_Ks
    ] * 2 + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    operands = list(locs) + list(ws) + [src]
    if rotate:
        in_specs += [pl.BlockSpec((1, TY, TX),
                                  lambda i, j, ch: (i * ntx + j, 0, 0)),
                     pl.BlockSpec((1, TY, TX),
                                  lambda i, j, ch: (i * ntx + j, 0, 0))]
        operands += [cosa, sina]
    out_specs = pl.BlockSpec((TY, TX, Cp), lambda i, j, ch: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((nty * TY, ntx * TX, Cp), jnp.float32)
    if with_checksum:
        out_specs = [out_specs,
                     pl.BlockSpec((8, 128), lambda i, j, ch: (i, j))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((nty * 8, ntx * 128),
                                          jnp.float32)]
    kwargs = {}
    if not interpret:
        # arbitrary semantics: the cross-tile double-buffer hand-off
        # requires the guaranteed sequential grid order
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BYTES)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, ntx),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((2, W8, Cp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, NC))]),
        interpret=interpret,
        **kwargs,
    )(ch_src.reshape(-1), *operands)
    if with_checksum:
        return res[0], res[1][::8, ::128]
    return res


def _validate_rotate(rotate, ranges, Cp):
    """Each (cu, cv, n) window must sit inside ONE CB sub-chunk of one
    method's range (the kernel rotates chunk-locally)."""
    for (cu, cv, n) in rotate:
        ok = False
        for c0, c1 in ranges:
            for lo_c in range(c0, c1, CB):
                cw = min(CB, c1 - lo_c)
                if lo_c <= cu and cu + n <= cv and cv + n <= lo_c + cw:
                    ok = True
        if not ok:
            raise ValueError(
                f"rotate window {(cu, cv, n)} does not fit one CB={CB} "
                f"sub-chunk of ranges {ranges}")


@partial(jax.jit,
         static_argnames=("ranges", "nty", "ntx", "precision", "interpret",
                          "with_checksum", "rotate"))
def fused_apply_packed(As, slab, *, ranges, nty, ntx,
                       precision="split_bf16", interpret=False,
                       with_checksum=False, rotate=(), cosa=None, sina=None,
                       locs=None, ws=None):
    """Packed multi-method apply: As = tuple of (n_tiles, Wa, TILE) one-hot
    operators over ONE union slab (n_tiles, W, Cp); ranges = per-A absolute
    output column ranges, ascending, ranges[-1][1] <= Cp, Cp % LANE == 0.

    Alternatively pass As=None with ``locs``/``ws`` — tuples of one
    (n_tiles, K_m, TILE) int32 / f32 pair per method — and each A is built
    in VMEM from the ELL arrays (_build_A_vmem): ~8K bytes of HBM per
    target instead of 6W/12W for a prestacked A, the dominant non-output
    traffic at production slab widths.

    Returns (nty*TY, ntx*TX, Cp) f32 in final row-major layout; one HBM
    write pass covers every method (see PackedSlabRegridder). With
    ``with_checksum``, also returns (nty, ntx) per-tile sums of out*out
    computed in-kernel from VMEM (every written value folded in, no output
    re-read) — the benchmark's materialization guard. With ``rotate``
    ((cu, cv, n) windows) plus cosa/sina TILE-BLOCKED (nty*ntx, TY, TX)
    f32 (see matmul_apply._tile_block), the Q4 wind rotation is applied
    in-kernel before the write (pad cosa with 1.0 and sina with 0.0
    outside the data region — zeros would inject 0/0 NaNs into the
    padding rows)."""
    n_tiles, W, Cp = slab.shape
    if n_tiles != nty * ntx:
        raise ValueError(f"slab has {n_tiles} tiles, grid wants {nty * ntx}")
    if Cp % LANE:
        raise ValueError(f"column count {Cp} not a multiple of {LANE}")
    prev = 0
    for c0, c1 in ranges:
        if c0 != prev or c1 <= c0:
            raise ValueError(f"ranges must tile [0, C) contiguously: {ranges}")
        prev = c1
    if prev > Cp:
        raise ValueError(f"ranges end {prev} exceeds padded width {Cp}")
    if rotate:
        _validate_rotate(rotate, ranges, Cp)
        if cosa is None or sina is None:
            raise ValueError("rotate windows require cosa and sina")
    split = precision if precision.startswith("split") else None
    if As is None:
        if locs is None or ws is None or len(locs) != len(ranges):
            raise ValueError("As=None requires one locs/ws pair per range")
        ell_Ks = tuple(l.shape[1] for l in locs)
        kernel = partial(_kernel_packed, ranges=ranges, split=split,
                         checksum=with_checksum, rotate=rotate,
                         ell_Ks=ell_Ks, W=W)
        in_specs = [
            pl.BlockSpec((1, K, TILE), lambda i, j: (i * ntx + j, 0, 0))
            for K in ell_Ks
        ] * 2 + [pl.BlockSpec((1, W, Cp), lambda i, j: (i * ntx + j, 0, 0))]
        operands = list(locs) + list(ws) + [slab]
    else:
        Wa = As[0].shape[1]
        kernel = partial(_kernel_packed, ranges=ranges, split=split,
                         checksum=with_checksum, rotate=rotate)
        in_specs = (
            [pl.BlockSpec((1, Wa, TILE), lambda i, j: (i * ntx + j, 0, 0))
             for _ in As]
            + [pl.BlockSpec((1, W, Cp), lambda i, j: (i * ntx + j, 0, 0))])
        operands = list(As) + [slab]
    if rotate:
        in_specs += [pl.BlockSpec((1, TY, TX),
                                  lambda i, j: (i * ntx + j, 0, 0)),
                     pl.BlockSpec((1, TY, TX),
                                  lambda i, j: (i * ntx + j, 0, 0))]
    out_specs = pl.BlockSpec((TY, TX, Cp), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((nty * TY, ntx * TX, Cp), jnp.float32)
    if with_checksum:
        # Mosaic requires (8, 128)-divisible blocks, so each tile's scalar
        # partial rides one f32 vreg tile with the sum at its [0, 0]
        # (~8 KB/tile of extra HBM writes — 0.1% of the output); the
        # strided slice below crops back to (nty, ntx)
        out_specs = [out_specs,
                     pl.BlockSpec((8, 128), lambda i, j: (i, j))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((nty * 8, ntx * 128),
                                          jnp.float32)]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_BYTES)
    if rotate:
        operands += [cosa, sina]
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pl.GridSpec(grid=(nty, ntx), in_specs=in_specs,
                              out_specs=out_specs),
        interpret=interpret,
        **kwargs,
    )(*operands)
    if with_checksum:
        return res[0], res[1][::8, ::128]
    return res


def _fits_vmem(Wa, W, Cp, a_dtype) -> bool:
    """Full-width (un-chunked) working set: double-buffered A block, slab
    block, and out block, plus the in-kernel (kW, Cp) bf16 split stack
    _kernel_split materializes in full-width mode (Wa*Cp*2 bytes with
    Wa = kW, single instance — a kernel temporary, not pipelined)."""
    split = a_dtype == jnp.bfloat16
    a_bytes = Wa * TILE * (2 if split else 4)
    work = 2 * (a_bytes + W * Cp * 4 + TILE * Cp * 4)
    if split:
        work += Wa * Cp * 2
    return work <= _VMEM_BYTES // 2


def gather_fits_vmem(W8, Ks, Cp, precision="split_bf16") -> bool:
    """VMEM check for the in-kernel-gather variant: double-buffered
    loc/w/out blocks plus the single-instance slab scratch and the
    in-kernel temporaries."""
    k = {"split_bf16": 3, "split6_bf16": 6}.get(precision)
    kW = (k or 1) * W8
    work = 2 * (sum(Ks) * TILE * 8 + TILE * Cp * 4)
    work += W8 * Cp * 4
    work += len(Ks) * (W8 * TILE * 4 + (kW * TILE * 2 if k else 0))
    if k:
        work += kW * Cp * 2
    return work <= _VMEM_BYTES // 2


def ell_fits_vmem(W, Ks, Cp, precision="split_bf16") -> bool:
    """VMEM check for the ELL-direct packed kernel at full column width:
    double-buffered loc/w/slab/out blocks plus the un-pipelined in-kernel
    temporaries (per-method f32 A + stacked bf16 A, stacked slab)."""
    k = {"split_bf16": 3, "split6_bf16": 6}.get(precision)
    kW = (k or 1) * W
    work = 2 * (sum(Ks) * TILE * 8 + W * Cp * 4 + TILE * Cp * 4)
    work += len(Ks) * (W * TILE * 4 + (kW * TILE * 2 if k else 0))
    if k:
        work += kW * Cp * 2
    return work <= _VMEM_BYTES // 2


def fused_available(W, precision="split_bf16") -> bool:
    """True when the fused kernel's VMEM working set fits comfortably."""
    k = {"split_bf16": 3, "split6_bf16": 6}.get(precision)
    a_bytes = k * W * TILE * 2 if k else W * TILE * 4
    work = 2 * (a_bytes + W * CB * 4 + TY * TX * CB * 4)
    if k:
        work += k * W * CB * 2
    return work <= _VMEM_BYTES
