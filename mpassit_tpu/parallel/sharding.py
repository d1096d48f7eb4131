"""Multi-device execution: shard the regrid over a JAX device mesh.

Replaces the reference's MPI/ESMF parallelism (SURVEY §2.2):

- the source-mesh MPI decomposition (``para_range``/METIS
  ``block_decomp_file``, model_grid.F90:423-437) and the target-grid
  ESMF decomposition (model_grid.F90:687-703) both become shardings of the
  ELL operator's target-row axis over a 1-D device mesh ('grid');
- the route-handle communication plan (source terms exchanged between ranks
  at apply time) disappears: with the source field replicated per host (the
  reference also reads the FULL input on every rank, input_data.F90:191-196)
  the apply is embarrassingly parallel over target rows — zero collectives
  on the hot path;
- ``shard_map_apply`` additionally shards the SOURCE axis and gathers the
  halo over ICI (``jax.lax.all_gather``) inside a shard_map — the multi-host
  configuration where the source no longer fits (or shouldn't be read) per
  device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.apply import apply_ell
from ..weights.ell import ELLWeights

GRID_AXIS = "grid"


def make_grid_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (GRID_AXIS,))


def _pad_rows(a: np.ndarray, mult: int) -> np.ndarray:
    pad = (-a.shape[0]) % mult
    if pad == 0:
        return a
    return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)


class ShardedRegridder:
    """ELL apply with target rows sharded across a device mesh and the
    source replicated. Rows are zero-padded to a device multiple (padding
    rows have w=0 -> they compute zeros)."""

    def __init__(self, ell: ELLWeights, mesh: Mesh, dtype=jnp.float32):
        self.mesh = mesh
        self.dst_shape = tuple(ell.dst_shape)
        self.n_dst = ell.idx.shape[0]
        self.n_src = ell.n_src
        n_dev = mesh.devices.size
        row_sharding = NamedSharding(mesh, P(GRID_AXIS, None))
        self.idx = jax.device_put(
            _pad_rows(ell.idx.astype(np.int32), n_dev), row_sharding)
        self.w = jax.device_put(
            _pad_rows(ell.w.astype(dtype), n_dev), row_sharding)
        self.src_sharding = NamedSharding(mesh, P())      # replicated
        self.out_sharding = NamedSharding(mesh, P(GRID_AXIS, None))
        self._apply = jax.jit(
            apply_ell, static_argnames=("out_dtype",),
            out_shardings=self.out_sharding)

    def __call__(self, src):
        src = jnp.asarray(src)
        squeeze = src.ndim == 1
        if squeeze:
            src = src[:, None]
        src = jax.device_put(src, self.src_sharding)
        out = self._apply(self.idx, self.w, src)[: self.n_dst]
        if squeeze:
            return out[:, 0].reshape(self.dst_shape)
        return out.reshape(self.dst_shape + (src.shape[1],))

    def apply_np(self, src, root_only: bool = False):
        from .multihost import fetch_to_host

        out = self(src)
        fetched = fetch_to_host(out, root_only=root_only)
        if fetched is None:            # non-primary, root_only
            return np.broadcast_to(np.zeros((), dtype=out.dtype), out.shape)
        return fetched


def _ring_local(idx_blk, w_blk, src_blk, *, n_dev):
    """shard_map body for the ring exchange (see ring_apply)."""
    blk = src_blk.shape[0]
    dev = jax.lax.axis_index(GRID_AXIS)

    def step(s, carry):
        out, blk_data = carry
        owner = (dev + s) % n_dev
        offset = owner * blk
        loc = idx_blk - offset
        in_blk = (loc >= 0) & (loc < blk)
        locc = jnp.clip(loc, 0, blk - 1)
        gathered = jnp.take(blk_data, locc, axis=0)       # (T_loc, K, C)
        wm = jnp.where(in_blk, w_blk, 0)
        out = out + jnp.einsum("tk,tkc->tc", wm, gathered,
                               preferred_element_type=out.dtype)
        nxt = jax.lax.ppermute(
            blk_data, GRID_AXIS,
            perm=[(i, (i - 1) % n_dev) for i in range(n_dev)])
        return out, nxt

    out0 = jax.lax.pcast(
        jnp.zeros((idx_blk.shape[0], src_blk.shape[1]), dtype=src_blk.dtype),
        (GRID_AXIS,), to="varying")
    out, _ = jax.lax.fori_loop(0, n_dev, step, (out0, src_blk))
    return out


def _allgather_local(idx_blk, w_blk, src_blk):
    """shard_map body for the all_gather halo (see shard_map_apply)."""
    full_src = jax.lax.all_gather(src_blk, GRID_AXIS, axis=0, tiled=True)
    return apply_ell(idx_blk, w_blk, full_src)


class SourceShardedRegridder:
    """ELL apply with BOTH the source rows and the target rows sharded over
    the device mesh — the production form of the reference's route-handle
    halo exchange (interp.F90:123-134) for meshes too large to replicate.

    comm="ring": source blocks rotate around the device ring via ppermute,
    each device accumulating masked partial applies; peak memory is one
    source block per device. comm="allgather": the full source is
    assembled over ICI inside shard_map before one local apply (faster when
    the source fits, one collective instead of n_dev).

    Multi-controller safe: inputs are placed with jax.device_put of host
    numpy onto cross-process NamedShardings, and apply_np returns the
    gathered result on every process (parallel/multihost.fetch_to_host).
    Columns are padded to CB so every bundle size reuses one compiled
    shard_map per (n_src, K) operator."""

    CB = 256

    def __init__(self, ell: ELLWeights, mesh: Mesh, dtype=jnp.float32,
                 comm: str = "ring"):
        if comm not in ("ring", "allgather"):
            raise ValueError(f"unknown comm {comm!r}")
        self.mesh = mesh
        self.comm = comm
        self.dtype = dtype
        self.dst_shape = tuple(ell.dst_shape)
        self.n_dst = ell.idx.shape[0]
        self.n_src = ell.n_src
        self.n_dev = n_dev = mesh.devices.size
        rows = NamedSharding(mesh, P(GRID_AXIS, None))
        self.idx = jax.device_put(_pad_rows(ell.idx.astype(np.int32), n_dev),
                                  rows)
        self.w = jax.device_put(
            _pad_rows(ell.w.astype(np.dtype(dtype)), n_dev), rows)
        self._src_sharding = rows
        body = (partial(_ring_local, n_dev=n_dev) if comm == "ring"
                else _allgather_local)
        self._fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(GRID_AXIS, None), P(GRID_AXIS, None),
                      P(GRID_AXIS, None)),
            out_specs=P(GRID_AXIS, None)))

    def __call__(self, src):
        src = np.asarray(src, dtype=np.dtype(self.dtype))
        squeeze = src.ndim == 1
        if squeeze:
            src = src[:, None]
        C = src.shape[1]
        cpad = (-C) % self.CB
        if cpad:
            src = np.pad(src, ((0, 0), (0, cpad)))
        src_p = _pad_rows(src, self.n_dev)
        src_d = jax.device_put(src_p, self._src_sharding)
        out = self._fn(self.idx, self.w, src_d)[: self.n_dst, :C]
        return out[:, 0] if squeeze else out

    def apply_np(self, src, root_only: bool = False):
        from .multihost import fetch_to_host

        src = np.asarray(src)
        shape = (self.dst_shape if src.ndim == 1
                 else self.dst_shape + (src.shape[1],))
        dev_out = self(src)
        out = fetch_to_host(dev_out, root_only=root_only)
        if out is None:                # non-primary, root_only
            return np.broadcast_to(np.zeros((), dtype=dev_out.dtype), shape)
        return out.reshape(shape)


def ring_apply(ell: ELLWeights, mesh: Mesh, src, dtype=jnp.float32):
    """Source-sharded apply with a RING exchange instead of all_gather.

    Both the source rows and the target rows are sharded over the 1-D device
    mesh. At step s, each device holds one rotating source block and
    accumulates that block's contribution to its local target rows:

        out[t] += sum_k  w[t,k] * src_blk[idx[t,k] - offset]   (masked to
                                                                the block)

    After n_dev ``ppermute`` steps every contribution has been applied. Per
    step the block transfer rides ICI and overlaps with the masked partial
    apply — and peak memory is ONE source block per device instead of the
    full gathered source (the all_gather path's footprint). This is the
    TPU-native analog of ESMF's route-handle halo exchange
    (interp.F90:123-134) for meshes too large to replicate.
    """
    n_dev = mesh.devices.size
    idx = _pad_rows(ell.idx.astype(np.int32), n_dev)
    w = _pad_rows(ell.w.astype(dtype), n_dev)
    src = np.asarray(src)
    squeeze = src.ndim == 1
    if squeeze:
        src = src[:, None]
    n_src = src.shape[0]
    src_p = _pad_rows(src.astype(dtype), n_dev)
    blk = src_p.shape[0] // n_dev   # rows per device block

    def local(idx_blk, w_blk, src_blk):
        dev = jax.lax.axis_index(GRID_AXIS)

        def step(s, carry):
            out, blk_data = carry
            # block currently held arrived from device (dev + s) % n_dev
            owner = (dev + s) % n_dev
            offset = owner * blk
            loc = idx_blk - offset
            in_blk = (loc >= 0) & (loc < blk)
            locc = jnp.clip(loc, 0, blk - 1)
            gathered = jnp.take(blk_data, locc, axis=0)   # (T_loc, K, C)
            wm = jnp.where(in_blk, w_blk, 0)
            out = out + jnp.einsum("tk,tkc->tc", wm, gathered,
                                   preferred_element_type=out.dtype)
            # rotate: send the held block to the left neighbor (dev - 1),
            # so the block from (dev + s + 1) arrives next step
            nxt = jax.lax.ppermute(
                blk_data, GRID_AXIS,
                perm=[(i, (i - 1) % n_dev) for i in range(n_dev)])
            return out, nxt

        T_loc = idx_blk.shape[0]
        C = src_blk.shape[1]
        # mark the zero carry as device-varying so the fori_loop carry type
        # matches the ppermute/einsum outputs (shard_map vma typing)
        out0 = jax.lax.pcast(jnp.zeros((T_loc, C), dtype=src_blk.dtype),
                             (GRID_AXIS,), to="varying")
        out, _ = jax.lax.fori_loop(0, n_dev, step, (out0, src_blk))
        return out

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(GRID_AXIS, None), P(GRID_AXIS, None),
                      P(GRID_AXIS, None)),
            out_specs=P(GRID_AXIS, None),
        )
    )
    out = fn(idx, w, src_p)[: ell.idx.shape[0]]
    return out[:, 0] if squeeze else out


def shard_map_apply(ell: ELLWeights, mesh: Mesh, src, dtype=jnp.float32):
    """Source-sharded apply: each device holds 1/N of the source rows and
    1/N of the target rows; the halo (here: the full source, the general
    union-of-col_idx case degenerates to all_gather for a globally-coupled
    operator) is assembled over ICI inside shard_map, then applied locally.

    This is the multi-host path skeleton: all_gather rides ICI; on a real
    pod slice the gather is the bandwidth cost that overlaps with compute.
    """
    n_dev = mesh.devices.size
    idx = _pad_rows(ell.idx.astype(np.int32), n_dev)
    w = _pad_rows(ell.w.astype(dtype), n_dev)
    src = np.asarray(src)
    squeeze = src.ndim == 1
    if squeeze:
        src = src[:, None]
    src_p = _pad_rows(src.astype(dtype), n_dev)

    def local(idx_blk, w_blk, src_blk):
        full_src = jax.lax.all_gather(src_blk, GRID_AXIS, axis=0, tiled=True)
        return apply_ell(idx_blk, w_blk, full_src)

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(GRID_AXIS, None), P(GRID_AXIS, None), P(GRID_AXIS, None)),
            out_specs=P(GRID_AXIS, None),
        )
    )
    out = fn(idx, w, src_p)[: ell.idx.shape[0]]
    return out[:, 0] if squeeze else out
