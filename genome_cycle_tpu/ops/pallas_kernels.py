"""Fused Pallas TPU kernel for the A/B copolymer pair force.

This is the speed-of-light path for the dominant O(N*nbr) computation
(BASELINE.md north star).  Design:

- Beads live in a dense padded cell slab laid out as ``(6, M, Cp)``: channels
  [x, y, z, a_factor, b_factor, valid], M = per-cell capacity (sublanes), and
  a *plane-padded* flat cell axis along the 128-lane dimension:

      flat(x, y, z) = (x+1) * plane_stride + h0 + y*nz + z
      h0 = nz + 1,  plane_stride = round_up(ny*nz + 2*(nz+1), 128)

  One FAR-filled pad plane on each x side plus in-plane halo padding means
  every neighbor access below stays in bounds, and all DMA offsets are
  multiples of the 128-aligned plane stride (a Mosaic requirement for
  dynamic lane-dimension slicing).
- Kernel grid = (nx,): program x DMAs padded planes x, x+1, x+2 (= real
  planes x-1, x, x+1 with halos) from HBM into VMEM; the 9 in-plane neighbor
  shifts oy*nz + oz are *static* slices of those regions.  In-plane index
  wrap-around across y rows lands on spatially distant cells whose pairs the
  cutoff kills, so boundary handling costs nothing.
- Pair math runs as dense (M, M, CH) blocks on the VPU — no gathers, no HBM
  round-trips for intermediates.  Empty slots carry FAR coordinates, so any
  pair involving them sits far beyond every cutoff.
- The pair law is the reference's per-pair mixed softcore
  (stage_interphase/simulation_driver_forcefield.cpp:30-52):
  F = c(r2) * dx with c = a_mix * c_softcore<2,3> + b_mix * c_softcore<8,3>,
  a_mix = (a_i+a_j)/2, b_mix = (b_i+b_j)/2, diameters scaled by the traced
  core_scale (passed as SMEM scalars).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FAR = 1e15


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def plane_geometry(dims: Tuple[int, int, int]):
    nx, ny, nz = dims
    if nz + 1 > 128:
        raise ValueError("nz too large for the 128-lane halo layout")
    if nz < 3:
        # With nz <= 2 distinct (oy, oz) offsets alias to the same flat shift
        # and neighbor pairs would be double-counted.
        raise ValueError("nz < 3 not supported by the flat-shift layout")
    h0 = 128  # lane-aligned in-plane data offset; >= nz+1 halo
    plane_stride = _round_up(h0 + ny * nz + nz + 1, 128)
    cp = (nx + 2) * plane_stride
    return h0, plane_stride, cp


def _kernel(params_ref, slab_hbm, out_ref, scratch, rolled_buf, facc, sem,
            *, dims, m, chunk):
    """chunk = lane-chunk width (cells processed per inner loop step)."""
    nx, ny, nz = dims
    h0, plane_stride, _ = plane_geometry(dims)
    plane = ny * nz
    plane_w = _round_up(plane, chunk)
    p = pl.program_id(0)

    # DMA padded planes p, p+1, p+2 (aligned offsets).
    for rx in range(3):
        pltpu.make_async_copy(
            slab_hbm.at[:, :, pl.ds((p + rx) * plane_stride, plane_stride)],
            scratch.at[rx],
            sem.at[rx],
        ).start()
    for rx in range(3):
        pltpu.make_async_copy(
            slab_hbm.at[:, :, pl.ds((p + rx) * plane_stride, plane_stride)],
            scratch.at[rx],
            sem.at[rx],
        ).wait()

    a_energy = params_ref[0]
    a_inv_d2 = params_ref[1]
    b_energy = params_ref[2]
    b_inv_d2 = params_ref[3]

    facc[...] = jnp.zeros_like(facc)

    # f32 self-pair mask (Mosaic minor-dim broadcast needs 32-bit types).
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(jnp.float32)

    n_chunks = plane_w // chunk

    for rx in range(3):
        region = scratch[rx][...]  # (6, M, plane_stride)
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                shift = oy * nz + oz
                # Lane-aligned neighbor access: roll absorbs the unaligned
                # in-plane shift (pltpu.roll needs a non-negative amount).
                amount = (-shift) % plane_stride
                rolled_buf[...] = (
                    pltpu.roll(region, amount, 2) if shift else region
                )
                is_center = rx == 1 and shift == 0

                def body(k, _, is_center=is_center):
                    # Dynamic lane offsets are multiples of the 128-aligned
                    # chunk — the supported dynamic-slicing form.
                    off = h0 + k * chunk
                    own = scratch[1, :, :, pl.ds(off, chunk)]   # (6, M, CH)
                    nbr = rolled_buf[:, :, pl.ds(off, chunk)]   # (6, M, CH)
                    dx = own[0][:, None, :] - nbr[0][None, :, :]
                    dy = own[1][:, None, :] - nbr[1][None, :, :]
                    dz = own[2][:, None, :] - nbr[2][None, :, :]
                    r2 = dx * dx + dy * dy + dz * dz
                    if is_center:
                        r2 = r2 + eye[:, :, None] * FAR

                    a_mix = 0.5 * (own[3][:, None, :] + nbr[3][None, :, :])
                    b_mix = 0.5 * (own[4][:, None, :] + nbr[4][None, :, :])

                    # softcore<2,3>: c = 6 e / d^2 * (1 - s)^2
                    s_a = r2 * a_inv_d2
                    core_a = 1.0 - s_a
                    c_a = jnp.where(
                        core_a > 0,
                        6.0 * a_energy * a_inv_d2 * core_a * core_a,
                        0.0,
                    )
                    # softcore<8,3>: c = 24 e / d^2 * s^3 (1 - s^4)^2
                    s_b = r2 * b_inv_d2
                    s_b2 = s_b * s_b
                    core_b = 1.0 - s_b2 * s_b2
                    c_b = jnp.where(
                        core_b > 0,
                        24.0 * b_energy * b_inv_d2 * s_b * s_b2 * core_b * core_b,
                        0.0,
                    )
                    c = (a_mix * c_a + b_mix * c_b) * nbr[5][None, :, :]

                    ks = pl.ds(k * chunk, chunk)
                    facc[0, :, ks] += jnp.sum(c * dx, axis=1)
                    facc[1, :, ks] += jnp.sum(c * dy, axis=1)
                    facc[2, :, ks] += jnp.sum(c * dz, axis=1)
                    return 0

                jax.lax.fori_loop(0, n_chunks, body, 0)

    # scratch[rx] is (6, M, PS): read the validity channel's own-plane tile.
    valid = scratch[1, 5, :, h0 : h0 + plane_w]
    out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[:, :, h0 : h0 + plane_w] = facc[:, :, :plane_w] * valid[None]


@functools.partial(jax.jit, static_argnames=("dims", "m", "chunk", "interpret"))
def ab_pair_forces_pallas(
    slab: jnp.ndarray,        # (6, M, Cp) plane-padded channel slab, f32
    params: jnp.ndarray,      # (4,) [a_energy, 1/a_d^2, b_energy, 1/b_d^2]
    dims: Tuple[int, int, int],
    m: int,
    chunk: int = 128,
    interpret: bool = False,
):
    """Returns (3, M, Cp) force planes in the same padded layout (pad columns
    zero)."""
    nx, ny, nz = dims
    h0, plane_stride, cp = plane_geometry(dims)
    if slab.shape != (6, m, cp):
        raise ValueError(f"bad slab shape {slab.shape}, expected (6, {m}, {cp})")

    plane_w = _round_up(ny * nz, chunk)
    grid = (nx,)
    kernel = functools.partial(_kernel, dims=dims, m=m, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (3, m, plane_stride), lambda p: (0, 0, p + 1), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, m, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, 6, m, plane_stride), jnp.float32),
            pltpu.VMEM((6, m, plane_stride), jnp.float32),
            pltpu.VMEM((3, m, plane_w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(params, slab)


def build_padded_slab(grid, positions, af, bf):
    """Scatter beads into the plane-padded (6, M, Cp) channel slab.

    ``grid`` is a :class:`~genome_cycle_tpu.ops.dense_grid.DenseGrid`.
    Returns (slab, ids (Cp, M) int32, overflow, max_fill).
    """
    n = positions.shape[0]
    m = grid.capacity
    nx, ny, nz = grid.dims
    h0, plane_stride, cp = plane_geometry(grid.dims)

    lower = jnp.asarray(grid.lower, positions.dtype)
    dims = jnp.asarray(grid.dims, jnp.int32)
    coords = jnp.floor((positions - lower) / grid.cell_size).astype(jnp.int32)
    coords = jnp.clip(coords, 0, dims - 1)
    flat = (
        (coords[:, 0] + 1) * plane_stride
        + h0
        + coords[:, 1] * nz
        + coords[:, 2]
    )

    order = jnp.argsort(flat)
    sorted_flat = flat[order]
    first_of_run = jnp.searchsorted(sorted_flat, sorted_flat, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first_of_run.astype(jnp.int32)
    max_fill = (jnp.max(rank, initial=-1) + 1).astype(jnp.int32)
    fits = rank < m
    overflow = jnp.sum(~fits).astype(jnp.int32)
    slot = jnp.where(fits, sorted_flat * m + rank, cp * m)

    def scatter(channel, fill):
        buf = jnp.full((cp * m,), fill, jnp.float32)
        return buf.at[slot].set(
            channel[order].astype(jnp.float32), mode="drop", unique_indices=True
        ).reshape(cp, m)

    px = scatter(positions[:, 0], FAR)
    py = scatter(positions[:, 1], FAR)
    pz = scatter(positions[:, 2], FAR)
    ca = scatter(af, 0.0)
    cb = scatter(bf, 0.0)
    ones = jnp.ones((n,), jnp.float32)
    cv = scatter(ones, 0.0)

    ids = jnp.full((cp * m,), -1, jnp.int32)
    ids = ids.at[slot].set(
        order.astype(jnp.int32), mode="drop", unique_indices=True
    ).reshape(cp, m)

    slab = jnp.stack([px.T, py.T, pz.T, ca.T, cb.T, cv.T], axis=0)
    return slab, ids, overflow, max_fill


def forces_to_beads(planes, ids, n: int):
    """(3, M, Cp) force planes + (Cp, M) bead ids -> (N, 3) forces."""
    flat_ids = ids.reshape(-1)
    forces = jnp.transpose(planes, (2, 1, 0)).reshape(-1, 3)
    out = jnp.zeros((n, 3), planes.dtype)
    safe = jnp.where(flat_ids >= 0, flat_ids, n)
    return out.at[safe].set(forces, mode="drop", unique_indices=True)
