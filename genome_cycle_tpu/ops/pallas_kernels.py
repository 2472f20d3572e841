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
    h0 = 128  # lane-aligned in-plane data offset; >= nz+1 halo
    plane_stride = _round_up(h0 + ny * nz + nz + 1, 128)
    cp = (nx + 2) * plane_stride
    return h0, plane_stride, cp


def _kernel(params_ref, slab_hbm, out_ref, scratch, sem, *, dims, m, chunk):
    """chunk here is the sublane (j-side capacity) chunk width."""
    nx, ny, nz = dims
    h0, plane_stride, _ = plane_geometry(dims)
    plane = ny * nz
    plane_w = _round_up(plane, 128)
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

    own = scratch[1, :, :, h0 : h0 + plane_w]  # (6, M, PW) aligned slice
    ox_x, ox_y, ox_z = own[0], own[1], own[2]
    own_a, own_b = own[3], own[4]

    fx = jnp.zeros((m, plane_w), jnp.float32)
    fy = jnp.zeros((m, plane_w), jnp.float32)
    fz = jnp.zeros((m, plane_w), jnp.float32)

    # f32 self-pair mask (Mosaic minor-dim broadcast needs 32-bit types);
    # row = own slot i, column handled per j-chunk below.
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(jnp.float32)

    for rx in range(3):
        region = scratch[rx][...]  # (6, M, plane_stride)
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                shift = oy * nz + oz
                # Lane-aligned neighbor access: roll absorbs the unaligned
                # in-plane shift, then slice at the aligned data offset.
                # (pltpu.roll wants a non-negative amount; left-shift by s ==
                # right-shift by L - s.)
                amount = (-shift) % plane_stride
                rolled = pltpu.roll(region, amount, 2) if shift else region
                nbr_win = rolled[:, :, h0 : h0 + plane_w]  # (6, M, PW)
                is_center = rx == 1 and shift == 0
                # Sublane-chunk the j side to bound live (M, JB, PW) temps.
                for j0 in range(0, m, chunk):
                    nbr = nbr_win[:, j0 : j0 + chunk, :]  # (6, JB, PW)
                    dx = ox_x[:, None, :] - nbr[0][None, :, :]
                    dy = ox_y[:, None, :] - nbr[1][None, :, :]
                    dz = ox_z[:, None, :] - nbr[2][None, :, :]
                    r2 = dx * dx + dy * dy + dz * dz
                    if is_center:
                        r2 = r2 + eye[:, j0 : j0 + chunk, None] * FAR

                    a_mix = 0.5 * (own_a[:, None, :] + nbr[3][None, :, :])
                    b_mix = 0.5 * (own_b[:, None, :] + nbr[4][None, :, :])

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

                    fx = fx + jnp.sum(c * dx, axis=1)
                    fy = fy + jnp.sum(c * dy, axis=1)
                    fz = fz + jnp.sum(c * dz, axis=1)

    valid = own[5]
    out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[0, :, h0 : h0 + plane_w] = fx * valid
    out_ref[1, :, h0 : h0 + plane_w] = fy * valid
    out_ref[2, :, h0 : h0 + plane_w] = fz * valid


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
