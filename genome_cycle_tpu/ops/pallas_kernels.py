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


VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # single source: also the CompilerParams cap

# Resident (m, jb, chunk) pair temporaries in _kernel's inner j-block loop:
# dx/dy/dz, r2, a_mix/b_mix, s_a (reused as core_a), s_b/s_b2/core_b, c —
# conservatively 10 live at once, plus the fx/fy/fz accumulators at
# (m, chunk).  vmem_plan budgets with this count; if the kernel body gains a
# block-shaped temporary, bump it here.
KERNEL_PAIR_TEMPS = 10


def vmem_plan(dims: Tuple[int, int, int], m: int):
    """Pick (chunk, jb) that provably fit the scoped-VMEM budget.

    Accounts for every scratch buffer declared by :func:`ab_pair_forces_pallas`
    plus the kernel body's (m, jb, chunk) pair temporaries (~10 resident
    blocks: 3 coordinate planes + shifted copies, r2, two softcore branches,
    coefficient, accumulator partials).  Returns None when no configuration
    fits — callers MUST fall back to the XLA dense-slab path instead of
    launching a kernel that kills the TPU worker (observed in round 2 at
    m=192: the capacity retry crashed the chip mid-bench).
    """
    _, plane_stride, _ = plane_geometry(dims)
    for chunk in (128,):
        plane_w = _round_up(dims[1] * dims[2], chunk)
        fixed = 4 * (
            3 * 6 * m * plane_stride   # rolled planes scratch
            + 6 * m * plane_stride     # rolled_buf
            + 3 * m * plane_w          # facc
            + 3 * m * plane_stride     # staging
        )
        jbs = [m] if m <= 32 else []
        jbs += [j for j in (16, 8, 4, 2, 1) if j < m]
        for jb in jbs:
            if m % jb != 0:
                continue
            temporaries = 4 * KERNEL_PAIR_TEMPS * m * jb * chunk
            if fixed + temporaries <= VMEM_LIMIT_BYTES:
                return chunk, jb
    return None


def plane_geometry(dims: Tuple[int, int, int]):
    nx, ny, nz = dims
    if nz + 1 > 128:
        raise ValueError("nz too large for the 128-lane halo layout")
    if nz < 3:
        # With nz <= 2 distinct (oy, oz) offsets alias to the same flat shift
        # and neighbor pairs would be double-counted.
        raise ValueError("nz < 3 not supported by the flat-shift layout")
    h0 = 128  # lane-aligned in-plane data offset; >= nz+1 halo
    # The kernel's neighbor slices extend to h0 + round_up(plane, chunk) +
    # nz + 1 with chunk up to 128: size the stride so every static slice
    # stays in bounds.
    plane_w = _round_up(ny * nz, 128)
    plane_stride = _round_up(h0 + plane_w + nz + 1, 128)
    cp = (nx + 2) * plane_stride
    return h0, plane_stride, cp


def _kernel(params_ref, slab_hbm, out_ref, scratch, rolled_buf, facc, staging,
            sem, out_sem, *, dims, m, chunk, jb):
    """chunk = lane-chunk width (cells per inner loop step; must be a
    multiple of 128 — Mosaic only allows dynamic lane offsets it can prove
    are 128-aligned).  jb = j-side sublane block: pair temporaries are
    (m, jb, chunk) instead of (m, m, chunk), bounding VMEM pressure at
    high per-cell capacity."""
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

    # f32 self-pair masks, one per j-sublane block (Mosaic minor-dim
    # broadcast needs 32-bit types).
    eyes = [
        (
            jax.lax.broadcasted_iota(jnp.int32, (m, jb), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (m, jb), 1) + j0
        ).astype(jnp.float32)
        for j0 in range(0, m, jb)
    ]

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
                    fx = jnp.zeros((m, chunk), jnp.float32)
                    fy = jnp.zeros((m, chunk), jnp.float32)
                    fz = jnp.zeros((m, chunk), jnp.float32)
                    # Static j-sublane blocks keep pair temporaries at
                    # (M, jb, CH) — VMEM-bounded at any capacity.
                    for bi, j0 in enumerate(range(0, m, jb)):
                        nbr = rolled_buf[:, j0:j0 + jb, pl.ds(off, chunk)]
                        dx = own[0][:, None, :] - nbr[0][None, :, :]
                        dy = own[1][:, None, :] - nbr[1][None, :, :]
                        dz = own[2][:, None, :] - nbr[2][None, :, :]
                        r2 = dx * dx + dy * dy + dz * dz
                        if is_center:
                            r2 = r2 + eyes[bi][:, :, None] * FAR

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
                            24.0 * b_energy * b_inv_d2
                            * s_b * s_b2 * core_b * core_b,
                            0.0,
                        )
                        c = (a_mix * c_a + b_mix * c_b) * nbr[5][None, :, :]

                        fx = fx + jnp.sum(c * dx, axis=1)
                        fy = fy + jnp.sum(c * dy, axis=1)
                        fz = fz + jnp.sum(c * dz, axis=1)

                    ks = pl.ds(k * chunk, chunk)
                    facc[0, :, ks] += fx
                    facc[1, :, ks] += fy
                    facc[2, :, ks] += fz
                    return 0

                jax.lax.fori_loop(0, n_chunks, body, 0)

    # scratch[rx] is (6, M, PS): read the validity channel's own-plane tile.
    # The result leaves through an HBM output buffer (out_specs = ANY): with
    # a blocked VMEM out spec XLA allocates the FULL (3, M, Cp) result in
    # scoped VMEM, which overflows its 16 MB limit at production grid sizes.
    valid = scratch[1, 5, :, h0 : h0 + plane_w]
    staging[...] = jnp.zeros_like(staging)
    staging[:, :, h0 : h0 + plane_w] = facc[:, :, :plane_w] * valid[None]
    copy_out = pltpu.make_async_copy(
        staging,
        out_ref.at[:, :, pl.ds((p + 1) * plane_stride, plane_stride)],
        out_sem,
    )
    copy_out.start()
    copy_out.wait()


@functools.partial(
    jax.jit, static_argnames=("dims", "m", "chunk", "jb", "interpret")
)
def ab_pair_forces_pallas(
    slab: jnp.ndarray,        # (6, M, Cp) plane-padded channel slab, f32
    params: jnp.ndarray,      # (4,) [a_energy, 1/a_d^2, b_energy, 1/b_d^2]
    dims: Tuple[int, int, int],
    m: int,
    chunk: int = 128,
    jb: int | None = None,
    interpret: bool = False,
):
    """Returns (3, M, Cp) force planes in the same padded layout (pad columns
    zero)."""
    nx, ny, nz = dims
    h0, plane_stride, cp = plane_geometry(dims)
    if slab.shape != (6, m, cp):
        raise ValueError(f"bad slab shape {slab.shape}, expected (6, {m}, {cp})")
    if chunk % 128 != 0:
        raise ValueError("chunk must be a multiple of 128 (Mosaic lane tile)")
    if jb is None:
        jb = m if m <= 32 else 16
    if m % jb != 0:
        raise ValueError(f"jb={jb} must divide capacity m={m}")

    plane_w = _round_up(ny * nz, chunk)
    grid = (nx,)
    kernel = functools.partial(_kernel, dims=dims, m=m, chunk=chunk, jb=jb)
    # Mosaic's default scoped-VMEM budget is 16 MB; the three resident
    # planes plus pair temporaries exceed it at production capacity (m >=
    # 96).  v5e/v5p cores have 128 MB of VMEM — raise the cap and keep the
    # working set well under the physical limit via the jb block size.
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=VMEM_LIMIT_BYTES,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((3, m, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, 6, m, plane_stride), jnp.float32),
            pltpu.VMEM((6, m, plane_stride), jnp.float32),
            pltpu.VMEM((3, m, plane_w), jnp.float32),
            pltpu.VMEM((3, m, plane_stride), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(params, slab)


def assign_slots(grid, positions):
    """Per-bead slab slot assignment (the sort; the expensive part).

    Returns (slots (N,) int32, overflow, max_fill).  ``slots[i] = flat_cell *
    M + rank``; beads that do not fit their cell's capacity get the
    out-of-range sentinel ``Cp * M`` (dropped by the scatter, zero force on
    readback).  Rank-within-cell is computed with a cummax over sorted run
    starts — O(N) vector work, no gather loops.
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
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_flat[1:] != sorted_flat[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    rank = iota - run_start
    max_fill = (jnp.max(rank, initial=-1) + 1).astype(jnp.int32)
    fits = rank < m
    overflow = jnp.sum(~fits).astype(jnp.int32)
    slot = jnp.where(fits, sorted_flat * m + rank, cp * m)

    slots = jnp.zeros((n,), jnp.int32).at[order].set(
        slot, unique_indices=True
    )
    return slots, overflow, max_fill


def refresh_slab(grid, slots, positions, af, bf):
    """(6, M, Cp) channel slab from cached slots: one fused 8-channel
    scatter, no sort."""
    n = positions.shape[0]
    m = grid.capacity
    h0, plane_stride, cp = plane_geometry(grid.dims)

    fills = jnp.asarray([FAR, FAR, FAR, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    vals = jnp.stack(
        [
            positions[:, 0], positions[:, 1], positions[:, 2],
            af, bf, jnp.ones((n,), positions.dtype),
            jnp.zeros((n,), positions.dtype),
            jnp.zeros((n,), positions.dtype),
        ],
        axis=1,
    ).astype(jnp.float32)
    buf = jnp.broadcast_to(fills, (cp * m, 8)).at[slots].set(
        vals, mode="drop", unique_indices=True
    )
    slab = jnp.transpose(buf.reshape(cp, m, 8), (2, 1, 0))
    return slab[:6]


def build_padded_slab(grid, positions, af, bf):
    """Scatter beads into the plane-padded (6, M, Cp) channel slab.

    ``grid`` is a :class:`~genome_cycle_tpu.ops.dense_grid.DenseGrid`.
    Returns (slab, slots (N,) int32, overflow, max_fill).
    """
    slots, overflow, max_fill = assign_slots(grid, positions)
    slab = refresh_slab(grid, slots, positions, af, bf)
    return slab, slots, overflow, max_fill


def forces_to_beads(planes, slots, n: int):
    """(3, M, Cp) force planes + per-bead slots -> (N, 3) forces.

    Pure gather: overflowed beads (sentinel slot) read the clamped edge
    entry and are masked to zero.
    """
    m = planes.shape[1]
    cp = planes.shape[2]
    slot_c = jnp.minimum(slots // m, cp - 1)
    slot_m = slots % m
    f = planes[:, slot_m, slot_c]          # (3, N)
    valid = (slots < cp * m)[None, :]
    return jnp.where(valid, f, 0.0).T
