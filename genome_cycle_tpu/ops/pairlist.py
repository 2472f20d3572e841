"""Verlet pair-list engine: per-bead fixed-capacity neighbor rows.

Third formulation of the dominant O(N*nbr) pair computation, alongside the
gather fold (:mod:`neighbor`) and the dense cell slabs (:mod:`dense_grid` /
:mod:`pallas_kernels`):

1. Every ``refresh`` steps, :func:`build_neighbor_rows` compacts all partners
   within ``radius = cutoff_max + margin`` of each bead into an (N, K) id
   table (both directions listed, so the per-step force needs no scatter).
2. In between, :func:`pair_forces_rows_list` re-measures only those K
   candidates per bead: 3 per-coordinate (N, K) gathers + elementwise math.
   K tracks the true neighborhood occupancy (~margin-inflated cutoff sphere),
   not the 27-cell stencil volume — an order of magnitude fewer candidate
   lanes than any cell-stencil scheme at liquid-like densities.
3. Validity is monitored, never assumed: the list covers every pair that can
   come within the cutoff while no bead has moved more than ``margin / 2``
   from its position at build time (``anchor``).  :func:`drift_exceeded`
   checks that bound; the driver reruns a chunk with a larger margin or a
   shorter refresh interval when it trips (same adaptive-retry pattern as
   cell-capacity overflow).

Replaces the same micromd surface as :func:`neighbor.pairwise_forces_cell`
(``md::make_neighbor_pairwise_forcefield``, SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .neighbor import CellGrid, build_cell_table, neighbor_fold


class NeighborRows(NamedTuple):
    ids: jnp.ndarray       # (N, K) int32 partner ids, -1 = empty slot
    anchor: jnp.ndarray    # (N, 3) positions the list was built at
    overflow: jnp.ndarray  # () int32 partners dropped for lack of capacity


def build_neighbor_rows(
    grid: CellGrid, table, positions, radius, capacity: int
) -> NeighborRows:
    """List all partners j with |x_i - x_j| < radius for every bead i.

    Both (i, j) and (j, i) are listed, so downstream force evaluation is a
    pure per-row reduction.  ``grid``/``table`` must have ``cell_size >=
    radius`` or pairs at the stencil edge are missed.
    """
    n = positions.shape[0]
    radius2 = radius * radius

    ids0 = jnp.full((n, capacity), -1, dtype=jnp.int32)
    fill0 = jnp.zeros((n,), jnp.int32)
    over0 = jnp.zeros((), jnp.int32)
    rows = jnp.arange(n, dtype=jnp.int32)

    def kernel(carry, j_ids, dxs, r2, valid):
        ids, fill, over = carry
        take = valid & (r2 < radius2)
        prefix = jnp.cumsum(take.astype(jnp.int32), axis=1)
        slot = fill[:, None] + prefix - 1
        ok = take & (slot < capacity)
        r = jnp.broadcast_to(rows[:, None], j_ids.shape)
        ids = ids.at[r, jnp.where(ok, slot, capacity)].set(
            jnp.where(ok, j_ids, -1), mode="drop"
        )
        over = over + jnp.sum(take & ~ok).astype(jnp.int32)
        return ids, fill + prefix[:, -1], over

    ids, _, over = neighbor_fold(grid, table, positions, kernel, (ids0, fill0, over0))
    return NeighborRows(ids=ids, anchor=positions, overflow=over)


def refresh_neighbor_rows(
    grid: CellGrid, positions, radius, capacity: int
) -> NeighborRows:
    """Cell-table build + row compaction in one call (the refresh step)."""
    table, _, _ = build_cell_table(grid, positions)
    return build_neighbor_rows(grid, table, positions, radius, capacity)


def drift_exceeded(rows: NeighborRows, positions, margin):
    """True when some bead moved more than margin/2 since the list was built
    (two such beads can close an unlisted gap of ``margin``)."""
    d2 = jnp.sum((positions - rows.anchor) ** 2, axis=-1)
    return jnp.max(d2) > (0.5 * margin) ** 2


def pair_forces_rows_list(
    positions, rows: NeighborRows, coeff_fn, energy_fn=None
):
    """Pairwise forces over a prebuilt neighbor-row list.

    ``coeff_fn(r2, i_ids, j_ids) -> (N, K)`` with F = c * dx, as in
    :func:`neighbor.pairwise_forces_cell`.  Every pair is listed in both
    rows, so the row reduction yields the full force and the energy sum is
    halved.  Coordinates travel as per-axis planes (TPU tiling; see
    ``neighbor_fold``).
    """
    n = positions.shape[0]
    ids = rows.ids
    valid = ids >= 0
    safe = jnp.maximum(ids, 0)
    i_ids = jnp.arange(n, dtype=jnp.int32)[:, None]

    dxs = []
    r2 = jnp.zeros(ids.shape, positions.dtype)
    for k in range(3):
        d = positions[:, k, None] - positions[:, k][safe]
        dxs.append(d)
        r2 = r2 + d * d
    r2 = jnp.where(valid, r2, jnp.asarray(1e30, positions.dtype))

    c = jnp.where(valid, coeff_fn(r2, i_ids, ids), 0.0)
    forces = jnp.stack([jnp.sum(c * d, axis=1) for d in dxs], axis=-1)

    energy = jnp.asarray(0.0, positions.dtype)
    if energy_fn is not None:
        u = jnp.where(valid, energy_fn(r2, i_ids, ids), 0.0)
        energy = 0.5 * jnp.sum(u)
    return forces, energy
