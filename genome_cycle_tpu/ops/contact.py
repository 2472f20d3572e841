"""Hi-C contact-map accumulation.

Replaces the reference's host-side hash-map contact map
(stage_interphase/contact_map.{hpp,cpp}) with a jit-friendly fixed-capacity
design:

1. At the start of each jitted chunk, :func:`build_contact_list` compacts all
   pairs within ``contact_distance + margin`` into a per-bead slot list
   (N, capacity) — the margin covers bead drift across the chunk, so the
   list is a superset of contact-eligible pairs for the whole chunk.
2. Inside the chunk, every ``contactmap_update_interval`` steps
   :func:`update_contact_counts` re-measures only the listed pairs and
   increments per-slot counts — no sorting or hashing in the hot loop.
3. After each chunk the (ids, counts) pair goes to the host, where
   :func:`merge_window` reduces the accumulated chunks of an output window
   to the sorted COO (i, j, count) rows the trajectory store expects
   (contact_map.cpp:66-85 sorts by (i<<32|j) for compressibility).

Pairs are stored once with i < j.  Slot-capacity and margin overflows are
counted and surfaced, never silently dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .neighbor import CellGrid, neighbor_fold


class ContactList(NamedTuple):
    ids: jnp.ndarray       # (N, capacity) int32 partner j (> i), -1 empty
    counts: jnp.ndarray    # (N, capacity) int32 accumulated contact events
    fill: jnp.ndarray      # (N,) int32 used slots per row
    overflow: jnp.ndarray  # () int32 pairs dropped for lack of capacity


def build_contact_list(
    grid: CellGrid, table, positions, cutoff, capacity: int, query=None
) -> ContactList:
    """Compact all pairs (i < j) with |x_i - x_j| < cutoff into row slots.

    With ``query=(q_pos, q_ids)`` only the given row block's pairs are listed
    (rows of the returned arrays correspond to the block), for spatially
    sharded accumulation.
    """
    if query is None:
        q_pos = positions
        q_ids = jnp.arange(positions.shape[0], dtype=jnp.int32)
    else:
        q_pos, q_ids = query
    nq = q_pos.shape[0]
    cutoff2 = jnp.asarray(cutoff * cutoff, positions.dtype)

    ids0 = jnp.full((nq, capacity), -1, dtype=jnp.int32)
    fill0 = jnp.zeros((nq,), jnp.int32)
    over0 = jnp.zeros((), jnp.int32)
    row_ids = jnp.arange(nq, dtype=jnp.int32)

    def kernel(carry, j_ids, dx, r2, valid):
        ids, fill, over = carry
        take = valid & (j_ids > q_ids[:, None]) & (r2 < cutoff2)
        # Row-wise slot assignment: running fill + prefix position.
        prefix = jnp.cumsum(take.astype(jnp.int32), axis=1)
        slot = fill[:, None] + prefix - 1
        ok = take & (slot < capacity)
        rows = jnp.broadcast_to(row_ids[:, None], j_ids.shape)
        ids = ids.at[rows, jnp.where(ok, slot, capacity)].set(
            jnp.where(ok, j_ids, -1), mode="drop"
        )
        new_fill = fill + prefix[:, -1]
        over = over + jnp.sum(take & ~ok).astype(jnp.int32)
        return ids, new_fill, over

    ids, fill, over = neighbor_fold(
        grid, table, positions, kernel, (ids0, fill0, over0), query=(q_pos, q_ids)
    )
    counts = jnp.zeros((nq, capacity), jnp.int32)
    return ContactList(
        ids=ids, counts=counts, fill=jnp.minimum(fill, capacity), overflow=over
    )


def update_contact_counts(
    contact: ContactList, positions, contact_distance, q_pos=None
) -> ContactList:
    """Count one contact event for each listed pair currently within distance.

    The reference counts each found pair once per neighbor-searcher pass
    (contact_map.cpp:33-63); this is the same event semantics on the frozen
    pair list.  ``q_pos`` supplies the row block's own positions when the
    list rows are a shard of the system.
    """
    if q_pos is None:
        q_pos = positions
    valid = contact.ids >= 0
    safe = jnp.maximum(contact.ids, 0)
    # Per-coordinate (N, capacity) planes (3-minor gathers tile terribly on
    # TPU; see neighbor_fold).
    r2 = jnp.zeros(contact.ids.shape, positions.dtype)
    for k in range(3):
        d = q_pos[:, k, None] - positions[:, k][safe]
        r2 = r2 + d * d
    hit = valid & (r2 < contact_distance * contact_distance)
    return contact._replace(counts=contact.counts + hit.astype(jnp.int32))


def contact_list_to_host(contact: ContactList, row_ids=None):
    """Extract (i, j, count) numpy arrays (only occupied, nonzero slots).

    ``row_ids`` maps local rows to global bead ids for sharded lists.
    """
    ids = np.asarray(contact.ids)
    counts = np.asarray(contact.counts)
    n, capacity = ids.shape
    if row_ids is None:
        row_ids = np.arange(n, dtype=np.int64)
    rows = np.repeat(np.asarray(row_ids, np.int64), capacity)
    flat_ids = ids.reshape(-1).astype(np.int64)
    flat_counts = counts.reshape(-1)
    keep = (flat_ids >= 0) & (flat_counts > 0)
    return rows[keep], flat_ids[keep], flat_counts[keep]


def merge_window(chunks) -> np.ndarray:
    """Merge per-chunk (i, j, count) triples into sorted COO (K, 3) int32.

    Sorted by the packed key (i << 32 | j), matching the reference dump order
    (contact_map.cpp:75-84).
    """
    if not chunks:
        return np.zeros((0, 3), dtype=np.int32)
    i = np.concatenate([c[0] for c in chunks])
    j = np.concatenate([c[1] for c in chunks])
    w = np.concatenate([c[2] for c in chunks])
    if len(i) == 0:
        return np.zeros((0, 3), dtype=np.int32)
    keys = (i.astype(np.uint64) << np.uint64(32)) | j.astype(np.uint64)

    from .. import native

    uniq, sums = native.merge_contact_events(keys, w)
    out = np.empty((len(uniq), 3), dtype=np.int32)
    out[:, 0] = (uniq >> np.uint64(32)).astype(np.int32)
    out[:, 1] = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int32)
    out[:, 2] = sums.astype(np.int32)
    return out
