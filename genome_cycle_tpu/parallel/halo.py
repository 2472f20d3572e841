"""True spatial decomposition: x-slab bead ownership + one-band halo exchange.

This is the scaling tier beyond :mod:`sharded` (which replicates all
positions on every device and all-gathers them each step — SURVEY.md §5.7's
small-N point of the design space).  Here each device OWNS the beads inside
its x-slab of the simulation volume and holds them in a fixed-capacity
buffer; per step it exchanges only the beads within ``halo_width`` of its
slab faces with its two neighbours over the ``beads`` mesh axis
(``lax.ppermute`` — rides ICI on hardware), so per-step communication is
O(surface), not O(N):

- pair + wall forces: computed for owned beads against the own+halo local
  set through the standard cell-table fold;
- chain/nucleolar bonds: every device scans the full (replicated, O(N))
  bond table and applies each bond's force to whichever ends it owns —
  bonded partners sit one bond length apart, far inside the halo band, so
  no extra communication is needed (SURVEY §5.7 mitigation);
- the nucleolar droplet acts among the handful of nucleolar particles at
  unbounded range: their positions are assembled with one tiny psum;
- wall axial reaction reduces with psum over the beads axis (the wall ODE
  stays identical on all shards of a replica);
- contact lists/events live on owner rows with *global* bead ids; partner
  positions resolve through a per-step id->local-slot map, and the
  per-segment rebuild semantics match the single-device engine exactly;
- noise is drawn per GLOBAL bead id (``fold_in(fold_in(key, step), id)``),
  so trajectories are bitwise identical across shard counts — determinism
  replaces sanitizers (SURVEY §5.2).

Ownership is static between rebins: beads that drift across a slab face
remain owned until :func:`rebin` (host-side, between chunks) reassigns them.
The safety condition — every interaction partner of an owned bead is inside
the halo band — therefore requires ``excursion + interaction_cutoff <=
halo_width``; the per-segment ``excursion`` watermark is tracked in the
stats and the driver must rebin (or widen the halo) before it is violated,
mirroring the contact-margin drift guard.

All capacities are static (jit cache keys); overflows (slab buffer, halo
band, cell table, contact rows, events) are counted and surfaced, never
silently dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.interphase import InterphaseModel
from ..ops import potentials as pot
from ..ops.block_pairs import SLOT_OVERFLOW, block_pair_forces, build_structure
from ..ops.contact import (
    ContactList,
    build_contact_list,
    compact_contact_events,
    events_to_host,
    merge_window,
)
from ..ops.neighbor import build_cell_table, pairwise_forces_cell

FAR = 1e15


class HaloGeometry(NamedTuple):
    """Static slab/halo layout along x (jit cache key)."""

    n_shards: int
    bound: float          # slabs tile [-bound, bound]
    slab_width: float
    halo_width: float
    own_capacity: int     # bead slots per device
    edge_capacity: int    # bead slots per halo band
    # Per-shard slot capacity of the block engine's column-aligned layout
    # (0 = auto worst case; plan_halo sizes it from the structure so the
    # per-shard lane cost scales with the LOCAL set, not global n).
    block_slots: int = 0


class HaloStats(NamedTuple):
    """Per-replica validity diagnostics for one halo segment."""

    cell_overflow: jnp.ndarray
    band_overflow: jnp.ndarray     # beads that did not fit a halo band buffer
    bond_misses: jnp.ndarray       # bond ends whose partner left the halo
    contact_overflow: jnp.ndarray
    contact_misses: jnp.ndarray    # listed partners unresolvable at a tick
    event_overflow: jnp.ndarray
    drift2: jnp.ndarray            # max squared displacement within segment
    excursion: jnp.ndarray         # max |x| overshoot beyond the own slab


class HaloCarry(NamedTuple):
    pos: jnp.ndarray       # (R, D*B, 3) FAR in empty slots
    ids: jnp.ndarray       # (R, D*B) int32 global bead ids, -1 empty
    key: jnp.ndarray       # (R, 2) uint32 PRNG keys
    semiaxes: jnp.ndarray  # (R, 3)


def carry_specs() -> HaloCarry:
    return HaloCarry(
        pos=P("replica", "beads", None),
        ids=P("replica", "beads"),
        key=P("replica", None),
        semiaxes=P("replica", None),
    )


def plan_halo(
    model: InterphaseModel,
    n_shards: int,
    positions: np.ndarray,
    imbalance: float = 1.6,
) -> HaloGeometry:
    """Derive slab/halo capacities from an actual structure.

    ``positions``: any representative (N, 3) (or (R, N, 3)) structure; slab
    occupancies size the per-device buffer, the halo-band population sizes
    the exchange buffers.
    """
    x = np.asarray(positions).reshape(-1, 3)
    c = model.config
    bound = float(model.settings.grid_bound)
    slab_w = 2.0 * bound / n_shards
    halo_w = float(
        c.contactmap_distance + model.settings.contact_margin
        + model.grid.cell_size
    )
    xs = np.clip(x[:, 0], -bound, bound - 1e-6)
    slab = ((xs + bound) / slab_w).astype(np.int64)
    per_rep = len(x) // model.n
    occupancy = np.bincount(slab, minlength=n_shards) / max(per_rep, 1)
    own_cap = int(np.ceil(occupancy.max() * imbalance / 64) * 64)
    # Band population: worst slab-face band of width halo_w.
    edges = np.arange(1, n_shards) * slab_w - bound
    band = 0
    for e in edges:
        band = max(
            band,
            int(((xs >= e - halo_w) & (xs < e)).sum() / max(per_rep, 1)),
            int(((xs >= e) & (xs < e + halo_w)).sum() / max(per_rep, 1)),
        )
    edge_cap = int(np.ceil(max(band, 32) * imbalance / 32) * 32)
    # Block-engine slot capacity for the worst slab's local (own + halo)
    # set: per-shard lane cost must scale with the local set, so the global
    # model's probed slot count cannot be reused here.  Exact per-column
    # padded need from the actual structure, with the imbalance headroom;
    # SLOT_OVERFLOW retries in the driver cover drift beyond it.
    block_slots = 0
    if model.block_grid is not None:
        bg = model.block_grid
        x0 = x[: model.n]
        nx, ny, _ = bg.dims
        need = 0
        for s in range(n_shards):
            lo = -bound + s * slab_w - halo_w
            hi = -bound + (s + 1) * slab_w + halo_w
            sub = x0[(x0[:, 0] >= lo) & (x0[:, 0] < hi)]
            cx = np.clip(
                ((sub[:, 0] - bg.lower[0]) / bg.cell_size).astype(np.int64),
                0, nx - 1,
            )
            cy = np.clip(
                ((sub[:, 1] - bg.lower[1]) / bg.cell_size).astype(np.int64),
                0, ny - 1,
            )
            counts = np.bincount(cx * ny + cy, minlength=nx * ny)
            need = max(
                need, int((-(-counts // bg.block) * bg.block).sum())
            )
        block_slots = int(np.ceil(max(need, 128) * imbalance / 128) * 128)
    return HaloGeometry(
        n_shards=n_shards,
        bound=bound,
        slab_width=slab_w,
        halo_width=halo_w,
        own_capacity=own_cap,
        edge_capacity=edge_cap,
        block_slots=block_slots,
    )


def bin_to_slabs(geo: HaloGeometry, positions: np.ndarray):
    """Host-side (re)binning: (N, 3) -> per-slab padded (D*B, 3) + id arrays.

    Raises if a slab outgrows the static capacity (the driver re-plans)."""
    n = positions.shape[0]
    d, b = geo.n_shards, geo.own_capacity
    xs = np.clip(positions[:, 0], -geo.bound, geo.bound - 1e-6)
    slab = ((xs + geo.bound) / geo.slab_width).astype(np.int64)
    pos = np.full((d * b, 3), FAR, np.float32)
    ids = np.full((d * b,), -1, np.int32)
    for s in range(d):
        members = np.nonzero(slab == s)[0]
        if len(members) > b:
            raise OverflowError(
                f"slab {s} holds {len(members)} beads > capacity {b}"
            )
        pos[s * b : s * b + len(members)] = positions[members]
        ids[s * b : s * b + len(members)] = members
    return pos, ids


def make_halo_carry(
    model: InterphaseModel, geo: HaloGeometry, mesh: Mesh, positions,
    seeds=None, semiaxes=None, keys=None,
) -> HaloCarry:
    """(R, N, 3) host positions -> device-sharded slab carry.

    Pass either ``seeds`` (fresh runs) or ``keys`` (R, 2) raw PRNG keys
    (checkpoint resume / rebinning mid-run keeps the stream).
    """
    r = positions.shape[0]
    pos_all, ids_all = [], []
    for k in range(r):
        p, i = bin_to_slabs(geo, np.asarray(positions[k], np.float32))
        pos_all.append(p)
        ids_all.append(i)
    if keys is None:
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
    else:
        keys = jnp.asarray(keys, jnp.uint32)
    carry = HaloCarry(
        pos=jnp.asarray(np.stack(pos_all)),
        ids=jnp.asarray(np.stack(ids_all)),
        key=keys,
        semiaxes=jnp.asarray(semiaxes, jnp.float32),
    )
    specs = carry_specs()
    from .mesh import shard_to_mesh

    return HaloCarry(
        *(shard_to_mesh(arr, mesh, spec) for arr, spec in zip(carry, specs))
    )


def events_host(ev) -> np.ndarray:
    """Fetch a segment's event block to the host.

    Events are sharded over the beads axis; on a multi-controller runtime a
    plain ``np.asarray`` only sees the local shards, so the global block is
    all-gathered first (every process needs the full window for its own
    merge — the reference's one-writer surface keeps rank 0's store, but
    the merge must agree everywhere for the adaptive retries to stay in
    lock-step)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(ev, tiled=True))
    return np.asarray(ev)


def gather_positions(model: InterphaseModel, carry: HaloCarry) -> np.ndarray:
    """Reassemble (R, N, 3) global positions from the slab layout."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        pos = np.asarray(multihost_utils.process_allgather(carry.pos, tiled=True))
        ids = np.asarray(multihost_utils.process_allgather(carry.ids, tiled=True))
    else:
        pos = np.asarray(carry.pos)
        ids = np.asarray(carry.ids)
    r = pos.shape[0]
    out = np.zeros((r, model.n, 3), np.float32)
    for k in range(r):
        m = ids[k] >= 0
        out[k, ids[k][m]] = pos[k][m]
    return out


def _pack_band(pos, ids, mask, capacity):
    """Compact the masked rows into a fixed-size band buffer."""
    n = pos.shape[0]
    idx = jnp.nonzero(mask, size=capacity, fill_value=n)[0]
    ok = idx < n
    safe = jnp.minimum(idx, n - 1)
    p = jnp.where(ok[:, None], pos[safe], FAR)
    i = jnp.where(ok, ids[safe], -1)
    overflow = jnp.sum(mask) - jnp.sum(ok)
    return p, i, overflow.astype(jnp.int32)


def make_halo_segment(
    model: InterphaseModel, geo: HaloGeometry, mesh: Mesh, seg_steps: int
):
    """Jitted (carry, seg_start) -> (carry, events, HaloStats) over one
    contact-list lifetime, fully sharded over ("replica", "beads")."""
    c = model.config
    d = geo.n_shards
    b = geo.own_capacity
    e_cap = geo.edge_capacity
    n = model.n
    dt = c.timestep
    spring = jnp.asarray(c.wall_semiaxes_spring, jnp.float32)
    events_cap = max(4096, model.events_capacity // d)
    local_n = b + 2 * e_cap

    perm_right = [(i, i + 1) for i in range(d - 1)]
    perm_left = [(i + 1, i) for i in range(d - 1)]

    bond_k = model.bond_spring
    bond_l = model.bond_length
    bond_i = model.bond_pairs[:, 0]
    bond_j = model.bond_pairs[:, 1]
    nuc_k = c.nucleolus_bond_spring
    nuc_l = c.nucleolus_bond_length
    has_nuc = model.nuc_bonds.shape[0] > 0

    # Per-shard block grid: locally sized slot capacity (geo.block_slots),
    # NOT the global model's probed count — lanes must scale with the slab.
    block_grid_local = None
    if model.block_grid is not None:
        import dataclasses as _dc

        block_grid_local = _dc.replace(
            model.block_grid, slots=geo.block_slots
        )

    def exchange(own_pos, own_ids, shard):
        """Own + received halo bands; returns local set (B + 2E rows)."""
        slab_lo = -geo.bound + shard.astype(own_pos.dtype) * geo.slab_width
        valid = own_ids >= 0
        xs = own_pos[:, 0]
        left_band = valid & (xs < slab_lo + geo.halo_width)
        right_band = valid & (xs >= slab_lo + geo.slab_width - geo.halo_width)
        lp, li, lov = _pack_band(own_pos, own_ids, left_band, e_cap)
        rp, ri, rov = _pack_band(own_pos, own_ids, right_band, e_cap)
        # My right band becomes my right neighbour's from-left halo.
        from_left_p = jax.lax.ppermute(rp, "beads", perm_right)
        from_left_i = jax.lax.ppermute(ri, "beads", perm_right)
        from_right_p = jax.lax.ppermute(lp, "beads", perm_left)
        from_right_i = jax.lax.ppermute(li, "beads", perm_left)
        # Edge shards receive zero-filled buffers: mask them invalid.
        from_left_i = jnp.where(shard > 0, from_left_i, -1)
        from_right_i = jnp.where(shard < d - 1, from_right_i, -1)
        local_pos = jnp.concatenate([own_pos, from_left_p, from_right_p])
        local_ids = jnp.concatenate([own_ids, from_left_i, from_right_i])
        local_valid = local_ids >= 0
        local_pos = jnp.where(local_valid[:, None], local_pos, FAR)
        # Excursion: how far owned beads have strayed from their slab.
        over_l = jnp.where(valid, slab_lo - xs, -FAR)
        over_r = jnp.where(valid, xs - (slab_lo + geo.slab_width), -FAR)
        excursion = jnp.maximum(
            jnp.maximum(over_l.max(), over_r.max()), 0.0
        )
        return local_pos, local_ids, local_valid, lov + rov, excursion

    def slot_map(local_ids, local_valid):
        """Global id -> local slot (-1 when absent)."""
        tgt = jnp.where(local_valid, local_ids, n)
        return (
            jnp.full((n + 1,), -1, jnp.int32)
            .at[tgt]
            .set(jnp.arange(local_n, dtype=jnp.int32), mode="drop")
        )[:n]

    def bonded_forces_local(local_pos, slots, bond_scale, own_ids):
        """Chain + nucleolar bond forces for owned rows, from the replicated
        bond table; each device applies only its own ends."""
        s2 = bond_scale * bond_scale
        force = jnp.zeros((local_n, 3), local_pos.dtype)
        misses = jnp.zeros((), jnp.int32)

        def accumulate(force, misses, gi, gj, k_arr, l_arr):
            si = slots[gi]
            sj = slots[gj]
            have = (si >= 0) & (sj >= 0)
            pi = local_pos[jnp.maximum(si, 0)]
            pj = local_pos[jnp.maximum(sj, 0)]
            dvec = pi - pj
            r2 = jnp.sum(dvec * dvec, axis=1)
            coeff = pot.semispring_force_coeff(r2, k_arr / s2, l_arr * bond_scale)
            fvec = jnp.where(have, coeff, 0.0)[:, None] * dvec
            sink = local_n  # dropped
            force = force.at[jnp.where(have, si, sink)].add(fvec, mode="drop")
            force = force.at[jnp.where(have, sj, sink)].add(-fvec, mode="drop")
            # A bond end we own whose partner is not locally resolvable is a
            # halo violation (bond stretched past the halo width).
            own_end = (si >= 0) & (si < b) | ((sj >= 0) & (sj < b))
            misses = misses + jnp.sum(own_end & ~have).astype(jnp.int32)
            return force, misses

        if bond_i.shape[0]:
            force, misses = accumulate(
                force, misses, bond_i, bond_j, bond_k, bond_l
            )
        if has_nuc:
            force, misses = accumulate(
                force,
                misses,
                model.nuc_bonds[:, 0],
                model.nuc_bonds[:, 1],
                jnp.full(model.nuc_bonds.shape[0], nuc_k, local_pos.dtype),
                jnp.full(model.nuc_bonds.shape[0], nuc_l, local_pos.dtype),
            )
        return force[:b], misses

    def droplet_forces_own(local_pos, slots, own_valid):
        """Nucleolar droplet: unbounded-range attraction among the (few)
        nucleolar particles; assemble their global positions with one psum,
        then apply the dense targeted force to owned rows."""
        if not model.use_droplet:
            return jnp.zeros((b, 3), local_pos.dtype)
        tgt = model.nuc_targets
        st = slots[tgt]
        owned_t = (st >= 0) & (st < b)
        contrib = jnp.where(
            owned_t[:, None], local_pos[jnp.maximum(st, 0)], 0.0
        )
        tgt_pos = jax.lax.psum(contrib, "beads")  # (T, 3) global
        cfg = c

        def drop_c(r2, i, j):
            inside = r2 < cfg.nucleolus_droplet_cutoff**2
            return jnp.where(
                inside,
                pot.softwell_force_coeff(
                    r2,
                    cfg.nucleolus_droplet_energy,
                    cfg.nucleolus_droplet_decay,
                    6,
                ),
                0.0,
            )

        t = tgt_pos.shape[0]
        dxs = tuple(
            tgt_pos[:, None, k] - tgt_pos[None, :, k] for k in range(3)
        )
        r2 = dxs[0] ** 2 + dxs[1] ** 2 + dxs[2] ** 2
        valid = ~jnp.eye(t, dtype=bool)
        r2 = jnp.where(valid, r2, 1e30)
        coeff = jnp.where(valid, drop_c(r2, None, None), 0.0)
        f_t = jnp.stack([jnp.sum(coeff * dx, axis=1) for dx in dxs], axis=-1)
        force = jnp.zeros((b + 1, 3), local_pos.dtype)
        sink = b
        rows = jnp.where(owned_t, st, sink)
        force = force.at[rows].add(jnp.where(owned_t[:, None], f_t, 0.0),
                                   mode="drop")
        return force[:b]

    def device_step(carry, step):
        (own_pos, own_ids, key, semiaxes, contact, stats) = carry
        shard = jax.lax.axis_index("beads")
        core_scale, bond_scale = model.scales(
            (step - 1).astype(jnp.float32) * dt
        )

        local_pos, local_ids, local_valid, band_ov, excursion = exchange(
            own_pos, own_ids, shard
        )
        slots = slot_map(local_ids, local_valid)
        own_valid = own_ids >= 0

        af_loc = jnp.where(local_valid, model.af[jnp.maximum(local_ids, 0)], 0.0)
        bf_loc = jnp.where(local_valid, model.bf[jnp.maximum(local_ids, 0)], 0.0)
        params = model._ab_params(core_scale)

        if block_grid_local is not None:
            # Per-shard sorted-block engine over the own+halo local set (the
            # single-chip hot path, VERDICT round-3 weak #4: multi-chip
            # scaling on the gather fold multiplied a ~20x-slower kernel).
            # Window-width / slot overflow rides the cell_overflow channel —
            # the driver grows the matching knob.
            def coeff_b(r2, e_i, e_j):
                return pot.ab_pair_force_coeff(
                    r2, 0.5 * (e_i[0] + e_j[0]), 0.5 * (e_i[1] + e_j[1]),
                    params,
                )

            pair_full, _, cell_ov, _ = block_pair_forces(
                block_grid_local, local_pos, (af_loc, bf_loc), coeff_b,
                struct=build_structure(
                    block_grid_local, local_pos, (af_loc, bf_loc),
                    valid=local_valid,
                ),
            )
            pair_f = pair_full[:b]
        else:
            table, cell_ov, _ = build_cell_table(
                model.grid, local_pos, valid=local_valid
            )

            def coeff(r2, i_loc, j_loc):
                a_mix = 0.5 * (af_loc[i_loc] + af_loc[j_loc])
                b_mix = 0.5 * (bf_loc[i_loc] + bf_loc[j_loc])
                return pot.ab_pair_force_coeff(r2, a_mix, b_mix, params)

            own_rows = jnp.arange(b, dtype=jnp.int32)
            pair_f, _ = pairwise_forces_cell(
                model.grid, table, local_pos, coeff,
                query=(local_pos[:b], own_rows),
            )

        bond_f, bond_miss = bonded_forces_local(
            local_pos, slots, bond_scale, own_ids
        )
        drop_f = droplet_forces_own(local_pos, slots, own_valid)

        # Wall: masked rows anchor at a quiet interior point.
        anchor = 0.25 * semiaxes
        wall_in = jnp.where(own_valid[:, None], own_pos, anchor[None, :])
        wall_a = 0.5 * (
            jnp.where(own_valid, model.af[jnp.maximum(own_ids, 0)], 0.5)
            + c.wall_ab_factor.a
        )
        wall_b = 0.5 * (
            jnp.where(own_valid, model.bf[jnp.maximum(own_ids, 0)], 0.5)
            + c.wall_ab_factor.b
        )
        from ..ops.wall import wall_forces

        wall_f, reaction, _ = wall_forces(
            wall_in, semiaxes, wall_a, wall_b, model._wall_params(core_scale)
        )
        reaction = jax.lax.psum(reaction, "beads")

        force = pair_f + bond_f + drop_f + wall_f

        # Per-global-id noise: bitwise identical across shard counts.
        base = jax.random.fold_in(key, step)
        bead_keys = jax.vmap(
            lambda i: jax.random.fold_in(base, i)
        )(jnp.maximum(own_ids, 0).astype(jnp.uint32))
        xi = jax.vmap(lambda k_: jax.random.normal(k_, (3,)))(bead_keys)
        mob = jnp.where(own_valid, model.mobility[jnp.maximum(own_ids, 0)], 0.0)
        noise_amp = jnp.sqrt(2.0 * c.temperature * mob * dt)
        new_pos = own_pos + mob[:, None] * force * dt + noise_amp[:, None] * xi
        new_pos = jnp.where(own_valid[:, None], new_pos, FAR)

        drift2 = jnp.max(
            jnp.where(own_valid, jnp.sum((new_pos - contact.ref_pos) ** 2, axis=1), 0.0)
        )

        semiaxes = semiaxes + dt * c.wall_mobility * (
            reaction - spring * semiaxes
        )

        stats = HaloStats(
            cell_overflow=jnp.maximum(stats.cell_overflow, cell_ov),
            band_overflow=jnp.maximum(stats.band_overflow, band_ov),
            bond_misses=stats.bond_misses + bond_miss,
            contact_overflow=stats.contact_overflow,
            contact_misses=stats.contact_misses,
            event_overflow=stats.event_overflow,
            drift2=jnp.maximum(stats.drift2, drift2),
            excursion=jnp.maximum(stats.excursion, excursion),
        )
        return (new_pos, own_ids, key, semiaxes, contact, stats), None

    def contact_tick(carry, step):
        """Count contact events on owner rows at the current positions:
        partner positions resolve through a fresh halo exchange's slot map."""
        own_pos, own_ids, key, semiaxes, contact, stats = carry
        shard = jax.lax.axis_index("beads")
        core_now, _ = model.scales(jnp.asarray(step, jnp.float32) * dt)
        t_pos, t_ids, t_valid, _, _ = exchange(own_pos, own_ids, shard)
        t_slots = slot_map(t_ids, t_valid)
        pid = contact.ids  # (B, cap) global partner ids
        have = pid >= 0
        ps = t_slots[jnp.maximum(pid, 0)]
        resolvable = have & (ps >= 0)
        pj = t_pos[jnp.maximum(ps, 0)]
        r2 = jnp.zeros(pid.shape, own_pos.dtype)
        for k in range(3):
            dk = own_pos[:, k, None] - pj[..., k]
            r2 = r2 + dk * dk
        dist = c.contactmap_distance * core_now
        hit = resolvable & (r2 < dist * dist)
        contact = contact._replace(
            counts=contact.counts + hit.astype(jnp.int32)
        )
        stats = stats._replace(
            contact_misses=stats.contact_misses
            + jnp.sum(have & ~resolvable).astype(jnp.int32)
        )
        return (own_pos, own_ids, key, semiaxes, contact, stats)

    def device_segment(own_pos, own_ids, key, semiaxes, seg_start):
        shard = jax.lax.axis_index("beads")
        own_valid = own_ids >= 0

        # Fresh contact list for this segment: owner rows, global partner
        # ids, cutoff covering the segment's final contact distance.
        t_end = (seg_start + seg_steps).astype(jnp.float32) * dt
        core_end, _ = model.scales(t_end)
        cutoff = c.contactmap_distance * core_end + model.settings.contact_margin

        local_pos, local_ids, local_valid, band_ov, _ = exchange(
            own_pos, own_ids, shard
        )
        ctable, _, _ = build_cell_table(
            model.margin_grid, local_pos, valid=local_valid
        )
        raw = build_contact_list(
            model.margin_grid, ctable, local_pos, cutoff,
            model.settings.contact_capacity,
            # Local row ids for the fold's self-exclusion; ownership and
            # stored partner ids resolve through the local->global map, so
            # row assignment is sharding-invariant.
            query=(
                jnp.where(own_valid[:, None], own_pos, FAR),
                jnp.arange(b, dtype=jnp.int32),
            ),
            global_ids=jnp.where(local_valid, local_ids, -1),
        )
        contact = raw._replace(ref_pos=own_pos)

        stats = HaloStats(
            cell_overflow=jnp.zeros((), jnp.int32),
            band_overflow=band_ov,
            bond_misses=jnp.zeros((), jnp.int32),
            contact_overflow=raw.overflow,
            contact_misses=jnp.zeros((), jnp.int32),
            event_overflow=jnp.zeros((), jnp.int32),
            drift2=jnp.zeros((), jnp.float32),
            excursion=jnp.zeros((), jnp.float32),
        )
        carry = (own_pos, own_ids, key, semiaxes, contact, stats)
        tick = c.contactmap_update_interval
        if seg_steps % tick == 0:
            # Tick-free inner scans; the tick fires at each block boundary
            # (a per-step lax.cond pays its branch every step under scan on
            # the current TPU runtime).
            for blk in range(seg_steps // tick):
                block_start = seg_start + blk * tick
                carry, _ = jax.lax.scan(
                    device_step, carry, block_start + 1 + jnp.arange(tick)
                )
                carry = contact_tick(carry, block_start + tick)
        else:
            raise ValueError(
                "halo segment length must be a multiple of the contact "
                "update interval"
            )
        own_pos, own_ids, key, semiaxes, contact, stats = carry

        events, n_events = compact_contact_events(
            contact, events_cap, row_ids=jnp.maximum(own_ids, 0)
        )
        stats = stats._replace(
            event_overflow=jnp.maximum(
                stats.event_overflow, n_events - np.int32(events_cap)
            )
        )
        # Per-replica reductions over the beads axis.
        stats = HaloStats(
            cell_overflow=jax.lax.pmax(stats.cell_overflow, "beads"),
            band_overflow=jax.lax.pmax(stats.band_overflow, "beads"),
            bond_misses=jax.lax.psum(stats.bond_misses, "beads"),
            contact_overflow=jax.lax.pmax(stats.contact_overflow, "beads"),
            contact_misses=jax.lax.psum(stats.contact_misses, "beads"),
            event_overflow=jax.lax.pmax(stats.event_overflow, "beads"),
            drift2=jax.lax.pmax(stats.drift2, "beads"),
            excursion=jax.lax.pmax(stats.excursion, "beads"),
        )
        return own_pos, own_ids, key, semiaxes, events, stats

    def replica_block(pos, ids, key, semiaxes, seg_start):
        # Leading axis: replicas owned by this device column.
        return jax.vmap(
            device_segment, in_axes=(0, 0, 0, 0, None)
        )(pos, ids, key, semiaxes, seg_start)

    specs = carry_specs()
    stat_spec = HaloStats(*([P("replica")] * len(HaloStats._fields)))
    sharded = shard_map(
        replica_block,
        mesh=mesh,
        in_specs=(*specs, P()),
        out_specs=(
            specs.pos,
            specs.ids,
            specs.key,
            specs.semiaxes,
            P("replica", "beads", None),
            stat_spec,
        ),
        check_vma=False,
    )

    @jax.jit
    def segment(carry: HaloCarry, seg_start):
        pos, ids, key, semiaxes, events, stats = sharded(
            *carry, jnp.asarray(seg_start, jnp.int32)
        )
        return HaloCarry(pos, ids, key, semiaxes), events, stats

    return segment


def run_halo_g1(store, engine, mesh, x, key, semiaxes, resume_step,
                save_frame, log):
    """Production G1 loop over the halo engine for ONE trajectory store.

    Called by :func:`..models.interphase.run_interphase` when spatial
    sharding is requested, AFTER the shared relaxation / frame-0 / resume
    logic: same sampling windows, contact dumps, progress lines, adaptive
    retries, and checkpoint cadence as the single-chip loop — the store
    contents are indistinguishable (reference surface:
    stage_interphase/main.cpp:7-20, one command -> one trajectory).

    Robustness: each chunk re-runs with adjusted settings on any HaloStats
    violation (window width, halo band capacity, halo width on bond/contact
    misses, contact rows, event rows, drift), and ownership re-bins from
    the gathered structure every chunk, so per-chunk excursion is bounded.
    """
    import time as _time

    config = engine.config
    c = config.interphase
    sampling = c.sampling_interval
    window_steps = sampling * c.contactmap_output_window
    n_shards = mesh.shape["beads"]
    n = engine.design.particle_count

    state = {
        "bundle": engine.bundle(),
        "imbalance": 1.6,
    }
    state["model"] = state["bundle"]["model"]
    x_host = np.asarray(x, np.float32)
    state["geo"] = plan_halo(state["model"], n_shards, x_host)
    seg_cache: dict = {}

    def refresh_model():
        state["bundle"] = engine.bundle()
        state["model"] = state["bundle"]["model"]

    def build_carry(x_host, key_arr, semi_arr):
        while True:
            try:
                return make_halo_carry(
                    state["model"], state["geo"], mesh, x_host[None],
                    semiaxes=np.asarray(semi_arr, np.float32)[None],
                    keys=np.asarray(key_arr, np.uint32)[None],
                )
            except OverflowError:
                state["imbalance"] *= 1.5
                state["geo"] = plan_halo(
                    state["model"], n_shards, x_host,
                    imbalance=state["imbalance"],
                )
                log(
                    f"halo: slab overflow; re-planned own capacity -> "
                    f"{state['geo'].own_capacity}"
                )

    def segment_fn():
        seg_len = state["model"].rebuild_interval(sampling)
        k = (id(state["model"]), state["geo"], seg_len)
        if k not in seg_cache:
            seg_cache[k] = (
                make_halo_segment(state["model"], state["geo"], mesh, seg_len),
                seg_len,
            )
        return seg_cache[k]

    def adjust(st) -> bool:
        """React to a violated segment; True = retry the chunk."""
        geo = state["geo"]
        cell_ov = int(np.max(st.cell_overflow))
        if cell_ov & SLOT_OVERFLOW:
            # The per-shard column-padded layout outgrew its slot buffer —
            # geometry knob, not an engine-model knob (no recompile of the
            # global model needed, only a new segment).
            state["geo"] = geo._replace(
                block_slots=-(-(max(geo.block_slots, 128) * 3 // 2) // 128)
                * 128
            )
            log(
                f"halo: slot overflow; block slots -> "
                f"{state['geo'].block_slots}"
            )
            return True
        if cell_ov > 0:
            engine.grow_cells(0)
            refresh_model()
            return True
        if int(np.max(st.band_overflow)) > 0:
            state["geo"] = geo._replace(edge_capacity=geo.edge_capacity * 2)
            log(
                f"halo: band overflow; edge capacity -> "
                f"{state['geo'].edge_capacity}"
            )
            return True
        if (
            int(np.max(st.bond_misses)) > 0
            or int(np.max(st.contact_misses)) > 0
        ):
            state["geo"] = geo._replace(
                halo_width=geo.halo_width * 1.5,
                edge_capacity=geo.edge_capacity * 2,
            )
            log(
                f"halo: partner outside halo; halo width -> "
                f"{state['geo'].halo_width:.3g}"
            )
            return True
        # Pair-force validity contract (module docstring): a bead's partners
        # are only guaranteed inside its slab + halo band, so
        # excursion + interaction_cutoff must stay <= halo_width.  Beads
        # drifting past that bound between re-binnings would silently lose
        # pair interactions (the bond/contact-miss checks only partially
        # cover this); widen the halo and re-bin, like a partner miss.
        exc = float(np.max(st.excursion))
        pair_cutoff = state["model"].grid.cell_size
        if exc + pair_cutoff > geo.halo_width:
            state["geo"] = geo._replace(
                halo_width=max(geo.halo_width * 1.5, exc + pair_cutoff),
                edge_capacity=geo.edge_capacity * 2,
            )
            log(
                f"halo: excursion {exc:.3g} breached the pair-validity "
                f"band; halo width -> {state['geo'].halo_width:.3g}"
            )
            return True
        if int(np.max(st.contact_overflow)) > 0:
            engine.grow_contacts()
            refresh_model()
            return True
        if int(np.max(st.event_overflow)) > 0:
            engine.grow_events(state["model"])
            refresh_model()
            return True
        if float(np.sqrt(np.max(st.drift2))) > engine.contact_margin / 2:
            # The halo segment only supports tick-multiple lifetimes, so the
            # single-chip driver's shorten-the-segment response is not
            # available here: widen the margin (and the halo that carries
            # it) instead.
            if engine.contact_margin >= 4.0:
                raise RuntimeError("contact margin limit exceeded")
            engine.contact_margin *= 2.0
            log(f"halo: drift exceeded margin/2; margin -> "
                f"{engine.contact_margin}")
            refresh_model()
            state["geo"] = plan_halo(
                state["model"], n_shards, x_host,
                imbalance=state["imbalance"],
            )
            return True
        return False

    key_h = np.asarray(key, np.uint32)
    semi_h = np.asarray(semiaxes, np.float32)
    carry = build_carry(x_host, key_h, semi_h)

    window_chunks: list = []
    wall_t0 = _time.perf_counter()
    steps_done = 0
    n_chunks = c.steps // sampling

    for chunk_i in range(resume_step // sampling, n_chunks):
        start = chunk_i * sampling
        chunk_x = x_host
        chunk_key = np.asarray(carry.key)[0]
        chunk_semi = np.asarray(carry.semiaxes)[0]
        while True:
            segment, seg_len = segment_fn()
            n_segments = sampling // seg_len
            ev_chunks = []
            failed = False
            cur = carry
            for s in range(n_segments):
                cur, ev, stats = segment(
                    cur, jnp.asarray(start + s * seg_len)
                )
                st = jax.tree.map(np.asarray, stats)
                if adjust(st):
                    failed = True
                    break
                ev_chunks.append(events_to_host(events_host(ev)))
            if not failed:
                carry = cur
                break
            carry = build_carry(chunk_x, chunk_key, chunk_semi)

        x_host = gather_positions(state["model"], carry)[0]
        semi_h = np.asarray(carry.semiaxes)[0]
        key_h = np.asarray(carry.key)[0]
        step = start + sampling
        window_chunks.extend(ev_chunks)

        contacts_coo = None
        if step % window_steps == 0:
            contacts_coo = merge_window(window_chunks)
            window_chunks = []

        ctx = save_frame(state["bundle"], step, x_host, semi_h, contacts_coo)
        steps_done += sampling
        if step % c.logging_interval == 0:
            from ..utils.logging import progress_line

            rate = steps_done / max(_time.perf_counter() - wall_t0, 1e-9)
            log(
                progress_line(
                    "interphase", step, t=step * c.timestep,
                    energy=ctx.mean_energy,
                    radius=float(np.cbrt(np.prod(semi_h))),
                )
                + f"\t{rate:.1f} steps/s ({rate * n:.3g} bead-steps/s, "
                f"{n_shards} shards)"
            )

        if contacts_coo is not None:
            store.save_checkpoint(
                step,
                {"positions": x_host, "semiaxes": semi_h, "key": key_h},
            )

        # Re-bin ownership from the fresh global structure: per-chunk
        # excursion stays bounded by one chunk's drift.
        carry = build_carry(x_host, key_h, semi_h)

    store.clear_checkpoint()
    return x_host
