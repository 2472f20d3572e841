"""Ensemble replica axis: many independent cell-cycle simulations at once.

The reference runs ensemble replicas as separate shell jobs over separate
trajectory files and merges their contact maps downstream
(src/cool.py:80-110; SURVEY.md §2.11).  Here the replica axis is a real
device-mesh axis: R independent interphase systems integrate data-parallel in
one jitted program (vmap over the replica dimension, optionally sharded over
a ``replica`` mesh axis), each still writing its own reference-schema
trajectory file so the downstream analysis (cool/dephase/pc1) is unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.interphase import EngineSettings, InterphaseModel
from ..ops.contact import contact_list_to_host, merge_window, update_contact_counts
from ..store import InterphaseContext, SimulationStore
from ..utils.logging import progress_line


def run_ensemble_interphase(
    stores: Sequence[SimulationStore],
    settings: Optional[EngineSettings] = None,
    log=print,
):
    """Run the interphase stage for R replicas in lock-step.

    All stores must come from the same ``prepare`` inputs (identical
    topology); each keeps its own stage seed, so trajectories are
    independent samples.  Relaxation initial structures must already be in
    place (``transition interphase`` per store).
    """
    r = len(stores)
    if r == 0:
        return

    config = stores[0].load_config()
    designs = [s.load_interphase_design() for s in stores]
    n = designs[0].particle_count
    for d in designs[1:]:
        if d.particle_count != n:
            raise ValueError("ensemble stores disagree on topology")

    import dataclasses

    if settings is None:
        settings = EngineSettings.auto(n, config.interphase)
    # Probe the densest cell across replicas up front; the ensemble driver
    # keeps lock-step simplicity (no adaptive rerun loops), so capacity must
    # be right from the start and any overflow is a hard error rather than a
    # silent drop.
    from ..ops.neighbor import CellGrid, build_cell_table

    cell_size = max(
        config.interphase.a_core_diameter, config.interphase.b_core_diameter
    )
    probe_grid = CellGrid.cubic(
        bound=settings.grid_bound, cell_size=cell_size, capacity=1
    )
    max_fill = 0
    for store_ in stores:
        pos0 = jnp.asarray(s_store_positions(store_), jnp.float32)
        _, _, fill = jax.jit(lambda x: build_cell_table(probe_grid, x))(pos0)
        max_fill = max(max_fill, int(fill))
    needed = int(2 ** np.ceil(np.log2(max(max_fill, 8))))
    if needed > settings.cell_capacity:
        log(f"ensemble: probed densest cell = {max_fill}; cell capacity -> {needed}")
        settings = dataclasses.replace(settings, cell_capacity=needed)

    model = InterphaseModel.from_design(designs[0], config, settings)
    c = model.config

    def check_overflow(stats_arr, what):
        if int(np.max(np.asarray(stats_arr))) > 0:
            raise RuntimeError(
                f"ensemble {what} overflow — rerun with larger capacity "
                "(the ensemble driver does not adaptively retry)"
            )

    keys = jnp.stack(
        [
            jax.random.split(jax.random.PRNGKey(d.seed), 3)[2]
            for d in designs
        ]
    )
    relax_keys = jnp.stack(
        [
            jax.random.split(jax.random.PRNGKey(d.seed), 3)[1]
            for d in designs
        ]
    )

    positions = jnp.stack(
        [jnp.asarray(s_store_positions(s), jnp.float32) for s in stores]
    )
    semiaxes = jnp.tile(
        jnp.asarray(c.wall_semiaxes_init, jnp.float32), (r, 1)
    )

    # ---- relaxation (vmapped) ---------------------------------------------
    def relax_chunk(carry):
        def one(x, key, semi):
            def body(cr, s):
                return model.relaxation_step(cr, s), None

            stats = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
            (x, key, semi, stats), _ = jax.lax.scan(
                body, (x, key, semi, stats),
                jnp.arange(c.relaxation_sampling_interval),
            )
            return x, key, semi, stats

        return jax.vmap(one)(*carry)

    relax_chunk = jax.jit(relax_chunk)

    for store in stores:
        store.set_stage("relaxation")
        store.clear_frames()

    def sample_relax(step, positions):
        for k, store in enumerate(stores):
            store.save_positions(step, np.asarray(positions[k]))
            store.save_interphase_context(
                step,
                InterphaseContext(
                    time=0.0,
                    wall_semiaxes=tuple(float(v) for v in np.asarray(semiaxes[k])),
                    core_scale=c.core_scale_init,
                    bond_scale=c.bond_scale_init,
                ),
            )
            store.append_frame(step)

    sample_relax(0, positions)
    carry = (positions, relax_keys, semiaxes)
    for chunk in range(c.relaxation_steps // c.relaxation_sampling_interval):
        x, k, s, stats = relax_chunk(carry)
        check_overflow(stats[0], "cell capacity")
        carry = (x, k, s)
        step = (chunk + 1) * c.relaxation_sampling_interval
        sample_relax(step, x)
        log(progress_line("relaxation", step, t=0.0))
    positions = carry[0]

    # ---- interphase (vmapped) ---------------------------------------------
    for store in stores:
        store.set_stage("interphase")
        store.clear_frames()

    sampling = c.sampling_interval
    window_steps = sampling * c.contactmap_output_window

    def inter_chunk(carry, start):
        def one(x, key, semi, cids, ccounts):
            from ..ops.contact import ContactList

            contact = ContactList(
                ids=cids, counts=ccounts,
                fill=jnp.zeros((cids.shape[0],), jnp.int32),
                overflow=jnp.zeros((), jnp.int32),
            )
            stats = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

            def body(cr, s):
                return model.interphase_step(cr, s), None

            (x, key, semi, contact, stats), _ = jax.lax.scan(
                body, (x, key, semi, contact, stats),
                start + 1 + jnp.arange(sampling),
            )
            return x, key, semi, contact.ids, contact.counts, stats

        return jax.vmap(one)(*carry)

    inter_chunk = jax.jit(inter_chunk)

    def fresh_contacts(positions, step):
        core_now, _ = model.scales(jnp.asarray(step * c.timestep))
        contacts = [
            model.fresh_contact_list(positions[k], float(core_now))
            for k in range(r)
        ]
        ids = jnp.stack([ct.ids for ct in contacts])
        counts = jnp.stack([ct.counts for ct in contacts])
        return ids, counts

    # callback(0) semantics of the reference / single-store driver: sample
    # frame 0, one contact update, dump-and-clear the step-0 window, then a
    # reaction-free wall update before step 1.
    core0, _ = model.scales(jnp.asarray(0.0))
    contacts0 = [
        update_contact_counts(
            model.fresh_contact_list(positions[k], float(core0)),
            positions[k],
            c.contactmap_distance * float(core0),
        )
        for k in range(r)
    ]
    for k, store in enumerate(stores):
        store.save_positions(0, np.asarray(positions[k]))
        store.save_interphase_context(
            0,
            InterphaseContext(
                time=0.0,
                wall_semiaxes=tuple(float(v) for v in np.asarray(semiaxes[k])),
                core_scale=float(core0),
                bond_scale=float(model.scales(jnp.asarray(0.0))[1]),
            ),
        )
        coo0 = merge_window([contact_list_to_host(contacts0[k])])
        store.save_contacts(0, coo0)
        store.append_frame(0)
    spring = jnp.asarray(c.wall_semiaxes_spring, jnp.float32)
    semiaxes = semiaxes + c.timestep * c.wall_mobility * (0.0 - spring * semiaxes)

    window_chunks: list[list] = [[] for _ in range(r)]
    ids, counts = fresh_contacts(positions, 0)
    carry = (positions, keys, semiaxes, ids, counts)

    for chunk in range(c.steps // sampling):
        start = chunk * sampling
        x, k, semis, ids, counts, stats = inter_chunk(carry, jnp.asarray(start))
        check_overflow(stats[0], "cell capacity")
        step = start + sampling

        from ..ops.contact import ContactList

        for i in range(r):
            contact = ContactList(
                ids=ids[i], counts=counts[i],
                fill=jnp.zeros((n,), jnp.int32),
                overflow=jnp.zeros((), jnp.int32),
            )
            window_chunks[i].append(contact_list_to_host(contact))

        dump = step % window_steps == 0
        core, bond = model.scales(jnp.asarray(step * c.timestep))
        for i, store in enumerate(stores):
            ctx = InterphaseContext(
                time=step * c.timestep,
                wall_semiaxes=tuple(float(v) for v in np.asarray(semis[i])),
                core_scale=float(core),
                bond_scale=float(bond),
            )
            store.save_positions(step, np.asarray(x[i]))
            store.save_interphase_context(step, ctx)
            if dump:
                coo = merge_window(window_chunks[i])
                store.save_contacts(step, coo)
                window_chunks[i] = []
            store.append_frame(step)

        if step % c.logging_interval == 0:
            log(progress_line("interphase", step, t=step * c.timestep))

        ids, counts = fresh_contacts(x, step)
        carry = (x, k, semis, ids, counts)

    return np.asarray(carry[0])


def s_store_positions(store: SimulationStore) -> np.ndarray:
    store.set_stage("relaxation")
    return store.load_positions(0)
