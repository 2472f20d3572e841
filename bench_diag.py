"""Per-component timing of the interphase hot loop on the current backend.

Pinpoints where a slow bench number goes: dispatch round-trip, dense pair
force, contact-list build, contact tick, event compaction, one full segment,
and the fused chunk.  Run with the TPU free:

    python bench_diag.py [n_beads]
"""

import json
import sys
import time


def t(fn, *args, reps=3, sync=None):
    import jax

    out = fn(*args)
    jax.block_until_ready(out if sync is None else sync(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out if sync is None else sync(out))
    return (time.perf_counter() - t0) / reps


def note(res, key, value):
    res[key] = value
    print(f"{key}: {value}", file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    sys.path.insert(0, ".")
    import bench
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from genome_cycle_tpu.models.interphase import ChunkStats, EngineSettings
    from genome_cycle_tpu.ops.contact import (
        build_contact_list,
        compact_contact_events,
        update_contact_counts,
    )
    from genome_cycle_tpu.ops.neighbor import build_cell_table

    res = {"backend": jax.default_backend(), "n": n}

    # 1. dispatch round trip
    f_triv = jax.jit(lambda x: x + 1.0)
    x8 = jnp.ones((8, 8))
    note(res, "dispatch_rtt_s", t(f_triv, x8, reps=10))

    plan = bench._plan(n)
    settings = EngineSettings(
        cell_capacity=plan["cell_capacity"],
        contact_capacity=plan["contact_capacity"],
        contact_cell_capacity=plan["contact_cell_capacity"],
        contact_cell_scale=plan["contact_bucket"],
        contact_margin=plan["margin"],
        grid_bound=plan["radius"] + 1.0,
        dense_bound=plan["dense_bound"],
        dense_cell_scale=plan["bucket"],
        use_dense_grid=True,
        use_pallas=False,
    )
    model = ge._make_model(n_beads=n, chains=bench.CHAINS, settings=settings)
    x = jnp.asarray(bench._chain_walk(n, bench.CHAINS, plan["radius"])[: model.n])
    semi = jnp.full((3,), plan["radius"], jnp.float32)
    key = jax.random.PRNGKey(0)

    # 2. dense pair force alone
    pair = jax.jit(lambda x: model.pair_forces_full(x, 0.5)[0])
    note(res, "pair_force_s", t(pair, x))

    # 3. full force assembly (pair + bonded + wall)
    asm = jax.jit(
        lambda x, s: model._assemble_forces(x, 0.5, 0.5, s)[0]
    )
    note(res, "assemble_s", t(asm, x, semi))

    # 4. contact-list build (margin-free tick search cutoff, fine grid)
    cutoff = model.config.contactmap_distance * 0.5

    @jax.jit
    def cbuild(x):
        table, _, _ = build_cell_table(model.contact_grid, x)
        ct = build_contact_list(
            model.contact_grid, table, x, cutoff, settings.contact_capacity
        )
        return ct

    note(res, "contact_build_s", t(cbuild, x, sync=lambda ct: ct.ids))
    ct = cbuild(x)

    # 5. contact tick
    tick = jax.jit(
        lambda ct, x: update_contact_counts(ct, x, model.config.contactmap_distance * 0.5)
    )
    note(res, "contact_tick_s", t(tick, ct, x, sync=lambda ct: ct.counts))

    # 6. event compaction
    comp = jax.jit(lambda ct: compact_contact_events(ct, model.events_capacity))
    note(res, "compact_s", t(comp, ct, sync=lambda r: r[0]))

    # 7. one segment (20 steps) and one fused chunk (200 steps)
    seg_fn = jax.jit(model.interphase_segment(20))
    carry0 = (x, key, semi, ChunkStats.zero(jnp.float32))
    note(res, "segment20_s", t(
        seg_fn, carry0, jnp.asarray(0), sync=lambda r: r[0][0]
    ))
    note(res, "segment_bead_steps_per_s", n * 20 / res["segment20_s"])

    # Host-loop chunk: isolates per-segment dispatch overhead.
    chunk_h = model.make_interphase_chunk(200, fuse=False)
    note(res, "hostloop_chunk200_s", t(
        chunk_h, carry0, jnp.asarray(0), reps=2, sync=lambda r: r[0][0]
    ))
    print(json.dumps(res), flush=True)

    # Fused chunk LAST: many sequential inner scans in one program have
    # crashed the experimental TPU runtime; a crash must not lose the rest.
    try:
        chunk = model.make_interphase_chunk(200, fuse=True)
        tc0 = time.perf_counter()
        carry, _ = chunk(carry0, jnp.asarray(0))
        jax.block_until_ready(carry[0])
        res["fused_chunk200_compile_plus_run_s"] = time.perf_counter() - tc0
        res["fused_chunk200_s"] = t(
            chunk, carry0, jnp.asarray(0), reps=2, sync=lambda r: r[0][0]
        )
        res["fused_bead_steps_per_s"] = n * 200 / res["fused_chunk200_s"]
    except Exception as ex:
        res["fused_chunk_error"] = str(ex)[:200]

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
