"""Per-component timing of the interphase hot loop on the current backend.

Pinpoints where a slow bench number goes: dispatch round-trip, block pair
force, full force assembly, contact tick (structure build + scatter-free
event extraction), one segment, and one host-loop chunk — all on the
shipping sorted-block engine.  Run with the TPU free:

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
    from genome_cycle_tpu.ops.block_pairs import build_structure

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
        use_block_pairs=True,
        use_dense_grid=False,
        use_pallas=False,
    )
    model = ge._make_model(n_beads=n, chains=bench.CHAINS, settings=settings)
    x = jnp.asarray(bench._chain_walk(n, bench.CHAINS, plan["radius"])[: model.n])
    if model.block_grid is not None:
        mw = int(jax.jit(
            lambda q: build_structure(model.block_grid, q).max_width
        )(x))
        import dataclasses

        settings = dataclasses.replace(
            settings,
            block_width=max(bench._round_up(int(mw * 1.25), 128), 256),
        )
        model = ge._make_model(
            n_beads=n, chains=bench.CHAINS, settings=settings
        )
        note(res, "block_width", model.block_grid.width)
    semi = jnp.full((3,), plan["radius"], jnp.float32)
    key = jax.random.PRNGKey(0)

    # 2. structure build (sort + windows) alone
    if model.block_grid is not None:
        sb = jax.jit(
            lambda q: build_structure(
                model.block_grid, q, (model.af, model.bf)
            ).max_width
        )
        note(res, "structure_build_s", t(sb, x))

    # 3. pair force alone (includes build + scatter-back)
    pair = jax.jit(lambda q: model.pair_forces_full(q, 0.5)[0])
    note(res, "pair_force_s", t(pair, x))

    # 4. full force assembly (pair + bonded + wall)
    asm = jax.jit(lambda q, s: model._assemble_forces(q, 0.5, 0.5, s)[0])
    note(res, "assemble_s", t(asm, x, semi))

    # 5. contact tick (fresh search + scatter-free event extraction)
    tick = jax.jit(lambda q: model.contact_events_tick(q, jnp.asarray(20)))
    note(res, "tick_s", t(tick, x, sync=lambda r: r[0]))
    note(res, "events_capacity", model.events_capacity)

    # 6. one segment (20 steps incl. tick) and a host-loop chunk (200 steps)
    seg_fn = jax.jit(model.interphase_segment(20))
    carry0 = (x, key, semi, ChunkStats.zero(jnp.float32))
    note(res, "segment20_s", t(
        seg_fn, carry0, jnp.asarray(0), sync=lambda r: r[0][0]
    ))
    note(res, "segment_bead_steps_per_s", model.n * 20 / res["segment20_s"])

    chunk_h = model.make_interphase_chunk(200, fuse=False)
    note(res, "hostloop_chunk200_s", t(
        chunk_h, carry0, jnp.asarray(0), reps=2, sync=lambda r: r[0][0]
    ))
    note(res, "hostloop_bead_steps_per_s",
         model.n * 200 / res["hostloop_chunk200_s"])
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
