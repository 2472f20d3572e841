"""Multi-device tests on the simulated 8-CPU mesh (SURVEY.md §4)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.config import parse_config
from genome_cycle_tpu.models.interphase import EngineSettings, InterphaseModel
from genome_cycle_tpu.ops.contact import contact_list_to_host, merge_window
from genome_cycle_tpu.parallel.mesh import make_mesh
from genome_cycle_tpu.parallel.sharded import (
    ShardedCarry,
    init_sharded_carry,
    make_sharded_chunk,
    make_sharded_interphase_step,
)
from genome_cycle_tpu.store import StageDesign
from genome_cycle_tpu.topology import ChainAssignment


def make_design(n=256, chains=2):
    per = n // chains
    assigns = [
        ChainAssignment(f"chr{i}:a", i * per, (i + 1) * per) for i in range(chains)
    ]
    ab = np.zeros((n, 2))
    ab[::2, 0] = 1.0
    ab[1::2, 1] = 1.0
    return StageDesign(
        seed=7,
        chains=assigns,
        ab_factors=ab,
        nucleolar_bonds=np.zeros((0, 2), np.int64),
    )


def make_model(temperature=1.0):
    config = parse_config(
        json.dumps({"interphase": {"temperature": temperature}})
    )
    design = make_design()
    settings = EngineSettings(
        cell_capacity=64, contact_capacity=64, grid_bound=4.0,
        use_dense_grid=False,  # CPU tests: gather path (same physics)
    )
    return InterphaseModel.from_design(design, config, settings), design


def ball_positions(rng, n, radius=1.2):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = radius * rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    return v * r


def test_mesh_construction():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"replica": 2, "beads": 4}
    with pytest.raises(ValueError):
        make_mesh(4, 4)


def test_sharded_step_runs_and_is_deterministic(rng):
    model, design = make_model()
    mesh = make_mesh(2, 4)
    positions = np.stack([ball_positions(rng, model.n) for _ in range(2)])
    semiaxes = np.tile([2.0, 2.0, 2.0], (2, 1))

    def run():
        carry = init_sharded_carry(model, mesh, positions, [1, 2], semiaxes)
        step = make_sharded_interphase_step(model, mesh)
        for s in range(1, 4):
            carry = step(carry, s)
        return carry

    c1, c2 = run(), run()
    np.testing.assert_array_equal(np.asarray(c1.positions), np.asarray(c2.positions))
    assert np.isfinite(np.asarray(c1.positions)).all()
    assert int(c1.overflow.max()) == 0
    # Replicas with different seeds diverge.
    p = np.asarray(c1.positions)
    assert np.abs(p[0] - p[1]).max() > 1e-4


def test_sharded_matches_single_device_at_zero_temperature(rng):
    # With T=0 the dynamics are deterministic gradient descent, so the
    # sharded step must match the single-device step to f32 tolerance.
    model, design = make_model(temperature=0.0)
    mesh = make_mesh(1, 8)
    x0 = ball_positions(rng, model.n)
    carry = init_sharded_carry(model, mesh, x0[None], [3], np.asarray([[2.0, 2, 2]]))
    step = make_sharded_interphase_step(model, mesh)
    for s in range(1, 6):
        carry = step(carry, s)
    sharded_pos = np.asarray(carry.positions)[0]
    sharded_semi = np.asarray(carry.semiaxes)[0]

    # Single-device reference using the same model step.
    from genome_cycle_tpu.ops.contact import ContactList

    x = jnp.asarray(x0, jnp.float32)
    key = jax.random.PRNGKey(3)
    semiaxes = jnp.asarray([2.0, 2.0, 2.0], jnp.float32)
    contact = model.fresh_contact_list(x, float(model.scales(0.0)[0]))
    stats = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    carry1 = (x, key, semiaxes, contact, stats)
    step1 = jax.jit(model.interphase_step)
    for s in range(1, 6):
        carry1 = step1(carry1, jnp.asarray(s))
    np.testing.assert_allclose(
        sharded_pos, np.asarray(carry1[0]), atol=2e-5
    )
    np.testing.assert_allclose(
        sharded_semi, np.asarray(carry1[2]), rtol=1e-5
    )


def test_sharded_contacts_match_single_device(rng):
    model, design = make_model(temperature=0.0)
    mesh = make_mesh(1, 8)
    x0 = ball_positions(rng, model.n)
    carry = init_sharded_carry(model, mesh, x0[None], [3], np.asarray([[2.0, 2, 2]]))
    step = make_sharded_interphase_step(model, mesh)
    # Steps 1..20: one contact update fires at step 20.
    for s in range(1, 21):
        carry = step(carry, s)

    from genome_cycle_tpu.ops.contact import ContactList

    ids = np.asarray(carry.contact_ids)[0]
    counts = np.asarray(carry.contact_counts)[0]
    sharded = merge_window(
        [
            contact_list_to_host(
                ContactList(
                    ids=jnp.asarray(ids),
                    counts=jnp.asarray(counts),
                    fill=jnp.zeros(ids.shape[0], jnp.int32),
                    overflow=jnp.zeros((), jnp.int32),
                    ref_pos=jnp.zeros((ids.shape[0], 3), jnp.float32),
                    drift2=jnp.zeros((), jnp.float32),
                )
            )
        ]
    )

    # Single-device run over the same 20 steps.
    x = jnp.asarray(x0, jnp.float32)
    key = jax.random.PRNGKey(3)
    semiaxes = jnp.asarray([2.0, 2.0, 2.0], jnp.float32)
    contact = model.fresh_contact_list(x, float(model.scales(0.0)[0]))
    stats = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    carry1 = (x, key, semiaxes, contact, stats)
    step1 = jax.jit(model.interphase_step)
    for s in range(1, 21):
        carry1 = step1(carry1, jnp.asarray(s))
    single = merge_window([contact_list_to_host(carry1[3])])

    np.testing.assert_array_equal(sharded, single)


def test_sharded_chunk_scan(rng):
    model, design = make_model()
    mesh = make_mesh(2, 2)
    positions = np.stack([ball_positions(rng, model.n) for _ in range(2)])
    carry = init_sharded_carry(
        model, mesh, positions, [5, 6], np.tile([2.0, 2, 2], (2, 1))
    )
    chunk = make_sharded_chunk(model, mesh, chunk_steps=10)
    carry = chunk(carry, jnp.asarray(0))
    assert np.isfinite(np.asarray(carry.positions)).all()


def test_ensemble_interphase(tmp_path, rng):
    """Two replicas integrate vmapped in lock-step, each writing its own
    reference-schema trajectory (the ensemble axis of SURVEY.md §2.11)."""
    import json as _json

    from genome_cycle_tpu.models.prepare import run_prepare
    from genome_cycle_tpu.models.transitions import transition_interphase
    from genome_cycle_tpu.models.anatelophase import run_anatelophase
    from genome_cycle_tpu.parallel.ensemble import run_ensemble_interphase
    from genome_cycle_tpu.store import SimulationStore

    config = {
        "mitotic_phase": {
            "anaphase_steps": 200, "telophase_steps": 100,
            "sampling_interval": 100, "logging_interval": 200,
        },
        "interphase": {
            "steps": 200, "sampling_interval": 100, "logging_interval": 200,
            "relaxation_steps": 100, "relaxation_sampling_interval": 100,
            "contactmap_output_window": 2,
        },
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(_json.dumps(config))
    rows = ["chain\tstart\tend\tA\tB\ttags"]
    for i in range(300):
        tag = "cen,B" if 140 <= i < 160 else ("A" if i % 2 else "B")
        a, b = (1, 0) if tag == "A" else (0, 1)
        rows.append(f"chr1:a\t{i*100000}\t{(i+1)*100000}\t{a}\t{b}\t{tag}")
    chains_path = tmp_path / "chains.tsv"
    chains_path.write_text("\n".join(rows) + "\n")

    paths = []
    for k in range(2):
        path = str(tmp_path / f"cell_{k}.h5")
        run_prepare(path, str(config_path), str(chains_path), seed=100 + k,
                    log=lambda *_: None)
        with SimulationStore(path) as store:
            run_anatelophase(store, log=lambda *_: None)
            transition_interphase(store, log=lambda *_: None)
        paths.append(path)

    stores = [SimulationStore(p) for p in paths]
    try:
        settings = EngineSettings(
            cell_capacity=128, contact_capacity=128, grid_bound=9.0,
            use_dense_grid=False,
        )
        run_ensemble_interphase(stores, settings=settings, log=lambda *_: None)
    finally:
        for s in stores:
            s.close()

    final = []
    for p in paths:
        with SimulationStore(p) as s:
            s.set_stage("interphase")
            # callback(0) semantics: frame 0 with its own contact window,
            # matching the reference and the single-store driver.
            assert s.load_steps() == [0, 100, 200]
            x = s.load_positions(200)
            assert np.isfinite(x).all()
            final.append(x)
            assert s.load_contacts(200) is not None
    # Different seeds -> different trajectories.
    assert np.abs(final[0] - final[1]).max() > 1e-3
