"""Prometaphase/metaphase stage driver: bipolar spindle congression.

Re-design of ``stage_prometaphase/simulation_driver.cpp`` (SURVEY.md §2.8):
duplicated sister chromatids, sister-kinetochore cohesion, two kinetochore
fiber fields (one per pole) and the polar ejection force-flux potential from
both poles.  Small coarse system -> dense pairwise repulsion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MitoticPhaseConfig, SimulationConfig
from ..store import SimulationStore, StageDesign
from ..ops import potentials as pot
from ..ops.bonded import (
    bending_forces,
    bending_triples,
    chain_bond_pairs,
    kfiber_forces,
    pair_bond_forces,
    point_source_forces,
)
from ..ops.integrator import BDParams, bd_update
from ..ops.neighbor import pairwise_forces_dense
from ..utils.logging import progress_line


@dataclasses.dataclass
class PrometaphaseModel:
    config: MitoticPhaseConfig
    n: int
    mobility: jnp.ndarray
    bond_pairs: jnp.ndarray
    triples: jnp.ndarray
    sister_pairs: jnp.ndarray      # (C, 2) kinetochore bead index pairs
    target_kinetochores: jnp.ndarray
    sister_kinetochores: jnp.ndarray
    target_springs: jnp.ndarray
    sister_springs: jnp.ndarray
    target_pole: jnp.ndarray
    sister_pole: jnp.ndarray

    @classmethod
    def from_design(
        cls, design: StageDesign, config: SimulationConfig
    ) -> "PrometaphaseModel":
        m = config.mitotic_phase
        n = design.particle_count
        chains = design.chains

        sister_pairs = []
        t_kin, s_kin, t_spring, s_spring = [], [], [], []
        for target_index, sister_index in design.sister_chromatids:
            target = chains[target_index]
            sister = chains[sister_index]
            if target.kinetochore is None or sister.kinetochore is None:
                # Kinetochore-less chromatid pair: no cohesion/fiber terms.
                continue
            sister_pairs.append([target.kinetochore, sister.kinetochore])
            t_kin.append(target.kinetochore)
            s_kin.append(sister.kinetochore)
            # K = decay / (core_mobility / chain_len)
            # (stage_prometaphase/simulation_driver.cpp:137-158).
            t_spring.append(
                m.kfiber_decay_rate_prometaphase
                / (m.core_mobility / (target.end - target.start))
            )
            s_spring.append(
                m.kfiber_decay_rate_prometaphase
                / (m.core_mobility / (sister.end - sister.start))
            )

        return cls(
            config=m,
            n=n,
            mobility=jnp.full((n,), m.core_mobility, jnp.float32),
            bond_pairs=chain_bond_pairs(chains),
            triples=bending_triples(chains, m.penalize_centromere_bending),
            sister_pairs=jnp.asarray(sister_pairs, jnp.int32).reshape(-1, 2),
            target_kinetochores=jnp.asarray(t_kin, jnp.int32),
            sister_kinetochores=jnp.asarray(s_kin, jnp.int32),
            target_springs=jnp.asarray(t_spring, jnp.float32),
            sister_springs=jnp.asarray(s_spring, jnp.float32),
            target_pole=jnp.asarray(design.pole_positions[0], jnp.float32),
            sister_pole=jnp.asarray(design.pole_positions[1], jnp.float32),
        )

    def forces(self, positions, with_energy=False):
        m = self.config

        def rep_c(r2, i, j):
            return pot.softcore_force_coeff(r2, m.core_repulsion, m.core_diameter, 2, 3)

        def rep_u(r2, i, j):
            return pot.softcore_energy(r2, m.core_repulsion, m.core_diameter, 2, 3)

        forces, energy = pairwise_forces_dense(
            positions, rep_c, rep_u if with_energy else None
        )

        f, e = pair_bond_forces(
            positions,
            self.bond_pairs,
            lambda r2: pot.semispring_energy(r2, m.bond_spring, m.bond_length),
            lambda r2: pot.semispring_force_coeff(r2, m.bond_spring, m.bond_length),
        )
        forces, energy = forces + f, energy + e

        f, e = bending_forces(positions, self.triples, m.bending_energy)
        forces, energy = forces + f, energy + e

        # Sister cohesion: semispring between sister kinetochores
        # (simulation_driver.cpp:100-118).
        f, e = pair_bond_forces(
            positions,
            self.sister_pairs,
            lambda r2: pot.semispring_energy(r2, m.bond_spring, m.sister_separation),
            lambda r2: pot.semispring_force_coeff(
                r2, m.bond_spring, m.sister_separation
            ),
        )
        forces, energy = forces + f, energy + e

        # Two kinetochore-fiber fields, one per pole.
        f, e = kfiber_forces(
            positions,
            self.target_kinetochores,
            self.target_pole,
            self.target_springs,
            jnp.asarray(m.kfiber_length_prometaphase, positions.dtype),
        )
        forces, energy = forces + f, energy + e
        f, e = kfiber_forces(
            positions,
            self.sister_kinetochores,
            self.sister_pole,
            self.sister_springs,
            jnp.asarray(m.kfiber_length_prometaphase, positions.dtype),
        )
        forces, energy = forces + f, energy + e

        # Polar ejection force from both poles (simulation_driver.cpp:162-182).
        if m.polar_ejection_force != 0:
            b = float(np.sqrt(m.polar_ejection_cross_section))
            for pole in (self.target_pole, self.sister_pole):
                f, e = point_source_forces(
                    positions,
                    pole,
                    lambda r2: pot.force_flux_energy(r2, m.polar_ejection_force, b),
                    lambda r2: pot.force_flux_force_coeff(
                        r2, m.polar_ejection_force, b
                    ),
                )
                forces, energy = forces + f, energy + e

        return forces, energy

    def step(self, carry, step):
        x, key = carry
        m = self.config
        forces, _ = self.forces(x)
        key, sub = jax.random.split(key)
        x = bd_update(x, forces, self.mobility, sub, BDParams(m.temperature, m.timestep))
        return (x, key)


def run_prometaphase(store: SimulationStore, log=print):
    config = store.load_config()
    design = store.load_prometaphase_design()
    model = PrometaphaseModel.from_design(design, config)
    m = model.config

    store.set_stage("prometaphase")

    # Requires an initial structure from `transition prometaphase`
    # (simulation_driver.cpp:196-210).
    if not store.check_positions(0):
        raise RuntimeError("no initial structure is given")
    x0 = store.load_positions(0)
    if x0.shape[0] != model.n:
        raise ValueError("initial structure size mismatch")
    x = jnp.asarray(x0, jnp.float32)

    store.clear_frames()
    key = jax.random.PRNGKey(design.seed)

    energy_fn = jax.jit(lambda p: model.forces(p, with_energy=True)[1])
    chunk = jax.jit(
        lambda carry: jax.lax.scan(
            lambda cr, s: (model.step(cr, s), None),
            carry,
            jnp.arange(m.sampling_interval),
        )[0]
    )

    store.save_positions(0, np.asarray(x))
    store.append_frame(0)
    log(progress_line("prometaphase", 0, energy=float(energy_fn(x)) / model.n))

    carry = (x, key)
    for c in range(m.prometaphase_steps // m.sampling_interval):
        carry = chunk(carry)
        step = (c + 1) * m.sampling_interval
        store.save_positions(step, np.asarray(carry[0]))
        store.append_frame(step)
        if step % m.logging_interval == 0:
            log(progress_line("prometaphase", step, energy=float(energy_fn(carry[0])) / model.n))

    return np.asarray(carry[0])
