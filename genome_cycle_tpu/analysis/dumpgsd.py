"""Trajectory .h5 -> GSD/HOOMD visualization file (OVITO-compatible).

Reference: src/dumpgsd.py.  Per-stage topology decorators add spindle-pole
pseudo-particles and microtubule/nucleolar pseudo-bonds; chain backbones
become "chrom" bonds; the box is fixed at (100, 100, 100).
"""

from __future__ import annotations

import argparse
import json
import logging
import typing

import h5py
import numpy as np

from .common import invoke_main, remove_none
from .gsdio import GSDWriter, write_hoomd_frame

LOG = logging.getLogger()
DEFAULT_BOX = (100.0, 100.0, 100.0, 0.0, 0.0, 0.0)
DIMENSION = 3


class ParticlesData(typing.NamedTuple):
    type_ids: list
    type_names: list


class BondsData(typing.NamedTuple):
    pairs: list
    type_ids: list
    type_names: list


class TopologyMod:
    def derive_extra_particles(self, metadata, next_id: int) -> ParticlesData:
        return ParticlesData([], [])

    def derive_extra_bonds(self, metadata, next_id: int) -> BondsData:
        return BondsData([], [], [])

    def derive_extra_positions(self, snapshot) -> np.ndarray:
        return np.zeros(shape=(0, DIMENSION))


class AnaphaseMod(TopologyMod):
    """Single spindle pole + microtubule bonds to every kinetochore
    (dumpgsd.py:70-90)."""

    def __init__(self, config: dict):
        self._pole_position = config["mitotic_phase"]["anaphase_spindle_shift"]

    def derive_extra_particles(self, metadata, next_id):
        return ParticlesData(type_ids=[next_id], type_names=["spindle_pole"])

    def derive_extra_bonds(self, metadata, next_id):
        pole_index = len(metadata["particle_types"])
        pairs = [(int(i), pole_index) for i in metadata["kinetochore_beads"]]
        return BondsData(pairs, [next_id] * len(pairs), ["microtubule"])

    def derive_extra_positions(self, snapshot):
        return np.reshape(self._pole_position, (1, DIMENSION))


class InterphaseMod(TopologyMod):
    """Nucleolar pseudo-bonds (dumpgsd.py:93-100)."""

    def derive_extra_bonds(self, metadata, next_id):
        nucleolar_bonds = [(int(i), int(j)) for i, j in metadata["nucleolar_bonds"]]
        return BondsData(
            nucleolar_bonds, [next_id] * len(nucleolar_bonds), ["nucleolus"]
        )


class PrometaphaseMod(TopologyMod):
    """Two poles + microtubules per sister pair (dumpgsd.py:103-130)."""

    def __init__(self, metadata):
        self._pole_positions = metadata["pole_positions"][:]

    def derive_extra_particles(self, metadata, next_id):
        return ParticlesData([next_id, next_id], ["spindle_pole"])

    def derive_extra_bonds(self, metadata, next_id):
        pole_a = len(metadata["particle_types"])
        pole_b = pole_a + 1
        kinetochores = metadata["kinetochore_beads"][:]
        pairs = []
        for chrom_a, chrom_b in metadata["sister_chromatids"]:
            pairs.append((int(kinetochores[chrom_a]), pole_a))
            pairs.append((int(kinetochores[chrom_b]), pole_b))
        return BondsData(pairs, [next_id] * len(pairs), ["microtubule"])

    def derive_extra_positions(self, snapshot):
        return self._pole_positions


def define_linear_bonds(start: int, end: int):
    return list(zip(range(start, end - 1), range(start + 1, end)))


def derive_particles(metadata, mod: TopologyMod) -> ParticlesData:
    stored_types = metadata["particle_types"][:]
    enum = h5py.check_enum_dtype(metadata["particle_types"].dtype) or {}
    stored_type_names = [
        name for name, _tid in sorted(enum.items(), key=lambda kv: kv[1])
    ]
    extra = mod.derive_extra_particles(metadata, next_id=len(stored_type_names))
    return ParticlesData(
        type_ids=(list(stored_types) + extra.type_ids),
        type_names=(stored_type_names + extra.type_names),
    )


def derive_bonds(metadata, mod: TopologyMod) -> BondsData:
    chain_ranges = metadata["chain_ranges"][:]
    stored_pairs = sum(
        (define_linear_bonds(int(s), int(e)) for s, e in chain_ranges), []
    )
    extra = mod.derive_extra_bonds(metadata, next_id=1)
    return BondsData(
        pairs=(stored_pairs + extra.pairs),
        type_ids=([0] * len(stored_pairs) + extra.type_ids),
        type_names=(["chrom"] + extra.type_names),
    )


def dump_trajectory(stage_store, writer: GSDWriter, mod: TopologyMod):
    metadata = stage_store["metadata"]
    particles = derive_particles(metadata, mod)
    bonds = derive_bonds(metadata, mod)

    for step in stage_store[".steps"]:
        step = step.decode() if isinstance(step, bytes) else str(step)
        snapshot = stage_store[step]
        stored = snapshot["positions"][:]
        extra = mod.derive_extra_positions(snapshot)
        positions = np.concatenate([stored, extra])
        write_hoomd_frame(
            writer,
            step=int(step),
            box=DEFAULT_BOX,
            positions=positions,
            type_ids=np.asarray(particles.type_ids, np.uint32),
            type_names=particles.type_names,
            bond_pairs=np.asarray(bonds.pairs, np.uint32).reshape(-1, 2),
            bond_type_ids=np.asarray(bonds.type_ids, np.uint32),
            bond_type_names=bonds.type_names,
        )


def main(*, input_filename: str, output_filename: str, stage: str = "interphase"):
    with h5py.File(input_filename, "r") as store:
        if stage not in store["stages"]:
            raise ValueError(
                f"unknown stage {stage!r}; trajectory has: "
                + ", ".join(sorted(store["stages"]))
            )
        stage_store = store["stages"][stage]
        stage_metadata = stage_store["metadata"]
        config = json.loads(store["metadata"]["config"][()])
        with GSDWriter(output_filename) as writer:
            match stage:
                case "anaphase":
                    dump_trajectory(stage_store, writer, AnaphaseMod(config))
                case "telophase":
                    dump_trajectory(stage_store, writer, TopologyMod())
                case "relaxation" | "interphase":
                    dump_trajectory(stage_store, writer, InterphaseMod())
                case "prometaphase":
                    dump_trajectory(stage_store, writer, PrometaphaseMod(stage_metadata))
                case _:
                    raise ValueError(f"unknown stage: {stage}")
            LOG.info("Wrote %d frames", writer.nframes)


def parse_args() -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", type=str)
    parser.add_argument("input_filename")
    parser.add_argument("output_filename")
    return remove_none(vars(parser.parse_args()))


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
