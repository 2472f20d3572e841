"""Merge trajectory contact samples into a cooler dataset.

Reference: src/cool.py.  Bins are copied from the simulation's chains.tsv
source; nucleolar particles become a virtual "nucleoli" chain.  Multiple
trajectory files (ensemble replicas) merge into one contact matrix; an
optional frame selection slices the sampled windows.
"""

from __future__ import annotations

import argparse
import io
import logging

import h5py
import numpy as np
import pandas as pd

from .common import invoke_main, remove_none
from .coolio import Cooler, balance_cooler, create_cooler

LOG = logging.getLogger()
NUCLEOLAR_CHAIN = "nucleoli"


def simulation_bins(store_path: str) -> pd.DataFrame:
    """Bin table for a trajectory store: chain bins + virtual nucleolar bins
    (src/cool.py:27-73)."""
    with h5py.File(store_path, "r") as store:
        cycle_metadata = store["metadata"]
        stage_metadata = store["stages/interphase/metadata"]
        n_bins = len(stage_metadata["particle_types"])
        chain_names = [name.decode() for name in stage_metadata["chain_names"]]
        chain_ranges = stage_metadata["chain_ranges"][:]
        chain_bins = pd.read_csv(
            io.StringIO(cycle_metadata["chains_source"][()].decode()), sep="\t"
        )

    bin_start = chain_bins["start"].values
    bin_end = chain_bins["end"].values
    bin_size = int(np.max(bin_end - bin_start))

    bins_chrom = np.empty(n_bins, dtype=object)
    bins_start = np.empty(n_bins, dtype=int)
    bins_end = np.empty(n_bins, dtype=int)
    chains_end = int(chain_ranges.max())

    for name, (start, end) in zip(chain_names, chain_ranges):
        bins_chrom[start:end] = name
        bins_start[start:end] = bin_start[start:end]
        bins_end[start:end] = bin_end[start:end]

    indices = np.arange(n_bins - chains_end)
    bins_chrom[chains_end:] = NUCLEOLAR_CHAIN
    bins_start[chains_end:] = indices * bin_size
    bins_end[chains_end:] = (indices + 1) * bin_size

    return pd.DataFrame({"chrom": bins_chrom, "start": bins_start, "end": bins_end})


def scan_pixels(input_sims, frames=None):
    """Yield contact COO chunks from trajectory files (src/cool.py:80-110)."""
    for input_sim in input_sims:
        LOG.info("Ingesting from %s", input_sim)
        try:
            with h5py.File(input_sim, "r") as store:
                snapshots = store["stages"]["interphase"]
                steps = [step.decode() for step in snapshots[".steps"]]
                steps_to_use = steps
                if frames is not None:
                    steps_to_use = np.concatenate(
                        [steps[frame_slice] for frame_slice in frames]
                    )
                for step in steps_to_use:
                    sample = snapshots[step]
                    if "contacts" not in sample:
                        continue
                    contacts = sample["contacts"][:]
                    yield {
                        "bin1_id": contacts[:, 0],
                        "bin2_id": contacts[:, 1],
                        "count": contacts[:, 2],
                    }
        except OSError as ex:
            LOG.warning(">> Skipping: %s", ex)


def main(*, output: str, frames=None, input_sims: list[str], no_balancing=False):
    bins = simulation_bins(input_sims[0])
    LOG.info("Bins: %d", len(bins))
    create_cooler(output, bins, scan_pixels(input_sims, frames))
    if not no_balancing:
        LOG.info("Balancing contact matrix")
        balance_cooler(Cooler(output), store=True)


def parse_frame_ranges(spec: str):
    """"100,200-300,400-" -> [slice(100,101), slice(200,301), slice(400,None)]
    (src/cool.py:152-169)."""
    seq = []
    for sub in spec.split(","):
        match sub.split("-"):
            case [point]:
                i = int(point)
                seq.append(slice(i, i + 1))
            case [start, ""]:
                seq.append(slice(int(start), None))
            case [start, end]:
                seq.append(slice(int(start), int(end) + 1))
    return seq


def parse_args() -> dict:
    parser = argparse.ArgumentParser(
        description="Collect contact samples from simulation trajectories"
    )
    parser.add_argument("--output", metavar="sim.cool", required=True)
    parser.add_argument("--frames", metavar="300-500,600", type=str)
    parser.add_argument("--no-balancing", action="store_true", default=None)
    parser.add_argument("input_sims", metavar="sim.h5", nargs="+")
    args = vars(parser.parse_args())
    if args.get("frames"):
        args["frames"] = parse_frame_ranges(args["frames"])
    return remove_none(args)


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
