"""Build a cooler contact matrix from simulation trajectory stores.

Behavior parity with the reference (src/cool.py): the bin table is copied
from the trajectory's embedded chains.tsv source, nucleolar particles get a
virtual "nucleoli" chain, contact COO samples from one or more trajectories
(ensemble replicas) merge into a single matrix, an optional ``--frames``
selection restricts which sampled windows contribute, and the matrix is
iteratively balanced afterwards.

Implementation differs from the reference: bins are assembled with a single
vectorized repeat over chain ranges (no per-chain loop), and frame selection
resolves slices to index arrays up front.  The cooler container itself comes
from :mod:`.coolio` (this framework's writer) rather than the cooler package.
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
    """Bin table for a trajectory store (src/cool.py:27-73).

    Chain beads keep their genomic intervals from the chains.tsv source
    (homologs stay distinct chains, as in the simulation input); trailing
    nucleolar particles become consecutive fixed-size bins on the virtual
    :data:`NUCLEOLAR_CHAIN` so NAD contacts survive into the matrix
    (dephase trims them later).
    """
    with h5py.File(store_path, "r") as store:
        meta = store["stages/interphase/metadata"]
        n_bins = meta["particle_types"].shape[0]
        names = np.asarray([s.decode() for s in meta["chain_names"]], object)
        ranges = np.asarray(meta["chain_ranges"])
        source = store["metadata/chains_source"][()].decode()

    table = pd.read_csv(io.StringIO(source), sep="\t")
    lengths = ranges[:, 1] - ranges[:, 0]
    beads_total = int(ranges.max())
    n_nuc = n_bins - beads_total
    binsize = int((table["end"] - table["start"]).max())

    chrom = np.concatenate(
        [np.repeat(names, lengths), np.repeat([NUCLEOLAR_CHAIN], n_nuc)]
    )
    nuc_edges = binsize * np.arange(n_nuc + 1, dtype=np.int64)
    start = np.concatenate(
        [table["start"].to_numpy()[:beads_total], nuc_edges[:-1]]
    )
    end = np.concatenate([table["end"].to_numpy()[:beads_total], nuc_edges[1:]])
    return pd.DataFrame({"chrom": chrom, "start": start, "end": end})


def _selected_steps(snapshots: h5py.Group, frames) -> list[str]:
    steps = [s.decode() for s in snapshots[".steps"]]
    if frames is None:
        return steps
    picked: list[str] = []
    for frame_slice in frames:
        picked.extend(steps[frame_slice])
    return picked


def scan_pixels(input_sims, frames=None):
    """Yield contact COO chunks {bin1_id, bin2_id, count} (src/cool.py:80-110).

    Contact dumps are sparse in the frame stream (only window boundaries
    carry them); frames without a contacts dataset contribute nothing.
    Unreadable trajectory files are skipped with a warning, matching the
    reference's tolerance for partially written ensemble members.
    """
    for path in input_sims:
        LOG.info("Ingesting from %s", path)
        try:
            with h5py.File(path, "r") as store:
                snapshots = store["stages/interphase"]
                for step in _selected_steps(snapshots, frames):
                    group = snapshots[step]
                    if "contacts" not in group:
                        continue
                    coo = np.asarray(group["contacts"])
                    yield {
                        "bin1_id": coo[:, 0],
                        "bin2_id": coo[:, 1],
                        "count": coo[:, 2],
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


def parse_frame_ranges(spec: str) -> list[slice]:
    """Parse "100,200-300,400-" into frame slices (src/cool.py:152-169):
    a point selects one frame, "a-b" is inclusive, "a-" is open-ended."""
    out: list[slice] = []
    for piece in spec.split(","):
        lo, dash, hi = piece.partition("-")
        if not dash:
            out.append(slice(int(lo), int(lo) + 1))
        elif hi == "":
            out.append(slice(int(lo), None))
        else:
            out.append(slice(int(lo), int(hi) + 1))
    return out


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
