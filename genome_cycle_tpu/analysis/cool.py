"""Aggregate simulated contact samples into a cooler matrix.

Covers the surface of the reference's contact-collection tool (``src/cool.py``
in snsinfu/3d-genome-cycle): one or more trajectory stores (ensemble
replicas) contribute their COO contact dumps to a single ``.cool`` dataset
whose bin table is reconstructed from the embedded ``chains.tsv`` source,
trailing nucleolar particles are exposed as a virtual chromosome, an optional
frame selection restricts which sampled windows contribute, and the matrix is
iteratively balanced at the end.

The construction differs from the reference throughout: the genomic bins are
taken straight from the chains.tsv columns instead of being re-scattered
through chain-range loops, contact chunks stream as DataFrames, frame
selections are parsed with a regular expression, and the cooler container is
this framework's own :mod:`.coolio` writer rather than the cooler package.
"""

from __future__ import annotations

import argparse
import io
import logging
import re

import h5py
import numpy as np
import pandas as pd

from .common import invoke_main, remove_none
from .coolio import Cooler, balance_cooler, create_cooler

LOG = logging.getLogger()

#: Virtual chromosome name carrying the trailing nucleolar particles, so
#: nucleolus-associated contacts survive into the matrix.  ``dephase`` trims
#: this chain when producing the haploid, experiment-comparable map.
NUCLEOLAR_CHAIN = "nucleoli"

_STAGE = "stages/interphase"


def bin_table(trajectory: str) -> pd.DataFrame:
    """Bin table of a trajectory store.

    Chain beads keep the genomic intervals recorded in the chains.tsv text
    embedded at prepare time (homologs stay distinct chains, exactly as the
    simulation saw them); every particle beyond the chain ranges is a
    nucleolar bead and becomes one fixed-width bin of the virtual
    :data:`NUCLEOLAR_CHAIN`.
    """
    with h5py.File(trajectory, "r") as f:
        meta = f[_STAGE + "/metadata"]
        total_particles = int(meta["particle_types"].shape[0])
        chain_span = int(np.asarray(meta["chain_ranges"]).max())
        chains_tsv = f["metadata/chains_source"][()].decode()

    chains = pd.read_csv(io.StringIO(chains_tsv), sep="\t")
    genomic = (
        chains.iloc[:chain_span]
        .loc[:, ["chain", "start", "end"]]
        .rename(columns={"chain": "chrom"})
        .astype({"start": np.int64, "end": np.int64})
    )

    width = int((chains["end"] - chains["start"]).max())
    edges = width * np.arange(total_particles - chain_span + 1, dtype=np.int64)
    virtual = pd.DataFrame(
        {"chrom": NUCLEOLAR_CHAIN, "start": edges[:-1], "end": edges[1:]}
    )
    return pd.concat([genomic, virtual], ignore_index=True)


def _frame_keys(stage: h5py.Group, selection) -> list[str]:
    """Step-group names of the sampled frames, optionally sliced."""
    labels = [raw.decode() for raw in stage[".steps"]]
    if selection is None:
        return labels
    chosen: list[str] = []
    for sl in selection:
        chosen.extend(labels[sl])
    return chosen


def iter_contact_chunks(trajectories, selection=None):
    """Stream contact COO chunks as DataFrames across all input stores.

    Only window-boundary frames carry a contacts dataset; other frames are
    skipped silently.  A store that cannot be opened is skipped with a
    warning so one broken ensemble member does not sink the merge.
    """
    for path in trajectories:
        LOG.info("Ingesting from %s", path)
        try:
            handle = h5py.File(path, "r")
        except OSError as err:
            LOG.warning(">> Skipping: %s", err)
            continue
        with handle:
            stage = handle[_STAGE]
            for key in _frame_keys(stage, selection):
                node = stage[key]
                if "contacts" not in node:
                    continue
                row, col, count = np.asarray(node["contacts"]).T
                yield pd.DataFrame(
                    {"bin1_id": row, "bin2_id": col, "count": count}
                )


def main(*, output: str, frames=None, input_sims: list[str], no_balancing=False):
    bins = bin_table(input_sims[0])
    LOG.info("Bins: %d", len(bins))
    create_cooler(output, bins, iter_contact_chunks(input_sims, frames))
    if not no_balancing:
        LOG.info("Balancing contact matrix")
        balance_cooler(Cooler(output), store=True)


_RANGE_TOKEN = re.compile(r"^(\d+)(-(\d*))?$")


def parse_frame_ranges(spec: str) -> list[slice]:
    """Frame-selection grammar: ``"100,200-300,400-"`` selects frame 100,
    frames 200..300 inclusive, and everything from 400 on."""
    selection: list[slice] = []
    for token in spec.split(","):
        m = _RANGE_TOKEN.match(token.strip())
        if m is None:
            raise ValueError(f"bad frame range {token!r}")
        first = int(m.group(1))
        if m.group(2) is None:
            selection.append(slice(first, first + 1))
        elif m.group(3) == "":
            selection.append(slice(first, None))
        else:
            selection.append(slice(first, int(m.group(3)) + 1))
    return selection


def parse_args() -> dict:
    parser = argparse.ArgumentParser(
        description="Collect contact samples from simulation trajectories"
    )
    parser.add_argument(
        "--output", metavar="sim.cool", required=True,
        help="cooler dataset to create",
    )
    parser.add_argument(
        "--frames", metavar="300-500,600",
        help="restrict to these sampled frames (see parse_frame_ranges)",
    )
    parser.add_argument(
        "--no-balancing", action="store_true", default=None,
        help="skip matrix balancing",
    )
    parser.add_argument(
        "input_sims", metavar="sim.h5", nargs="+",
        help="trajectory stores (ensemble replicas merge)",
    )
    options = vars(parser.parse_args())
    if options.get("frames"):
        options["frames"] = parse_frame_ranges(options["frames"])
    return remove_none(options)


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
