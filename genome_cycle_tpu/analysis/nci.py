"""NCI (neighboring-contact index) genomic track from an experimental cooler.

Reference: src/nci.py + src/pkg/nci/nci.py.  The NCI of bin i is

    nci(i) = c_{i,i+1} / sqrt(c_{i,i} * c_{i+1,i+1})

on the *raw* matrix (invariant under multiplicative bin bias, so no balancing
is needed; pkg/nci/nci.py:27-29,47).  With ``halve=True`` overlapping output
bins are decimated so the output binsize is twice the matrix resolution.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np
import pandas as pd

from .coolio import Cooler
from .common import invoke_main, remove_none

LOG = logging.getLogger()
DEFAULT_CHUNK_SIZE = 512


def compute_nci(matrix, start: int, end: int, *, chunk_size: int = DEFAULT_CHUNK_SIZE):
    chunk_ncis = [np.empty(0)]
    for offset in range(start, end, chunk_size):
        # Extend by one so the bin pair straddling the chunk boundary is kept.
        stop = min(offset + chunk_size + 1, end)
        chunk = matrix[offset:stop, offset:stop]
        diag = np.diag(chunk)
        sub = np.diag(chunk, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            nci = sub / np.sqrt(diag[1:] * diag[:-1])
        chunk_ncis.append(nci)
    return np.concatenate(chunk_ncis)


def make_nci_track(
    cool: Cooler,
    chrom: str,
    *,
    halve: bool = False,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> pd.DataFrame:
    def make_track(start, end, score):
        return pd.DataFrame({"chrom": chrom, "start": start, "end": end, "score": score})

    matrix = cool.matrix(balance=False)
    chrom_start, chrom_end = cool.extent(chrom)
    if chrom_start == chrom_end:
        return make_track([], [], [])

    bins = cool.bins()[chrom_start:chrom_end]
    nci = compute_nci(matrix, chrom_start, chrom_end, chunk_size=chunk_size)
    assert len(nci) == len(bins) - 1

    # nci(i) spans input bins i and i+1 (pkg/nci/nci.py:58-81).
    if len(nci) > 0:
        track = make_track(
            start=bins["start"].values[:-1],
            end=bins["end"].values[1:],
            score=nci,
        )
    else:
        track = make_track(start=bins["start"], end=bins["end"], score=np.nan)

    if halve:
        halved = track[::2]
        if len(track) % 2 == 0:
            remains = track[-1:].copy()
            remains.iloc[0, remains.columns.get_loc("start")] = track.iloc[-2]["end"]
            halved = pd.concat([halved, remains], ignore_index=True)
        track = halved.reset_index(drop=True)

    return track


def main(*, cool: str, output: str, binsize: int | None = None, halve: bool = True):
    """CLI: build a genome-wide NCI track.  With --binsize, the matrix at
    resolution binsize/2 is read from an .mcool (src/nci.py:16-64)."""
    uri = cool
    if binsize is not None:
        uri = f"{cool}::/resolutions/{binsize // 2}"
    clr = Cooler(uri)
    tracks = []
    for chrom in clr.chromnames:
        LOG.info("NCI for %s", chrom)
        tracks.append(make_nci_track(clr, chrom, halve=halve))
    table = pd.concat(tracks, ignore_index=True)
    table.to_csv(output, sep="\t", index=False, float_format="%g")


def parse_args() -> dict:
    parser = argparse.ArgumentParser(description="Compute NCI track from Hi-C")
    parser.add_argument("--binsize", type=int, default=None)
    parser.add_argument("--no-halve", dest="halve", action="store_false", default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("cool")
    return remove_none(vars(parser.parse_args()))


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
