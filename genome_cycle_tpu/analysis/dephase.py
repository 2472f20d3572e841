"""Diploid -> haploid contact-map aggregation.

Reference: src/dephase.py.  Chain names "chrN:a"/"chrN:b" map onto one
haploid "chrN"; superposed pixels merge by summation; the virtual "nucleoli"
chain is dropped; the result is re-balanced.  The reference's duckdb SQL
joins are replaced with vectorized numpy interval mapping.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np
import pandas as pd

from .common import invoke_main, remove_none
from .coolio import Cooler, balance_cooler, create_cooler

LOG = logging.getLogger()
VIRTUAL_CHAINS = {"nucleoli"}
CHUNK_SIZE = 5_000_000


def infer_chromosome_copies(chain_names: list[str]) -> dict[str, list[str]]:
    chrom_copies: dict[str, list[str]] = {}
    for chain_name in chain_names:
        match chain_name.split(":"):
            case [chrom, suffix]:
                chrom_copies.setdefault(chrom, []).append(suffix)
            case _:
                LOG.warning("Skipping unrecognized chain: %s", chain_name)
    return chrom_copies


def make_output_bins(input_bins, chrom_copies):
    canon = {f"{chrom}:{sufs[0]}": chrom for chrom, sufs in chrom_copies.items()}
    output_bins = (
        input_bins[input_bins["chrom"].isin(canon)]
        .reset_index(drop=True)
        .replace({"chrom": canon})
    )
    return output_bins


def make_mapping(input_bins, output_bins, chrom_copies) -> pd.DataFrame:
    """Rows of (chrom_start, chrom_end, chain_start, chain_end) bin-id ranges
    mapping each diploid chain onto its haploid chromosome range."""
    records = []

    def chrom_range(bins, name):
        idx = bins.index[bins["chrom"] == name]
        return int(idx[0]), int(idx[-1]) + 1

    for chrom, suffixes in chrom_copies.items():
        chrom_start, chrom_end = chrom_range(output_bins, chrom)
        for suffix in suffixes:
            chain_start, chain_end = chrom_range(input_bins, f"{chrom}:{suffix}")
            records.append(
                {
                    "chrom_start": chrom_start,
                    "chrom_end": chrom_end,
                    "chain_start": chain_start,
                    "chain_end": chain_end,
                }
            )
    return pd.DataFrame.from_records(records)


def _map_bin_ids(bin_ids: np.ndarray, mapping: pd.DataFrame) -> np.ndarray:
    """Map diploid bin ids to haploid ids; -1 for unmapped (virtual) bins."""
    starts = mapping["chain_start"].to_numpy()
    ends = mapping["chain_end"].to_numpy()
    chrom_starts = mapping["chrom_start"].to_numpy()
    order = np.argsort(starts)
    starts_sorted = starts[order]
    row = np.searchsorted(starts_sorted, bin_ids, side="right") - 1
    row = np.clip(row, 0, len(starts) - 1)
    rows = order[row]
    mapped = bin_ids - starts[rows] + chrom_starts[rows]
    ok = (bin_ids >= starts[rows]) & (bin_ids < ends[rows])
    return np.where(ok, mapped, -1)


def dephase_pixels(clr: Cooler, mapping: pd.DataFrame, chunk_size: int):
    pixels = clr.pixels()[:]
    n_pixels = len(pixels)
    LOG.info("Dephasing %d pixels", n_pixels)
    for chunk_start in range(0, n_pixels, chunk_size):
        chunk = pixels.iloc[chunk_start : chunk_start + chunk_size]
        b1 = _map_bin_ids(chunk["bin1_id"].to_numpy(), mapping)
        b2 = _map_bin_ids(chunk["bin2_id"].to_numpy(), mapping)
        keep = (b1 >= 0) & (b2 >= 0)
        lo = np.minimum(b1[keep], b2[keep])
        hi = np.maximum(b1[keep], b2[keep])
        yield pd.DataFrame(
            {
                "bin1_id": lo,
                "bin2_id": hi,
                "count": chunk["count"].to_numpy()[keep],
            }
        )


def main(*, output: str, input: str, no_balancing: bool = False):
    LOG.info("Opening cool dataset: %s", input)
    clr = Cooler(input)
    chrom_copies = infer_chromosome_copies(
        [name for name in clr.chromnames if name not in VIRTUAL_CHAINS]
    )
    LOG.info("Inferred chromosomes: %s", ", ".join(chrom_copies))

    input_bins = clr.bins()[:]
    output_bins = make_output_bins(input_bins, chrom_copies)
    mapping = make_mapping(input_bins, output_bins, chrom_copies)
    LOG.info("Bins reduced: %d -> %d", len(input_bins), len(output_bins))

    create_cooler(
        output,
        output_bins,
        dephase_pixels(clr, mapping, CHUNK_SIZE),
        assembly=clr.info.get("genome-assembly"),
    )
    output_clr = Cooler(output)
    if not no_balancing:
        LOG.info("Balancing contact matrix")
        balance_cooler(output_clr, store=True)


def parse_args() -> dict:
    parser = argparse.ArgumentParser(description="Aggregate homologous contacts")
    parser.add_argument("--no-balancing", action="store_true", default=None)
    parser.add_argument("--output", metavar="out.cool", required=True)
    parser.add_argument("input", metavar="in.cool")
    return remove_none(vars(parser.parse_args()))


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
