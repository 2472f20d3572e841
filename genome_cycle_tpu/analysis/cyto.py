"""Cytogenetic band annotation: stains -> {HET, CEN, NOR} categories.

Reference: src/pkg/annotate/cyto.py (duckdb interval join replaced with a
vectorized pandas/numpy containment join).
"""

from __future__ import annotations

import enum
import logging

import numpy as np
import pandas as pd

LOG = logging.getLogger(__name__)


class CytoCat(enum.Enum):
    NONE = 0
    HET = 1
    CEN = 2
    NOR = 3


# https://hgdownload.cse.ucsc.edu/goldenPath/hg38/database/cytoBand.txt.gz
CYTO_BAND_FORMAT = dict(
    sep="\t", header=None, names=["chrom", "start", "end", "name", "stain"]
)

STAIN_TO_CAT = {
    "gpos25": CytoCat.HET,
    "gpos33": CytoCat.HET,
    "gpos50": CytoCat.HET,
    "gpos66": CytoCat.HET,
    "gpos75": CytoCat.HET,
    "gpos100": CytoCat.HET,
    "acen": CytoCat.CEN,
    "stalk": CytoCat.NOR,
}


def load_cyto_band(filename: str) -> pd.DataFrame:
    return pd.read_csv(filename, **CYTO_BAND_FORMAT)


def attach_cyto_category(
    nci_table: pd.DataFrame,
    band_table: pd.DataFrame,
    extend_nor: bool = False,
) -> pd.DataFrame:
    """LEFT JOIN each NCI bin onto the band fully containing it
    (cyto.py:37-49), then map stains to categories."""
    out = nci_table.reset_index(drop=True).copy()
    stains = np.full(len(out), None, dtype=object)

    for chrom, band_group in band_table.groupby("chrom", sort=False):
        sel = out["chrom"] == chrom
        if not sel.any():
            continue
        starts = out.loc[sel, "start"].to_numpy()
        ends = out.loc[sel, "end"].to_numpy()
        b_start = band_group["start"].to_numpy()
        b_end = band_group["end"].to_numpy()
        b_stain = band_group["stain"].to_numpy()
        # Containment: n.start >= b.start and n.end <= b.end.
        idx = np.searchsorted(b_start, starts, side="right") - 1
        idx = np.clip(idx, 0, len(b_start) - 1)
        ok = (starts >= b_start[idx]) & (ends <= b_end[idx])
        chosen = np.where(ok, b_stain[idx], None)
        stains[np.where(sel)[0]] = chosen

    out["cat"] = [STAIN_TO_CAT.get(s, CytoCat.NONE) for s in stains]

    for chrom, track in out.groupby("chrom", sort=False):
        if (track["cat"] == CytoCat.CEN).sum() == 0:
            LOG.warning("No centromere was identified on %s", chrom)
    if (out["cat"] == CytoCat.NOR).sum() == 0:
        LOG.warning("No NOR was identified")

    if extend_nor:
        out = do_extend_nor(out)
    return out


def do_extend_nor(table: pd.DataFrame) -> pd.DataFrame:
    """On NOR-bearing chromosomes, mark the whole p-arm (up to the centromere)
    as NOR (cyto.py:82-103)."""
    new_cats = []
    for chrom, track in table.groupby("chrom", sort=False):
        cats = track["cat"].values
        seen_nor = False
        arm_end = len(cats)
        for i, cat in enumerate(cats):
            if cat == CytoCat.NOR:
                seen_nor = True
            if cat == CytoCat.CEN:
                arm_end = i
                break
        if seen_nor:
            cats = cats.copy()
            cats[:arm_end] = CytoCat.NOR
        new_cats.append(cats)
    return table.assign(cat=np.concatenate(new_cats))
