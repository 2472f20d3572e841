"""Cytogenetic band categories for chain annotation.

Maps UCSC cytoBand stains onto the three structural categories the chain
designer cares about — heterochromatic G-bands (HET), centromeres (CEN) and
NOR stalks (NOR) — and attaches one category per NCI bin.

Behavior parity with the reference (src/pkg/annotate/cyto.py): same stain
mapping, same containment-join semantics (a bin gets a band's stain only if
the band fully contains it), same NOR p-arm extension rule.  The
implementation is different: the reference runs a duckdb SQL left join and
per-chromosome Python loops; here both the interval join and the p-arm
extension are vectorized numpy over a chromosome-sorted frame.
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

# Gimsa-positive bands of any intensity are heterochromatic; acrocentric
# stalks carry the rDNA repeats (NORs).
_HET_STAINS = ("gpos25", "gpos33", "gpos50", "gpos66", "gpos75", "gpos100")
STAIN_TO_CAT = {
    **{stain: CytoCat.HET for stain in _HET_STAINS},
    "acen": CytoCat.CEN,
    "stalk": CytoCat.NOR,
}


def load_cyto_band(filename: str) -> pd.DataFrame:
    return pd.read_csv(filename, **CYTO_BAND_FORMAT)


def _categories_for_chrom(starts, ends, bands: pd.DataFrame) -> np.ndarray:
    """Category codes for one chromosome's bins given its band intervals.

    Bands tile the chromosome without overlap, so the band containing a
    bin's start is found by bisection; the bin must also end inside it.
    """
    cats = np.full(starts.shape[0], CytoCat.NONE, dtype=object)
    if not len(bands):
        return cats
    lo = bands["start"].to_numpy()
    hi = bands["end"].to_numpy()
    cat_codes = np.array(
        [STAIN_TO_CAT.get(s, CytoCat.NONE) for s in bands["stain"]],
        dtype=object,
    )
    k = np.searchsorted(lo, starts, side="right") - 1
    k = np.clip(k, 0, len(lo) - 1)
    contained = (starts >= lo[k]) & (ends <= hi[k])
    cats[contained] = cat_codes[k[contained]]
    return cats


def attach_cyto_category(
    nci_table: pd.DataFrame,
    band_table: pd.DataFrame,
    extend_nor: bool = False,
) -> pd.DataFrame:
    """Return ``nci_table`` with a ``cat`` column of :class:`CytoCat`."""
    out = nci_table.reset_index(drop=True).copy()
    per_chrom_bands = dict(iter(band_table.groupby("chrom", sort=False)))

    pieces = []
    for chrom, bins in out.groupby("chrom", sort=False):
        bands = per_chrom_bands.get(chrom, band_table.iloc[0:0])
        cats = _categories_for_chrom(
            bins["start"].to_numpy(), bins["end"].to_numpy(), bands
        )
        if not (cats == CytoCat.CEN).any():
            LOG.warning("No centromere was identified on %s", chrom)
        pieces.append(pd.Series(cats, index=bins.index))
    out["cat"] = pd.concat(pieces).sort_index() if pieces else []

    if not (out["cat"] == CytoCat.NOR).any():
        LOG.warning("No NOR was identified")

    return do_extend_nor(out) if extend_nor else out


def do_extend_nor(table: pd.DataFrame) -> pd.DataFrame:
    """Mark the whole p-arm as NOR on NOR-bearing chromosomes.

    The rDNA stalk sits on the short arm of acrocentric chromosomes; the
    model treats that entire arm (everything before the first centromeric
    bin) as nucleolus-organizing when any stalk band was seen there.
    """
    cat = table["cat"].to_numpy(dtype=object, copy=True)
    chroms = table["chrom"].to_numpy()
    for chrom in pd.unique(chroms):
        rows = np.flatnonzero(chroms == chrom)
        codes = cat[rows]
        cen_hits = np.flatnonzero(codes == CytoCat.CEN)
        arm_len = cen_hits[0] if len(cen_hits) else len(codes)
        if (codes[:arm_len] == CytoCat.NOR).any():
            cat[rows[:arm_len]] = CytoCat.NOR
    return table.assign(cat=cat)
