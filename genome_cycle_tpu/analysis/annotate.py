"""Build the chains.tsv simulation input from an NCI track + cytoBand file.

Reference: src/annotate.py.  NCI scores are smoothed (centered rolling mean),
z-scored with a median/MAD normalizer, and thresholded into A/B/u chromatin
types with per-bead force parameters A=(1,0), B=(0,1), u=(.5,.5); cytoBand
categories add anor/bnor/cen tags; the output is a diploid chain design with
chrX/chrY special-casing (Xa normalized per-chromosome, Xb all-B = inactive
X, chrY only as a :b copy).

Note: the reference's typing loop (annotate.py:78-90) is in a broken editing
state — a stray duplicated line calls determine_chromatin_type without the
required tags argument (a TypeError at runtime) and would override the
tag-aware parameters with tag-blind ones.  We implement the evident intent
(tag-aware typing used for both the tag and the parameters) and test it
(SURVEY.md §2.10).
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import logging

import numpy as np
import pandas as pd

from .common import invoke_main, remove_none
from .cyto import CytoCat, attach_cyto_category, load_cyto_band

LOG = logging.getLogger()
NCI_FORMAT = dict(sep="\t")


class AnnotScheme(enum.Enum):
    GENOME_WIDE = 0
    SINGLE_CHROM = 1
    ALL_B = 2


@dataclasses.dataclass
class Chain:
    name: str
    chrom: str
    annot_scheme: AnnotScheme
    activate_nor: bool = False


class ChromType(enum.Enum):
    A = 1
    B = 2
    U = 3


CHROM_TYPE_HEURISTICS = {
    "cen": ChromType.B,
    "anor": ChromType.A,
    "bnor": ChromType.B,
}

CHROM_TYPE_TAGS = {ChromType.A: "A", ChromType.B: "B", ChromType.U: "u"}

CHROM_TYPE_PARAMETERS = {
    ChromType.A: (1.0, 0.0),
    ChromType.B: (0.0, 1.0),
    ChromType.U: (0.5, 0.5),
}


def design_diploid_chains(chrom_names: list[str], active_nor_patterns: list[str]):
    """Diploid chain list with chrX/chrY rules (annotate.py:145-209)."""
    chains = []
    normal_chroms = chrom_names.copy()
    use_xa = use_xb = use_y = False

    if "chrX" in chrom_names:
        use_xa = use_xb = True
        normal_chroms.remove("chrX")
    if "chrY" in chrom_names:
        use_xb = False
        use_y = True
        normal_chroms.remove("chrY")

    for chrom in normal_chroms:
        chain_name = chrom + ":a"
        chains.append(
            Chain(
                name=chain_name,
                chrom=chrom,
                annot_scheme=AnnotScheme.GENOME_WIDE,
                activate_nor=any(
                    chain_name.endswith(pat) for pat in active_nor_patterns
                ),
            )
        )
    if use_xa:
        chains.append(Chain("chrX:a", "chrX", AnnotScheme.SINGLE_CHROM))
    for chrom in normal_chroms:
        chain_name = chrom + ":b"
        chains.append(
            Chain(
                name=chain_name,
                chrom=chrom,
                annot_scheme=AnnotScheme.GENOME_WIDE,
                activate_nor=any(
                    chain_name.endswith(pat) for pat in active_nor_patterns
                ),
            )
        )
    if use_xb:
        chains.append(Chain("chrX:b", "chrX", AnnotScheme.ALL_B))
    if use_y:
        chains.append(Chain("chrY:b", "chrY", AnnotScheme.GENOME_WIDE))
    return chains


def determine_chromatin_type(z_score, tristate, tags) -> ChromType:
    """Tag-aware typing (annotate.py:212-227): NaN score falls back to a
    heuristic from the cytogenetic tags."""
    if np.isnan(z_score):
        return infer_chromatin_type(tags)
    if z_score > tristate:
        return ChromType.A
    if z_score < -tristate:
        return ChromType.B
    return ChromType.U


def infer_chromatin_type(tags) -> ChromType:
    for key, typ in CHROM_TYPE_HEURISTICS.items():
        if key in tags:
            return typ
    return ChromType.U


def compute_normalizer(values: np.ndarray):
    """Median center, MAD scale (annotate.py:230-234)."""
    MAD_FACTOR = 1.4826
    center = np.nanmedian(values)
    scale = np.nanmedian(np.abs(values - center)) * MAD_FACTOR
    return center, scale


def main(
    *,
    tristate: float = 0,
    activate_nor: list[str] = [],
    extend_nor: bool = False,
    smooth_window: int = 10,
    output_filename: str,
    nci_filename: str,
    band_filename: str,
):
    nci_table = pd.read_csv(nci_filename, **NCI_FORMAT)
    band_table = load_cyto_band(band_filename)
    nci_cat_table = attach_cyto_category(nci_table, band_table, extend_nor=extend_nor)

    chrom_names = list(nci_cat_table["chrom"].unique())
    chains = design_diploid_chains(chrom_names, activate_nor)

    exclude = ["chrX"]
    basic_center, basic_scale = compute_normalizer(
        nci_cat_table[~nci_cat_table["chrom"].isin(exclude)]["score"].values
    )

    with open(output_filename, "w") as output:
        need_header = True
        for chain in chains:
            nci_cat_track = nci_cat_table[nci_cat_table["chrom"] == chain.chrom]
            chain_length = len(nci_cat_track)
            cats = nci_cat_track["cat"].values
            tags = [[] for _ in range(chain_length)]

            for i in range(chain_length):
                match cats[i]:
                    case CytoCat.NOR:
                        tags[i].append("anor" if chain.activate_nor else "bnor")
                    case CytoCat.CEN:
                        tags[i].append("cen")
                    case CytoCat.HET:
                        tags[i].append("het")

            scores = (
                nci_cat_track["score"]
                .rolling(window=smooth_window, center=True, min_periods=1)
                .mean()
                .values
            )
            parameters = np.zeros((chain_length, 2))

            match chain.annot_scheme:
                case AnnotScheme.GENOME_WIDE:
                    center, scale = basic_center, basic_scale
                case AnnotScheme.SINGLE_CHROM:
                    center, scale = compute_normalizer(scores)
                case AnnotScheme.ALL_B:
                    center, scale = np.inf, 1

            for i in range(chain_length):
                z_score = (scores[i] - center) / scale
                chrom_type = determine_chromatin_type(z_score, tristate, tags[i])
                tags[i].append(CHROM_TYPE_TAGS[chrom_type])
                parameters[i] = CHROM_TYPE_PARAMETERS[chrom_type]
                # "het" is informational only; drop it from the output.
                if "het" in tags[i]:
                    tags[i].remove("het")

            track = pd.DataFrame(
                {
                    "chain": chain.name,
                    "start": nci_cat_track["start"].values,
                    "end": nci_cat_track["end"].values,
                    "A": parameters[:, 0],
                    "B": parameters[:, 1],
                    "tags": [",".join(t) for t in tags],
                }
            )
            track.to_csv(
                output, sep="\t", float_format="%g", index=False, header=need_header
            )
            need_header = False
            output.flush()


def parse_args() -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tristate", type=float)
    parser.add_argument("--activate-nor", type=str)
    parser.add_argument("--extend-nor", action="store_true", default=None)
    parser.add_argument("--smooth-window", type=int)
    parser.add_argument("--nci", dest="nci_filename", required=True)
    parser.add_argument("--band", dest="band_filename", required=True)
    parser.add_argument("--output", dest="output_filename", required=True)
    args = vars(parser.parse_args())
    if args.get("activate_nor"):
        args["activate_nor"] = args["activate_nor"].split(",")
    return remove_none(args)


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
