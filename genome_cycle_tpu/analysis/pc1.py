"""Compartment (PC1) profile from a contact matrix.

Reference: src/pc1.py + src/pkg/pc1/math.py.  Pipeline: cooler matrix ->
O/E normalization (per-diagonal cis expected, scalar trans expected) ->
column standardization -> power-iteration SVD for the first right singular
vector -> PC1 scaled so its variance equals the explained-variance ratio.
"""

from __future__ import annotations

import argparse
import json
import logging
import typing

import numpy as np
import pandas as pd

from .common import invoke_main, remove_none
from .coolio import Cooler

LOG = logging.getLogger()
MATRIX_FORMAT = dict(dtype=np.float32, order="C")
OUTPUT_FORMAT = dict(sep="\t", float_format="%g", na_rep="nan", index=False)


class SVDStep(typing.NamedTuple):
    step: int
    vector: np.ndarray
    delta: float


def power_svd(data: np.ndarray, init=None):
    """First right singular vector by power iteration (pkg/pc1/math.py:12-37),
    NaN-tolerant like the reference (nansum in the iteration)."""
    step = 0
    if init is not None:
        prev = init
    else:
        dim = data.shape[1]
        prev = np.ones(dim, dtype=data.dtype) / np.sqrt(dim)
    while True:
        weights = data @ prev
        vec = np.nansum(weights[:, None] * data, axis=0)
        vec = vec / np.linalg.norm(vec)
        step += 1
        yield SVDStep(step=step, vector=vec, delta=np.abs(vec - prev).max())
        prev = vec


class ContactPatch(typing.NamedTuple):
    chrom: str
    rows: np.ndarray
    trans_1: np.ndarray
    trans_2: np.ndarray
    cis: np.ndarray


def scan_chrom_rows(contact_matrix: np.ndarray, chrom_ranges: dict):
    for chrom, (start, end) in chrom_ranges.items():
        rows = contact_matrix[start:end]
        yield ContactPatch(
            chrom=chrom,
            rows=rows,
            trans_1=rows[:, :start],
            trans_2=rows[:, end:],
            cis=rows[:, start:end],
        )


class ExpectedContacts(typing.NamedTuple):
    intra: np.ndarray
    inter: float


def valid_sum(vec: np.ndarray):
    valid = np.isfinite(vec)
    return vec[valid].sum(), valid.sum()


def estimate_expected_contacts(contact_matrix, chrom_ranges) -> ExpectedContacts:
    """Per-separation cis expected + scalar trans expected
    (src/pc1.py:156-183)."""
    max_separation = max(end - start for start, end in chrom_ranges.values())
    inter_sum = 0.0
    inter_count = 0
    intra_sums = np.zeros(max_separation, dtype=contact_matrix.dtype)
    intra_counts = np.zeros(max_separation, dtype=contact_matrix.dtype)

    for patch in scan_chrom_rows(contact_matrix, chrom_ranges):
        sum_1, count_1 = valid_sum(patch.trans_1)
        sum_2, count_2 = valid_sum(patch.trans_2)
        inter_sum += sum_1 + sum_2
        inter_count += count_1 + count_2
        for s in range(len(patch.cis)):
            diag = np.diag(patch.cis, s)
            d_sum, d_count = valid_sum(diag)
            intra_sums[s] += d_sum
            intra_counts[s] += d_count

    with np.errstate(invalid="ignore", divide="ignore"):
        return ExpectedContacts(
            intra=(intra_sums / intra_counts),
            inter=float(inter_sum / inter_count) if inter_count else np.nan,
        )


def unselect_vector(vector, selection, placeholder=np.nan):
    result = np.full(len(selection), placeholder, dtype=vector.dtype)
    result[np.arange(len(result))[selection]] = vector
    return result


def compute_pc1(
    contact_matrix: np.ndarray,
    chrom_ranges: dict,
    *,
    mask_intra: bool = False,
    use_covariance: bool = False,
    svd_tolerance: float = 1e-4,
    max_iters: int = 10_000,
):
    """Core O/E + PC1 computation; returns (pc1, ev1, evr, expected)."""
    expected = estimate_expected_contacts(contact_matrix, chrom_ranges)
    data_matrix = contact_matrix

    for patch in scan_chrom_rows(data_matrix, chrom_ranges):
        patch.trans_1[...] /= expected.inter
        patch.trans_2[...] /= expected.inter
        if mask_intra:
            patch.cis[np.isfinite(patch.cis)] = 1
        else:
            cis_size = len(patch.cis)
            for k in range(-cis_size + 1, cis_size):
                diag = np.diagonal(patch.cis, k)
                diag.setflags(write=True)
                diag[:] /= expected.intra[abs(k)]

    coverages = np.nansum(data_matrix, axis=0)
    selection = coverages > 0
    if not use_covariance:
        # Zero-variance columns cannot be standardized; drop them with the
        # empty ones (robustness addition over the reference, which assumes
        # real Hi-C data where this never happens).
        with np.errstate(invalid="ignore"):
            col_std = np.nanstd(np.where(np.isfinite(data_matrix), data_matrix, np.nan), axis=0)
        selection &= np.nan_to_num(col_std) > 0
    data_matrix = data_matrix[:, selection]
    with np.errstate(invalid="ignore", divide="ignore"):
        data_matrix[np.isinf(data_matrix)] = np.nan
        data_matrix[...] -= np.nanmean(data_matrix, axis=0)
        if not use_covariance:
            data_matrix[...] /= np.nanstd(data_matrix, axis=0)
    # Mean-impute scattered invalid entries (empty expected diagonals on
    # sparse matrices leave NaNs inside otherwise-valid rows; the reference's
    # nansum-based iteration would discard every row in that case).  After
    # centering, the column mean is 0.
    data_matrix[~np.isfinite(data_matrix)] = 0.0

    LOG.info(
        ">> Found %d valid bins out of %d", data_matrix.shape[1], len(selection)
    )

    svd = None
    for svd in power_svd(data_matrix):
        if svd.delta < svd_tolerance or svd.step >= max_iters:
            break

    pc1 = data_matrix @ svd.vector
    ev1 = unselect_vector(svd.vector, selection)

    # Scale so var(pc1) = explained variance ratio (src/pc1.py:87-97).
    data_var = np.nansum(np.nanvar(data_matrix, axis=0))
    pc1 = pc1 / np.sqrt(data_var)
    evr = float(np.nanvar(pc1))
    return pc1, ev1, evr, expected


def main(
    *,
    cool: str,
    output: str,
    aux_output: str | None = None,
    mask_intra: bool = False,
    use_covariance: bool = False,
    use_raw: bool = False,
    svd_tolerance: float = 1e-4,
):
    LOG.info("Opening cooler dataset %s", cool)
    clr = Cooler(cool)
    bins = clr.bins()[:]
    matrix = clr.matrix(balance=(not use_raw))

    LOG.info("Loading contact matrix")
    contact_matrix = np.asarray(matrix[:, :], **MATRIX_FORMAT)
    chrom_ranges = {chrom: clr.extent(chrom) for chrom in clr.chromnames}

    LOG.info("Computing O/E matrix + PC1")
    pc1, ev1, evr, expected = compute_pc1(
        contact_matrix,
        chrom_ranges,
        mask_intra=mask_intra,
        use_covariance=use_covariance,
        svd_tolerance=svd_tolerance,
    )
    LOG.info("Explained variance ratio: %.1f %%", evr * 100)

    table = pd.DataFrame.from_dict(
        {
            "chrom": bins["chrom"].values,
            "start": bins["start"].values,
            "end": bins["end"].values,
            "ev1": ev1,
            "pc1": pc1,
        }
    )
    table.to_csv(output, **OUTPUT_FORMAT)

    if aux_output:
        aux_data = {
            "explained_variance_ratio": float(evr),
            "cis_decay_profile": [float(x) for x in expected.intra],
            "trans_contact": expected.inter,
        }
        with open(aux_output, "w") as file:
            json.dump(aux_data, file)


def parse_args() -> dict:
    parser = argparse.ArgumentParser(description="Compute compartment signal")
    parser.add_argument("--svd-tolerance", metavar="1e-4", type=float, default=None)
    parser.add_argument("--use-raw", action="store_true", default=None)
    parser.add_argument("--use-covariance", action="store_true", default=None)
    parser.add_argument("--mask-intra", action="store_true", default=None)
    parser.add_argument("--aux-output", metavar="aux.json", type=str, default=None)
    parser.add_argument("--output", metavar="pc1.tsv", required=True)
    parser.add_argument("cool")
    return remove_none(vars(parser.parse_args()))


if __name__ == "__main__":
    invoke_main(main, parse_args(), LOG)
