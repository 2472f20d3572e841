"""Compartment (PC1) profile from a contact matrix.

Pipeline parity with the reference tool (src/pc1.py + src/pkg/pc1/math.py):
cooler matrix -> observed/expected normalization (per-separation cis
expected, scalar trans expected) -> column standardization -> power-iteration
for the first right singular vector -> PC1 scaled so its variance equals the
explained-variance ratio; same TSV/JSON outputs and CLI flags.

The numerics are implemented differently: the per-separation expected profile
is accumulated with one ``bincount`` over a |i-j| separation grid per
chromosome block (the reference loops over ``np.diag`` calls, one per
diagonal), O/E division is a single vectorized gather through the same grid,
and the power iteration is a plain convergence loop rather than a generator
protocol.  Robustness additions over the reference: zero-variance columns are
dropped before standardization, scattered non-finite entries are
mean-imputed after centering (sparse simulated matrices hit both paths), and
a max-iteration cap guards the iteration.
"""

from __future__ import annotations

import argparse
import json
import logging
from typing import NamedTuple

import numpy as np

from .common import invoke_main, remove_none
from .coolio import Cooler

LOG = logging.getLogger()


def leading_singular_vector(
    data: np.ndarray, *, tol: float = 1e-4, max_iters: int = 10_000
) -> tuple[np.ndarray, int, float]:
    """First right singular vector of ``data`` by power iteration on the
    Gram operator v -> normalize(Dᵀ(Dv)); NaN-tolerant via nansum.  Returns
    (vector, iterations, final max-abs step delta)."""
    dim = data.shape[1]
    vec = np.ones(dim, dtype=data.dtype) / np.sqrt(dim)
    delta = np.inf
    for step in range(1, max_iters + 1):
        weights = data @ vec
        nxt = np.nansum(weights[:, None] * data, axis=0)
        nxt /= np.linalg.norm(nxt)
        delta = float(np.abs(nxt - vec).max())
        vec = nxt
        if delta < tol:
            break
    return vec, step, delta


class OEProfile(NamedTuple):
    """Expected contact frequencies: per-separation within a chromosome,
    one scalar across chromosomes."""

    cis_by_separation: np.ndarray
    trans_mean: float


def _separations(n: int) -> np.ndarray:
    """(n, n) grid of genomic separations |i - j|."""
    idx = np.arange(n)
    return np.abs(idx[:, None] - idx[None, :])


def estimate_expected(matrix: np.ndarray, chrom_ranges: dict) -> OEProfile:
    """Mean finite contact per separation (cis, upper triangle once) and the
    scalar mean over all finite trans pixels, in one vectorized pass per
    chromosome block."""
    max_sep = max(end - start for start, end in chrom_ranges.values())
    cis_sum = np.zeros(max_sep)
    cis_cnt = np.zeros(max_sep)
    trans_sum = 0.0
    trans_cnt = 0

    for start, end in chrom_ranges.values():
        rows = matrix[start:end]
        cis = rows[:, start:end]
        n = end - start

        sep = _separations(n)
        keep = np.isfinite(cis) & (sep >= 0) & np.triu(np.ones((n, n), bool))
        cis_sum += np.bincount(
            sep[keep], weights=cis[keep].astype(np.float64), minlength=max_sep
        )
        cis_cnt += np.bincount(sep[keep], minlength=max_sep)

        # Trans pixels of this row block = all finite entries outside the
        # cis square (counted once per orientation, like a full-row scan).
        row_ok = np.isfinite(rows)
        trans_sum += float(rows[row_ok].sum()) - float(cis[np.isfinite(cis)].sum())
        trans_cnt += int(row_ok.sum()) - int(np.isfinite(cis).sum())

    with np.errstate(invalid="ignore", divide="ignore"):
        cis_mean = (cis_sum / cis_cnt).astype(matrix.dtype)
    return OEProfile(
        cis_by_separation=cis_mean,
        trans_mean=(trans_sum / trans_cnt) if trans_cnt else np.nan,
    )


def oe_normalize(
    matrix: np.ndarray, chrom_ranges: dict, profile: OEProfile, mask_intra: bool
) -> None:
    """In-place observed/expected division (cis by the separation profile via
    one gathered divide per block, trans by the scalar)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        for start, end in chrom_ranges.values():
            rows = matrix[start:end]
            rows[:, :start] /= profile.trans_mean
            rows[:, end:] /= profile.trans_mean
            cis = rows[:, start:end]
            if mask_intra:
                cis[np.isfinite(cis)] = 1
            else:
                cis /= profile.cis_by_separation[_separations(end - start)]


def scatter_to_full(values: np.ndarray, mask: np.ndarray, fill=np.nan) -> np.ndarray:
    """Place ``values`` at the True positions of ``mask``; ``fill`` elsewhere."""
    out = np.full(mask.shape, fill, dtype=values.dtype)
    out[mask] = values
    return out


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
    expected = estimate_expected(contact_matrix, chrom_ranges)
    data_matrix = contact_matrix
    oe_normalize(data_matrix, chrom_ranges, expected, mask_intra)

    coverages = np.nansum(data_matrix, axis=0)
    selection = coverages > 0
    if not use_covariance:
        # Zero-variance columns cannot be standardized; drop them with the
        # empty ones (robustness addition over the reference, which assumes
        # real Hi-C data where this never happens).
        with np.errstate(invalid="ignore"):
            col_std = np.nanstd(
                np.where(np.isfinite(data_matrix), data_matrix, np.nan), axis=0
            )
        selection &= np.nan_to_num(col_std) > 0
    data_matrix = data_matrix[:, selection]
    with np.errstate(invalid="ignore", divide="ignore"):
        data_matrix[np.isinf(data_matrix)] = np.nan
        data_matrix[...] -= np.nanmean(data_matrix, axis=0)
        if not use_covariance:
            data_matrix[...] /= np.nanstd(data_matrix, axis=0)
    # Mean-impute scattered invalid entries (empty expected diagonals on
    # sparse matrices leave NaNs inside otherwise-valid rows; a nansum-based
    # iteration would discard every such row).  After centering, the column
    # mean is 0.
    data_matrix[~np.isfinite(data_matrix)] = 0.0

    LOG.info(
        "Kept %d of %d bins (nonzero coverage%s)",
        data_matrix.shape[1],
        len(selection),
        "" if use_covariance else " and variance",
    )

    vector, iters, delta = leading_singular_vector(
        data_matrix, tol=svd_tolerance, max_iters=max_iters
    )
    LOG.info("Power iteration: %d steps, final delta %.2g", iters, delta)

    pc1 = data_matrix @ vector
    ev1 = scatter_to_full(vector, selection)

    # pc1 comes out multiplied by the first singular value; rescale so that
    # var(pc1) equals the explained-variance ratio.
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
    contact_matrix = np.ascontiguousarray(matrix[:, :], dtype=np.float32)
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

    # Output contract (columns, separators, NaN spelling, aux keys) follows
    # the reference tool so downstream comparisons are drop-in.
    table = bins[["chrom", "start", "end"]].copy()
    table["ev1"] = ev1
    table["pc1"] = pc1
    table.to_csv(
        output, sep="\t", float_format="%g", na_rep="nan", index=False
    )

    if aux_output:
        with open(aux_output, "w") as file:
            json.dump(
                {
                    "explained_variance_ratio": float(evr),
                    "cis_decay_profile": np.asarray(
                        expected.cis_by_separation, dtype=float
                    ).tolist(),
                    "trans_contact": expected.trans_mean,
                },
                file,
            )


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
