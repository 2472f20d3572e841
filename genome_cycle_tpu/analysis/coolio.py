"""Minimal cooler-format (.cool) reader/writer + ICE matrix balancing.

The upstream analysis layer depends on the `cooler` package
(src/cool.py, src/dephase.py, src/pc1.py, src/nci.py of the reference);
that package is not available in this environment, so this module implements
the documented single-resolution cooler HDF5 schema directly:

    /chroms/name, /chroms/length
    /bins/chrom (enum-coded int32), /bins/start, /bins/end [, /bins/weight]
    /pixels/bin1_id, /pixels/bin2_id, /pixels/count
    /indexes/chrom_offset, /indexes/bin1_offset
    root attrs: format, format-version, bin-type, bin-size, nbins, nchroms,
    nnz, storage-mode ("symmetric-upper"), sum

plus multi-resolution container paths (``file.mcool::/resolutions/<res>``)
for reading experimental inputs.  Write output is schema-compatible so real
cooler/HiGlass tooling can open our files; the reader handles files produced
by cooler itself.

Balancing is iterative correction (ICE): divisive bin weights w with
(w C w) having unit marginals, stored in /bins/weight like
``cooler.balance_cooler(..., store=True)``.
"""

from __future__ import annotations

import datetime
from typing import Iterable, Optional

import h5py
import numpy as np
import pandas as pd

_STR = h5py.string_dtype(encoding="utf-8")


def _split_uri(uri: str) -> tuple[str, str]:
    if "::" in uri:
        path, group = uri.split("::", 1)
        if not group.startswith("/"):
            group = "/" + group
        return path, group
    return uri, "/"


def create_cooler(uri: str, bins: pd.DataFrame, pixels_iter, assembly=None):
    """Create a .cool dataset from bins and an iterable of pixel chunks.

    ``bins``: DataFrame with chrom/start/end columns (chrom order defines
    chromosome order).  ``pixels_iter``: iterable of dicts or DataFrames with
    bin1_id/bin2_id/count; duplicate (bin1, bin2) entries are merged by
    summation (matching ``cooler.create_cooler`` aggregation semantics).
    """
    path, group = _split_uri(uri)
    bins = bins.reset_index(drop=True)
    n_bins = len(bins)

    chrom_names = list(pd.unique(bins["chrom"].astype(str)))
    chrom_ids = {name: k for k, name in enumerate(chrom_names)}
    bin_chrom_ids = bins["chrom"].astype(str).map(chrom_ids).to_numpy(np.int32)
    # chrom length = max bin end per chromosome
    lengths = np.zeros(len(chrom_names), dtype=np.int64)
    ends = bins["end"].to_numpy()
    np.maximum.at(lengths, bin_chrom_ids, ends)

    # Accumulate + merge pixels (in-memory; simulation-scale data).
    keys_all, counts_all = [], []
    for chunk in pixels_iter:
        if isinstance(chunk, pd.DataFrame):
            b1 = chunk["bin1_id"].to_numpy()
            b2 = chunk["bin2_id"].to_numpy()
            ct = chunk["count"].to_numpy()
        else:
            b1 = np.asarray(chunk["bin1_id"])
            b2 = np.asarray(chunk["bin2_id"])
            ct = np.asarray(chunk["count"])
        if len(b1) == 0:
            continue
        # Upper-triangular storage.
        lo = np.minimum(b1, b2).astype(np.int64)
        hi = np.maximum(b1, b2).astype(np.int64)
        keys_all.append(lo * n_bins + hi)
        counts_all.append(ct)

    if keys_all:
        keys = np.concatenate(keys_all)
        counts = np.concatenate(counts_all)
        uniq, inverse = np.unique(keys, return_inverse=True)
        sums = np.bincount(inverse, weights=counts.astype(np.float64))
        bin1 = (uniq // n_bins).astype(np.int64)
        bin2 = (uniq % n_bins).astype(np.int64)
        counts = np.rint(sums).astype(np.int64)
    else:
        bin1 = bin2 = np.zeros(0, np.int64)
        counts = np.zeros(0, np.int64)

    widths = ends - bins["start"].to_numpy()
    binsize = int(widths.max()) if n_bins else 0
    uniform = n_bins > 0 and (widths == binsize).sum() >= n_bins - len(chrom_names)

    mode = "w" if group == "/" else "a"
    with h5py.File(path, mode) as f:
        grp = f.require_group(group) if group != "/" else f
        for key in ("chroms", "bins", "pixels", "indexes"):
            if key in grp:
                del grp[key]

        grp.create_dataset("chroms/name", data=np.asarray(chrom_names, object), dtype=_STR)
        grp.create_dataset("chroms/length", data=lengths)
        grp.create_dataset("bins/chrom", data=bin_chrom_ids)
        grp.create_dataset("bins/start", data=bins["start"].to_numpy(np.int64))
        grp.create_dataset("bins/end", data=bins["end"].to_numpy(np.int64))
        grp.create_dataset("pixels/bin1_id", data=bin1)
        grp.create_dataset("pixels/bin2_id", data=bin2)
        grp.create_dataset("pixels/count", data=counts)

        chrom_offset = np.searchsorted(
            bin_chrom_ids, np.arange(len(chrom_names) + 1), side="left"
        ).astype(np.int64)
        bin1_offset = np.searchsorted(
            bin1, np.arange(n_bins + 1), side="left"
        ).astype(np.int64)
        grp.create_dataset("indexes/chrom_offset", data=chrom_offset)
        grp.create_dataset("indexes/bin1_offset", data=bin1_offset)

        grp.attrs["format"] = "HDF5::Cooler"
        grp.attrs["format-version"] = np.int64(3)
        grp.attrs["bin-type"] = "fixed" if uniform else "variable"
        grp.attrs["bin-size"] = np.int64(binsize)
        grp.attrs["storage-mode"] = "symmetric-upper"
        grp.attrs["nbins"] = np.int64(n_bins)
        grp.attrs["nchroms"] = np.int64(len(chrom_names))
        grp.attrs["nnz"] = np.int64(len(bin1))
        grp.attrs["sum"] = np.int64(counts.sum())
        grp.attrs["generated-by"] = "genome_cycle_tpu"
        grp.attrs["creation-date"] = datetime.datetime.now().isoformat()
        if assembly:
            grp.attrs["genome-assembly"] = assembly


class _MatrixSelector:
    def __init__(self, clr: "Cooler", balance: bool):
        self._clr = clr
        self._balance = balance

    def __getitem__(self, key):
        if not isinstance(key, tuple) or len(key) != 2:
            raise TypeError("matrix selector expects [rows, cols] slices")
        r, c = key
        n = self._clr.nbins

        def bounds(s):
            if isinstance(s, slice):
                return s.indices(n)[0], s.indices(n)[1]
            return int(s), int(s) + 1

        r0, r1 = bounds(r)
        c0, c1 = bounds(c)
        return self._clr._fetch_dense(r0, r1, c0, c1, self._balance)

    @property
    def shape(self):
        return (self._clr.nbins, self._clr.nbins)


class Cooler:
    """Read-side API mirroring the subset of ``cooler.Cooler`` used by the
    reference analysis scripts: bins()/chromnames/extent()/matrix()/pixels()/
    info."""

    def __init__(self, uri: str):
        self.uri = uri
        self._path, self._group = _split_uri(uri)
        with h5py.File(self._path, "r") as f:
            grp = f[self._group]
            self._chrom_names = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in grp["chroms/name"][:]
            ]
            self._chrom_offset = grp["indexes/chrom_offset"][:]
            self._bin1_offset = grp["indexes/bin1_offset"][:]
            self.nbins = int(grp.attrs.get("nbins", len(grp["bins/start"])))
            self.info = dict(grp.attrs)

    @property
    def chromnames(self):
        return list(self._chrom_names)

    def extent(self, chrom: str) -> tuple[int, int]:
        k = self._chrom_names.index(chrom)
        return int(self._chrom_offset[k]), int(self._chrom_offset[k + 1])

    def bins(self):
        with h5py.File(self._path, "r") as f:
            grp = f[self._group]
            chrom_ids = grp["bins/chrom"][:]
            data = {
                "chrom": np.asarray(self._chrom_names, object)[chrom_ids],
                "start": grp["bins/start"][:],
                "end": grp["bins/end"][:],
            }
            if "bins/weight" in grp:
                data["weight"] = grp["bins/weight"][:]
        return _SliceableFrame(pd.DataFrame(data))

    def pixels(self):
        with h5py.File(self._path, "r") as f:
            grp = f[self._group]
            frame = pd.DataFrame(
                {
                    "bin1_id": grp["pixels/bin1_id"][:],
                    "bin2_id": grp["pixels/bin2_id"][:],
                    "count": grp["pixels/count"][:],
                }
            )
        return _SliceableFrame(frame)

    def matrix(self, balance=True):
        return _MatrixSelector(self, balance)

    def pixel_slice(self, r0: int, r1: int):
        """(bin1, bin2, count) arrays for pixels whose bin1 lies in [r0, r1).

        Upper-triangular pixels are sorted by bin1, so this is a single
        contiguous HDF5 read via the bin1_offset index — no dense matrix."""
        lo = int(self._bin1_offset[r0])
        hi = int(self._bin1_offset[r1])
        with h5py.File(self._path, "r") as f:
            grp = f[self._group]
            return (
                grp["pixels/bin1_id"][lo:hi],
                grp["pixels/bin2_id"][lo:hi],
                grp["pixels/count"][lo:hi],
            )

    def _fetch_dense(self, r0, r1, c0, c1, balance):
        with h5py.File(self._path, "r") as f:
            grp = f[self._group]
            # Rows of the upper-triangular pixel list intersecting the query:
            # both (r in rows) and (r in cols) orientations are needed.
            out = np.zeros((r1 - r0, c1 - c0), dtype=np.float64)

            # Direct part: pixels with bin1 in rows, bin2 in cols.
            lo = self._bin1_offset[r0]
            hi = self._bin1_offset[r1]
            b1_ids = grp["pixels/bin1_id"][lo:hi]
            b2_ids = grp["pixels/bin2_id"][lo:hi]
            cts = grp["pixels/count"][lo:hi]
            sel = (b2_ids >= c0) & (b2_ids < c1)
            np.add.at(
                out,
                (b1_ids[sel] - r0, b2_ids[sel] - c0),
                cts[sel].astype(np.float64),
            )
            # Symmetric part: pixels with bin1 in cols, bin2 in rows.
            lo = self._bin1_offset[c0]
            hi = self._bin1_offset[c1]
            b1_ids = grp["pixels/bin1_id"][lo:hi]
            b2_ids = grp["pixels/bin2_id"][lo:hi]
            cts = grp["pixels/count"][lo:hi]
            sel = (b2_ids >= r0) & (b2_ids < r1) & (b1_ids != b2_ids)
            np.add.at(
                out,
                (b2_ids[sel] - r0, b1_ids[sel] - c0),
                cts[sel].astype(np.float64),
            )

            if balance:
                if "bins/weight" not in grp:
                    raise ValueError("no balancing weights; run balance_cooler")
                w = grp["bins/weight"][:]
                out *= w[r0:r1, None] * w[None, c0:c1]
        return out


class _SliceableFrame:
    """cooler-style lazy table: supports [:] and [a:b] selection."""

    def __init__(self, frame: pd.DataFrame):
        self._frame = frame

    def __getitem__(self, key):
        if isinstance(key, slice):
            return self._frame.iloc[key].reset_index(drop=True)
        return self._frame[key]

    def __len__(self):
        return len(self._frame)


def balance_cooler(
    clr: Cooler,
    store: bool = True,
    max_iters: int = 200,
    tol: float = 1e-5,
    mad_max: float = 5.0,
):
    """ICE balancing with divisive weights; masks zero-coverage and
    MAD-outlier bins like cooler's default filtering."""
    pixels = clr.pixels()[:]
    n = clr.nbins
    b1 = pixels["bin1_id"].to_numpy()
    b2 = pixels["bin2_id"].to_numpy()
    counts = pixels["count"].to_numpy(np.float64)

    coverage = np.zeros(n)
    np.add.at(coverage, b1, counts)
    np.add.at(coverage, b2, counts * (b1 != b2))

    mask = coverage > 0
    if mask.sum() > 1:
        logc = np.log(coverage[mask])
        med = np.median(logc)
        mad = np.median(np.abs(logc - med)) * 1.4826
        if mad > 0:
            mask_ids = np.where(mask)[0]
            mask[mask_ids[np.abs(logc - med) > mad_max * mad]] = False

    w = np.where(mask, 1.0, 0.0)
    for _ in range(max_iters):
        vals = counts * w[b1] * w[b2]
        marg = np.zeros(n)
        np.add.at(marg, b1, vals)
        np.add.at(marg, b2, vals * (b1 != b2))
        nz = marg[mask]
        if len(nz) == 0:
            break
        scale = nz.mean()
        adj = np.ones(n)
        adj[mask] = np.where(nz > 0, nz / scale, 1.0)
        w = w / np.sqrt(adj)
        if np.abs(nz / scale - 1.0).max() < tol:
            break

    # Normalize to unit marginals.
    vals = counts * w[b1] * w[b2]
    marg = np.zeros(n)
    np.add.at(marg, b1, vals)
    np.add.at(marg, b2, vals * (b1 != b2))
    nzm = marg[mask & (marg > 0)]
    if len(nzm):
        w = w / np.sqrt(nzm.mean())

    weights = np.where(mask, w, np.nan)
    if store:
        with h5py.File(clr._path, "r+") as f:
            grp = f[clr._group]
            if "bins/weight" in grp:
                del grp["bins/weight"]
            grp.create_dataset("bins/weight", data=weights)
    return weights
