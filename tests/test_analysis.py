"""Analysis toolchain tests: coolio, NCI, PC1, dephase, annotate, GSD."""

import json

import numpy as np
import pandas as pd
import pytest

from genome_cycle_tpu.analysis import coolio
from genome_cycle_tpu.analysis.annotate import (
    AnnotScheme,
    ChromType,
    compute_normalizer,
    design_diploid_chains,
    determine_chromatin_type,
)
from genome_cycle_tpu.analysis.cyto import (
    CytoCat,
    attach_cyto_category,
    do_extend_nor,
)
from genome_cycle_tpu.analysis.dephase import (
    infer_chromosome_copies,
    make_mapping,
    make_output_bins,
    _map_bin_ids,
)
from genome_cycle_tpu.analysis.gsdio import (
    GSDReader,
    GSDWriter,
    decode_type_names,
    encode_type_names,
    write_hoomd_frame,
)
from genome_cycle_tpu.analysis.nci import compute_nci, make_nci_track
from genome_cycle_tpu.analysis.pc1 import compute_pc1, power_svd


def make_bins(chroms):
    rows = []
    for chrom, n in chroms:
        for i in range(n):
            rows.append((chrom, i * 100, (i + 1) * 100))
    return pd.DataFrame(rows, columns=["chrom", "start", "end"])


def test_cool_round_trip(tmp_path):
    bins = make_bins([("chr1:a", 5), ("chr2:a", 3)])
    pixels = [
        {"bin1_id": [0, 0, 1], "bin2_id": [1, 2, 1], "count": [3, 2, 7]},
        {"bin1_id": [1, 6], "bin2_id": [0, 7], "count": [1, 5]},  # dup (0,1) via (1,0)
    ]
    path = str(tmp_path / "test.cool")
    coolio.create_cooler(path, bins, iter(pixels))
    clr = coolio.Cooler(path)
    assert clr.chromnames == ["chr1:a", "chr2:a"]
    assert clr.extent("chr2:a") == (5, 8)
    mat = clr.matrix(balance=False)[:, :]
    assert mat[0, 1] == 4  # 3 + 1 merged across orientations
    assert mat[1, 0] == 4  # symmetric fetch
    assert mat[1, 1] == 7  # diagonal once
    assert mat[6, 7] == 5
    # Partial window fetch agrees with the full matrix.
    sub = clr.matrix(balance=False)[0:3, 5:8]
    np.testing.assert_array_equal(sub, mat[0:3, 5:8])


def test_balance_unit_marginals(tmp_path, rng):
    # Random symmetric matrix with strong per-bin biases: after ICE the
    # balanced marginals must be ~equal.
    n = 20
    bias = rng.uniform(0.2, 3.0, n)
    base = rng.poisson(40, size=(n, n)) + 1
    counts = np.triu((base + base.T) * np.outer(bias, bias), 0).astype(int)
    iu, ju = np.nonzero(counts)
    bins = make_bins([("chr1:a", n)])
    path = str(tmp_path / "b.cool")
    coolio.create_cooler(
        path,
        bins,
        [{"bin1_id": iu, "bin2_id": ju, "count": counts[iu, ju]}],
    )
    clr = coolio.Cooler(path)
    w = coolio.balance_cooler(clr, store=True)
    assert np.isfinite(w).all()
    mat = clr.matrix(balance=True)[:, :]
    marg = np.nansum(mat, axis=0)
    assert marg.std() / marg.mean() < 0.01
    assert marg.mean() == pytest.approx(1.0, rel=0.05)


def test_nci_formula(tmp_path):
    # nci(i) = c[i,i+1]/sqrt(c[i,i] c[i+1,i+1]) on the raw matrix.
    n = 6
    mat = np.zeros((n, n), int)
    diag = [4, 9, 16, 25, 36, 49]
    sub = [6, 12, 20, 30, 42]
    for i in range(n):
        mat[i, i] = diag[i]
    for i in range(n - 1):
        mat[i, i + 1] = sub[i]
    iu, ju = np.triu_indices(n)
    sel = mat[iu, ju] > 0
    bins = make_bins([("chr1", n)])
    path = str(tmp_path / "n.cool")
    coolio.create_cooler(
        path, bins, [{"bin1_id": iu[sel], "bin2_id": ju[sel], "count": mat[iu, ju][sel]}]
    )
    clr = coolio.Cooler(path)
    nci = compute_nci(clr.matrix(balance=False), 0, n, chunk_size=3)
    expected = [s / np.sqrt(diag[i] * diag[i + 1]) for i, s in enumerate(sub)]
    np.testing.assert_allclose(nci, expected, rtol=1e-6)
    # Track bins span pairs of input bins; halving removes overlaps.
    track = make_nci_track(clr, "chr1", halve=False)
    assert len(track) == n - 1
    assert track["start"].iloc[0] == 0 and track["end"].iloc[0] == 200
    halved = make_nci_track(clr, "chr1", halve=True)
    starts, ends = halved["start"].values, halved["end"].values
    assert (starts[1:] >= ends[:-1]).all()  # no overlaps


def test_power_svd_matches_numpy(rng):
    data = rng.normal(size=(40, 15))
    for svd in power_svd(data):
        if svd.delta < 1e-10 or svd.step > 5000:
            break
    _, _, vt = np.linalg.svd(data, full_matrices=False)
    v1 = vt[0]
    # Sign-invariant comparison.
    dot = abs(float(np.dot(svd.vector, v1)))
    assert dot == pytest.approx(1.0, abs=1e-6)


def test_pc1_recovers_compartments(rng):
    # Synthetic two-compartment checkerboard: PC1 sign must track compartments.
    # Use blocks (not strict alternation, which the per-diagonal O/E expected
    # normalization would absorb completely).
    n = 60
    comp = np.where((np.arange(n) // 6) % 2 == 0, 1.0, -1.0)
    base = np.exp(-np.abs(np.subtract.outer(np.arange(n), np.arange(n))) / 10.0)
    mat = base * (1 + 0.4 * np.outer(comp, comp))
    mat += rng.normal(0, 0.01, (n, n))
    mat = ((mat + mat.T) / 2 * 1000).astype(np.float32)
    pc1, ev1, evr, expected = compute_pc1(
        mat.copy(), {"chr1": (0, n)}, svd_tolerance=1e-8
    )
    corr = np.corrcoef(pc1, comp)[0, 1]
    assert abs(corr) > 0.95
    assert 0 < evr <= 1
    assert np.var(pc1) == pytest.approx(evr, rel=1e-3)


def test_dephase_mapping():
    bins = make_bins([("chr1:a", 4), ("chr1:b", 4), ("chr2:a", 2), ("nucleoli", 3)])
    copies = infer_chromosome_copies(["chr1:a", "chr1:b", "chr2:a"])
    assert copies == {"chr1": ["a", "b"], "chr2": ["a"]}
    out_bins = make_output_bins(bins, copies)
    assert list(out_bins["chrom"].unique()) == ["chr1", "chr2"]
    assert len(out_bins) == 6
    mapping = make_mapping(bins, out_bins, copies)
    # chr1:b bin 5 maps onto haploid chr1 bin 1; nucleoli unmapped.
    mapped = _map_bin_ids(np.asarray([0, 5, 8, 9, 11]), mapping)
    assert mapped.tolist() == [0, 1, 4, 5, -1]


def test_annotate_typing():
    assert determine_chromatin_type(2.0, 0.5, []) == ChromType.A
    assert determine_chromatin_type(-2.0, 0.5, []) == ChromType.B
    assert determine_chromatin_type(0.2, 0.5, []) == ChromType.U
    # NaN -> tag heuristics (the reference's broken line 86 would TypeError here).
    assert determine_chromatin_type(np.nan, 0, ["cen"]) == ChromType.B
    assert determine_chromatin_type(np.nan, 0, ["anor"]) == ChromType.A
    assert determine_chromatin_type(np.nan, 0, ["bnor"]) == ChromType.B
    assert determine_chromatin_type(np.nan, 0, []) == ChromType.U


def test_diploid_chain_design():
    chains = design_diploid_chains(["chr1", "chr2", "chrX"], ["chr2:a"])
    names = [c.name for c in chains]
    assert names == ["chr1:a", "chr2:a", "chrX:a", "chr1:b", "chr2:b", "chrX:b"]
    by_name = {c.name: c for c in chains}
    assert by_name["chr2:a"].activate_nor
    assert not by_name["chr2:b"].activate_nor
    assert by_name["chrX:a"].annot_scheme == AnnotScheme.SINGLE_CHROM
    assert by_name["chrX:b"].annot_scheme == AnnotScheme.ALL_B
    # With chrY: no Xb, chrY gets a :b copy.
    chains_y = design_diploid_chains(["chr1", "chrX", "chrY"], [])
    names_y = [c.name for c in chains_y]
    assert "chrX:b" not in names_y and "chrY:b" in names_y


def test_normalizer_median_mad():
    vals = np.asarray([1.0, 2.0, 3.0, 4.0, 100.0])
    center, scale = compute_normalizer(vals)
    assert center == 3.0
    assert scale == pytest.approx(1.0 * 1.4826)


def test_cyto_categories():
    nci = pd.DataFrame(
        {
            "chrom": ["chr1"] * 5,
            "start": [0, 100, 200, 300, 400],
            "end": [100, 200, 300, 400, 500],
            "score": [1.0] * 5,
        }
    )
    bands = pd.DataFrame(
        {
            "chrom": ["chr1"] * 3,
            "start": [0, 200, 300],
            "end": [200, 300, 500],
            "name": ["p1", "p2", "q1"],
            "stain": ["stalk", "acen", "gpos50"],
        }
    )
    out = attach_cyto_category(nci, bands)
    assert out["cat"].tolist() == [
        CytoCat.NOR,
        CytoCat.NOR,
        CytoCat.CEN,
        CytoCat.HET,
        CytoCat.HET,
    ]
    # extend_nor marks the whole p-arm NOR.
    extended = do_extend_nor(out)
    assert extended["cat"].tolist()[:2] == [CytoCat.NOR, CytoCat.NOR]


def test_gsd_round_trip(tmp_path, rng):
    path = str(tmp_path / "t.gsd")
    pos0 = rng.normal(size=(7, 3)).astype(np.float32)
    pos1 = rng.normal(size=(7, 3)).astype(np.float32)
    with GSDWriter(path) as w:
        for step, pos in [(0, pos0), (1000, pos1)]:
            write_hoomd_frame(
                w,
                step=step,
                box=(100, 100, 100, 0, 0, 0),
                positions=pos,
                type_ids=np.arange(7) % 2,
                type_names=["arm", "kinetochore"],
                bond_pairs=np.asarray([[0, 1], [1, 2]]),
                bond_type_ids=[0, 0],
                bond_type_names=["chrom"],
            )
    with GSDReader(path) as r:
        assert r.schema == "hoomd"
        assert r.nframes == 2
        np.testing.assert_array_equal(r.chunk(1, "particles/position"), pos1)
        assert int(r.chunk(1, "configuration/step")[0]) == 1000
        assert decode_type_names(r.chunk(0, "particles/types")) == [
            "arm",
            "kinetochore",
        ]
        np.testing.assert_array_equal(
            r.chunk(0, "bonds/group"), [[0, 1], [1, 2]]
        )


def test_encode_decode_type_names():
    names = ["unknown", "a", "nucleolus"]
    assert decode_type_names(encode_type_names(names)) == names
