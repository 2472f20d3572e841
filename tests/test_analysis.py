"""Analysis toolchain tests: coolio, NCI, PC1, dephase, annotate, GSD."""

import json

import numpy as np
import pandas as pd
import pytest

from genome_cycle_tpu.analysis import coolio
from genome_cycle_tpu.analysis.annotate import (
    SCHEME_ALL_B,
    SCHEME_OWN,
    TYPE_A,
    TYPE_B,
    TYPE_U,
    classify_beads,
    compose_tags,
    mad_normalizer,
    plan_diploid_chains,
)
from genome_cycle_tpu.analysis.cyto import (
    CytoCat,
    attach_cyto_category,
    do_extend_nor,
)
from genome_cycle_tpu.analysis.dephase import project_bins, split_chain_names
from genome_cycle_tpu.analysis.gsdio import (
    GSDReader,
    GSDWriter,
    decode_type_names,
    encode_type_names,
    write_hoomd_frame,
)
from genome_cycle_tpu.analysis.nci import extract_diagonals, make_nci_track, nci_scores
from genome_cycle_tpu.analysis.pc1 import compute_pc1, leading_singular_vector


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
    d, s = extract_diagonals(clr, 0, n)
    np.testing.assert_array_equal(d, diag)
    np.testing.assert_array_equal(s, sub)
    nci = nci_scores(d, s)
    expected = [s / np.sqrt(diag[i] * diag[i + 1]) for i, s in enumerate(sub)]
    np.testing.assert_allclose(nci, expected, rtol=1e-6)
    # Track bins span pairs of input bins; halving removes overlaps.
    track = make_nci_track(clr, "chr1", halve=False)
    assert len(track) == n - 1
    assert track["start"].iloc[0] == 0 and track["end"].iloc[0] == 200
    halved = make_nci_track(clr, "chr1", halve=True)
    starts, ends = halved["start"].values, halved["end"].values
    assert (starts[1:] >= ends[:-1]).all()  # no overlaps


def test_power_iteration_matches_numpy(rng):
    data = rng.normal(size=(40, 15))
    vec, iters, delta = leading_singular_vector(data, tol=1e-10, max_iters=5000)
    assert delta < 1e-10 and iters <= 5000
    _, _, vt = np.linalg.svd(data, full_matrices=False)
    v1 = vt[0]
    # Sign-invariant comparison.
    dot = abs(float(np.dot(vec, v1)))
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
    chroms, suffixes = split_chain_names(bins["chrom"])
    assert chroms.iloc[0] == "chr1" and suffixes.iloc[0] == "a"
    assert pd.isna(suffixes.iloc[-1])  # "nucleoli" has no copy suffix
    out_bins, projection = project_bins(bins)
    assert list(out_bins["chrom"].unique()) == ["chr1", "chr2"]
    assert len(out_bins) == 6
    # chr1:b bin 5 maps onto haploid chr1 bin 1; nucleoli unmapped.
    assert projection[[0, 5, 8, 9, 11]].tolist() == [0, 1, 4, 5, -1]
    # The canonical copy maps onto itself.
    assert projection[:4].tolist() == [0, 1, 2, 3]


def test_annotate_typing():
    none = int(CytoCat.NONE)
    z = np.asarray([2.0, -2.0, 0.2, np.nan, np.nan, np.nan, np.nan])
    cats = np.asarray(
        [none, none, none, int(CytoCat.CEN), int(CytoCat.NOR), int(CytoCat.NOR), none]
    )
    # NOR falls back to A only when the chain's NOR is activated.
    got_on = classify_beads(z, cats, activate_nor=True, tristate=0.5)
    assert got_on.tolist() == [TYPE_A, TYPE_B, TYPE_U, TYPE_B, TYPE_A, TYPE_A, TYPE_U]
    got_off = classify_beads(z, cats, activate_nor=False, tristate=0.5)
    assert got_off.tolist() == [TYPE_A, TYPE_B, TYPE_U, TYPE_B, TYPE_B, TYPE_B, TYPE_U]
    # Tag strings carry the category prefix then the type letter.
    tags = compose_tags(cats, got_on, activate_nor=True)
    assert tags.tolist() == ["A", "B", "u", "cen,B", "anor,A", "anor,A", "u"]
    assert compose_tags(cats, got_off, False).tolist() == [
        "A", "B", "u", "cen,B", "bnor,B", "bnor,B", "u",
    ]


def test_diploid_chain_design():
    chains = plan_diploid_chains(["chr1", "chr2", "chrX"], ["chr2:a"])
    names = [c.name for c in chains]
    assert names == ["chr1:a", "chr2:a", "chrX:a", "chr1:b", "chr2:b", "chrX:b"]
    by_name = {c.name: c for c in chains}
    assert by_name["chr2:a"].activate_nor
    assert not by_name["chr2:b"].activate_nor
    assert by_name["chrX:a"].scheme == SCHEME_OWN
    assert by_name["chrX:b"].scheme == SCHEME_ALL_B
    # With chrY: no Xb, chrY gets a :b copy.
    chains_y = plan_diploid_chains(["chr1", "chrX", "chrY"], [])
    names_y = [c.name for c in chains_y]
    assert "chrX:b" not in names_y and "chrY:b" in names_y


def test_annotate_end_to_end(tmp_path):
    # Two chromosomes, clear A/B signal, a stalk band on chr2 -> anor tags
    # on the activated copy only; output is a diploid chains.tsv.
    from genome_cycle_tpu.analysis import annotate

    rows = []
    for i in range(12):
        rows.append(("chr1", i * 100, (i + 1) * 100, 3.0 if i < 6 else -3.0))
    # chr2 has no NCI coverage at all (rolling-mean smoothing would fill
    # isolated NaNs from neighbours, so only whole-window gaps stay NaN).
    for i in range(6):
        rows.append(("chr2", i * 100, (i + 1) * 100, np.nan))
    nci = pd.DataFrame(rows, columns=["chrom", "start", "end", "score"])
    nci_path = tmp_path / "nci.tsv"
    nci.to_csv(nci_path, sep="\t", index=False)

    bands = pd.DataFrame(
        {
            "chrom": ["chr1", "chr2", "chr2"],
            "start": [0, 0, 200],
            "end": [1200, 200, 600],
            "name": ["q", "p", "q"],
            "stain": ["gneg", "stalk", "gneg"],
        }
    )
    band_path = tmp_path / "bands.tsv"
    bands.to_csv(band_path, sep="\t", index=False, header=False)

    out_path = tmp_path / "chains.tsv"
    annotate.main(
        tristate=0.5,
        activate_nor=["chr2:a"],
        output_filename=str(out_path),
        nci_filename=str(nci_path),
        band_filename=str(band_path),
    )
    table = pd.read_csv(out_path, sep="\t")
    assert list(table["chain"].unique()) == ["chr1:a", "chr2:a", "chr1:b", "chr2:b"]
    chr1a = table[table["chain"] == "chr1:a"]
    # High-score beads are A=(1,0); low-score beads B=(0,1) (smoothing blurs
    # the boundary, so check the outer beads).
    assert (chr1a["A"].values[:2] == 1.0).all() and (chr1a["B"].values[:2] == 0.0).all()
    assert (chr1a["A"].values[-1:] == 0.0).all() and (chr1a["B"].values[-1:] == 1.0).all()
    # NaN-score stalk beads: anor on the activated copy, bnor on the other.
    chr2a = table[table["chain"] == "chr2:a"]
    chr2b = table[table["chain"] == "chr2:b"]
    assert chr2a["tags"].values[0].startswith("anor,")
    assert chr2b["tags"].values[0].startswith("bnor,")


def test_normalizer_median_mad():
    vals = np.asarray([1.0, 2.0, 3.0, 4.0, 100.0])
    center, scale = mad_normalizer(vals)
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
