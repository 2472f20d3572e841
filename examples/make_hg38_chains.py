"""Generate an hg38-scaled diploid 46-chromosome chains.tsv.

Synthetic stand-in for the reference's annotate.py output (which needs
experimental Hi-C input): real chromosome lengths and centromere positions,
alternating A/B blocks as a neutral compartment pattern, NOR tags on the
acrocentric short arms (chr13/14/15/21/22), and the reference's diploid
layout rules (src/annotate.py:145-209): every autosome as chrN:a + chrN:b,
one active chrX:a, one chrY:b — 46 chains.

    python examples/make_hg38_chains.py [--binsize 1000000] [-o chains.tsv]
"""

import argparse

# (name, length_mb, centromere_mb) — hg38, rounded to 1 Mb.
CHROMS = [
    ("chr1", 249, 123), ("chr2", 242, 93), ("chr3", 198, 90),
    ("chr4", 190, 50), ("chr5", 182, 48), ("chr6", 171, 60),
    ("chr7", 159, 60), ("chr8", 145, 45), ("chr9", 138, 43),
    ("chr10", 134, 40), ("chr11", 135, 53), ("chr12", 133, 36),
    ("chr13", 114, 18), ("chr14", 107, 17), ("chr15", 102, 19),
    ("chr16", 90, 37), ("chr17", 83, 25), ("chr18", 80, 18),
    ("chr19", 59, 26), ("chr20", 64, 28), ("chr21", 47, 12),
    ("chr22", 51, 15), ("chrX", 156, 61), ("chrY", 57, 10),
]
NOR_CHROMS = {"chr13", "chr14", "chr15", "chr21", "chr22"}
AB_BLOCK = 10  # beads per compartment block
CEN_HALF = 2   # centromere half-width in beads
NOR_BEADS = 2  # NOR beads adjacent to the centromere (short-arm side)


def emit_chain(rows, name, copy, length_mb, cen_mb, binsize):
    n = length_mb * 1_000_000 // binsize
    cen = cen_mb * 1_000_000 // binsize
    chrom = name.split("chr")[1]
    inactive_x = name == "chrX" and copy == "b"
    nor = name in NOR_CHROMS
    for i in range(n):
        tags = []
        if cen - CEN_HALF <= i < cen + CEN_HALF:
            tags.append("cen")
            a, b = 0, 1
        elif nor and cen - CEN_HALF - NOR_BEADS <= i < cen - CEN_HALF:
            # NOR on the short arm, active on the :a copy only
            # (annotate --activate-nor semantics).
            tags.append("anor" if copy == "a" else "bnor")
            a, b = (1, 0) if copy == "a" else (0, 1)
        elif inactive_x:
            a, b = 0, 1       # inactive X: all-B (annotate.py:193-200)
        elif (i // AB_BLOCK) % 2 == 0:
            a, b = 1, 0
        else:
            a, b = 0, 1
        if not tags:
            tags.append("A" if a else "B")
        rows.append(
            f"{name}:{copy}\t{i * binsize}\t{(i + 1) * binsize}"
            f"\t{a}\t{b}\t{','.join(tags)}"
        )
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binsize", type=int, default=1_000_000)
    ap.add_argument("-o", "--output", default="examples/hg38_chains.tsv")
    args = ap.parse_args()

    rows = ["chain\tstart\tend\tA\tB\ttags"]
    total = chains = 0
    for name, length, cen in CHROMS:
        copies = (
            ["a"] if name == "chrX" else ["b"] if name == "chrY" else ["a", "b"]
        )
        for copy in copies:
            total += emit_chain(rows, name, copy, length, cen, args.binsize)
            chains += 1
    with open(args.output, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{args.output}: {chains} chains, {total} beads "
          f"at {args.binsize // 1000} kb/bead")


if __name__ == "__main__":
    main()
