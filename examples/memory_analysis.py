"""Compartment-memory analysis across consecutive cell cycles.

The reference paper's headline experiment (Fujishiro & Sasai 2025,
"Three-dimensional memory of nuclear organization through cell cycles"):
run N consecutive cycles (`cli cycles -n N`), derive each cycle's PC1
compartment profile, and measure how strongly compartments correlate from
one cycle to the next — the 3D memory carried through mitosis by the
anaphase hand-off.

    python examples/memory_analysis.py mem_cell_0.h5 mem_cell_1.h5 ...

Writes per-cycle `<stem>.cool` / `<stem>_haploid.cool` / `<stem>_pc1.tsv`
next to each trajectory and prints the cycle-to-cycle PC1 correlation
matrix (sign-aligned: PC1 eigenvector sign is arbitrary per run).
"""

import pathlib
import sys

import numpy as np


def pc1_of(trajectory: str) -> np.ndarray:
    from genome_cycle_tpu.analysis import cool as cool_mod
    from genome_cycle_tpu.analysis import dephase as dephase_mod
    from genome_cycle_tpu.analysis import pc1 as pc1_mod

    stem = pathlib.Path(trajectory).with_suffix("")
    cool_path = f"{stem}.cool"
    hap_path = f"{stem}_haploid.cool"
    pc1_path = f"{stem}_pc1.tsv"
    cool_mod.main(output=cool_path, input_sims=[trajectory])
    dephase_mod.main(output=hap_path, input=cool_path)
    pc1_mod.main(cool=hap_path, output=pc1_path)
    table = np.genfromtxt(pc1_path, names=True, dtype=None, encoding=None)
    return np.asarray(table["pc1"], float)


def main(paths):
    if len(paths) < 2:
        sys.exit("need at least two cycle trajectories")
    profiles = [pc1_of(p) for p in paths]
    n = len(profiles)
    print("\ncycle-to-cycle PC1 correlation (|r|, sign-aligned):")
    header = "      " + "  ".join(f"cyc{j}" for j in range(n))
    print(header)
    for i in range(n):
        row = [f"cyc{i}"]
        for j in range(n):
            a, b = profiles[i], profiles[j]
            ok = np.isfinite(a) & np.isfinite(b)
            r = float(np.corrcoef(a[ok], b[ok])[0, 1])
            row.append(f"{abs(r):4.2f}")
        print("  ".join(row))

    # Shuffled control: the same adjacent-cycle comparison with one profile
    # bin-permuted destroys the positional correspondence — its |r| is the
    # chance level the memory signal must exceed.
    rng = np.random.default_rng(0)
    real, ctrl = [], []
    for i in range(n - 1):
        a, b = profiles[i], profiles[i + 1]
        ok = np.isfinite(a) & np.isfinite(b)
        a, b = a[ok], b[ok]
        real.append(abs(float(np.corrcoef(a, b)[0, 1])))
        ctrl.append(
            np.mean([
                abs(float(np.corrcoef(a, rng.permutation(b))[0, 1]))
                for _ in range(20)
            ])
        )
    print(
        f"\nadjacent-cycle memory: mean |r| = {np.mean(real):.3f} "
        f"(shuffled-control chance level {np.mean(ctrl):.3f})"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
