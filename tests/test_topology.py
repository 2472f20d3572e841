import numpy as np
import pytest

from genome_cycle_tpu.config import default_config, parse_config
from genome_cycle_tpu.topology import (
    INTERPHASE_TYPES,
    MITOTIC_TYPES,
    compile_topology,
    derive_stage_seeds,
    load_chains,
    seed_seq_generate,
)


def make_chains_tsv(n_beads=400, cen_at=(180, 220), nor=False):
    lines = ["chain\tstart\tend\tA\tB\ttags"]
    for i in range(n_beads):
        tags = []
        if cen_at[0] <= i < cen_at[1]:
            tags.append("cen")
        elif nor and i < 10:
            tags.append("anor")
        tags.append("A" if i % 2 == 0 else "B")
        a, b = (1.0, 0.0) if i % 2 == 0 else (0.0, 1.0)
        lines.append(f"chr1:a\t{i * 100000}\t{(i + 1) * 100000}\t{a}\t{b}\t{','.join(tags)}")
    return "\n".join(lines) + "\n"


def test_load_chains_grouping():
    text = (
        "chain\tstart\tend\tA\tB\ttags\n"
        "chr1:a\t0\t100\t1\t0\tA\n"
        "chr1:a\t100\t200\t0\t1\tB\n"
        "chr2:a\t0\t100\t0.5\t0.5\tu\n"
    )
    defs = load_chains(text)
    assert [c.name for c in defs.chains] == ["chr1:a", "chr2:a"]
    assert len(defs.chains[0].beads) == 2
    assert defs.chains[0].beads[1].b_factor == 1.0
    assert defs.source == text


def test_tag_priority():
    # First matching tag in priority order anor > bnor > cen > A > B > u
    # (prepare.cpp:175-197). A bead tagged "cen,A" must be centromere.
    text = (
        "chain\tstart\tend\tA\tB\ttags\n"
        "chr1:a\t0\t100\t1\t0\tcen,A\n"
        "chr1:a\t100\t200\t1\t0\tanor,cen\n"
        "chr1:a\t200\t300\t0\t1\tbnor,B\n"
    )
    topo = compile_topology(load_chains(text), default_config())
    types = topo.interphase.particle_types
    assert types[0] == INTERPHASE_TYPES["centromere"]
    assert types[1] == INTERPHASE_TYPES["active_nor"]
    assert types[2] == INTERPHASE_TYPES["silent_nor"]


def test_nucleolar_particles_appended():
    text = make_chains_tsv(nor=True)
    cfg = default_config()
    topo = compile_topology(load_chains(text), cfg)
    inter = topo.interphase
    n_chain_beads = 400
    n_nors = 10
    # 2 nucleolus beads per active NOR appended after all chain beads.
    assert len(inter.particle_types) == n_chain_beads + 2 * n_nors
    assert (
        inter.particle_types[n_chain_beads:] == INTERPHASE_TYPES["nucleolus"]
    ).all()
    assert inter.nucleolar_bonds.shape == (2 * n_nors, 2)
    # Bond pairs reference the NOR bead and the appended particle.
    assert inter.nucleolar_bonds[0, 0] == 0
    assert inter.nucleolar_bonds[0, 1] == n_chain_beads
    # ab factors of nucleolar particles come from config.
    assert inter.ab_factors[n_chain_beads, 1] == cfg.interphase.nucleolus_ab_factor.b


def test_anatelophase_coarse_graining():
    topo = compile_topology(load_chains(make_chains_tsv()), default_config())
    ana = topo.anatelophase
    assert len(ana.chains) == 1
    chain = ana.chains[0]
    assert chain.end - chain.start == 400 // 100
    # Centromere range [180, 220), midpoint 200 -> coarse offset 2.
    assert chain.kinetochore == 2
    assert ana.particle_types[2] == MITOTIC_TYPES["kinetochore"]
    assert ana.particle_types[0] == MITOTIC_TYPES["arm"]


def test_no_centromere_whole_chain_centromeric(capsys):
    text = (
        "chain\tstart\tend\tA\tB\ttags\n"
        + "\n".join(f"chr9:a\t{i}\t{i + 1}\t1\t0\tA" for i in range(200))
        + "\n"
    )
    topo = compile_topology(load_chains(text), default_config())
    chain = topo.anatelophase.chains[0]
    # Whole chain treated as centromeric: midpoint = (0+200)//2 -> offset 1.
    assert chain.kinetochore - chain.start == 1


def test_prometaphase_sister_layout():
    text = make_chains_tsv() + "".join(
        f"chr2:a\t{i * 100000}\t{(i + 1) * 100000}\t1\t0\tA,cen\n" for i in range(200)
    )
    topo = compile_topology(load_chains(text), default_config())
    pro = topo.prometaphase
    ana = topo.anatelophase
    assert len(pro.chains) == 2 * len(ana.chains)
    assert pro.sister_chromatids.tolist() == [[0, 1], [2, 3]]
    # target_start = anatelo_start * 2 (prepare.cpp:336).
    for i, achain in enumerate(ana.chains):
        target = pro.chains[2 * i]
        sister = pro.chains[2 * i + 1]
        assert target.start == achain.start * 2
        assert sister.start == target.end
        assert sister.name == achain.name + "-copy"
        assert (
            target.kinetochore - target.start
            == achain.kinetochore - achain.start
            == sister.kinetochore - sister.start
        )
    assert len(pro.particle_types) == 2 * len(ana.particle_types)
    # Poles at -/+ spindle_axis.
    np.testing.assert_allclose(pro.pole_positions[0], [0, -5, 0])
    np.testing.assert_allclose(pro.pole_positions[1], [0, 5, 0])


def test_seed_seq_matches_cpp():
    # Golden values generated with g++ (libstdc++) std::seed_seq::generate;
    # the algorithm is fully specified in [rand.util.seedseq] so these hold
    # for any conforming C++ implementation, including the reference's
    # prepare.cpp:549-562 seed derivation.
    assert seed_seq_generate([12345], 3) == [2323448196, 1798476213, 717421070]
    assert seed_seq_generate([42], 4) == [
        735521182,
        3707395978,
        3290902861,
        980519533,
    ]
    seeds = derive_stage_seeds(777)
    assert seeds == {
        "anaphase": 1912111911,
        "interphase": 1721518513,
        "prometaphase": 678404194,
    }
