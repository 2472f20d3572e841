import json

from genome_cycle_tpu.config import (
    ABFactor,
    default_config,
    format_config,
    parse_config,
)


def test_defaults_match_reference():
    # Spot-check defaults against simulation_config.hpp:15-115.
    cfg = default_config()
    m = cfg.mitotic_phase
    assert m.temperature == 1.0
    assert m.timestep == 1e-4
    assert m.anaphase_steps == 200_000
    assert m.telophase_steps == 50_000
    assert m.prometaphase_steps == 400_000
    assert m.coarse_graining == 100
    assert m.core_diameter == 0.3
    assert m.bond_spring == 1000.0
    assert m.spindle_axis == (0.0, 5.0, 0.0)
    assert m.anaphase_spindle_shift == (0.0, 2.0, 0.0)
    assert m.telophase_packing_radius == 1.5

    i = cfg.interphase
    assert i.timestep == 1e-5
    assert i.steps == 700_000
    assert i.relaxation_spacestep == 0.001
    assert i.contactmap_distance == 0.24
    assert i.contactmap_update_interval == 20
    assert i.a_core_diameter == 0.30
    assert i.b_core_diameter == 0.24
    assert i.a_core_bond_spring == 100.0
    assert i.b_core_bond_spring == 50.0
    assert i.core_scale_init == 0.5
    assert i.nucleolus_bead_count == 2
    assert i.nucleolus_ab_factor == ABFactor(0.0, 10.0)
    assert i.wall_semiaxes_init == (2.0, 2.0, 2.0)
    assert i.wall_semiaxes_spring == (3e4, 3e4, 3e4)
    assert i.wall_mobility == 2e-4


def test_parse_partial_json():
    text = json.dumps(
        {
            "interphase": {"steps": 1000, "wall_semiaxes_init": [1, 2, 3]},
            "mitotic_phase": {"anaphase_steps": 5},
        }
    )
    cfg = parse_config(text)
    assert cfg.interphase.steps == 1000
    assert cfg.interphase.wall_semiaxes_init == (1.0, 2.0, 3.0)
    assert cfg.mitotic_phase.anaphase_steps == 5
    # Untouched fields keep defaults.
    assert cfg.interphase.timestep == 1e-5
    assert cfg.source == text


def test_round_trip():
    cfg = parse_config('{"interphase":{"nucleolus_ab_factor":[1.5,2.5]}}')
    text = format_config(cfg)
    cfg2 = parse_config(text)
    assert cfg2.interphase.nucleolus_ab_factor == ABFactor(1.5, 2.5)
    assert format_config(cfg2) == text


def test_second_bond_spring_json_exposed():
    # Documented fix of the reference quirk (SURVEY.md §2.2).
    cfg = parse_config('{"interphase":{"a_core_2nd_bond_spring":7.0}}')
    assert cfg.interphase.a_core_2nd_bond_spring == 7.0
    assert "a_core_2nd_bond_spring" in format_config(cfg)


def test_unknown_key_rejected():
    import pytest

    with pytest.raises(ValueError):
        parse_config('{"interphase":{"no_such_key":1}}')
