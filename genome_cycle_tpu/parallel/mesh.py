"""Mesh construction for the two parallel axes of this domain (SURVEY.md §2.11):

- ``replica``: embarrassingly parallel ensemble of independent cell-cycle
  simulations (the analogue of the reference's multi-file shell-job ensemble,
  src/cool.py merging multiple trajectories) — data parallelism.
- ``beads``: spatial decomposition of one nucleus — each device owns a row
  block of beads, computes the O(N·nbr) pairwise/wall forces for its rows
  against the replicated bead table, and row blocks are re-assembled with an
  all-gather each step.  Wall axial reaction and overflow stats reduce with
  psum.  This is the "sequence parallel" analogue for bead count N.

On a real pod slice the replica axis should map to DCN (independent work)
and the beads axis to ICI (an all-gather of N*3 f32 per step rides the
fast interconnect).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_replicas: int, n_bead_shards: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = n_replicas * n_bead_shards
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for mesh ({n_replicas} replicas x "
            f"{n_bead_shards} bead shards), have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(n_replicas, n_bead_shards)
    return Mesh(grid, axis_names=("replica", "beads"))
