"""Compute primitives: potentials, forces, neighbor engine, integrator, contacts."""
