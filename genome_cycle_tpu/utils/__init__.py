"""Utilities: logging, splines, PRNG discipline."""
