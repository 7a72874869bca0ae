"""Solvers: Dai-Yuan conjugate-gradient ptychography reconstruction."""

from tikejax.solvers.cg import CGOptions, run

__all__ = ["CGOptions", "run"]
