"""Solvers: Dai-Yuan conjugate-gradient ptychography reconstruction."""

from tikejax.solvers.cg import CGOptions, run
from tikejax.solvers.tiered import reconstruct

__all__ = ["CGOptions", "run", "reconstruct"]
