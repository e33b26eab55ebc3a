"""Pressure-Poisson solvers: red-black SOR (reference-faithful flavors),
Jacobi, and geometric multigrid."""

from cfd_tpu.poisson.sor import (
    SORConfig,
    make_eps_neumann_poisson,
    make_ghost_poisson,
)

__all__ = [
    "SORConfig",
    "make_eps_neumann_poisson",
    "make_ghost_poisson",
]
