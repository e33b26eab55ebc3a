"""Pressure-Poisson solvers: red-black SOR (reference-faithful flavors) and
geometric multigrid with consistent-Dirichlet coarsening."""

from cfd_tpu.poisson.sor import (
    SORConfig,
    make_eps_neumann_poisson,
    make_ghost_poisson,
)
from cfd_tpu.poisson.multigrid import (
    MGConfig,
    PoissonProblem,
    cavity_problem,
    channel_problem,
    neumann_problem,
    make_multigrid_poisson,
)

__all__ = [
    "SORConfig",
    "make_eps_neumann_poisson",
    "make_ghost_poisson",
    "MGConfig",
    "PoissonProblem",
    "cavity_problem",
    "channel_problem",
    "neumann_problem",
    "make_multigrid_poisson",
]
