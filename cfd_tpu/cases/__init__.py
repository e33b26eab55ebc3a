"""Simulation cases with the reference solvers' constants as defaults."""

from cfd_tpu.cases.cavity import make_cavity_case
from cfd_tpu.cases.channel import make_channel_case
from cfd_tpu.cases.backwards_step import make_backwards_step_case
from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

__all__ = [
    "make_cavity_case",
    "make_channel_case",
    "make_backwards_step_case",
    "make_rayleigh_benard_case",
]
