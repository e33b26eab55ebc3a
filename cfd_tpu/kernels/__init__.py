"""Pallas TPU kernels for the hot stencil operations."""

from cfd_tpu.kernels.rb_smoother import make_rb_pairs, rb_pairs_for_level

__all__ = ["make_rb_pairs", "rb_pairs_for_level"]
