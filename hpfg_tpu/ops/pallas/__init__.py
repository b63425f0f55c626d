"""Pallas TPU kernels for the hot non-convolution ops."""

from hpfg_tpu.ops.pallas.window_attention import window_attention  # noqa: F401
