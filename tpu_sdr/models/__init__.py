"""Demodulator models (receive chains) built from tpu_sdr.ops kernels."""
