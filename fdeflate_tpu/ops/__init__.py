"""Compute primitives: bit I/O, checksums, and TPU kernels."""
