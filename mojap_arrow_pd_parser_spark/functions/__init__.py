"""Scalar functions + codec kernels."""
