"""Compute ops: color algebra, ray generation, intersection, shading,
acceleration structures, scans/sorts, and Pallas TPU kernels."""
