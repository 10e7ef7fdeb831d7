"""Native (C++) runtime components.

The reference's host runtime is C/C++ (parser, scene builder, image writer
— SURVEY §2.1/§2.2); here the same layers exist as a small C++ library with
a plain C ABI, loaded via ctypes (no pybind11). The Python implementations
remain the semantic definition and the fallback: every native path is
asserted byte/bit-identical to its Python twin in tests/test_native.py.

Built on demand with g++ (`python -m raytracing_gpu_tpu.native.build`
to prebuild); the first import compiles once and caches the .so next to
the sources.
"""

from raytracing_gpu_tpu.native.build import available, ensure_built

__all__ = ["available", "ensure_built"]
