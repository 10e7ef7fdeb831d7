"""Color algebra in the reference's two quantization regimes.

The reference stores colors as floats pre-scaled to [0,255] and clamps at
EVERY operation (cpu/colors.c:3-49); the GPU variant uses saturating uint8
(gpu/colors.cu:3-49). That per-op clamping is destructive for gradients, so
this module provides both:

- `match` ops: float arrays in the [0,255] domain, clamped per-op with the
  exact same arithmetic order as cpu/colors.c, so renders truncate to the
  same uint8 values as the oracle.
- `smooth` ops: linear radiometric floats, no intermediate clamping; the
  final image is clamped once. Differentiable end-to-end.

Colors are (...,3) arrays. All functions are shape-polymorphic and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


# --- match mode: [0,255] domain, clamp-at-every-op (cpu/colors.c) ---


def m_init(c):
    """init_color (cpu/colors.c:3-22): c in 'unit' domain -> clamp(c*255, 0, 255)."""
    return jnp.clip(c * 255.0, 0.0, 255.0)


def m_add(a, b):
    """color_add (cpu/colors.c:24-36): a+b, upper clamp only (inputs are >=0)."""
    return jnp.minimum(a + b, 255.0)


def m_mul(a, coef):
    """color_mul (cpu/colors.c:38-41): init_color(a/255*coef) — literal order."""
    return m_init((a / 255.0) * coef)


def m_mul2(a, b):
    """color_mul2 (cpu/colors.c:43-49): componentwise init_color((a/255)*(b/255))."""
    return m_init((a / 255.0) * (b / 255.0))


# --- smooth mode: linear floats, clamp only at the end ---


def s_init(c):
    return c


def s_add(a, b):
    return a + b


def s_mul(a, coef):
    return a * coef


def s_mul2(a, b):
    return a * b


class ColorOps:
    """Dispatch table selected by RenderConfig.quantize."""

    def __init__(self, quantize: str):
        if quantize == "match":
            self.init, self.add, self.mul, self.mul2 = m_init, m_add, m_mul, m_mul2
        elif quantize == "smooth":
            self.init, self.add, self.mul, self.mul2 = s_init, s_add, s_mul, s_mul2
        else:
            raise ValueError(quantize)
        self.quantize = quantize

    def zeros(self, shape):
        return jnp.zeros(shape + (3,), jnp.float32)

    def finalize(self, c):
        """Convert accumulated color to the [0,255] float image domain."""
        if self.quantize == "match":
            return c  # already [0,255], clamped per-op
        return jnp.clip(c, 0.0, 1.0) * 255.0
