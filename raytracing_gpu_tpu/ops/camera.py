"""Primary-ray generation.

Reproduces the reference camera model exactly:

- Basis: u = normalize(cam.u), v = normalize(cam.v), w = cross(u, v);
  image-plane center C = position + w*L with L = width / (2*tan(fov*pi/360))
  (cpu/raytracer.c:82-86; same math on the GPU host at gpu/raytracer.cu:177-182).
- CPU mode: pixel (p,q) of the printed image corresponds to plane coordinates
  k = width - width/2 - q, l = height - height/2 - p, with 2x2 supersampling
  at offsets {0, 0.5} (cpu/raytracer.c:50-68) — derived from the quadrant
  thread decomposition (cpu/raytracer.c:92-127), the buffer write
  `output_tab[(j+halfh)*width + (i+halfw)]` (cpu/raytracer.c:70) and the
  double-flipped writeout loop (cpu/raytracer.c:128-134).
- GPU mode: one ray per hi-res pixel at integer offsets px - width/2,
  py - height/2, written double-flipped (gpu/raytracer.cu:95-128).
- Ray direction QUIRK: direction = normalize(position - point) — it points
  from the image-plane point back through/away from the camera position
  (cpu/raytracer.c:62, gpu/raytracer.cu:101). Reproduced as-is.

Rays: origin = image-plane point, direction as above. Returned flattened.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from raytracing_gpu_tpu.models.scene import Camera


def camera_basis(camera: Camera):
    """Host-side camera basis in f32, matching the C float arithmetic.

    Returns (u, v, C) each (3,) — works on numpy or jnp camera leaves.
    Differentiable when camera leaves are traced arrays.
    """
    cu = jnp.asarray(camera.position).dtype  # noqa: F841  (keep dtype f32)
    u_raw = jnp.asarray(camera.u, jnp.float32)
    v_raw = jnp.asarray(camera.v, jnp.float32)
    pos = jnp.asarray(camera.position, jnp.float32)
    fov = jnp.asarray(camera.fov, jnp.float32)

    def norm(a):
        # vector3_normalize (cpu/vector3.c:40-47): float ops, double sqrt
        return a / jnp.sqrt(jnp.sum(a * a))

    u = norm(u_raw)
    v = norm(v_raw)
    w = jnp.cross(u, v)
    # L computed in double precision in C (tan/M_PI are double, cpu/raytracer.c:85)
    # then truncated to f32 by vector3_scale. fov is traced -> use f32 tan
    # (difference is far below the uint8 quantization threshold).
    L = camera.width / (2.0 * jnp.tan(fov * (math.pi / 360.0)))
    C = pos + w * L.astype(jnp.float32)
    return u, v, C


def cpu_subpixel_coords(width: int, height: int) -> np.ndarray:
    """(H, W, 4, 2) f32 array of (k, l) plane coords for the 4 subsamples of
    each printed pixel, in the reference's accumulation order
    (k outer loop, l inner — cpu/raytracer.c:55-56)."""
    halfw, halfh = width // 2, height // 2
    q = np.arange(width)
    p = np.arange(height)
    kbase = (width - halfw - q).astype(np.float32)  # (W,)
    lbase = (height - halfh - p).astype(np.float32)  # (H,)
    # order: (k, l) in [(0,0), (0,.5), (.5,0), (.5,.5)]
    offs = np.array([[0.0, 0.0], [0.0, 0.5], [0.5, 0.0], [0.5, 0.5]], np.float32)
    kk = kbase[None, :, None] + offs[None, None, :, 0]  # (1,W,4)
    ll = lbase[:, None, None] + offs[None, None, :, 1]  # (H,1,4)
    out = np.stack(np.broadcast_arrays(kk, ll), axis=-1)  # (H,W,4,2)
    return out


def cpu_subpixel_coords_traced(width: int, height: int, ray_ids):
    """Traced twin of `cpu_subpixel_coords` for flat ray ids.

    Ray id r = ((p*width) + q)*4 + s with p the printed row, q the printed
    column, s the subsample in the reference's accumulation order
    [(0,0), (0,.5), (.5,0), (.5,.5)] (cpu/raytracer.c:55-68). Generating
    coords from ids INSIDE the chunked trace (instead of materializing the
    full (H*W*4,2) plane and scanning over it) keeps every image-sized
    buffer out of the XLA program — measured 87s -> 13s compile for a
    512x512 render. Values are small-integer + 0.5 arithmetic: bit-identical
    to the numpy version.
    """
    pix = ray_ids // 4
    s = ray_ids % 4
    q = pix % width
    p = pix // width
    halfw, halfh = width // 2, height // 2
    k = (width - halfw - q).astype(jnp.float32) \
        + 0.5 * (s // 2).astype(jnp.float32)
    l = (height - halfh - p).astype(jnp.float32) \
        + 0.5 * (s % 2).astype(jnp.float32)
    return jnp.stack([k, l], axis=1)


def gpu_pixel_coords_traced(width: int, height: int, ray_ids):
    """Traced twin of `gpu_pixel_coords` for flat hi-res ray ids
    (r = py*width + px)."""
    px = ray_ids % width
    py = ray_ids // width
    k = (px - width // 2).astype(jnp.float32)
    l = (py - height // 2).astype(jnp.float32)
    return jnp.stack([k, l], axis=1)


def gpu_pixel_coords(width: int, height: int) -> np.ndarray:
    """(H, W, 2) f32 (k, l) coords for GPU-mode hi-res pixels.

    Kernel thread (px, py) uses offsets (px - width/2, py - height/2) and
    writes buffer[height-py-1][width-px-1] (gpu/raytracer.cu:95-128); the
    downscale kernel reads that buffer flipped again (gpu/raytracer.cu:64-66,
    81-82), so hi-res image row r, col c corresponds to py = height-1-r ...
    composed with the downscale double flip the net mapping returned here is
    final-image-oriented: see render.py for the composition.
    """
    px = np.arange(width)
    py = np.arange(height)
    k = (px - width // 2).astype(np.float32)
    l = (py - height // 2).astype(np.float32)
    kk, ll = np.meshgrid(k, l)  # (H,W)
    return np.stack([kk, ll], axis=-1)


def make_rays(u, v, C, position, coords):
    """coords (...,2) of (k,l) -> origins (...,3), directions (...,3).

    point = C + u*k + v*l; direction = normalize(position - point)
    (cpu/raytracer.c:59-62).
    """
    k = coords[..., 0:1]
    l = coords[..., 1:2]
    point = C + u * k + v * l
    d = position - point
    direction = d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    return point, direction
