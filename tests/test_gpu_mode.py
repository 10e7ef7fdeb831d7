"""GPU-pipeline-semantics tests.

There is no runnable CUDA oracle in this environment, so these validate the
gpu-mode pipeline (gpu/rt.cpp + gpu/raytracer.cu semantics: aliasing-x
hi-res render, shallow-first saturating accumulation with bounce cap, box
downscale) against internal invariants and against the CPU pipeline where
the two must agree.
"""

import numpy as np
import pytest

from raytracing_gpu_tpu.config import RenderConfig
from raytracing_gpu_tpu.models.procedural import make_sphere_scene
from raytracing_gpu_tpu.render import render_scene


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(width=24, height=24, n_lat=8, n_lon=12,
                             reflective=False)


def test_gpu_mode_close_to_cpu_mode(scene):
    """On a non-reflective scene both pipelines average subsamples of the
    same shading; only the sampling grid (3x3 integer vs 2x2 half-pixel) and
    quantization path differ, so images agree within a few levels off-edge."""
    cpu = render_scene(scene, RenderConfig(mode="cpu", quantize="match"))
    gpu = render_scene(scene, RenderConfig(mode="gpu", quantize="match"))
    diff = np.abs(cpu.astype(int) - gpu.astype(int)).max(axis=-1)
    # bulk of the image matches closely; geometry/shadow edges shift by up
    # to a pixel between the two sampling grids (integer 3x3 vs half-step
    # 2x2), so the tail is long but must be a minority
    assert np.median(diff) <= 4
    assert (diff <= 16).mean() > 0.7
    # a flipped/misaligned composition would double the mean error
    flipped = np.abs(cpu.astype(int) - gpu[::-1, ::-1].astype(int)).max(axis=-1)
    assert diff.mean() < flipped.mean()


def test_gpu_mode_aliasing_factors(scene):
    """aliasing=1 (no supersampling) and 3 must agree away from edges."""
    a1 = render_scene(scene, RenderConfig(mode="gpu", aliasing=1))
    a3 = render_scene(scene, RenderConfig(mode="gpu", aliasing=3))
    assert a1.shape == a3.shape == (24, 24, 3)
    diff = np.abs(a1.astype(int) - a3.astype(int)).max(axis=-1)
    assert np.median(diff) <= 4


def test_gpu_mode_bounce_cap_terminates():
    """Nr=1.0 mirrors: the CPU reference would recurse forever; gpu mode
    caps at max_bounce (gpu/raytracer.cu:113). More bounces -> more light,
    saturating: bounce 0 < bounce 10 image energy, 10 == 12 (cutoff)."""
    scene = make_sphere_scene(width=16, height=16, n_lat=6, n_lon=9,
                              reflective=True)
    import dataclasses

    # force perfect mirrors
    mats = dataclasses.replace(
        scene.materials, nr=np.where(scene.materials.nr > 0, 1.0, 0.0).astype(np.float32)
    )
    scene = dataclasses.replace(scene, materials=mats)
    e = {}
    for mb in (0, 10, 12):
        img = render_scene(scene, RenderConfig(mode="gpu", aliasing=1,
                                               max_bounce=mb))
        e[mb] = float(img.sum())
    assert e[0] < e[10]
    # with nr=1.0 nothing decays; extra bounces past the deepest mirror path
    # change nothing measurable
    assert abs(e[10] - e[12]) / e[10] < 0.02


def test_gpu_mode_downscale_identity_at_aliasing_1(scene):
    """With aliasing=1 the box average is a single uint8-quantized texel
    (gpu/raytracer.cu:68-80 with a=1): every output value is an integer."""
    img = render_scene(scene, RenderConfig(mode="gpu", aliasing=1))
    assert np.all(img == np.trunc(img))
    assert img.min() >= 0.0 and img.max() <= 255.0
