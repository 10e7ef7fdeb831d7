"""Public-API surface tests: one-shot vs device-resident renderer."""

import numpy as np

from raytracing_gpu_tpu import RenderConfig, SceneRenderer, render_scene
from raytracing_gpu_tpu.models.procedural import make_sphere_scene


def test_scene_renderer_matches_render_scene():
    """SceneRenderer (device-resident loop API) must produce exactly the
    one-shot render_scene image, frame after frame — it only hoists the
    upload/accel/compile out of the loop, never changes the program."""
    scene = make_sphere_scene(width=12, height=12)
    cfg = RenderConfig(mode="cpu", quantize="match")
    r = SceneRenderer(scene, cfg)
    a = r.render()
    b = r.render()
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, render_scene(scene, cfg))
    assert a.shape == (12, 12, 3)


def test_scene_renderer_gpu_mode():
    scene = make_sphere_scene(width=12, height=12)
    cfg = RenderConfig(mode="gpu", aliasing=1, quantize="match")
    r = SceneRenderer(scene, cfg)
    np.testing.assert_array_equal(r.render(), render_scene(scene, cfg))
