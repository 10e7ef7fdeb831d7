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


def test_ray_chunking_covers_partial_tail_chunk():
    """Ray counts that do not divide ray_chunk must still render every ray.

    Regression: _trace_image's chunk count used a broken ceil-div
    (`-(-n) // c` == floor) and silently dropped the tail chunk — every
    square corpus render divided evenly, so only non-square native
    resolutions (spheres/car-on-road/dark-night at 960x540) hit it, as a
    reshape error deep in image assembly. A 20x12 cpu-mode render is 960
    rays; ray_chunk=256 leaves a 192-ray tail. Both mode pipelines must
    equal the single-chunk image exactly.
    """
    scene = make_sphere_scene(width=20, height=12)
    for mode in ("cpu", "gpu"):
        one = render_scene(scene, RenderConfig(mode=mode, aliasing=1,
                                               quantize="match"))
        chunked = render_scene(scene, RenderConfig(mode=mode, aliasing=1,
                                                   quantize="match",
                                                   ray_chunk=256))
        np.testing.assert_array_equal(one, chunked)
        assert one.shape == (12, 20, 3)


def test_scene_cache_key_distinguishes_same_shape_scenes():
    """Two scenes whose PADDED leaf shapes coincide but whose static Scene
    metadata differs (object/light counts) must get distinct AOT-executable
    cache keys — regression for the full-corpus sweep failure where
    triangle-ambient's compiled program was reused for cube and the
    dispatch died on the pytree-metadata mismatch."""
    import sys
    from oracle import oracle_available, scene_text

    if not oracle_available():
        import pytest

        pytest.skip("reference not mounted")
    from raytracing_gpu_tpu.models.parser import parse_scene_text
    from raytracing_gpu_tpu.models.scene import scene_to_device
    from raytracing_gpu_tpu.render import scene_cache_key

    a = scene_to_device(parse_scene_text(scene_text("triangle-ambient", 32, 32)))
    b = scene_to_device(parse_scene_text(scene_text("cube-ambient", 32, 32)))
    ka, kb = scene_cache_key(a), scene_cache_key(b)
    # the padded LEAF shapes collide (1 tri and 12 tris both pad to 256) —
    # that collision is exactly what made shapes-only keys unsafe
    assert ka[0] == kb[0]
    assert ka != kb
    hash(ka), hash(kb)  # must be usable as dict keys
    # scenes differing only in array VALUES (not structure) SHOULD share
    # an executable — the scene is a runtime argument, not baked in
    c = scene_to_device(parse_scene_text(scene_text("sphere-spec", 32, 32)))
    d = scene_to_device(
        parse_scene_text(scene_text("sphere-spec_smooth", 32, 32)))
    assert scene_cache_key(c) == scene_cache_key(d)


def test_block_swizzled_rays_bit_identical():
    """Block-swizzled ray order (compact 2D pixel blocks per sweep tile —
    the big-scene culling lever) is pure reordering: per-ray arithmetic is
    untouched and the unswizzle is a reshape/transpose, so the rendered
    image must be BIT-IDENTICAL to row-major order on the kernel backend."""
    import dataclasses

    scene = make_sphere_scene(width=16, height=16, n_lat=8, n_lon=12)
    cfg = RenderConfig(mode="cpu", quantize="match", backend="pallas",
                       block_rays="off")
    base = render_scene(scene, cfg)
    # block_rays is a static config field: flipping it reaches a DIFFERENT
    # cached executable, no cache clearing needed (ADVICE r4 — the env-var
    # predecessor was read at trace time but not cache-keyed)
    swiz = render_scene(scene, dataclasses.replace(cfg, block_rays="on"))
    np.testing.assert_array_equal(base, swiz)


def test_f2b_tiles_config_bit_identical():
    """cfg.f2b_tiles threads through collide to the two-round front-to-back
    sweep (round 5: config field replaces the RGT_F2B_TILES env route on the
    render path) — bit-identical images by construction."""
    import dataclasses

    # big enough that nt > 2*K actually engages the two-round sweep
    scene = make_sphere_scene(width=16, height=16, n_lat=20, n_lon=26)
    cfg = RenderConfig(mode="cpu", quantize="match", backend="pallas")
    base = render_scene(scene, cfg)
    f2b = render_scene(scene, dataclasses.replace(cfg, f2b_tiles=1))
    np.testing.assert_array_equal(base, f2b)


def test_block_swizzle_non_square_resolution():
    """Swizzle must stay bit-identical at non-square, non-8-divisible
    resolutions (the 960x540-class fallback picks a smaller block shape;
    20x12 exercises the (4,4) candidate)."""
    import dataclasses

    scene = make_sphere_scene(width=20, height=12, n_lat=8, n_lon=12)
    cfg = RenderConfig(mode="cpu", quantize="match", backend="pallas",
                       block_rays="off")
    base = render_scene(scene, cfg)
    swiz = render_scene(scene, dataclasses.replace(cfg, block_rays="on"))
    np.testing.assert_array_equal(base, swiz)
    assert base.shape == (12, 20, 3)
