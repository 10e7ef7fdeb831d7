"""Acceleration-layer tests (partition/).

The reference only has printf inspection harnesses for this layer
(gpu/test.cu, SURVEY §4); these are real assertions: structural invariants
of the flat octree, slab-test properties, and the end-to-end guarantee that
culling never changes a render (vs the reference, where layout/partitioning
variants were validated by eye)."""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracing_gpu_tpu.config import RenderConfig
from raytracing_gpu_tpu.models.procedural import make_sphere_scene
from raytracing_gpu_tpu.models.scene import scene_to_device
from raytracing_gpu_tpu.partition import (
    build_octree,
    compute_object_aabbs,
    compute_scene_aabb,
    hit_aabb,
)
from raytracing_gpu_tpu.partition.apply import with_accel
from raytracing_gpu_tpu.render import render_scene


def _boxes_scene():
    """8 unit boxes at the corners of a [0,16]^3 region + 1 big object."""
    rng = np.random.RandomState(0)
    objects = []
    corners = [(x, y, z) for x in (1, 13) for y in (1, 13) for z in (1, 13)]
    for c in corners:
        base = np.array(c, np.float32)
        tri = base + rng.rand(4, 3, 3).astype(np.float32)  # 4 tris in unit cube
        objects.append(tri)
    objects.append(rng.rand(6, 3, 3).astype(np.float32) * 16.0)  # spans scene
    vertices = np.concatenate(objects)  # (T,3,3)
    tri_obj = np.concatenate(
        [np.full((o.shape[0],), i, np.int32) for i, o in enumerate(objects)]
    )
    valid = np.ones((vertices.shape[0],), bool)
    return jnp.asarray(vertices), jnp.asarray(tri_obj), jnp.asarray(valid), len(objects)


def test_object_aabbs():
    vertices, tri_obj, valid, n_obj = _boxes_scene()
    aabbs = np.asarray(compute_object_aabbs(vertices, tri_obj, valid, n_obj))
    v = np.asarray(vertices)
    to = np.asarray(tri_obj)
    for o in range(n_obj):
        pts = v[to == o].reshape(-1, 3)
        np.testing.assert_allclose(aabbs[o, 0], pts.min(axis=0))
        np.testing.assert_allclose(aabbs[o, 1], pts.max(axis=0))


def test_scene_aabb_and_padding():
    vertices, tri_obj, valid, n_obj = _boxes_scene()
    # pad with an invalid object slot
    aabbs = compute_object_aabbs(vertices, tri_obj, valid, n_obj + 2)
    obj_valid = jnp.arange(n_obj + 2) < n_obj
    box = np.asarray(compute_scene_aabb(aabbs, obj_valid))
    v = np.asarray(vertices).reshape(-1, 3)
    np.testing.assert_allclose(box[0], v.min(axis=0))
    np.testing.assert_allclose(box[1], v.max(axis=0))


def test_hit_aabb_basic():
    boxes = jnp.asarray(np.array([[[0, 0, 0], [1, 1, 1]],
                                  [[5, 5, 5], [6, 6, 6]]], np.float32))
    o = jnp.asarray(np.array([
        [0.5, 0.5, -2.0],   # shoots +z through box 0
        [0.5, 0.5, -2.0],   # shoots -z away (slab test ignores sign: hit on the line)
        [3.0, 0.5, -2.0],   # parallel offset: misses both
        [0.5, 0.5, 0.5],    # origin inside box 0
    ], np.float32))
    d = jnp.asarray(np.array([
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
        [0.0, 0.0, 1.0],
        [1.0, 0.0, 0.0],
    ], np.float32))
    got = np.asarray(hit_aabb(o, d, boxes))
    assert got[0, 0] and not got[0, 1]
    assert got[1, 0]  # behind-origin hits count (matches aabb.cu slab test)
    assert not got[2, 0] and not got[2, 1]
    assert got[3, 0]


def test_hit_aabb_axis_parallel_on_plane():
    """Zero direction component with origin exactly on a slab plane must not
    NaN-cull (the reference's test would produce 0*inf NaNs here)."""
    boxes = jnp.asarray(np.array([[[0, 0, 0], [1, 1, 1]]], np.float32))
    o = jnp.asarray(np.array([[0.0, 0.5, -2.0]], np.float32))  # x on min plane
    d = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    assert np.asarray(hit_aabb(o, d, boxes))[0, 0]


def test_octree_structure():
    vertices, tri_obj, valid, n_obj = _boxes_scene()
    aabbs = compute_object_aabbs(vertices, tri_obj, valid, n_obj)
    obj_valid = jnp.ones((n_obj,), bool)
    scene_box = compute_scene_aabb(aabbs, obj_valid)
    tree = build_octree(aabbs, scene_box, obj_valid)
    nv = np.asarray(tree.node_valid)
    lvl = np.asarray(tree.node_level)
    start, end = np.asarray(tree.node_start), np.asarray(tree.node_end)
    sub_s, sub_e = np.asarray(tree.node_sub_start), np.asarray(tree.node_sub_end)
    kids = np.asarray(tree.node_children)
    parent = np.asarray(tree.node_parent)
    box = np.asarray(tree.node_box)
    obj_node = np.asarray(tree.obj_node)

    rows = np.flatnonzero(nv)
    assert int(tree.n_nodes) == len(rows) >= 2  # root + at least one child
    # exactly one root
    roots = [r for r in rows if lvl[r] == 0]
    assert len(roots) == 1
    root = roots[0]
    assert parent[root] == -1
    assert sub_s[root] == 0 and sub_e[root] == n_obj

    # every valid object's node exists and owns it
    for o in range(n_obj):
        r = obj_node[o]
        assert r >= 0 and nv[r]
        slot = int(np.flatnonzero(np.asarray(tree.perm) == o)[0])
        assert start[r] <= slot < end[r]

    # owned ranges of all nodes partition the valid objects
    total = sum(int(end[r] - start[r]) for r in rows)
    assert total == n_obj

    for r in rows:
        # children linkage: child's parent is r; child subtree nested
        for c in kids[r]:
            if c >= 0:
                assert nv[c]
                assert parent[c] == r
                assert lvl[c] == lvl[r] + 1
                assert sub_s[r] <= sub_s[c] and sub_e[c] <= sub_e[r]
                # child box nested in parent box (grid cells)
                assert np.all(box[c, 0] >= box[r, 0] - 1e-5)
                assert np.all(box[c, 1] <= box[r, 1] + 1e-5)
        # owned objects' AABBs are inside the node cell box
        a = np.asarray(aabbs)
        perm = np.asarray(tree.perm)
        for slot in range(start[r], end[r]):
            o = perm[slot]
            assert np.all(a[o, 0] >= box[r, 0] - 1e-4), (r, o)
            assert np.all(a[o, 1] <= box[r, 1] + 1e-4), (r, o)

    # the 8 corner objects should land in distinct depth>=1 nodes
    corner_nodes = {int(obj_node[o]) for o in range(8)}
    assert len(corner_nodes) == 8
    assert all(lvl[r] >= 1 for r in corner_nodes)
    # the scene-spanning object lands at the root
    assert int(obj_node[8]) == root


@pytest.mark.parametrize("partitioning", ["aabb", "octree"])
def test_culled_render_identical(partitioning):
    scene = make_sphere_scene(width=24, height=24, n_lat=8, n_lon=12)
    base = render_scene(scene, RenderConfig(mode="cpu", quantize="match"))
    accel = render_scene(
        scene, RenderConfig(mode="cpu", quantize="match", partitioning=partitioning)
    )
    np.testing.assert_array_equal(base, accel)


def test_with_accel_octree_node_boxes_cover_objects():
    scene = scene_to_device(make_sphere_scene(width=8, height=8))
    accel_scene, tree = with_accel(scene, "octree")
    geo = accel_scene.geometry
    assert geo.obj_aabb is not None and geo.octree is not None
    a = np.asarray(geo.obj_aabb)
    valid_obj = np.asarray(tree.obj_node) >= 0
    assert valid_obj[:3].all()
    # each object's owning-node cell box covers its AABB
    nb = np.asarray(geo.octree.node_box)[
        np.clip(np.asarray(tree.obj_node), 0, None)]
    assert np.all(nb[valid_obj, 0] <= a[valid_obj, 0] + 1e-4)
    assert np.all(nb[valid_obj, 1] >= a[valid_obj, 1] - 1e-4)


def test_octree_walk_matches_own_node_box_test():
    """The production consumer of the node graph: per-ray top-down
    reachability through the parent links (octree_object_reach) must agree
    with the collapsed own-node-box slab test — node cells NEST, so
    "own box hit" iff "every ancestor box hit" (up to slab-test f32
    boundary ties, where the walk may only cull MORE, never less than an
    ancestor-aware DFS would)."""
    import jax.numpy as jnp

    from raytracing_gpu_tpu.ops.camera import camera_basis, make_rays
    from raytracing_gpu_tpu.ops.camera import cpu_subpixel_coords
    from raytracing_gpu_tpu.partition.aabb import hit_aabb
    from raytracing_gpu_tpu.partition.octree import octree_object_reach

    s = make_sphere_scene(width=8, height=8, n_lat=8, n_lon=12)
    scene = scene_to_device(s)
    accel_scene, tree = with_accel(scene, "octree")
    nc = accel_scene.geometry.octree
    u, v, C = camera_basis(scene.camera)
    coords = jnp.asarray(np.asarray(cpu_subpixel_coords(8, 8)).reshape(-1, 2))
    origins, dirs = make_rays(u, v, C,
                              jnp.asarray(scene.camera.position), coords)
    reach = np.asarray(octree_object_reach(origins, dirs, nc))

    own_box = np.asarray(tree.node_box)[
        np.clip(np.asarray(tree.obj_node), 0, None)]
    own_hit = np.asarray(hit_aabb(origins, dirs, jnp.asarray(own_box)))
    valid_obj = np.asarray(tree.obj_node) >= 0
    # exact equivalence on this scene (no degenerate boundary ties at 8x8)
    np.testing.assert_array_equal(reach[:, valid_obj], own_hit[:, valid_obj])
    # padding objects are never culled by the walk (conservative)
    assert reach[:, ~valid_obj].all()
