"""Attach acceleration data to a scene — runtime analog of the reference's
compile-time PARTITIONING_{NONE,AABB,OCTREE} matrix (gpu/CMakeLists.txt:12-15)
and of `to_cuda`'s build-on-upload step (gpu/scene.cu:224-352: AABB for
PARTITIONING_AABB; octree + AABBs for PARTITIONING_OCTREE).
"""

from __future__ import annotations

import dataclasses

from raytracing_gpu_tpu.models.scene import Scene
from raytracing_gpu_tpu.partition.aabb import (
    compute_object_aabbs,
    compute_scene_aabb,
)
from raytracing_gpu_tpu.partition.octree import (
    Octree,
    build_octree,
    node_cull_tables,
)


def with_accel(scene: Scene, partitioning: str):
    """Returns (scene with accel fields filled, Octree | None).

    Culling is conservative: a culled object can never contain the nearest
    hit, so renders are identical to brute force (tests/test_partition.py
    asserts bit-equality), unlike the reference where the slab test's
    NaN behavior on degenerate axes could silently drop grazing hits
    (aabb.cu:202-243 has no inf/zero-direction handling).
    """
    if partitioning == "none":
        return scene, None
    import jax.numpy as jnp

    import jax

    geo = scene.geometry
    n_obj = scene.materials.padded_count
    # an object is valid iff it owns at least one valid triangle (padding
    # triangles carry tri_obj=0, so a plain scatter-set would race on slot 0)
    obj_valid = (
        jax.ops.segment_sum(
            geo.valid.astype(jnp.int32), geo.tri_obj, num_segments=n_obj
        )
        > 0
    )
    aabbs = compute_object_aabbs(geo.vertices, geo.tri_obj, geo.valid, n_obj)
    if partitioning == "aabb":
        return dataclasses.replace(
            scene, geometry=dataclasses.replace(geo, obj_aabb=aabbs)
        ), None
    if partitioning != "octree":
        raise ValueError(f"unknown partitioning {partitioning!r}")
    scene_box = compute_scene_aabb(aabbs, obj_valid)
    tree = build_octree(aabbs, scene_box, obj_valid)
    # attach the node graph itself: the jnp cull WALKS it per ray
    # (partition.octree.octree_object_reach), replacing the earlier
    # collapsed per-object node-box AND — same conservative mask, but the
    # traversal now consumes the built parent links at render time like
    # the reference's DFS consumes its pointer graph
    return dataclasses.replace(
        scene,
        geometry=dataclasses.replace(
            geo, obj_aabb=aabbs, octree=node_cull_tables(tree)
        ),
    ), tree
