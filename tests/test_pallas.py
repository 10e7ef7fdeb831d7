"""Pallas intersection kernel tests.

On CPU these run through the Pallas interpreter (exact same kernel code the
TPU compiles); TPU equality at 512x512 vs the CPU oracle was additionally
measured at 99.99% bit-exact with all >1-off pixels on geometry/shadow edges
(f32 winner flips — the same class of divergence the CUDA reference's own
GPU/CPU pair exhibits).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracing_gpu_tpu.config import RenderConfig
from raytracing_gpu_tpu.models.procedural import make_sphere_scene
from raytracing_gpu_tpu.models.scene import scene_to_device
from raytracing_gpu_tpu.ops import pallas_intersect as pk
from raytracing_gpu_tpu.ops.intersect import collide
from raytracing_gpu_tpu.render import render_scene


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(width=12, height=12, n_lat=8, n_lon=12)


def test_kernel_matches_jnp_collide(scene):
    """Winner from the kernel == the jnp argmin path (to f32 fusion jitter).

    The two paths are separately compiled programs; XLA may fuse/FMA
    differently, so distances agree only to ~1 ulp and an exact tie can in
    principle flip a winner. Require identical hit masks, ulp-close
    distances, and identical winners everywhere.
    """
    dev = scene_to_device(scene)
    rng = np.random.RandomState(1)
    R = 64
    o = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 6.0 - 3.0)
    d = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0)
    jhit = collide(o, d, dev.geometry)
    phit = collide(o, d, dev.geometry, backend="pallas")
    np.testing.assert_array_equal(np.asarray(jhit.mask), np.asarray(phit.mask))
    m = np.asarray(jhit.mask)
    np.testing.assert_array_equal(np.asarray(jhit.obj)[m], np.asarray(phit.obj)[m])
    np.testing.assert_allclose(
        np.asarray(jhit.dist)[m], np.asarray(phit.dist)[m], rtol=5e-7
    )
    np.testing.assert_allclose(
        np.asarray(jhit.point)[m], np.asarray(phit.point)[m], rtol=5e-6, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jhit.normal)[m], np.asarray(phit.normal)[m], rtol=5e-6, atol=1e-5
    )


def test_render_pallas_matches_jnp(scene):
    """Backends are separately compiled f32 programs: 1-ulp distance jitter
    can flip the winning triangle exactly on geometry edges, so compare with
    the same edge-aware tolerance used against the C oracle."""
    from raytracing_gpu_tpu.utils.compare import assert_images_close

    ref = render_scene(scene, RenderConfig(mode="cpu", quantize="match"))
    pal = render_scene(
        scene, RenderConfig(mode="cpu", quantize="match", backend="pallas")
    )
    assert_images_close(
        np.trunc(pal).astype(np.uint8), np.trunc(ref).astype(np.uint8),
        tol=1, context="pallas-vs-jnp",
    )


@pytest.mark.parametrize("partitioning", ["none", "aabb", "octree"])
def test_render_pallas_partitioning_modes_identical(scene, partitioning):
    """The kernel-side culling modes (brute force / flat tile AABBs /
    hierarchical octree-tile traversal) are semantically invisible: every
    mode must produce the IDENTICAL image from the same backend — the
    runtime form of the reference's 'every build-matrix variant renders the
    same scenes' contract (gpu/CMakeLists.txt:4-15)."""
    ref = render_scene(
        scene, RenderConfig(mode="cpu", quantize="match", backend="pallas",
                            partitioning="none")
    )
    pal = render_scene(
        scene,
        RenderConfig(mode="cpu", quantize="match", backend="pallas",
                     partitioning=partitioning),
    )
    np.testing.assert_array_equal(ref, pal)


def test_partitioning_modes_actually_cull(scene):
    """Non-vacuity check: with culling on, the pair-tile mask has culled
    entries for real primary rays; 'none' is all ones (true brute force)."""
    dev = scene_to_device(scene)
    geo = dev.geometry
    pack = pk.pack_geometry(geo.vertices, geo.valid)
    rng = np.random.RandomState(3)
    R = 2 * pk.TILE_R
    o = jnp.broadcast_to(jnp.asarray([0.0, 2.0, -8.0], jnp.float32), (R, 3))
    d = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0)
    op, dp, _ = pk.pack_rays(o, d)
    none = np.asarray(pk.tile_cull_mask_hierarchical(op, dp, pack, "none"))
    aabb = np.asarray(pk.tile_cull_mask_hierarchical(op, dp, pack, "aabb"))
    octr = np.asarray(pk.tile_cull_mask_hierarchical(op, dp, pack, "octree"))
    assert none.all(), "partitioning='none' must be brute force"
    assert aabb.sum() < none.sum(), "aabb mode must cull some pair tiles"
    assert octr.sum() < none.sum(), "octree mode must cull some pair tiles"


def test_hierarchical_mask_conservative_large_scene():
    """Octree-mode culling on a >64-tile scene (interval levels engaged):
    no (ray tile, tri tile) pair holding a true winner may be culled."""
    from raytracing_gpu_tpu.models.procedural import make_sphere_grid_scene

    scene = make_sphere_grid_scene(nx=4, ny=4, nz=2, n_lat=16, n_lon=20)
    dev = scene_to_device(scene)
    geo = dev.geometry
    assert geo.vertices.shape[0] // pk.TILE_T > 64  # interval path engaged
    pack = pk.pack_geometry(geo.vertices, geo.valid)
    rng = np.random.RandomState(4)
    R = 2 * pk.TILE_R
    # tile 0: coherent primary rays (camera origin, narrow cone at one
    # sphere) — the case tile-granularity culling must pay off on;
    # tile 1: scattered rays everywhere — the adversarial case that must
    # stay conservative (intervals unconstrained -> nothing culled there)
    cam = np.asarray(scene.camera.position, np.float32)
    target = np.array([3.75, 3.75, 1.25], np.float32)  # corner sphere
    d_coh = (target + rng.rand(pk.TILE_R, 3).astype(np.float32) * 0.6 - cam)
    o = np.concatenate([np.broadcast_to(cam, (pk.TILE_R, 3)),
                        rng.rand(pk.TILE_R, 3).astype(np.float32) * 10 - 5])
    d = np.concatenate([d_coh,
                        rng.rand(pk.TILE_R, 3).astype(np.float32) * 2 - 1])
    o, d = jnp.asarray(o.astype(np.float32)), jnp.asarray(d.astype(np.float32))
    op, dp, _ = pk.pack_rays(o, d)
    mask = np.asarray(pk.tile_cull_mask_hierarchical(op, dp, pack, "octree"))
    from raytracing_gpu_tpu.ops.intersect import _mt_core

    dist, *_ = _mt_core(o, d, geo.vertices[pack.perm], geo.normals[pack.perm],
                        geo.valid[pack.perm], 1e-7, 0.01)
    dn = np.asarray(dist)
    win = dn.argmin(axis=1)
    missed_cull = [
        (r, int(win[r]) // pk.TILE_T)
        for r in range(R)
        if np.isfinite(dn[r, win[r]])
        and mask[win[r] // pk.TILE_T, r // pk.TILE_R] != 1
    ]
    assert not missed_cull, missed_cull
    # the coherent tile must actually cull most triangle tiles (the entire
    # point of the hierarchy); a handful survive around the target sphere
    coherent_active = int(mask[:, 0].sum())
    assert coherent_active < mask.shape[0] // 4, coherent_active


def test_mxu_collide_matches_jnp(scene):
    """The MXU (matmul-formulation) backend agrees with the jnp argmin path.

    The determinants are computed via a different association (expanded
    triple products on the MXU), so distances agree to ~1e-6 rel and winners
    may flip only on exact f32 ties / geometry edges. For random rays against
    a smooth sphere these are measure-zero; require full agreement here.
    """
    dev = scene_to_device(scene)
    rng = np.random.RandomState(1)
    R = 64
    o = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 6.0 - 3.0)
    d = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0)
    jhit = collide(o, d, dev.geometry)
    mhit = collide(o, d, dev.geometry, backend="mxu")
    np.testing.assert_array_equal(np.asarray(jhit.mask), np.asarray(mhit.mask))
    m = np.asarray(jhit.mask)
    np.testing.assert_array_equal(np.asarray(jhit.obj)[m], np.asarray(mhit.obj)[m])
    np.testing.assert_allclose(
        np.asarray(jhit.dist)[m], np.asarray(mhit.dist)[m], rtol=1e-5
    )


def test_render_mxu_matches_jnp(scene):
    """Full render through the MXU backend, edge-aware compare vs jnp."""
    from raytracing_gpu_tpu.utils.compare import assert_images_close

    ref = render_scene(scene, RenderConfig(mode="cpu", quantize="match"))
    mxu = render_scene(
        scene, RenderConfig(mode="cpu", quantize="match", backend="mxu")
    )
    assert_images_close(
        np.trunc(mxu).astype(np.uint8), np.trunc(ref).astype(np.uint8),
        tol=1, context="mxu-vs-jnp",
    )


def test_cluster_perm_is_permutation(scene):
    """cluster_triangles returns a true permutation with invalid rows last."""
    dev = scene_to_device(scene)
    geo = dev.geometry
    perm, tile_aabb, tile_nonempty = jax.jit(pk.cluster_triangles)(
        geo.vertices, geo.valid
    )
    p = np.asarray(perm)
    T = geo.vertices.shape[0]
    assert sorted(p.tolist()) == list(range(T))
    val = np.asarray(geo.valid)
    n_valid = int(val.sum())
    assert val[p][:n_valid].all() and not val[p][n_valid:].any()
    # every valid triangle's vertices lie inside its tile AABB
    verts = np.asarray(geo.vertices)[p]
    boxes = np.asarray(tile_aabb)
    for j in range(boxes.shape[0]):
        sl = slice(j * pk.TILE_T, (j + 1) * pk.TILE_T)
        vv = verts[sl][val[p][sl]]
        if vv.size:
            assert bool(np.asarray(tile_nonempty)[j])
            assert (vv.reshape(-1, 3) >= boxes[j, 0] - 1e-6).all()
            assert (vv.reshape(-1, 3) <= boxes[j, 1] + 1e-6).all()


def test_cluster_cull_mask_conservative(scene):
    """No (ray tile, clustered tri tile) holding a true winner is culled
    by the exact per-ray leaf-tile mask (the 'aabb' partitioning mode)."""
    dev = scene_to_device(scene)
    geo = dev.geometry
    rng = np.random.RandomState(2)
    R = pk.TILE_R
    o = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 6.0 - 3.0)
    d = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0)
    perm, tile_aabb, tile_nonempty = pk.cluster_triangles(geo.vertices, geo.valid)
    op, dp, _ = pk.pack_rays(o, d)
    mask = np.asarray(
        pk.tile_cull_mask_packed(op, dp, tile_aabb, tile_nonempty)
    )  # (nT, 1)
    from raytracing_gpu_tpu.ops.intersect import _mt_core

    verts_c = geo.vertices[perm]
    dist, *_ = _mt_core(o, d, verts_c, geo.normals[perm], geo.valid[perm],
                        1e-7, 0.01)
    dn = np.asarray(dist)
    win = dn.argmin(axis=1)
    for r in range(R):
        if np.isfinite(dn[r, win[r]]):
            assert mask[win[r] // pk.TILE_T, 0] == 1


def test_hit_aabb_forward_behind_ray():
    """Forward slab test: box behind the origin culled, ahead/containing hit."""
    from raytracing_gpu_tpu.partition.aabb import hit_aabb_forward

    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    boxes = jnp.asarray(
        [
            [[-1.0, -1.0, 2.0], [1.0, 1.0, 3.0]],    # ahead -> hit
            [[-1.0, -1.0, -3.0], [1.0, 1.0, -2.0]],  # behind -> miss
            [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]],   # contains origin -> hit
        ],
        jnp.float32,
    )
    got = np.asarray(hit_aabb_forward(o, d, boxes))[0]
    np.testing.assert_array_equal(got, [True, False, True])


def test_pack_rays_padding_misses():
    """Padded ray lanes must produce no hits."""
    scene = make_sphere_scene(width=8, height=8, n_lat=6, n_lon=9)
    dev = scene_to_device(scene)
    o = jnp.zeros((3, 3), jnp.float32) + jnp.asarray([[0.0, 2.0, -8.0]])
    d = jnp.asarray([[0.2, -0.1, 1.0]] * 3, jnp.float32)
    v0, e1, e2 = pk.pack_triangles(dev.geometry.vertices, dev.geometry.valid)
    op, dp, R = pk.pack_rays(o, d)
    nr = op.shape[1] // pk.TILE_R
    nt = v0.shape[0] // pk.TILE_T
    dist, idx = pk.nearest_hit_pallas(
        op, dp, v0, e1, e2, jnp.ones((nt, nr), jnp.int32), 1e-7, 0.01
    )
    assert R == 3
    assert not np.isfinite(np.asarray(dist[3:])).any()


def test_sweep_kernels_chunk_triangle_axis():
    """Triangle-axis worklist chunking is bit-exact vs the single-chunk path.

    The scalar-prefetched worklist is nt*nr*4 bytes of the ~1MB per-kernel
    SMEM; past ~250k triangles x 64k rays a dense worklist OOMs the compile
    (measured on the 246k scale tier: "Ran out of memory in memory space
    smem"). The sweep wrappers chunk the triangle-tile axis under
    _SMEM_WORKLIST_BUDGET and combine chunks with strict <, preserving the
    first-occurrence tie-break. Force multi-chunk traces on a small scene
    (budget shrunk to one tri tile per chunk) and require IDENTICAL
    dist/idx: min over f32 is exact, so any difference is a real bug.
    """
    scene = make_sphere_scene(width=8, height=8, n_lat=16, n_lon=24)
    dev = scene_to_device(scene)
    rng = np.random.RandomState(7)
    R = 512
    o = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 6.0 - 3.0)
    d = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0)

    v0, e1, e2 = pk.pack_triangles(dev.geometry.vertices, dev.geometry.valid)
    op, dp, _ = pk.pack_rays(o, d)
    nr = op.shape[1] // pk.TILE_R
    nt = v0.shape[0] // pk.TILE_T
    assert nt >= 3, f"need >=3 triangle tiles to exercise chunking, got {nt}"
    mask = jnp.ones((nt, nr), jnp.int32)
    rayf = pk.ray_features_mxu(op, dp)
    g = pk.pack_tri_features(v0, e1, e2)

    def run_all():
        return (
            pk.nearest_hit_pallas(op, dp, v0, e1, e2, mask, 1e-7, 0.01),
            pk.nearest_dist_pallas(op, dp, v0, e1, e2, mask, 1e-7, 0.01),
            pk.nearest_hit_mxu(rayf, g, mask, 1e-7, 0.01),
            pk.nearest_dist_mxu(rayf, g, mask, 1e-7, 0.01),
        )

    base = jax.tree.map(np.asarray, run_all())
    assert len(pk._tri_tile_chunks(nt, nr)) == 1  # sanity: base is unchunked

    saved = pk._SMEM_WORKLIST_BUDGET
    try:
        pk._SMEM_WORKLIST_BUDGET = 4 * nr  # one triangle tile per chunk
        assert len(pk._tri_tile_chunks(nt, nr)) == nt
        jax.clear_caches()  # the chunk split is baked in at trace time
        chunked = jax.tree.map(np.asarray, run_all())
    finally:
        pk._SMEM_WORKLIST_BUDGET = saved
        jax.clear_caches()

    for b, c in zip(jax.tree.leaves(base), jax.tree.leaves(chunked)):
        np.testing.assert_array_equal(b, c)


def test_front_to_back_sweep_bit_exact():
    """The two-round front-to-back sweep (nearest tiles first, occlusion
    cutoff on the rest — the batched recast of the reference octree DFS's
    early exit, gpu/hit.cu:120-169) must return EXACTLY the single-sweep
    result: min dist, lowest slot on ties. k_near is forced tiny so round
    B really executes; rays include coherent front-hitters, wild randoms,
    and a parked (dead) tail whose ray tile must keep cutting nothing."""
    from raytracing_gpu_tpu.models.procedural import make_sphere_grid_scene

    scene = make_sphere_grid_scene(width=8, height=8, nx=2, ny=2, nz=2,
                                   n_lat=8, n_lon=16)
    dev = scene_to_device(scene)
    pack = pk.pack_geometry(dev.geometry.vertices, dev.geometry.valid,
                            dev.geometry.normals, dev.geometry.tri_obj)
    rng = np.random.RandomState(3)
    R = 512
    o = np.full((R, 3), [0.0, 0.0, -12.0], np.float32)
    o += rng.rand(R, 3).astype(np.float32) * 0.5
    d = rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0
    d[:, 2] = np.abs(d[:, 2]) + 0.5  # mostly toward the grid
    o[-128:] = 3e29  # parked tail
    d[-128:] = 0.0
    op, dp, _ = pk.pack_rays(jnp.asarray(o), jnp.asarray(d))
    mask = pk.tile_cull_mask_hierarchical(op, dp, pack, "octree")
    nt = mask.shape[0]
    assert nt >= 6, f"need several triangle tiles, got {nt}"

    base = jax.tree.map(np.asarray, pk.nearest_hit_pallas(
        op, dp, pack.v0, pack.e1, pack.e2, mask, 1e-7, 0.01))
    for k_near in (2, 4):
        f2b = jax.tree.map(np.asarray, pk.nearest_hit_front_to_back(
            op, dp, pack.v0, pack.e1, pack.e2, pack.tile_aabb,
            pack.tile_nonempty, mask, 1e-7, 0.01, k_near=k_near))
        np.testing.assert_array_equal(base[0], f2b[0])
        np.testing.assert_array_equal(base[1], f2b[1])
    # sanity: some rays hit, some missed, so both cutoff regimes ran
    finite = np.isfinite(base[0])
    assert finite.any() and (~finite).any()


def test_any_hit_matches_dist(scene):
    """The any-hit shadow kernel (round 5: dedicated boolean sweep with a
    per-ray-tile all-occluded early-out) must equal `nearest_dist != 0`
    exactly — same acceptance chain, no min-dist fold — including parked
    (dead) rays, which report unoccluded like collide_dist's 0.0."""
    from raytracing_gpu_tpu.ops import intersect
    from raytracing_gpu_tpu.ops.intersect import collide_any, collide_dist

    monkeypatch = pytest.MonkeyPatch()
    monkeypatch.setattr(intersect, "ANY_HIT_MIN_TRIS", 0)  # force the kernel
    dev = scene_to_device(scene)
    rng = np.random.RandomState(7)
    R = 512
    o = rng.rand(R, 3).astype(np.float32) * 6.0 - 3.0
    d = rng.rand(R, 3).astype(np.float32) * 2.0 - 1.0
    # park a scattered third of the rays exactly like the shading path does
    parked = rng.rand(R) < 0.33
    o[parked] = 3e29
    d[parked] = 0.0
    o, d = jnp.asarray(o), jnp.asarray(d)
    for partitioning in ("none", "octree"):
        occ = np.asarray(collide_any(o, d, dev.geometry, backend="pallas",
                                     partitioning=partitioning))
        fd = np.asarray(collide_dist(o, d, dev.geometry, backend="pallas",
                                     partitioning=partitioning))
        np.testing.assert_array_equal(occ, fd != 0.0,
                                      err_msg=f"partitioning={partitioning}")
        assert not occ[np.asarray(parked)].any()
    # jnp fallback derives from collide_dist — boolean identical too
    occ_jnp = np.asarray(collide_any(o, d, dev.geometry, backend="jnp"))
    fd_jnp = np.asarray(collide_dist(o, d, dev.geometry, backend="jnp"))
    np.testing.assert_array_equal(occ_jnp, fd_jnp != 0.0)
    monkeypatch.undo()
    # below the size gate the pallas route falls back to collide_dist too
    occ_small = np.asarray(collide_any(o, d, dev.geometry, backend="pallas"))
    np.testing.assert_array_equal(occ_small, fd != 0.0)


def test_any_hit_early_out_saturated_tile(scene):
    """A ray tile whose every live lane is occluded must still report the
    exact boolean (the early-out skips only provably-dead work): build a
    full TILE_R of rays aimed straight at the sphere so the tile saturates
    on the first triangle tile."""
    from raytracing_gpu_tpu.ops import intersect
    from raytracing_gpu_tpu.ops.intersect import collide_any, collide_dist

    monkeypatch = pytest.MonkeyPatch()
    monkeypatch.setattr(intersect, "ANY_HIT_MIN_TRIS", 0)  # force the kernel
    dev = scene_to_device(scene)
    R = pk.TILE_R
    # straight down onto the ground quad at y=0: every lane hits
    o = np.tile(np.array([[0.0, 5.0, 0.0]], np.float32), (R, 1))
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (R, 1))
    o, d = jnp.asarray(o), jnp.asarray(d)
    occ = np.asarray(collide_any(o, d, dev.geometry, backend="pallas"))
    fd = np.asarray(collide_dist(o, d, dev.geometry, backend="pallas"))
    np.testing.assert_array_equal(occ, fd != 0.0)
    assert occ.all()
    monkeypatch.undo()
