"""2-process multihost test: the process_allgather branch actually executes.

The reference has nothing distributed (SURVEY §2.5); our multi-host layer
(parallel/multihost.py) was previously only tested single-process, which
short-circuits before jax.distributed and process_allgather. Here two
subprocesses on localhost form a real 2-process JAX group over the CPU
backend (2 virtual devices each -> a 4-device global mesh) and both must
produce the full image, equal to the single-process render.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_two_process_allgather(tmp_path, backend):
    """backend="pallas" runs the flagship kernel path (scalar-prefetched
    worklist grids + octree tile hierarchy) across a REAL process boundary
    for both the render and the training step — the shard_map +
    jax.distributed + Pallas composition seam (VERDICT r4 missing #2)."""
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "img")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_PROCESSES", None)
    # the axon sitecustomize registers the TPU-tunnel PJRT plugin at
    # interpreter start, which initializes the backend BEFORE
    # jax.distributed.initialize may run — disable it for the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             coord, str(pid), out, backend],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    # both processes assembled the full image, identically
    img0 = np.load(f"{out}.0.npy")
    img1 = np.load(f"{out}.1.npy")
    np.testing.assert_array_equal(img0, img1)

    # and it matches the single-process render bit-for-bit
    from raytracing_gpu_tpu.config import RenderConfig
    from raytracing_gpu_tpu.models.procedural import make_sphere_scene
    from raytracing_gpu_tpu.render import render_scene

    scene = make_sphere_scene(width=16, height=16, n_lat=8, n_lon=12)
    ref = render_scene(scene, RenderConfig(mode="cpu", quantize="match",
                                           ray_chunk=512, backend=backend))
    np.testing.assert_array_equal(np.trunc(ref), np.trunc(img0))

    # --- training across the process boundary (grad psum over the group):
    # both processes observed identical losses and parameters...
    tr0 = np.load(f"{out}.train.0.npz")
    tr1 = np.load(f"{out}.train.1.npz")
    np.testing.assert_array_equal(tr0["losses"], tr1["losses"])
    np.testing.assert_array_equal(tr0["kd"], tr1["kd"])
    assert np.all(np.isfinite(tr0["losses"]))
    # ...the loss went down (kd recovery is working over 2 processes)...
    assert tr0["losses"][-1] < tr0["losses"][0] * 0.95, tr0["losses"]

    # ...and they match a single-process run of the SAME 4-device-mesh
    # program (psum over in-process devices vs over the process boundary)
    from raytracing_gpu_tpu.parallel.mesh import make_mesh

    sys.path.insert(0, HERE)
    from _multihost_worker import _train_on_mesh

    losses_sp, kd_sp = _train_on_mesh(scene, make_mesh(4, 1),
                                      backend=backend)
    np.testing.assert_allclose(tr0["losses"], np.asarray(losses_sp),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(tr0["kd"], kd_sp, rtol=1e-6, atol=1e-7)
