"""Worker process for the 2-process localhost multihost test.

Launched twice by tests/test_multihost.py with a shared coordinator address;
each process owns 2 virtual CPU devices (4 global). This executes the REAL
multi-process code path — jax.distributed.initialize forming the group and
render_scene_multihost's process_allgather branch — which single-process
tests can never reach. Usage:

    python _multihost_worker.py <coordinator> <process_id> <out_prefix>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coord, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    # The axon sitecustomize force-sets jax_platforms at interpreter start;
    # undo it before any backend (or the distributed client) initializes.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from raytracing_gpu_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, f"process_count={jax.process_count()}"
    assert len(jax.devices()) == 4, f"devices={len(jax.devices())}"

    from raytracing_gpu_tpu.config import RenderConfig
    from raytracing_gpu_tpu.models.procedural import make_sphere_scene

    scene = make_sphere_scene(width=16, height=16, n_lat=8, n_lon=12)
    cfg = RenderConfig(mode="cpu", quantize="match", ray_chunk=512)
    mesh = multihost.global_mesh(tiles=4, scene_shards=1)
    img = multihost.render_scene_multihost(scene, cfg, mesh)
    np.save(f"{out}.{pid}.npy", np.asarray(img))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
