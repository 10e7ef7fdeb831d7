"""Checkpoint/resume round-trip for the training state."""

import numpy as np
import pytest

import jax

from raytracing_gpu_tpu.models.procedural import make_sphere_scene
from raytracing_gpu_tpu.models.scene import scene_to_device
from raytracing_gpu_tpu.parallel.train import extract_params, init_train_state

try:
    import orbax.checkpoint  # noqa: F401

    HAS_ORBAX = True
except ImportError:
    HAS_ORBAX = False

pytestmark = pytest.mark.skipif(not HAS_ORBAX, reason="orbax not installed")


def test_checkpoint_roundtrip(tmp_path):
    from raytracing_gpu_tpu.parallel.checkpoint import (
        latest_checkpoint,
        resume_or_init,
        save_train_state,
    )

    scene = scene_to_device(make_sphere_scene(width=8, height=8, n_lat=6, n_lon=9))
    state = init_train_state(scene)
    ckdir = str(tmp_path / "ckpts")
    p = save_train_state(ckdir, state)
    assert latest_checkpoint(ckdir) == p

    fresh = init_train_state(scene)
    restored, resumed = resume_or_init(ckdir, fresh)
    assert resumed
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(restored.params[k]), np.asarray(state.params[k]), err_msg=k
        )
    assert int(jax.device_get(restored.step)) == 0

    # empty dir -> init
    _, resumed2 = resume_or_init(str(tmp_path / "nothing"), fresh)
    assert not resumed2
