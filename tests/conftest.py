"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware (set RGT_TEST_TPU=1 to run on the real chip
instead). Must run before jax is imported anywhere.
"""

import os

if not os.environ.get("RGT_TEST_TPU"):
    # Force-override: the environment bakes JAX_PLATFORMS=axon (remote TPU
    # tunnel); tests must NOT claim the single TPU chip.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("RGT_TEST_TPU"):
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at
    # interpreter start (overriding JAX_PLATFORMS); undo it before any
    # backend is initialized so tests never claim the single TPU chip.
    import jax

    jax.config.update("jax_platforms", "cpu")
