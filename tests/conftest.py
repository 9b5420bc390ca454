"""Test configuration: run everything on CPU with 8 virtual devices.

The sharded paths are exercised on a fake 8-device mesh (XLA
--xla_force_host_platform_device_count), per SURVEY.md §4 — distributed
logic is tested without a pod.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the shell's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def sintel_pair():
    """First Sintel alley_1 frame pair (1024x436 BGR float32)."""
    from flowonthego_tpu.io.images import load_image
    base = "/root/reference/images/alley_1"
    return (load_image(f"{base}/frame_0001.png"),
            load_image(f"{base}/frame_0002.png"))


@pytest.fixture(scope="session")
def reference_flow():
    """The bundled reference result flow (kroeger/flows/alley_0001.flo)."""
    from flowonthego_tpu.io.flo import read_flo
    return read_flo("/root/reference/kroeger/flows/alley_0001.flo")


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
