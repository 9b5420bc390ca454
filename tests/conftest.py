"""Test configuration: run everything on CPU with 8 virtual devices.

The sharded paths are exercised on a fake 8-device mesh (XLA
--xla_force_host_platform_device_count), per SURVEY.md §4 — distributed
logic is tested without a pod.  Must run before jax is imported.
"""

import os
import sys

# The axon TPU plugin reads the platform env vars at interpreter startup
# (site hook), so mutating os.environ here is too late — re-exec pytest
# once with the right environment instead.
if os.environ.get("_FOT_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # Unset the axon pool address so the site hook never registers the
    # TPU plugin at interpreter start: registration dials the tunnel
    # relay, and a busy/wedged TPU worker would block this CPU-only
    # suite at `import jax` for minutes.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["_FOT_TEST_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# Silence XLA:CPU's AOT-load chatter BEFORE anything compiles:
# deserializing even *same-machine* cache entries prints a full
# machine-feature dump at ERROR severity (the compile feature list always
# contains pseudo-features like +prefer-no-scatter that no host cpuid
# has).  TF_CPP_MIN_LOG_LEVEL can't do this reliably — jax's __init__
# setdefaults it to '1' during pytest plugin loading, before this file
# runs — so we filter the exact noise lines at the fd level instead
# (utils/logfilter.py); real errors still reach the terminal.
from flowonthego_tpu.utils.logfilter import \
    install_stderr_noise_filter  # noqa: E402

install_stderr_noise_filter()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the suite is compile-bound (every test jits
# real pipelines); warm re-runs drop from ~10 min to seconds.  The cache
# dir is keyed by CPU feature set (utils/cache.py) so XLA:CPU AOT entries
# from a different host are never loaded (they warn "+prefer-no-gather is
# not supported ... could lead to execution errors such as SIGILL").
from flowonthego_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


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
