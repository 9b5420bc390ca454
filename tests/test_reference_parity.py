"""Full-sequence accuracy parity vs the locally built reference CPU oracle.

Builds the reference CPU baseline (/root/reference/kroeger, OF_DIS) via
tools/kroeger_oracle/build.sh (minimal Eigen shim; nothing copied into this
repo) and asserts the BASELINE.md accuracy bound as a tested property
instead of a comment:

  * flow-field agreement: EPE(ours, oracle) stays in the band measured over
    the full 49-pair sequence (see PARITY.md / parity.json, mean 0.145 px,
    max 0.56 px);
  * accuracy: photometric warp error of our flow is within 2% of the
    oracle's (sequence study: ours is ~2% BETTER, ratio 0.979).

The full 49-pair study is tools/reference_parity.py; this test samples
frames across the sequence to keep CI time bounded.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_IMAGES = "/root/reference/images/alley_1"
ORACLE_BUILD = os.environ.get("KROEGER_ORACLE_DIR", "/tmp/kroeger_oracle")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("pkg-config") is None
    or subprocess.run(["pkg-config", "--exists", "opencv4"]).returncode != 0
    or not os.path.isdir("/root/reference/kroeger"),
    reason="reference CPU oracle not buildable here")


@pytest.fixture(scope="module")
def oracle_binary():
    binary = os.path.join(ORACLE_BUILD, "run_OF_RGB")
    if not os.path.exists(binary):
        subprocess.run(
            ["bash", os.path.join(REPO, "tools/kroeger_oracle/build.sh"),
             ORACLE_BUILD], check=True, capture_output=True)
    return binary


def _oracle_flow(binary, i):
    out = os.path.join(ORACLE_BUILD, f"oracle_{i:04d}.flo")
    if not os.path.exists(out):
        subprocess.run(
            [binary, f"{REF_IMAGES}/frame_{i:04d}.png",
             f"{REF_IMAGES}/frame_{i + 1:04d}.png", out, "2"],
            check=True, capture_output=True)
    from flowonthego_tpu.io.flo import read_flo
    return read_flo(out)


def test_oracle_matches_bundled_flow(oracle_binary):
    """The freshly built oracle reproduces the bundled 2017 result up to
    OpenCV-version numerics drift — validates the Eigen-shim build."""
    from flowonthego_tpu.io.flo import read_flo
    from flowonthego_tpu.utils.metrics import average_epe
    oracle = _oracle_flow(oracle_binary, 1)
    bundled = read_flo("/root/reference/kroeger/flows/alley_0001.flo")
    assert average_epe(oracle, bundled) < 0.1


@pytest.mark.slow
def test_sequence_parity(oracle_binary):
    """EPE band + 2%-of-reference warp-error bound on sampled frames."""
    from flowonthego_tpu.config import operating_point
    from flowonthego_tpu.io.images import load_image
    from flowonthego_tpu.models.dis_flow import compute_flow
    from flowonthego_tpu.utils.metrics import average_epe
    import sys
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from reference_parity import warp_error

    frames = [1, 17, 33, 49]
    cfg = operating_point(2, width=1024)
    we_ours, we_oracle = [], []
    for i in frames:
        oracle = _oracle_flow(oracle_binary, i)
        I0 = load_image(f"{REF_IMAGES}/frame_{i:04d}.png")
        I1 = load_image(f"{REF_IMAGES}/frame_{i + 1:04d}.png")
        ours = np.asarray(compute_flow(I0, I1, cfg=cfg))
        epe = average_epe(ours, oracle)
        # full-sequence max is 0.56 px (parity.json); band with headroom
        assert epe < 0.8, f"frame {i}: EPE {epe:.3f} vs oracle"
        we_ours.append(warp_error(ours, I0, I1))
        we_oracle.append(warp_error(oracle, I0, I1))
    ratio = np.mean(we_ours) / np.mean(we_oracle)
    # BASELINE.md: accuracy within 2% of the reference
    assert ratio <= 1.02, f"warp-error ratio {ratio:.4f} exceeds 1.02"
