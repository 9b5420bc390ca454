"""Compare two .flo files (average endpoint / angular error).

Evaluation-methodology parity with the reference's Middlebury tooling
(/root/reference/flow_code/C, docs/index.md:127-148):

    python tools/flow_eval.py computed.flo reference.flo
"""

import sys

sys.path.insert(0, ".")


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 2
    import numpy as np
    from flowonthego_tpu.io.flo import read_flo
    from flowonthego_tpu.utils.metrics import (average_epe, angular_error,
                                               endpoint_error)

    flow = read_flo(argv[0])
    gt = read_flo(argv[1])
    if flow.shape != gt.shape:
        print(f"size mismatch: {flow.shape} vs {gt.shape}")
        return 1
    epe = endpoint_error(flow, gt)
    ang = angular_error(flow, gt)
    gt_mag = np.sqrt((gt ** 2).sum(-1))
    print(f"avg EPE        : {np.nanmean(epe):.4f} px")
    print(f"EPE p50 / p90  : {np.nanpercentile(epe, 50):.4f} / "
          f"{np.nanpercentile(epe, 90):.4f} px")
    print(f"avg AE         : {np.nanmean(ang):.3f} deg")
    print(f"normalized EPE : {100 * np.nanmean(epe) / max(gt_mag.mean(), 1e-9):.2f}%"
          f"  (mean |gt| = {gt_mag.mean():.3f} px)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
