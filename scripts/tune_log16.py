"""One-shot tuned-table row for log 16 (BASELINE config 2's weak spot).

The heuristic picks c=8 at 2^16 (33 windows, per-window overheads dominate:
0.34 Mpts/s, artifacts/bench_log16.log). Measure the large-n production
config (c=16 / signed / f15 / ss_scan) at 2^16 so `select_config` can serve
a measured row for 2^15..2^17 (lookup serves +/-1 log size).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpu_msm.utils import autotune

best = {
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15"],
    "segment_starts": ["ss_scan"],
}
autotune.sweep([16], space=best, repeats=3)
print("sweep done")
