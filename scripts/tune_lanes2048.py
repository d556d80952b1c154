"""Probe the unmeasured scan_lanes=2048 rows at 2^20.

The r3 sweep measured 8192 -> 4096 lanes as an 8% end-to-end win (narrower
scan halves the lane-carry tree while steps double; smaller working set).
2048 is in DEFAULT_SPACE but was never measured on HW. This continues the
trend probe one step down, with both plausible fanouts, on top of the
current best knobs (c=16 / signed / f15 / ss_scan).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpu_msm.utils import autotune

space = {
    "window_bits": [16],
    "scan_lanes": [2048],
    "reduce_fanout": [1024, 2048],
    "signed_digits": [True],
    "field_impl": ["f15"],
    "segment_starts": ["ss_scan"],
}
autotune.sweep([20], space=space, repeats=3)
print("sweep done")
