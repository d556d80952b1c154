"""Tuned-table row for log 22 (BASELINE config 4) under the knob-tuned
production config (c=16 / signed / f15 / ss_scan), so select_config serves a
measured row for 2^21..2^23 and the large-size BASELINE row reflects the
segment-starts win measured at 2^20."""
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
autotune.sweep([22], space=best, repeats=3)
print("sweep done")
