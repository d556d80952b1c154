"""Round-5 focused autotune sweeps: the new segment_starts='hist' and
sort_impl='rank' knobs on top of each size's best known base, GLV
re-measured at the mid sizes under whichever sort wins (VERDICT r4 next #2),
and first-ever rows for the unswept 2^14/2^17/2^18/2^19 band (next #5).

Ordering puts the headline 2^20 rows first so the most valuable
measurements land even if the session budget cuts the tail. Every combo
checkpoints the table to disk (autotune.sweep).

    python scripts/tune_r5.py [phase]   # phase in {20, mid, band, 22}
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpu_msm.utils import autotune

BASE20 = {
    "window_bits": [16], "scan_lanes": [4096], "reduce_fanout": [2048],
    "signed_digits": [True], "field_impl": ["f15d"],
}

PHASES = {
    # Headline size: hist vs ss_scan, then rank vs payload under the best
    # starts, then GLV re-measured under the r5 stages (its r4 loss was
    # pure sort superlinearity).
    "20": [
        ([20], {**BASE20, "segment_starts": ["hist"]}),
        ([20], {**BASE20, "segment_starts": ["hist"],
                "sort_impl": ["rank"]}),
        ([20], {**BASE20, "segment_starts": ["ss_scan"],
                "sort_impl": ["rank"]}),
        ([20], {**BASE20, "segment_starts": ["hist"], "glv": [True]}),
    ],
    # Refinement around the hist winner: with the searchsorted stage gone
    # the lanes/step-batch balance may shift (the r3 4096-lane verdict was
    # measured under ss_scan's gather pressure).
    "20b": [
        ([20], {**BASE20, "scan_lanes": [8192], "reduce_fanout": [4096],
                "segment_starts": ["hist"]}),
        ([20], {**BASE20, "segment_starts": ["hist"],
                "scan_step_batch": [4]}),
    ],
    # Mid band: first measured rows at 17/18/19 (glv on/off x hist).
    "band": [
        ([18], {**BASE20, "segment_starts": ["hist"],
                "glv": [False, True]}),
        ([17], {**BASE20, "segment_starts": ["hist"],
                "glv": [False, True]}),
        ([19], {**BASE20, "segment_starts": ["hist"],
                "glv": [False, True]}),
        ([14], {**BASE20, "scan_lanes": [2048],
                "segment_starts": ["hist"], "glv": [False, True]}),
    ],
    # 2^16 refresh: the tuned row is glv+ss_scan+k4; try hist under it.
    "mid": [
        ([16], {**BASE20, "segment_starts": ["hist"], "glv": [True],
                "scan_step_batch": [4]}),
        ([16], {**BASE20, "segment_starts": ["hist"], "glv": [True],
                "scan_step_batch": [4], "sort_impl": ["rank"]}),
    ],
    # 2^22: carry the 2^20 winner up.
    "22": [
        ([22], {**BASE20, "segment_starts": ["hist"]}),
        ([22], {**BASE20, "segment_starts": ["hist"],
                "sort_impl": ["rank"]}),
        ([22], {**BASE20, "segment_starts": ["hist"], "glv": [True]}),
    ],
}


def main() -> int:
    phases = sys.argv[1:] or ["20", "mid", "band", "22"]
    for ph in phases:
        for log_sizes, space in PHASES[ph]:
            autotune.sweep(log_sizes, space=space, repeats=3)
    print("tune_r5 done:", " ".join(phases))
    return 0


if __name__ == "__main__":
    sys.exit(main())
