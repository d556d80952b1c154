"""Measured autotuning of the Pippenger pipeline constants.

The reference hard-codes every tuning constant with "TODO - learn how to
calculate this" notes (src/metal/msm.rs:140,375; bucket_wise_accumulation.rs:
38-49; sum_reduction.rs:38,109,162). Here the knobs (window_bits, scan_lanes,
reduce_fanout) are swept ON DEVICE, the measurements are persisted to a
committed JSON table, and `tpu_msm.utils.config.select_config` consults that
table per (platform, log-size) before falling back to the cost-model
heuristic.

CLI:
    python -m tpu_msm.utils.autotune --log-sizes 16 18 20 --repeats 3
    python -m tpu_msm.utils.autotune --show
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

TABLE_PATH = Path(__file__).with_name("tuned_configs.json")

# Sweep space. window_bits in {8, 16} keeps digit extraction limb-aligned
# (free); scan_lanes bounded by the fused-kernel VMEM budget
# (pippenger._FUSED_MAX_LANES); fanout shapes the bucket-query reduction;
# signed_digits halves the bucket range (balanced windows).
DEFAULT_SPACE = {
    "window_bits": [8, 16],
    "scan_lanes": [2048, 4096, 8192],
    "reduce_fanout": [1024, 2048, 4096],
    "signed_digits": [False, True],
    "field_impl": ["u16", "f15"],
}

_KNOBS = ("window_bits", "scan_lanes", "reduce_fanout", "signed_digits",
          "field_impl", "segment_starts", "window_batch", "glv",
          "scan_step_batch", "sort_impl")


def _platform() -> str:
    import jax

    return jax.default_backend()


_table_cache: tuple = (None, None)  # (mtime, parsed) — lookup() sits on the
# per-MSM dispatch path via select_config, so re-parsing the JSON per call
# would add file I/O to every msm()/msm_best().


def load_table() -> dict:
    global _table_cache
    if not TABLE_PATH.exists():
        return {}
    mtime = TABLE_PATH.stat().st_mtime_ns
    if _table_cache[0] != mtime:
        try:
            with open(TABLE_PATH) as f:
                _table_cache = (mtime, json.load(f))
        except (json.JSONDecodeError, OSError) as e:
            # lookup() sits on the per-MSM dispatch path: a truncated or
            # corrupt committed table must degrade to the heuristic, never
            # crash msm()/msm_best().
            print(f"autotune: ignoring unreadable {TABLE_PATH}: {e}",
                  file=sys.stderr)
            _table_cache = (mtime, {})
    return _table_cache[1]


def _write_table(table: dict) -> None:
    """Atomic write (tmp + os.replace): a SIGTERM mid-write must never leave
    a truncated JSON for a later session to commit."""
    tmp = TABLE_PATH.with_name(TABLE_PATH.name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, TABLE_PATH)


def lookup(n: int, platform: Optional[str] = None) -> Optional[dict]:
    """Best measured config for size n on this platform, or None.

    Accepts the nearest measured log size within +/-1 (timings vary smoothly
    in log n); beyond that the heuristic is a safer bet than extrapolating.
    """
    table = load_table()
    if platform is None:
        try:
            platform = _platform()
        except Exception:
            return None
    rows = table.get(platform)
    if not rows:
        return None
    logn = max(1, (n - 1).bit_length())
    best_key = None
    for key in rows:
        dist = abs(int(key) - logn)
        if dist <= 1 and (best_key is None or dist < abs(int(best_key) - logn)):
            best_key = key
    return rows[best_key]["best"] if best_key is not None else None


def measure(log_size: int, cfg_kwargs: dict, repeats: int = 3) -> float:
    """Median wall seconds of one jitted device MSM at 2^log_size.

    NOTE: on the tunneled TPU platform `block_until_ready` returns at
    ENQUEUE time, so every timed run must end with a (tiny) device->host
    fetch — without it the r3 sweep recorded 0.2 ms "measurements" of a
    570 ms pipeline and would have committed a noise-ranked table onto the
    dispatch path. Same caveat as bench.py / cli.profiler._sync.
    """
    import numpy as _np
    import jax.numpy as jnp

    from tpu_msm import msm_device
    from tpu_msm.utils import preprocess
    from tpu_msm.utils.config import MsmConfig

    def _sync(res):
        _np.asarray(res.x.ravel()[0:1])
        return res

    cfg = MsmConfig(**cfg_kwargs)
    [inst] = preprocess.get_or_create_msm_instances(log_size, 1)
    px, py, sl = (jnp.asarray(a) for a in (inst.px, inst.py, inst.scalars))
    _sync(msm_device(px, py, sl, cfg))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(msm_device(px, py, sl, cfg))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _merge_row(rows: dict, log_size: int, result: dict) -> None:
    """Merge one measurement into rows[log_size], keyed by knob values, so
    successive focused sweeps (base grid, then segment_starts, then
    window_batch) compose: best = argmin over the union."""
    prior = rows.get(str(log_size), {}).get("measurements", [])
    seen = {tuple(sorted((k, v) for k, v in r.items()
                         if k in _KNOBS)): r for r in prior}
    seen[tuple(sorted((k, v) for k, v in result.items()
                      if k in _KNOBS))] = result
    merged = sorted(seen.values(), key=lambda r: r["seconds"])
    rows[str(log_size)] = {
        "best": {k: merged[0][k] for k in _KNOBS if k in merged[0]},
        "measurements": merged,
    }


def sweep(log_sizes: List[int], space: Dict[str, list] = None,
          repeats: int = 3, verbose: bool = True) -> dict:
    """Run the sweep, merging into the table and checkpointing it to disk
    after EVERY measured combo — a session timeout mid-sweep keeps all
    measurements taken so far (round 2 lost a full 900 s sweep to a
    write-only-at-the-end design)."""
    space = space or DEFAULT_SPACE
    from tpu_msm.utils.config import enable_persistent_cache

    enable_persistent_cache()
    platform = _platform()
    table = load_table()
    rows = table.setdefault(platform, {})
    for log_size in log_sizes:
        n = 1 << log_size
        keys = list(space.keys())
        for combo in itertools.product(*(space[k] for k in keys)):
            kw = dict(zip(keys, combo))
            if kw.get("scan_lanes", 0) * 2 > n:
                continue  # thinner than one point per lane
            try:
                t = measure(log_size, kw, repeats)
            except Exception as e:  # OOM / unsupported combo: record + skip
                if verbose:
                    print(f"  2^{log_size} {kw}: FAILED ({type(e).__name__})",
                          flush=True)
                continue
            _merge_row(rows, log_size, {**kw, "seconds": round(t, 6),
                                        "points_per_s": round(n / t, 1)})
            _write_table(table)
            if verbose:
                print(f"  2^{log_size} {kw}: {t*1e3:.1f} ms "
                      f"({n/t/1e6:.3f} Mpts/s)", flush=True)
    return table


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--log-sizes", type=int, nargs="+", default=[16, 18, 20])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--show", action="store_true",
                    help="print the current table and exit")
    args = ap.parse_args(argv)
    if args.show:
        json.dump(load_table(), sys.stdout, indent=1, sort_keys=True)
        print()
        return 0
    sweep(args.log_sizes, repeats=args.repeats)
    print(f"table written to {TABLE_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
