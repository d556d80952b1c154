"""Attribute the non-sort non-scan residual of a window (the 'sides').

Times each side stage in isolation at production shape (2^20, c=16 signed,
4096 lanes), checksum-forced, with the measured dispatch RTT subtracted.
Stages: inter-lane carry scan, bucket-boundary query gather + adds,
ec_reduce of the X(s_b) batch, and the Horner fold.

    python scripts/probe_sides.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tpu_msm.utils.config import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from tpu_msm.ops import curve, pippenger
    from tpu_msm.ops.curve import ProjPoint

    lanes, steps, m = 4096, 256, 1 << 15
    w = 16
    rng = np.random.RandomState(9)

    def u32(*shape):
        return jnp.asarray(rng.randint(0, 1 << 31, shape, dtype=np.int64)
                           .astype(np.uint32))

    def med(fn, iters=5):
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn())[...]
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    one = jnp.ones((8, 128), jnp.uint32)
    rtt = med(lambda: jax.jit(lambda a: a + 1)(one)[0, 0:1])
    print(f"RTT floor: {rtt*1e3:.2f} ms", flush=True)
    rows = {"rtt_s": round(rtt, 6)}

    def report(name, t, per_window=True):
        net = t - rtt
        rows[name] = round(net, 6)
        tot = net * w if per_window else net
        print(f"{name}: {t*1e3:.1f} ms raw, {net*1e3:.1f} ms net"
              + (f" -> x{w} = {tot*1e3:.0f} ms" if per_window else ""),
              flush=True)

    # 1. inter-lane carry scan (12 rounds of 4096-wide rolled padd).
    totals = ProjPoint(u32(16, lanes), u32(16, lanes), u32(16, lanes))
    f = jax.jit(lambda p: sum(a.sum(dtype=jnp.uint32) for a in
                              pippenger._lane_inclusive_scan(
                                  p, lanes, "pallas", "f15")))
    report("lane_scan", med(lambda: f(totals)))

    # 2. query gather (48 rows x m+1 positions from (48, steps, lanes))
    #    + the lane-carry gather + the wide query add + select.
    ys48 = u32(48, steps, lanes)
    car48 = u32(48, lanes)
    q = jnp.asarray(rng.randint(0, steps * lanes, m + 4096).astype(np.int32))

    def queries(ys, car, qpos):
        is_zero = qpos == 0
        pos = jnp.maximum(qpos, 1) - 1
        lq = (pos // steps).astype(jnp.int32)
        kq = (pos % steps).astype(jnp.int32)
        loc = ys[:, kq, lq]
        local = ProjPoint(loc[0:16], loc[16:32], loc[32:48])
        c = car[:, lq]
        lane_carry = ProjPoint(c[0:16], c[16:32], c[32:48])
        x = pippenger.ec_add(lane_carry, local, "pallas", "f15")
        x = curve.select_point(is_zero,
                               curve.proj_infinity((qpos.shape[0],)), x)
        return sum(a.sum(dtype=jnp.uint32) for a in x)

    f = jax.jit(queries)
    report("query_gather_add", med(lambda: f(ys48, car48, q)))

    # 2b. the gather alone (no EC math) to split gather vs add.
    f = jax.jit(lambda ys, qpos: ys[:, qpos % steps, qpos // steps]
                .sum(dtype=jnp.uint32))
    report("query_gather_only", med(lambda: f(ys48, q)))

    # 3. ec_reduce of the X(s_b) batch (fanout 2048).
    xs = ProjPoint(u32(16, m), u32(16, m), u32(16, m))  # pipeline width: exactly m (pow2)
    f = jax.jit(lambda p: sum(a.sum(dtype=jnp.uint32) for a in
                              pippenger.ec_reduce(p, 2048, "pallas", "f15")))
    report("ec_reduce", med(lambda: f(xs)))

    # 4. Horner fold over 16 windows (c=16): 15*16 doublings + 15 adds,
    #    all at batch width 1 — narrow sequential ops, fixed cost each.
    ws = ProjPoint(u32(w, 16, 1), u32(w, 16, 1), u32(w, 16, 1))
    f = jax.jit(lambda p: sum(a.sum(dtype=jnp.uint32) for a in
                              pippenger.horner_fold(p, 16)))
    report("horner_fold_total", med(lambda: f(ws)), per_window=False)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
