"""Measure the sharded layer's collective cost on the virtual CPU mesh.

VERDICT r3 #6: the >=80% multi-host scaling acceptance rested on literature
constants only. One physical chip exists, so the ICI/DCN hop times stay
modeled — but the STACK-side inputs of that model (collective rounds,
payload bytes, and the wall-time overhead of the collective + replicated
tail versus pure local compute, all through the real shard_map programs)
are measurable right here on the 8-virtual-device CPU mesh. This script
measures them and the committed log feeds BASELINE.md's model.

Weak scaling: n_per_chip is fixed, D in {2, 4, 8}; local compute per chip is
constant by construction, so any growth in wall time is collective + tail.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/collective_timing.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp  # noqa: E402

    from tpu_msm.ops import pippenger  # noqa: E402
    from tpu_msm.ops.curve import AffinePoint  # noqa: E402
    from tpu_msm.parallel import sharded  # noqa: E402
    from tpu_msm.utils import interop, oracle  # noqa: E402
    from tpu_msm.utils.config import MsmConfig  # noqa: E402

    # Production-shaped PAYLOAD (W = 16 windows => the 3 KB per-chip
    # collective payload the BASELINE model assumes) with tiny per-window
    # graphs: c = 8 with 120-bit scalars gives ceil(121/8) = 16 windows and
    # only 2^7 bucket queries per window — the c=16/254-bit graph's 2^15
    # queries are uncompilable in bounded time on this 1-core host (same
    # reason tests/test_sharded.py caps scalar_bits).
    n_per = 64
    cfg = MsmConfig(window_bits=8, scan_lanes=16, signed_digits=True,
                    scalar_bits=120, backend="jnp")
    rng = np.random.RandomState(20260820)

    def inputs(n):
        ks = [int(rng.randint(1, 1 << 24)) for _ in range(n)]
        pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
        scalars = [int.from_bytes(rng.bytes(32), "little") % (1 << 120)
                   for _ in range(n)]
        px, py = interop.affine_points_to_limbs(pts)
        return px, py, interop.ints_to_limbs(scalars), pts, scalars

    def t_median(fn, iters=5):
        fn()  # warm (compile excluded)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            r = fn()
            jax.tree_util.tree_map(lambda a: np.asarray(a), r)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    out = {"n_per_chip": n_per, "cfg": str(cfg),
           "payload_bytes_per_chip": cfg.num_windows() * 3 * 16 * 4}
    # Single-device local reference (the model's compute denominator shape).
    px, py, sl, pts, scalars = inputs(n_per)
    dpx, dpy, dsl = jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)

    def single():
        return pippenger.msm_projective(AffinePoint(dpx, dpy), dsl, cfg)

    t_single = t_median(jax.jit(single, static_argnames=()))
    out["t_local_single_chip_s"] = round(t_single, 6)
    print(f"single-chip local (n={n_per}): {t_single*1e3:.1f} ms", flush=True)

    for d in (2, 4, 8):
        mesh = sharded.default_mesh(jax.devices("cpu")[:d])
        n = n_per * d
        px, py, sl, pts, scalars = inputs(n)
        want = oracle.msm(scalars, pts)
        row = {}
        for coll in ("gather_tree", "ppermute_tree"):
            fn = sharded.make_sharded_msm(mesh, cfg, collective=coll)
            arrs = sharded.shard_arrays(mesh, "data", px, py, sl)
            res = fn(*arrs)
            [got] = interop.proj_limbs_to_affine_points(
                np.asarray(res.x), np.asarray(res.y), np.asarray(res.z))
            assert got == want, (d, coll)
            t = t_median(lambda: fn(*arrs))
            row[coll] = round(t, 6)
            print(f"D={d} {coll}: {t*1e3:8.1f} ms (correct ✓)", flush=True)
        row["overhead_vs_local_s"] = round(
            min(row.values()) - t_single, 6)
        out[f"D{d}"] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
