"""Montgomery-multiply throughput microbenchmark (the BASELINE.md kernel
acceptance metric: per-chip mont-mul rate within 1.5x of the VPU roofline).

Times a fused Pallas kernel that chains K dependent Montgomery multiplies
per lane entirely in VMEM scratch (chaining defeats dead-code elimination
and mirrors how the EC formulas consume the multiplier), for both limb
cores (u16 and f15). Reference analogue: the mul shader is the unit of all
cost in the reference too (CIOS at fp_bn254.h.metal:237-290) — it just never
measured it.

    python benches/montmul_benchmark.py --lanes 65536 --chain 256 --iters 3
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _build_kernel(impl: str, chain: int, r: int, ilp: int = 1):
    """ilp > 1 keeps `ilp` INDEPENDENT dependency chains live per step and
    interleaves their muls — measures how much of the kernel-vs-model gap
    is serialization (too few independent op pairs for the VPU's second
    issue slot) rather than op count. The real scan kernel's EC formulas
    carry ~4-11 semi-independent muls per stage, so the dependent single
    chain (ilp=1) is the pessimistic bound and ilp~4 the optimistic one."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_msm.ops import f15, fmxu
    from tpu_msm.ops import pallas_curve as pc

    nrows = pc.NROWS

    def body(rows, xin, mats):
        if impl in ("f15", "f15c", "mxu"):
            mul = {"f15": f15.mont_mul_conv, "f15c": f15.mont_mul_cios}.get(
                impl) or functools.partial(fmxu.mont_mul, gpinv=mats[0],
                                           gp=mats[1])
            rows15 = f15.from_u16_rows(rows)
            x15 = f15.from_u16_rows(xin)
            if ilp > 1:
                chains = [rows15[k:] + rows15[:k] for k in range(ilp)]
                for _ in range(chain):
                    chains = [mul(c, x15) for c in chains]
                acc = chains[0]
                for c in chains[1:]:  # xor-fold keeps every chain live
                    acc = [a ^ b for a, b in zip(acc, c)]
                rows15 = [a & np.uint32(f15.MASK) for a in acc]
            else:
                for _ in range(chain):
                    rows15 = mul(rows15, x15)
            return f15.to_u16_rows(rows15)
        if ilp > 1:
            chains = [rows[k:] + rows[:k] for k in range(ilp)]
            for _ in range(chain):
                chains = [pc.mont_mul(c, xin) for c in chains]
            acc = chains[0]
            for c in chains[1:]:
                acc = [a ^ b for a, b in zip(acc, c)]
            return [a & np.uint32(0xFFFF) for a in acc]
        for _ in range(chain):
            rows = pc.mont_mul(rows, xin)
        return rows

    def kernel(*refs):
        mats = [refs[i][...] for i in range(len(refs) - 3)]
        x_ref, out_ref, acc = refs[-3], refs[-2], refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[...] = x_ref[...]

        rows = body([acc[i] for i in range(nrows)],
                    [x_ref[i] for i in range(nrows)], mats)
        acc[...] = jnp.stack(rows)
        out_ref[...] = acc[...]

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(x, steps: int):
        spec = pl.BlockSpec((nrows, r, pc.LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
        mat_args = []
        in_specs = []
        if impl == "mxu":
            for m in (fmxu.G_PINV_PACKED, fmxu.G_P_PACKED):
                mat_args.append(jnp.asarray(m))
                in_specs.append(pl.BlockSpec(
                    m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=in_specs + [spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nrows, r, pc.LANE), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((nrows, r, pc.LANE), jnp.uint32)],
        )(*mat_args, x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=65536)
    ap.add_argument("--chain", type=int, default=64,
                    help="dependent muls per grid step (trace-unrolled)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impls", nargs="+", default=["u16", "f15"],
                    choices=["u16", "f15", "f15c", "mxu"])
    ap.add_argument("--ilp", type=int, default=1,
                    help="independent interleaved chains per step (ILP "
                         "headroom probe; 1 = dependent chain)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpu_msm.utils.config import enable_persistent_cache

    enable_persistent_cache()

    from tpu_msm.models import bn254
    from tpu_msm.utils import interop
    from tpu_msm.utils.profiling import MONT_MUL_U32_OPS, VPU_U32_OPS_PER_S

    r = args.lanes // 128
    rng = np.random.RandomState(11)
    vals = [int.from_bytes(rng.bytes(32), "little") % bn254.P
            for _ in range(min(args.lanes, 128))]
    x = np.tile(interop.ints_to_limbs(vals), args.lanes // len(vals))
    x = jnp.asarray(x.reshape(16, r, 128))

    out = {}
    for impl in args.impls:
        run = _build_kernel(impl, args.chain, r, ilp=args.ilp)
        res = run(x, steps=args.steps)
        np.asarray(res[0, 0, 0])  # sync
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = run(x, steps=args.steps)
            np.asarray(res[0, 0, 0])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[len(times) // 2]
        muls = args.lanes * args.chain * args.steps * args.ilp
        rate = muls / sec
        peak = VPU_U32_OPS_PER_S / MONT_MUL_U32_OPS.get(impl, MONT_MUL_U32_OPS["f15"])
        out[impl] = {
            "mont_mul_per_s": round(rate, 1),
            "seconds": round(sec, 6),
            "roofline_per_s": round(peak, 1),
            "ratio_to_roofline": round(peak / rate, 3),
        }
        print(f"{impl}: {rate/1e6:.1f}M mont-mul/s "
              f"({out[impl]['ratio_to_roofline']}x off the "
              f"{MONT_MUL_U32_OPS.get(impl, MONT_MUL_U32_OPS['f15'])}-u32-op roofline)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
