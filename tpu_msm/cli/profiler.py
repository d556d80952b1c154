"""MSM profiler CLI — parity with the reference's `gpu_profiler` binary
(src/bin/gpu_profiler.rs:17-172).

Usage (positional args mirror the reference's
`log_instance_size num_instances run_mode retries`):

    python -m tpu_msm.cli.profiler 20 5 tpu 10
    python -m tpu_msm.cli.profiler 16 3 check 1

Run modes (reference modes gpu | gpu_cpu | best_gpu | cpu | check,
gpu_profiler.rs:143-172, mapped to the TPU architecture):

    tpu      device MSM on the default platform        (≙ "gpu")
    sharded  mesh-sharded MSM over all visible devices (≙ "gpu_cpu" — the
             reference's heterogeneous split becomes multi-chip sharding)
    best     adaptive dispatcher msm_best              (≙ "best_gpu")
    cpu      native C++ host engine                    (≙ "cpu")
    check    run tpu AND cpu, assert identical results (≙ "check")

Per-stage timing goes through the standard `logging` module (reference uses
log::debug timers, msm.rs:193-215): set TPU_MSM_LOG=debug or -v.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

log = logging.getLogger("tpu_msm.profiler")


def _run_tpu(inst, cfg):
    import jax
    import jax.numpy as jnp

    from tpu_msm import msm_device

    res = msm_device(
        jnp.asarray(inst.px), jnp.asarray(inst.py), jnp.asarray(inst.scalars), cfg
    )
    jax.block_until_ready(res)
    return res


def _run_sharded(inst, cfg):
    import jax

    from tpu_msm.ops.curve import AffinePoint
    from tpu_msm.parallel import sharded
    import jax.numpy as jnp

    res = sharded.msm_sharded(
        AffinePoint(jnp.asarray(inst.px), jnp.asarray(inst.py)),
        jnp.asarray(inst.scalars),
        cfg=cfg,
    )
    jax.block_until_ready(res)
    return res


def _run_cpu(inst):
    from tpu_msm.bindings import native

    return native.msm(inst.px, inst.py, inst.scalars)


def _jac_to_affine(res):
    from tpu_msm.utils import interop

    [pt] = interop.jac_limbs_to_affine_points(
        np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
    )
    return pt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("log_instance_size", type=int)
    ap.add_argument("num_instances", type=int, nargs="?", default=1)
    ap.add_argument("run_mode", nargs="?", default="tpu",
                    choices=["tpu", "sharded", "best", "cpu", "check"])
    ap.add_argument("retries", type=int, nargs="?", default=1)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    from tpu_msm.utils import preprocess
    from tpu_msm.utils.config import select_config

    n = 1 << args.log_instance_size
    cfg = select_config(n)
    log.info("generating/loading %d instance(s) of size 2^%d",
             args.num_instances, args.log_instance_size)
    instances = preprocess.get_or_create_msm_instances(
        args.log_instance_size, args.num_instances
    )

    # Warm-up compile (excluded from timing, like criterion's warmup).
    if args.run_mode in ("tpu", "best", "check"):
        _run_tpu(instances[0], cfg)
    elif args.run_mode == "sharded":
        _run_sharded(instances[0], cfg)

    total = 0.0
    runs = 0
    for retry in range(args.retries):
        for i, inst in enumerate(instances):
            t0 = time.perf_counter()
            if args.run_mode == "tpu":
                _run_tpu(inst, cfg)
            elif args.run_mode == "sharded":
                _run_sharded(inst, cfg)
            elif args.run_mode == "best":
                _run_tpu(inst, cfg)
            elif args.run_mode == "cpu":
                _run_cpu(inst)
            elif args.run_mode == "check":
                got = _jac_to_affine(_run_tpu(inst, cfg))
                want = _run_cpu(inst)
                if got != want:
                    log.error("MISMATCH at instance %d: tpu=%s cpu=%s", i, got, want)
                    return 1
                log.info("instance %d: tpu == cpu ✓", i)
            dt = time.perf_counter() - t0
            total += dt
            runs += 1
            log.debug("retry %d instance %d: %.1f ms", retry, i, dt * 1e3)

    log.info("Total Execution Time: %.1f ms", total * 1e3)
    log.info("Average Execution Time: %.1f ms (%d runs, %.2f Mpoints/s)",
             total / runs * 1e3, runs, n * runs / total / 1e6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
