"""Ahead-of-time export of the device MSM as a serialized StableHLO artifact.

The reference compiles its GPU code to a `msm.metallib` at build time and
embeds it in the binary (build.rs:15-99, state.rs:31), so consumers never
need the Metal compiler at runtime. The TPU-native analogue is `jax.export`:
the jitted MSM graph is traced, lowered to StableHLO, and serialized to a
versioned, portable artifact that a serving process (or a non-JAX PJRT host)
can load and compile without this package's Python tracing path.

    export_msm(1 << 20, path="msm_log20.bin")       # build time
    fn = load_msm("msm_log20.bin"); fn(px, py, sl)   # serving time
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.utils.config import MsmConfig, select_config


def _abstract_inputs(n: int):
    shape = jax.ShapeDtypeStruct((bn254.LIMBS, n), jnp.uint32)
    return shape, shape, shape


def export_msm(n: int, cfg: MsmConfig | None = None,
               path: str | Path | None = None,
               platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialize the jitted (px, py, scalar_limbs) -> ProjPoint MSM at size n.

    Returns the serialized bytes; writes them to `path` when given.
    `platforms` pins the lowering targets (default: the current backend).
    """
    from tpu_msm import msm_device

    cfg = cfg or select_config(n)
    # Return a plain (x, y, z) tuple: the serialized artifact must not
    # depend on this package's pytree types being registered in the loader.
    fn = jax.jit(lambda px, py, sl: tuple(msm_device(px, py, sl, cfg)))
    exp = jax.export.export(fn, platforms=platforms)(*_abstract_inputs(n))
    data = exp.serialize()
    if path is not None:
        Path(path).write_bytes(data)
    return data


def load_msm(src: str | Path | bytes):
    """Deserialize an exported MSM; returns a callable
    (px, py, scalar_limbs) -> ProjPoint-shaped tuple."""
    data = src if isinstance(src, bytes) else Path(src).read_bytes()
    exp = jax.export.deserialize(data)
    return exp.call
