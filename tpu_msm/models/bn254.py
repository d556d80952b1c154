"""BN254 curve/field parameters ("model" definition).

This module is the TPU-native equivalent of the reference's hard-coded shader
constants plus the Python constant-generation helpers:

- base-field modulus / Montgomery constants: reference
  `src/metal/shader/fields/fp_bn254.h.metal:25-46` (N, R_SQUARED, R_SUB_N, MU)
  and `src/metal/shader/helper/{mu.py,r_sqr_mod_n.py,r_sub_n.py}`.
- curve shape (a=0, b=3) and the `BN254 = ECPoint<FpBN254, 0, u256>`
  instantiation: `src/metal/shader/curves/bn254.h.metal:12-24`.

Instead of committing generated hex literals, every constant is derived here
at import time from the prime itself (integers are exact in Python), then
materialised as little-endian 16x16-bit limb arrays (see `tpu_msm.ops.u256`
for the representation choice — the reference uses big-endian 8x32 limbs,
`src/metal/abstraction/limbs_conversion.rs:87-106`; we deliberately differ
because 16-bit limb products fit exactly in uint32 VPU lanes).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Limb representation: LIMBS little-endian limbs of LIMB_BITS bits each,
# stored one-per-uint32 lane. 16 limbs x 16 bits = 256 bits.
# ---------------------------------------------------------------------------
LIMB_BITS = 16
LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
TOTAL_BITS = LIMB_BITS * LIMBS  # 256
R = 1 << TOTAL_BITS  # Montgomery radix 2^256


def int_to_limbs(x: int, n: int = LIMBS) -> np.ndarray:
    """Python int -> little-endian u16-limb vector (shape (n,), dtype uint32)."""
    if x < 0 or x >= (1 << (LIMB_BITS * n)):
        raise ValueError(f"{x} out of range for {n} limbs of {LIMB_BITS} bits")
    out = np.empty((n,), dtype=np.uint32)
    for i in range(n):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(limbs: np.ndarray) -> int:
    """Little-endian limb vector (leading axis = limbs) -> Python int."""
    limbs = np.asarray(limbs)
    acc = 0
    for i in range(limbs.shape[0] - 1, -1, -1):
        acc = (acc << LIMB_BITS) | int(limbs[i])
    return acc


# ---------------------------------------------------------------------------
# BN254 (alt_bn128) parameters.
# ---------------------------------------------------------------------------
# Base field prime (coordinates live in Fp):
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
# Scalar field prime (group order; scalars live in Fr):
FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# Short-Weierstrass y^2 = x^3 + A x + B with A = 0, B = 3.
A_CURVE = 0
B_CURVE = 3

# Generator of G1 (cofactor 1: the curve group *is* the prime-order group).
GX = 1
GY = 2

# ---------------------------------------------------------------------------
# Montgomery constants for Fp with radix R = 2^256 (derived, not hard-coded).
# ---------------------------------------------------------------------------
R_MOD_P = R % P
R2_MOD_P = (R * R) % P
R3_MOD_P = (R * R * R) % P
# N' = -P^{-1} mod 2^256 (full-width Montgomery REDC multiplier).
P_INV_NEG = (-pow(P, -1, R)) % R

# Same for Fr (used by scalar-side utilities / tests).
R_MOD_FR = R % FR
R2_MOD_FR = (R * R) % FR
FR_INV_NEG = (-pow(FR, -1, R)) % R

# Limb-array forms (numpy; converted to jnp at trace time by the ops layer).
P_LIMBS = int_to_limbs(P)
R_MOD_P_LIMBS = int_to_limbs(R_MOD_P)
R2_MOD_P_LIMBS = int_to_limbs(R2_MOD_P)
P_INV_NEG_LIMBS = int_to_limbs(P_INV_NEG)

FR_LIMBS = int_to_limbs(FR)
R_MOD_FR_LIMBS = int_to_limbs(R_MOD_FR)
R2_MOD_FR_LIMBS = int_to_limbs(R2_MOD_FR)
FR_INV_NEG_LIMBS = int_to_limbs(FR_INV_NEG)

# Montgomery-domain curve constants.
GX_MONT = (GX * R) % P
GY_MONT = (GY * R) % P
B_MONT = (B_CURVE * R) % P
THREE_B_MONT = (3 * B_CURVE * R) % P

GX_MONT_LIMBS = int_to_limbs(GX_MONT)
GY_MONT_LIMBS = int_to_limbs(GY_MONT)
B_MONT_LIMBS = int_to_limbs(B_MONT)

# Number of bits that matter in a scalar (Fr is a 254-bit prime).
SCALAR_BITS = FR.bit_length()  # 254
MODULUS_BITS = P.bit_length()  # 254

# Exponent for sqrt in Fp: P % 4 == 3, so sqrt(x) = x^((P+1)/4) when x is a QR.
assert P % 4 == 3
SQRT_EXP = (P + 1) // 4
