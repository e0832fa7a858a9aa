"""32-bit modular arithmetic primitives for RNS limb planes.

TPU has no native 64-bit integer multiply, so every wide product is built from
16-bit half-words combined with 32-bit lane ops (VPU friendly; also legal inside
Pallas/Mosaic kernels). All moduli must satisfy q < 2**31 so that lazy sums and
Montgomery/Shoup reductions fit in uint32 without overflow.

Conventions
-----------
* All values are jnp.uint32 and reduced to [0, q) unless stated otherwise.
* "shoup" companions are floor(w << 32 / q) for a constant w — one mulhi +
  two mullo per modular multiply (Harvey/Shoup trick, used for twiddles and
  any precomputed constant).
* General (variable x variable) modmul goes through Montgomery REDC followed by
  a Shoup multiply with R = 2**32 to undo the R^-1 factor.

Replaces the modular arithmetic Hecate outsources to SEAL/HEaaN
(reference: lib/Runtime/SEAL_HEVM.cpp delegates to seal::Evaluator).
"""

import jax.numpy as jnp

# plain python int (not a jnp scalar): keeps these helpers usable inside
# Pallas kernels, where closed-over device constants are rejected
_U16 = 0xFFFF


def mulhi_u32(a, b):
    """High 32 bits of the 64-bit product a*b (both uint32)."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a0 = a & _U16
    a1 = a >> 16
    b0 = b & _U16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & _U16) + (hl & _U16)
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def mullo_u32(a, b):
    """Low 32 bits of a*b (uint32 wraparound multiply)."""
    return (a.astype(jnp.uint32) * b.astype(jnp.uint32)).astype(jnp.uint32)


def add_mod(a, b, q):
    s = a + b  # a, b < q < 2^31 so no wrap
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, (a + q) - b)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def mul_mod_shoup(a, w, w_shoup, q):
    """a * w mod q with precomputed w_shoup = floor(w << 32 / q). a < q, w < q."""
    hi = mulhi_u32(a, w_shoup)
    r = mullo_u32(a, w) - mullo_u32(hi, q)
    return jnp.where(r >= q, r - q, r)


def mont_mul(a, b, q, qinv_neg):
    """a * b * 2^-32 mod q (Montgomery REDC); qinv_neg = -q^-1 mod 2^32."""
    lo = mullo_u32(a, b)
    hi = mulhi_u32(a, b)
    m = mullo_u32(lo, qinv_neg)
    carry = (lo != 0).astype(jnp.uint32)
    t = hi + mulhi_u32(m, q) + carry
    return jnp.where(t >= q, t - q, t)


def mul_mod(a, b, q, qinv_neg, rconst, rconst_shoup):
    """General a * b mod q; rconst = 2^32 mod q (undoes the Montgomery R^-1)."""
    t = mont_mul(a, b, q, qinv_neg)
    return mul_mod_shoup(t, rconst, rconst_shoup, q)


# ---------------------------------------------------------------------------
# Host-side (python int) mirrors, used for table precomputation and testing.
# ---------------------------------------------------------------------------

def host_shoup(w: int, q: int) -> int:
    return (w << 32) // q


def host_qinv_neg(q: int) -> int:
    return (-pow(q, -1, 1 << 32)) % (1 << 32)
