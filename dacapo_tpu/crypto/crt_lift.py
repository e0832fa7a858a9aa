"""Centered CRT lift of coefficient planes to a longer RNS chain — on device.

Shared by the native bootstrapper's ModRaise (bootstrap_native.mod_raise_pair)
and the device-resident emulated-bootstrap oracle (bootstrap.py): given
residues modulo the bottom prime (or bottom prime PAIR, the ~2^60 composite
base), produce the centered representative modulo every prime of the target
chain. Exact uint32 arithmetic throughout — no int64, no host round-trip.
"""

import numpy as np
import jax.numpy as jnp

from .modmath import add_mod, sub_mod, mul_mod_shoup, host_shoup


def pair_crt_expand(ctx, v0, v1, num_rows):
    """Residues (v0 mod q0, v1 mod q1) [..., N] -> centered v mod q_i for
    i < num_rows, shape [..., num_rows, N].

    v = v0 + q0*t with t = (v1 - v0) * q0^{-1} mod q1; per-row
    v mod q_i = v0 + (q0 mod q_i)*t (mod q_i), minus q0*q1 when
    (t, v0) > (t_half, v0_half) lexicographically (the centering)."""
    q0, q1 = ctx.q_primes[0], ctx.q_primes[1]
    uq1 = jnp.uint32(q1)
    v0q1 = jnp.where(v0 >= uq1, v0 - uq1, v0)
    inv_q0 = pow(q0, -1, q1)
    t = mul_mod_shoup(sub_mod(v1, v0q1, uq1),
                      jnp.uint32(inv_q0),
                      jnp.uint32(host_shoup(inv_q0, q1)), uq1)

    half = (q0 * q1 - 1) // 2
    t_half, v0_half = half // q0, half % q0
    neg = (t > jnp.uint32(t_half)) | (
        (t == jnp.uint32(t_half)) & (v0 > jnp.uint32(v0_half)))

    qs = [ctx.q_primes[i] for i in range(num_rows)]
    arr = lambda f: jnp.asarray(
        np.array([f(q) for q in qs], np.uint32))[:, None]
    q_r = arr(lambda q: q)
    q0m = arr(lambda q: q0 % q)
    q0m_sh = arr(lambda q: host_shoup(q0 % q, q))
    q01m = arr(lambda q: (q0 * q1) % q)

    tb = t[..., None, :]                                # [..., 1, N]
    v0b = v0[..., None, :]
    t_r = jnp.where(tb >= q_r, tb - q_r, tb)
    v0_r = jnp.where(v0b >= q_r, v0b - q_r, v0b)
    r = add_mod(v0_r, mul_mod_shoup(t_r, q0m, q0m_sh, q_r), q_r)
    return jnp.where(neg[..., None, :], sub_mod(r, q01m, q_r), r)


def single_crt_expand(ctx, v0, num_rows):
    """Residue v0 mod q0 [..., N] -> centered v mod q_i, [..., num_rows, N]
    (single-prime base; requires q_i > q0/2 so one corrective add suffices)."""
    q0 = ctx.q_primes[0]
    half = jnp.uint32(q0 // 2)
    qs = np.array([ctx.q_primes[i] for i in range(num_rows)], dtype=np.int64)
    assert (qs > q0 // 2).all(), "single-base lift needs q_i > q0/2"
    corr = jnp.asarray(((qs - np.int64(q0)) % (1 << 32)).astype(np.uint32))
    v = v0[..., None, :]
    return jnp.where(v > half, v + corr[:, None], v)
