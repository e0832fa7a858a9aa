"""Batched negacyclic NTT / inverse NTT over RNS limb planes (JAX).

Replaces the NTT hidden inside SEAL/HEaaN (reference L0). Cooley-Tukey forward
(natural -> bit-reversed "evaluation" order) with the negacyclic twist merged
into the twiddle table (ψ-powers, Harvey style); the inverse simply runs the
forward stages backwards with elementwise-inverse twiddles and a final N^-1.

The evaluation order is opaque to the rest of the stack: pointwise ops don't
care, and slot rotations use permutation tables recovered by discrete log at
context build (params.CKKSContext.eval_exps).

Shapes: x is uint32 [B, N] where each row b is one (prime, poly) plane; the
twiddle rows are pre-gathered per plane by the caller. This traces to
O(log N) XLA ops per call and is batched over however many planes the caller
stacks — key-switching batches 30-200 planes per call.

A fused Pallas kernel (crypto/pallas/ntt_kernel.py) implements the same
contract for the TPU hot path; this module is the portable reference used on
CPU and as the fallback.
"""

import jax.numpy as jnp

from .modmath import add_mod, sub_mod, mul_mod_shoup


def ntt_fwd(x, tw, tw_shoup, q):
    """Forward negacyclic NTT. x, tw, tw_shoup: [B, N]; q: [B, 1]."""
    b, n = x.shape
    qe = q[:, :, None]
    m = 1
    while m < n:
        t = n // (2 * m)
        xr = x.reshape(b, m, 2, t)
        u = xr[:, :, 0, :]
        v = xr[:, :, 1, :]
        w = tw[:, m: 2 * m][:, :, None]
        ws = tw_shoup[:, m: 2 * m][:, :, None]
        wv = mul_mod_shoup(v, w, ws, qe)
        x = jnp.stack([add_mod(u, wv, qe), sub_mod(u, wv, qe)], axis=2).reshape(b, n)
        m *= 2
    return x


def ntt_inv(x, itw, itw_shoup, q, ninv, ninv_shoup):
    """Inverse NTT (bit-reversed evaluation order -> natural coefficients).

    itw must be the elementwise modular inverse of the forward table; ninv is
    N^-1 mod q per row ([B, 1]).
    """
    b, n = x.shape
    qe = q[:, :, None]
    m = n // 2
    while m >= 1:
        t = n // (2 * m)
        xr = x.reshape(b, m, 2, t)
        y0 = xr[:, :, 0, :]
        y1 = xr[:, :, 1, :]
        w = itw[:, m: 2 * m][:, :, None]
        ws = itw_shoup[:, m: 2 * m][:, :, None]
        u = add_mod(y0, y1, qe)
        v = mul_mod_shoup(sub_mod(y0, y1, qe), w, ws, qe)
        x = jnp.stack([u, v], axis=2).reshape(b, n)
        m //= 2
    return mul_mod_shoup(x, ninv, ninv_shoup, q)
