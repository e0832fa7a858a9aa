"""Fused negacyclic NTT / iNTT as a single Pallas TPU kernel.

The portable JAX path (crypto/ntt.py) traces one XLA op-chain per butterfly
stage: every stage round-trips the whole limb plane through HBM (15-16
passes at N=2^15/2^16). This kernel keeps the plane in VMEM for all stages —
one HBM read + one write per plane — with the per-stage twiddle planes
precomputed host-side per prime.

Uniform butterfly formulation (same math as ntt.py, verified against it):
  forward stage (m, t = N/2m), global index i, r = i mod 2t, block j = i/2t:
     r <  t: out[i] = x[i] + w[m+j] * x[i+t]
     r >= t: out[i] = x[i-t] - w[m+j] * x[i]
  inverse stage (m from N/2 down):
     r <  t: out[i] = x[i] + x[i+t]
     r >= t: out[i] = w[m+j] * (x[i-t] - x[i])
Since 2t-blocks never straddle the roll boundary actually used, both
x[i+t] and x[i-t] come from circular rolls of the (sublanes, lanes)-shaped
plane: sublane rolls for t >= 128, lane rolls for t < 128.

Layout: plane [N] viewed as (N/128, 128) uint32. Grid = rows; per-row prime
identity is a scalar-prefetch index into the per-unique-prime stage-plane
stacks, so consecutive rows of the same prime reuse the fetched planes.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..modmath import mulhi_u32, mullo_u32

_LANES = 128


def _add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, (a + q) - b)


def _mul_shoup(a, w, ws, q):
    hi = mulhi_u32(a, ws)
    r = mullo_u32(a, w) - mullo_u32(hi, q)
    return jnp.where(r >= q, r - q, r)


# ---------------------------------------------------------------- tables
def build_stage_planes(n: int, tw: np.ndarray, logn: int):
    """[S, N] per-stage twiddle planes from a compact [N] table.

    Stage s has m = 2^s, t = N/2m; plane[i] = tw[m + i // (2t)].
    Forward order s=0..logn-1; pass itw for the inverse (callers reverse the
    stage order by flipping the returned axis).
    """
    planes = np.empty((logn, n), dtype=np.uint32)
    for s in range(logn):
        m = 1 << s
        t = n // (2 * m)
        idx = m + (np.arange(n) // (2 * t))
        planes[s] = tw[idx]
    return planes


def _roll2d(x, t, n):
    """x viewed (R, 128); circular shift of the flattened plane by -t
    (bring x[i+t] to position i; negative t shifts the other way).

    Only positions whose 2t-block doesn't wrap are consumed, so per-axis
    rolls are equivalent to the true flat roll at every used position.
    pltpu.roll requires non-negative shifts: roll(-k) == roll(size - k).
    """
    rows = n // _LANES
    if abs(t) >= _LANES:
        return pltpu.roll(x, (-t // _LANES) % rows, axis=0)
    return pltpu.roll(x, (-t) % _LANES, axis=1)


def _mask_rt(r_rows, t, n):
    """bool (R, 128): (i mod 2t) < t for flattened index i."""
    rows, lanes = r_rows
    if t >= _LANES:
        rr = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
        return (rr % ((2 * t) // _LANES)) < (t // _LANES)
    cc = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    return (cc % (2 * t)) < t


def _ntt_kernel(slot_ref, q_ref, ninv_ref, ninvs_ref, x_ref, tw_ref,
                tws_ref, o_ref, *, logn, inverse):
    n = 1 << logn
    rows = n // _LANES
    shape = (rows, _LANES)
    b = pl.program_id(0)
    x = x_ref[0]                    # (R, 128)
    q = q_ref[b]
    for si in range(logn):
        m = (1 << si) if not inverse else (n >> (si + 1))
        t = n // (2 * m)
        w = tw_ref[0, si]
        ws = tws_ref[0, si]
        mask = _mask_rt(shape, t, n)
        xp = _roll2d(x, t, n)      # x[i+t]
        xm = _roll2d(x, -t, n)     # x[i-t]
        if not inverse:
            a = jnp.where(mask, x, xm)
            bv = jnp.where(mask, xp, x)
            wb = _mul_shoup(bv, w, ws, q)
            x = jnp.where(mask, _add_mod(a, wb, q), _sub_mod(a, wb, q))
        else:
            a = jnp.where(mask, x, xm)
            bv = jnp.where(mask, xp, x)
            x = jnp.where(mask, _add_mod(a, bv, q),
                          _mul_shoup(_sub_mod(a, bv, q), w, ws, q))
    if inverse:
        x = _mul_shoup(x, ninv_ref[b], ninvs_ref[b], q)
    o_ref[0] = x


@functools.partial(jax.jit, static_argnames=("logn", "inverse", "interpret"))
def ntt_pallas(x, slots, planes_tw, planes_tws, qv, ninv, ninvs,
               logn, inverse, interpret=False):
    """Run the fused NTT kernel. ALL tables are runtime arguments:

    x:      uint32 [B, N] limb planes
    slots:  int32  [B] row index of each plane into the plane stacks
    planes_tw/planes_tws: uint32 [P, S, N] per-stage twiddle stacks (global,
            one block DMA'd per grid step via scalar-prefetch indexing)
    qv/ninv/ninvs: uint32 [B] per-plane scalars (pre-gathered by the caller).

    Passing the stacks as arguments (not closures) keeps them OUT of the
    serialized program — compiled size is independent of table content.
    """
    b, n = x.shape
    r = n // _LANES
    u, s = planes_tw.shape[:2]
    x3 = x.reshape(b, r, _LANES)
    tw4 = planes_tw.reshape(u, s, r, _LANES)
    tws4 = planes_tws.reshape(u, s, r, _LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # slots, q, ninv, ninv_shoup
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, _LANES), lambda i, *sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, r, _LANES),
                         lambda i, slot, *sc: (slot[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, r, _LANES),
                         lambda i, slot, *sc: (slot[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, _LANES), lambda i, *sc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_ntt_kernel, logn=logn, inverse=inverse)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, r, _LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=25 * logn * b * n, transcendentals=0,
            bytes_accessed=(2 * b + 2 * u * s) * n * 4,
        ),
        interpret=interpret,
    )(slots, qv, ninv, ninvs, x3, tw4, tws4)
    return out.reshape(b, n)


class PallasNTT:
    """Per-context fused-NTT dispatcher over GLOBAL stage-plane stacks.

    One [P, S, N] stack per direction covers every prime in the context;
    each call indexes it with the plane's global row id (scalar prefetch), so
    there is exactly one device copy of the twiddle data regardless of how
    many rows-signatures are used. Callers inside jit traces must thread the
    stacks as arguments (Evaluator.pack) — see module docstring.
    """

    def __init__(self, ctx, interpret=False):
        self.ctx = ctx
        self.logn = ctx.logn
        self.interpret = interpret
        self._host_planes = {}   # inverse -> (tw, tws) np [P, S, N]
        self._dev_planes = {}    # inverse -> (tw, tws) jnp [P, S, N]

    def host_planes(self, inverse):
        got = self._host_planes.get(inverse)
        if got is None:
            host = self.ctx.host_tables
            key = "itw" if inverse else "tw"
            n = self.ctx.n
            P = len(self.ctx.primes)
            tw = np.stack([
                build_stage_planes(n, host[key][r], self.logn)
                for r in range(P)
            ])
            tws = np.stack([
                build_stage_planes(n, host[key + "_shoup"][r], self.logn)
                for r in range(P)
            ])
            if inverse:   # inverse runs the stages in reverse order
                tw = tw[:, ::-1].copy()
                tws = tws[:, ::-1].copy()
            got = self._host_planes[inverse] = (tw, tws)
        return got

    def device_planes(self, inverse):
        got = self._dev_planes.get(inverse)
        if got is None:
            tw, tws = self.host_planes(inverse)
            # Concrete even when first touched inside an outer jit trace.
            with jax.ensure_compile_time_eval():
                got = self._dev_planes[inverse] = (
                    jnp.asarray(tw), jnp.asarray(tws))
        return got

    def __call__(self, x, rows, inverse=False):
        rows = tuple(rows)
        tw, tws = self.device_planes(inverse)
        idx = np.asarray(rows, dtype=np.int32)
        host = self.ctx.host_tables
        return ntt_pallas(
            x, jnp.asarray(idx), tw, tws,
            jnp.asarray(host["q"][idx]), jnp.asarray(host["ninv"][idx]),
            jnp.asarray(host["ninv_shoup"][idx]),
            self.logn, inverse, self.interpret)
