"""Isolate the flagship RMS regression: per-primitive correctness on the
real chip at the flagship profile (orbit layout at N=2^15).

Checks: encrypt/decrypt, rotate (several steps incl. large), mul_pt,
mul_ct+rescale, emulated bootstrap round-trip. One PASS/FAIL line each.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from dacapo_tpu.crypto.scheme import Scheme, Ciphertext

profile = sys.argv[1] if len(sys.argv) > 1 else "tpu_n15"
steps = (1, 2, 8, 56, 448, 8191)

s = Scheme(profile)
s.generate_keys(rot_steps=steps)
ev = s.ev
ctx = s.ctx
n = ctx.config.n_slots
rng = np.random.default_rng(7)
v = rng.uniform(-1, 1, n)
delta = 2.0 ** 40
rr = ctx.config.rescale_rows


def rms(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def report(name, r, bar=1e-3):
    print(f"{'PASS' if r < bar else 'FAIL'} {name}: rms {r:.3e}", flush=True)


ct = s.encrypt(v, scale=delta)
report("encrypt/decrypt", rms(s.decrypt(ct), v))

nl = ct.nl
for st in steps:
    out = ev.rotate(ct.data, nl, st, s.keys.galois[st])
    report(f"rotate({st})", rms(s.decrypt(Ciphertext(out, ct.scale)),
                                np.roll(v, -st)))

# Representative scales: the planner (PARS/waterline) keeps every
# post-rescale scale >= 2^waterline, upscaling operands so products land at
# ~2^(waterline + rf). Encoding the plaintext/ct at 2^(rf+waterline) - 2^40
# = 2^60 + pairing with the 2^40 ciphertext reproduces that: the product sits
# at 2^100, the composite rescale (~2^60) drops it to ~2^40 — where the fixed
# rescale-rounding noise sqrt((h+1)/12)*sqrt(N) (~7.7e3 abs for the dense
# ternary secret at N=2^15) is ~7e-9 relative. The r4 probe used delta=2^40
# on BOTH operands, landing at scale 2^20 where that same absolute noise is
# 5e-3 relative: the "FAIL mul+rescale" in _logs/orbit_isolate_r4.log was
# expected CKKS noise at an unrepresentative scale, not an arithmetic bug.
rf_bits = 30 * rr                       # composite rescale span (~2^60)
hi = 2.0 ** (40 + rf_bits - 40)         # operand scale so product lands ~2^40
w = rng.uniform(-1, 1, n)
pt = s.encode(w, scale=hi, nl=nl)
out = ev.mul_pt(ct.data, pt.data, nl)
out = ev.rescale_k(out, nl, rr)
sc2 = ct.scale * pt.scale
for k in range(rr):
    sc2 /= ctx.q_primes[nl - 1 - k]
report("mul_pt+rescale", rms(s.decrypt(Ciphertext(out, sc2)), v * w))

w2 = rng.uniform(-1, 1, n)
ct2 = s.encrypt(w2, scale=hi)
out = ev.mul_ct(ct.data, ct2.data, nl, s.keys.rlk)
out = ev.rescale_k(out, nl, rr)
sc2 = ct.scale * ct2.scale
for k in range(rr):
    sc2 /= ctx.q_primes[nl - 1 - k]
report("mul_ct+rescale", rms(s.decrypt(Ciphertext(out, sc2)), v * w2))

# emulated bootstrap round-trip from near the chain bottom
from dacapo_tpu.crypto.bootstrap import EmulatedBootstrapper
bs = EmulatedBootstrapper(s)
low = ct.data[:, :4, :]
tgt = ctx.config.num_q // rr - 1
data2, (nl2, sc3) = bs.bootstrap(low, 4, ct.scale, tgt)
jax.block_until_ready(data2)
report("oracle bootstrap", rms(s.decrypt(Ciphertext(data2, sc3)), v))
print("done", flush=True)
