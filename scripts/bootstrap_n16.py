"""Native bootstrap at production parameters (tpu_n16, N=2^16) on the TPU.

Reference bar: HEaaN bootstrap 253.7-474.0 ms per level-16 target on GPU
(config.json:17-23). Reports keygen/transform-build/first-call (compile) and
steady-state latency + output precision. Run standalone on the chip.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

t00 = time.time()
import jax
from dacapo_tpu.crypto.scheme import Scheme, Ciphertext
from dacapo_tpu.crypto.bootstrap_native import BootstrapConfig

def log(*a):
    print(*a, file=sys.stderr, flush=True)

profile = sys.argv[1] if len(sys.argv) > 1 else "tpu_n16"
target_level = int(sys.argv[2]) if len(sys.argv) > 2 else 10

t0 = time.time(); s = Scheme(profile)
log(f"context: {time.time()-t0:.1f}s (N=2^{s.ctx.logn}, "
    f"{len(s.ctx.q_primes)}+{len(s.ctx.p_primes)} primes, logQP={s.ctx.logqp})")
t0 = time.time(); s.generate_keys(); log(f"keygen: {time.time()-t0:.1f}s")
# standalone scheme has no executor memory plan: cap device-resident galois
# keys (the ~90 CtS/StC rotation keys at 56 QP rows would exceed HBM).
# r5: 7 GiB still hit RESOURCE_EXHAUSTED on the tunneled chip (its usable
# HBM is below v5e spec); default tighter, override with BS_KEY_GB.
s.set_key_budget(int(float(os.environ.get("BS_KEY_GB", "2.5")) * (1 << 30)))
t0 = time.time()
# radix must match the profile's chain budget (runner.py auto-config): the
# n15b/n16 chains are sized for radix-7 CtS/StC at 2^14+ slots — radix 5
# adds two transform levels and overruns the budget ("consumed too many
# levels" at target 14)
radix = 7 if s.ctx.config.n_slots >= (1 << 14) else 5
# defaults otherwise (K=16, r=3, degree=36, baby=8): the exact config the
# runner auto-builds, so this standalone's compiles land in the persistent
# cache the flagship's native-bootstrap path then hits
bs = s.enable_native_bootstrap(BootstrapConfig(radix=radix))
log(f"bootstrapper init: {time.time()-t0:.1f}s (radix={radix})")

n = s.ctx.config.n_slots
rng = np.random.default_rng(3)
vals = rng.uniform(-1, 1, n)
delta = 2.0 ** s.ctx.config.scale_bits
ct = s.encrypt(vals, scale=delta, nl=2)

t0 = time.time()
data, (nl2, sc2) = bs.bootstrap(ct.data, ct.nl, ct.scale, target_level)
jax.block_until_ready(data)
log(f"bootstrap first call (incl. compiles + key gen): {time.time()-t0:.1f}s")
# precision evidence BEFORE the steady loop (r5: a later key re-upload OOM
# must not destroy the correctness datapoint)
got = s.decrypt(Ciphertext(data, sc2))
err = got - vals
rms = float(np.sqrt(np.mean(err * err)))
log(f"first-call precision: level {nl2-1}, rms {rms:.3e}, "
    f"max |err| {np.max(np.abs(err)):.3e}")

iters = int(os.environ.get("BS_ITERS", "3"))
t0 = time.time()
out = ct.data
for _ in range(iters):
    data, (nl2, sc2) = bs.bootstrap(ct.data, ct.nl, ct.scale, target_level)
np.asarray(data[0, 0, :1])       # honest sync: download beats the queue
lat = (time.time() - t0) / iters
log(f"steady-state: {lat*1e3:.1f} ms -> level {nl2-1}")
print(f'{{"bootstrap_ms": {lat*1e3:.1f}, "target_level": {nl2-1}, '
      f'"rms": {rms:.3e}, "profile": "{profile}"}}')
