"""Micro-bench: Pallas vs XLA NTT path on the real chip, plus hot HE ops."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

backend = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["DACAPO_TPU_NTT"] = backend
profile = sys.argv[2] if len(sys.argv) > 2 else "tpu_n15"

import jax

print("devices:", jax.devices(), "backend:", backend, flush=True)
from dacapo_tpu.crypto.scheme import Scheme


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


t0 = time.time()
s = Scheme(profile)
print(f"ctx: {time.time()-t0:.1f}s  N=2^{s.ctx.logn} L={s.ctx.config.num_q}", flush=True)
t0 = time.time()
s.generate_keys(rot_steps=(1,))
print(f"keygen: {time.time()-t0:.1f}s", flush=True)

nl = s.ctx.config.num_q
n = s.ctx.config.n_slots
rng = np.random.default_rng(0)
a = s.encrypt(rng.uniform(-1, 1, n))
b = s.encrypt(rng.uniform(-1, 1, n))
ev = s.ev

import jax.numpy as jnp
x = jnp.asarray(np.stack([np.asarray(a.data[0][i]) for i in range(nl)]))
rows = list(range(nl))
t = timeit(lambda y: ev.ntt(y, rows), x, iters=50)
print(f"ntt fwd  [{nl},{s.ctx.n}]: {t*1e3:.3f} ms")
t = timeit(lambda y: ev.intt(y, rows), x, iters=50)
print(f"ntt inv  [{nl},{s.ctx.n}]: {t*1e3:.3f} ms")
t = timeit(lambda u, v: ev.mul_ct(u, v, nl, s.keys.rlk), a.data, b.data)
print(f"mul+relin L={nl}: {t*1e3:.2f} ms")
t = timeit(lambda u: ev.rotate(u, nl, 1, s.keys.galois[1]), a.data)
print(f"rotate   L={nl}: {t*1e3:.2f} ms")
t = timeit(lambda u: ev.rescale(u, nl), a.data)
print(f"rescale  L={nl}: {t*1e3:.2f} ms")
