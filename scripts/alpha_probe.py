"""Honest keyswitch-cost comparison: tpu_n15 (alpha=7, dnum=4) vs
tpu_n15a14 (alpha=14, dnum=2). Same q-chain; measures mul_ct+relin, rotate,
rot_mac bank with chained+downloaded timing, checks correctness."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from dacapo_tpu.crypto.scheme import Scheme, Ciphertext

def tsync(fn, x0, iters=30):
    out = fn(x0); np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = x0
    for _ in range(iters):
        out = fn(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3

def rms(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))

for profile in (sys.argv[1:] or ["tpu_n15", "tpu_n15a14"]):
    s = Scheme(profile)
    s.generate_keys(rot_steps=tuple(range(1, 10)))
    ev, ctx = s.ev, s.ctx
    n = ctx.config.n_slots
    rng = np.random.default_rng(0)
    va, vb = rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    a = s.encrypt(va, scale=2.0 ** 60)
    b = s.encrypt(vb, scale=2.0 ** 60)
    rlk = s.keys.rlk
    gk = s.keys.galois[1]
    pk = ev.pack()
    # correctness first
    out = s.decrypt(s.rescale(s.mul(a, b)))
    r1 = rms(out, va * vb)
    out = ev.rotate(a.data, ctx.config.num_q, 3, s.keys.galois[3])
    r2 = rms(s.decrypt(Ciphertext(out, a.scale)), np.roll(va, -3))
    nl = ctx.config.num_q
    fm = jax.jit(lambda c, p: ev._mul_ct(c, c, nl, rlk, p))
    fr = jax.jit(lambda c, p: ev._rotate(c, nl, jnp.int32(1), gk, p))
    t_mul = tsync(lambda c: fm(c, pk), a.data)
    t_rot = tsync(lambda c: fr(c, pk), a.data)
    # bank: K=9 rot-mac with fold-rescale
    steps = list(range(1, 10))
    perms = jnp.asarray(steps, dtype=jnp.int32)
    gks = [s.keys.galois[st] for st in steps]
    alpha = ctx.config.alpha
    pts = [jnp.asarray(rng.integers(0, 1 << 30, (nl + alpha, ctx.n),
                                    dtype=np.uint32)) for _ in steps]
    def bank(c):
        out = ev.rot_mac(c, nl, perms, gks, pts,
                         fold_rescale_rows=ctx.config.rescale_rows)
        return jnp.pad(out, ((0, 0), (0, ctx.config.rescale_rows), (0, 0)))
    t_bank = tsync(bank, a.data, iters=15)
    key_mb = s.keys.rlk.nbytes / 2 ** 20
    print(f"{profile}: mul {t_mul:.2f} ms | rot {t_rot:.2f} ms | bank(K=9) "
          f"{t_bank:.2f} ms | rlk {key_mb:.0f} MiB | rms mul {r1:.1e} rot {r2:.1e}",
          flush=True)
