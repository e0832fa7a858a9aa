"""Microbench the fused conv superop (rot_mac) — the flagship's hot path.

r4c attribution: 52.4 s of the 57.9 s ResNet run is jitted segment windows,
which are mostly rot-mac conv banks. This measures one bank end-to-end
(modup + K rotations/keyswitch + masks + moddown + fold-rescale) at the
flagship's level range, plus its pieces, against the HBM roofline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t_op(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from dacapo_tpu.crypto.scheme import Scheme

    profile = sys.argv[1] if len(sys.argv) > 1 else "tpu_n15"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    s = Scheme(profile)
    steps = list(range(1, K + 1))
    s.generate_keys(rot_steps=tuple(steps))
    ev = s.ev
    ctx = s.ctx
    n = ctx.config.n_slots
    rng = np.random.default_rng(0)
    ct = s.encrypt(rng.uniform(-1, 1, n), scale=2.0 ** 60)
    alpha = ctx.config.alpha

    for nl in (28, 20, 12):
        if nl > ctx.config.num_q:
            continue
        cd = ct.data[:, :nl, :]
        perms = jnp.asarray(steps, dtype=jnp.int32)   # slot shifts (orbit layout)
        gks = [s.keys.galois[st] for st in steps]
        sp = [ctx.config.num_q + i for i in range(alpha)]
        pts = [jnp.asarray(rng.integers(0, 1 << 30, (nl + alpha, ctx.n),
                                        dtype=np.uint32)) for _ in steps]

        t_modup = t_op(lambda x: ev.modup(x, nl), cd[1])
        digits = ev.modup(cd[1], nl)
        t_bank = t_op(lambda d: ev.rot_mac(
            cd, nl, perms, gks, pts, digits=d, fold_rescale_rows=ctx.config.rescale_rows),
            digits)
        t_rot1 = t_op(lambda x: ev.rotate(x, nl, 1, gks[0]), cd)
        t_rotb = t_op(lambda x: ev.rotate_batch(x, nl, perms,
                                                jnp.stack(gks)), cd)
        t_mul = t_op(lambda x, y: ev.mul_ct(x, y, nl, s.keys.rlk), cd, cd)

        # permutation-application strategies: dynamic gather (current),
        # static-constant gather, lane roll (the slot-orbit-layout target)
        big = jnp.asarray(rng.integers(0, 1 << 30, (4, nl + alpha, ctx.n),
                                       dtype=np.uint32))
        perm1 = jnp.asarray(np.random.default_rng(0).permutation(ctx.n), dtype=jnp.int32)
        pc = np.asarray(perm1)

        f_dyn = jax.jit(lambda x, p: x[..., p])
        f_static = jax.jit(lambda x: x[..., jnp.asarray(pc)])
        f_roll = jax.jit(lambda x: jnp.roll(x, 5, axis=-1))          # static shift
        f_rolld = jax.jit(lambda x, sh: jnp.roll(x, sh, axis=-1))    # traced shift
        orb = jax.jit(lambda x, sh: ev.automorphism(x, sh))          # orbit roll
        t_dyn = t_op(f_dyn, big, perm1)
        t_sta = t_op(f_static, big)
        t_rol = t_op(f_roll, big)
        t_rld = t_op(f_rolld, big, jnp.int32(5))
        t_orb = t_op(orb, big, jnp.int32(5))
        gb = big.nbytes / 2 ** 30
        log(f"nl={nl}: perm strategies on {gb:.2f} GiB/out: dyn-gather "
            f"{t_dyn*1e3:.2f} ms | static-gather {t_sta*1e3:.2f} ms | "
            f"roll-static {t_rol*1e3:.2f} ms | roll-traced {t_rld*1e3:.2f} ms"
            f" | orbit-automorphism {t_orb*1e3:.2f} ms")

        # traffic estimate for the bank: digits read K times? (gathers) +
        # keys K + masks K + acc writes
        dnum = ctx.config.dnum
        bytes_bank = (dnum * (nl + alpha) * ctx.n * 4 * (1 + K)   # digits+gather
                      + K * dnum * 2 * (nl + alpha) * ctx.n * 4   # keys
                      + K * (nl + alpha) * ctx.n * 4              # masks
                      + 4 * (nl + alpha) * ctx.n * 4)
        log(f"nl={nl}: modup {t_modup*1e3:.2f} ms | bank(K={K}) "
            f"{t_bank*1e3:.2f} ms | rot1 {t_rot1*1e3:.2f} ms | rotK "
            f"{t_rotb*1e3:.2f} ms | mul {t_mul*1e3:.2f} ms | bank traffic "
            f"~{bytes_bank/2**30:.2f} GiB -> roofline "
            f"{bytes_bank/800e9*1e3:.2f} ms @800GB/s")


if __name__ == "__main__":
    main()
