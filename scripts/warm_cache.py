"""Warm the persistent XLA compile cache for a profile's op signatures.

Every HE op compiles once per (op, level) signature; on remote-compile TPU
setups each compile costs minutes, so production deployments warm the disk
cache once (this script), after which every process — benchmarks, tests,
serving — hits the cache. Usage:

    python scripts/warm_cache.py [profile] [--levels 4,6,...] [--banks]
"""

import sys
import time

import numpy as np


def main():
    profile = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "tpu_n15"
    from dacapo_tpu.crypto.scheme import Scheme

    t_start = time.time()
    s = Scheme(profile)
    s.generate_keys(rot_steps=(1, 2))
    cfg = s.ctx.config
    ev = s.ev
    rr = cfg.rescale_rows
    n = cfg.n_slots
    rng = np.random.default_rng(0)
    a = s.encrypt(rng.uniform(-1, 1, n))
    b = s.encrypt(rng.uniform(-1, 1, n))
    pt = s.encode(rng.uniform(-1, 1, n))
    rlk, gk = s.keys.rlk, s.keys.galois[1]
    gk2 = s.keys.galois[2]

    import jax
    levels = [(lv + 1) * rr for lv in range(1, cfg.num_levels)]
    for nl in levels:
        t0 = time.time()
        ad, bd, pd = a.data[:, :nl], b.data[:, :nl], pt.data[:nl]
        outs = [
            ev.add_ct(ad, bd, nl), ev.neg_ct(ad, nl), ev.add_pt(ad, pd, nl),
            ev.mul_pt(ad, pd, nl), ev.upscale(ad, nl, 5),
            ev.rescale_k(ad, nl, rr), ev.mul_ct(ad, bd, nl, rlk),
            ev.rotate(ad, nl, 1, gk),
        ]
        # rotation banks: modup + each bucket size
        digits = ev.modup(ad[1], nl)
        for bk in ev.BANK_BUCKETS:
            perms = np.stack([np.full(1, st % (n) or 1)  # legacy-unused
                              for st in range(1, bk + 1)])
            import jax.numpy as jnp
            gks = jnp.stack([gk if i % 2 == 0 else gk2 for i in range(bk)])
            outs.append(ev.rotate_apply(digits, ad[0], nl,
                                        jnp.asarray(perms, jnp.int32), gks))
        jax.block_until_ready(outs)
        print(f"nl={nl}: warmed in {time.time()-t0:.1f}s", flush=True)
    print(f"total: {time.time()-t_start:.1f}s", flush=True)


if __name__ == "__main__":
    main()
