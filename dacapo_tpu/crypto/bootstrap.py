"""Bootstrapping.

Two implementations, mirroring the reference's runtime split:

* `EmulatedBootstrapper` — decrypt -> re-encode -> re-encrypt, the insecure
  functional oracle the reference ships for SEAL (SEAL_HEVM.cpp:324-334,
  README.md:160-173 "not privacy-safe"). Host round-trip; works only with the
  secret key loaded, used to validate planner output before the native path.
* `NativeBootstrapper` — the real CKKS bootstrapping (ModRaise ->
  CoeffToSlot -> EvalMod -> SlotToCoeff), the HEaaN-class path
  (HEAAN_HEVM.cpp:386-399). Built in crypto/bootstrap_native.py.
"""

import numpy as np
import jax.numpy as jnp

# Headroom for the exact integer lift: polynomial COEFFICIENTS of the raw
# message (~scale * slot-bound) must stay below the lift base q0*q1/2. The
# reference's oracle decodes to floats so any scale works
# (SEAL_HEVM.cpp:324-334); the device-resident oracle lifts raw ints, so
# inputs that arrive hot (zero-depth boundaries leave them at up to
# Delta~2^60 ~ q0*q1) are first cooled by exact single-row rescales.
_LIFT_VMAX_BITS = 13


def _cool_input(s, data, nl, scale, limit_log2):
    """Rescale single RNS rows (exact division) until log2(scale) +
    _LIFT_VMAX_BITS <= limit_log2. Returns (data, nl, scale, K) where K is
    the exact integer product of the dropped primes (1 if none)."""
    data = jnp.asarray(data)[:, :nl, :]
    K = 1
    while nl > 2 and np.log2(scale) + _LIFT_VMAX_BITS > limit_log2:
        data = s.ev.rescale_k(data, nl, 1)
        K *= int(s.ctx.q_primes[nl - 1])
        scale /= float(s.ctx.q_primes[nl - 1])
        nl -= 1
    return data, nl, scale, K


def _reheat(ctx, lifted, num_rows, K):
    """Multiply lifted coefficient planes [..., num_rows, N] by the exact
    integer K (mod each prime) — restores the pre-cooling scale so the
    oracle is scale-preserving like the reference SEAL oracle
    (SEAL_HEVM.cpp:324-334 re-encodes at the input scale) and like the
    executor's _meta_step OP_BOOTSTRAP prediction."""
    from .modmath import mul_mod_shoup, host_shoup
    qs = [int(ctx.q_primes[i]) for i in range(num_rows)]
    # exactness: |K * centered| < prod(qs)/2 (message stayed under q0*q1/2)
    assert np.log2(float(K)) + np.log2(float(qs[0])) + np.log2(float(qs[1])) \
        < sum(np.log2(float(q)) for q in qs), \
        "reheat would overflow the target chain modulus"
    km = jnp.asarray(np.array([K % q for q in qs], np.uint32))[:, None]
    ksh = jnp.asarray(np.array([host_shoup(K % q, q) for q in qs],
                               np.uint32))[:, None]
    qr = jnp.asarray(np.array(qs, np.uint32))[:, None]
    return mul_mod_shoup(lifted, km, ksh, qr)


class EmulatedBootstrapper:
    def __init__(self, scheme):
        self.s = scheme
        assert scheme.keys is not None and scheme.keys.s_ntt is not None, \
            "emulated bootstrapping needs the secret key (full VM mode)"
        self._jits = {}
        self._seed = np.random.SeedSequence(0xB007).generate_state(1)[0]

    def _plan(self, nl, scale, target_level):
        """Static cooling plan for (nl, scale): returns (n_drop, K, nl2)."""
        ctx = self.s.ctx
        nl2 = (target_level + 1) * ctx.config.rescale_rows
        limit = np.log2(float(ctx.q_primes[0]) * float(ctx.q_primes[1])) - 1
        K, n_drop, nlc, sc = 1, 0, nl, scale
        while nlc > 2 and np.log2(sc) + _LIFT_VMAX_BITS > limit:
            K *= int(ctx.q_primes[nlc - 1])
            sc /= float(ctx.q_primes[nlc - 1])
            nlc -= 1
            n_drop += 1
        return n_drop, K, nl2

    def _oracle_fn(self, nl, n_drop, K, nl2, batch):
        """ONE jitted dispatch for the whole oracle refresh (cool -> decrypt
        at the bottom pair -> exact CRT lift -> reheat -> fresh encrypt),
        with the encryption randomness generated ON DEVICE (jax.random) —
        replaces ~30 eager dispatches + ~11 MB of host->device randomness
        uploads per bootstrap (measured 0.24 s each on the tunneled chip).
        Cache key: (nl, n_drop, K, nl2, batch)."""
        key = (nl, n_drop, K, nl2, batch)
        fn = self._jits.get(key)
        if fn is not None:
            return fn
        import jax
        s = self.s
        ev = s.ev
        ctx = s.ctx
        from .modmath import add_mod, mul_mod
        from .crt_lift import pair_crt_expand
        n = ctx.n
        rows2 = list(range(nl2))
        qs2 = np.array([int(ctx.q_primes[i]) for i in range(nl2)], np.int64)

        qr32 = jnp.asarray(qs2.astype(np.int32))

        def residues_of_small(x):
            """Signed small ints [N] -> uint32 residue planes [nl2, N].
            numpy %-semantics (sign of divisor) keep results in [0, q)."""
            return (x[None, :] % qr32[:, None]).astype(jnp.uint32)

        def one(data, s_ntt, pk_enc, rngkey, pk):
            nlc = nl
            for _ in range(n_drop):
                data = ev._rescale_k(data, nlc, 1, pk)
                nlc -= 1
            nb = 2
            rows = [0, 1]
            qq = ev._mm_consts(rows)
            m_ntt = add_mod(data[0, :nb], mul_mod(data[1, :nb],
                                                  s_ntt[:nb], *qq), qq[0])
            c = ev._ntt(m_ntt, rows, pk, inverse=True)
            lifted = pair_crt_expand(ctx, c[0], c[1], nl2)
            if K != 1:
                lifted = _reheat(ctx, lifted, nl2, K)
            m2 = ev._ntt(lifted, rows2, pk)

            k1, k2, k3 = jax.random.split(rngkey, 3)
            v = jax.random.randint(k1, (n,), -1, 2, dtype=jnp.int32)
            e0 = jnp.round(jax.random.normal(k2, (n,)) * 3.2).astype(jnp.int32)
            e1 = jnp.round(jax.random.normal(k3, (n,)) * 3.2).astype(jnp.int32)
            vp = ev._ntt(residues_of_small(v), rows2, pk)
            e0p = ev._ntt(residues_of_small(e0), rows2, pk)
            e1p = ev._ntt(residues_of_small(e1), rows2, pk)
            qq2 = ev._mm_consts(rows2)
            q2 = qq2[0]
            c0 = add_mod(add_mod(mul_mod(vp, pk_enc[0], *qq2), e0p, q2), m2, q2)
            c1 = add_mod(mul_mod(vp, pk_enc[1], *qq2), e1p, q2)
            return jnp.stack([c0, c1])

        if batch:
            def f(data_b, s_ntt, pk_enc, rngkey, pk):
                with ev.use_pack(pk):
                    keys = jax.random.split(rngkey, data_b.shape[0])
                    return jax.vmap(
                        lambda d, k: one(d, s_ntt, pk_enc, k, pk))(data_b, keys)
        else:
            def f(data, s_ntt, pk_enc, rngkey, pk):
                with ev.use_pack(pk):
                    return one(data, s_ntt, pk_enc, rngkey, pk)
        import jax as _jax
        fn = self._jits[key] = _jax.jit(f)
        return fn

    def _next_key(self):
        import jax
        self._seed += 1
        return jax.random.PRNGKey(self._seed)

    def bootstrap(self, data, nl, scale, target_level):
        """Decrypt -> re-encrypt ENTIRELY ON DEVICE: m = c0 + c1*s in the
        NTT domain at the chain bottom, iNTT, exact uint32 CRT lift to the
        target chain (crt_lift), NTT back, plus a fresh encryption — zero
        device<->host ciphertext traffic. The old host path's blocking
        download + int64 lift serialized the dispatch queue 19 times per
        ResNet run; this keeps the bootstrap asynchronous like every other
        op. (Still the insecure oracle: the server holds s, exactly like
        the reference SEAL build, SEAL_HEVM.cpp:324-334.)"""
        import os
        if nl >= 2 and os.environ.get("DACAPO_TPU_ORACLE_JIT", "1") == "1":
            s = self.s
            n_drop, K, nl2 = self._plan(nl, scale, target_level)
            fn = self._oracle_fn(nl, n_drop, K, nl2, batch=False)
            out = fn(jnp.asarray(data)[:, :nl, :], s.keys.s_ntt,
                     s.keys.pk[:, :nl2, :], self._next_key(), s.ev.pack())
            return out, (nl2, scale)
        from .modmath import add_mod, mul_mod
        from .crt_lift import pair_crt_expand, single_crt_expand
        s = self.s
        ctx = s.ctx
        nl2 = (target_level + 1) * ctx.config.rescale_rows
        limit = np.log2(float(ctx.q_primes[0]) * float(ctx.q_primes[1])) - 1
        orig_scale = scale
        data, nl, scale, K = _cool_input(s, data, nl, scale, limit)
        nb = 2 if nl >= 2 else 1                       # base rows for the lift
        rows = list(range(nb))
        qq = s.ev._mm_consts(rows)
        m_ntt = add_mod(data[0, :nb], mul_mod(data[1, :nb],
                                              s.keys.s_ntt[:nb], *qq), qq[0])
        c = s.ev.intt(m_ntt, rows)                     # [nb, N] coeffs
        if nb == 2:
            lifted = pair_crt_expand(ctx, c[0], c[1], nl2)
        else:
            lifted = single_crt_expand(ctx, c[0], nl2)
        if K != 1:
            lifted = _reheat(ctx, lifted, nl2, K)
            scale = orig_scale
        m2 = s.ev.ntt(lifted, list(range(nl2)))

        # fresh encryption of m2 (host RNG for v/e, device NTT — ~N ints)
        kg = s.keygen
        v = kg._ntt_planes(kg._ternary(), list(range(nl2)))
        e0 = kg._ntt_planes(kg._gauss(), list(range(nl2)))
        e1 = kg._ntt_planes(kg._gauss(), list(range(nl2)))
        qq2 = s.ev._mm_consts(list(range(nl2)))
        q2 = qq2[0]
        pk = s.keys.pk[:, :nl2, :]
        c0 = add_mod(add_mod(mul_mod(v, pk[0], *qq2), e0, q2), m2, q2)
        c1 = add_mod(mul_mod(v, pk[1], *qq2), e1, q2)
        return jnp.stack([c0, c1]), (nl2, scale)

    def bootstrap_batch(self, data, nl, scale, target_level):
        """Batched device oracle: data [B, 2, nl, N], one dispatch chain for
        the whole batch (no per-row host trips)."""
        import os
        if nl >= 2 and os.environ.get("DACAPO_TPU_ORACLE_JIT", "1") == "1":
            s = self.s
            n_drop, K, nl2 = self._plan(nl, scale, target_level)
            fn = self._oracle_fn(nl, n_drop, K, nl2,
                                 batch=int(jnp.asarray(data).shape[0]))
            out = fn(jnp.asarray(data)[:, :, :nl, :], s.keys.s_ntt,
                     s.keys.pk[:, :nl2, :], self._next_key(), s.ev.pack())
            return out, (nl2, scale)
        from .modmath import add_mod, mul_mod
        from .crt_lift import pair_crt_expand, single_crt_expand
        s = self.s
        ctx = s.ctx
        data = jnp.asarray(data)
        B = int(data.shape[0])
        nl2 = (target_level + 1) * ctx.config.rescale_rows
        limit = np.log2(float(ctx.q_primes[0]) * float(ctx.q_primes[1])) - 1
        orig_scale = scale
        K = 1
        if nl > 2 and np.log2(scale) + _LIFT_VMAX_BITS > limit:
            # cool rows batch-wise (vmap over the batch of ciphertexts)
            while nl > 2 and np.log2(scale) + _LIFT_VMAX_BITS > limit:
                import jax
                data = jax.vmap(lambda d: s.ev.rescale_k(d, nl, 1))(
                    data[:, :, :nl, :])
                K *= int(ctx.q_primes[nl - 1])
                scale /= float(ctx.q_primes[nl - 1])
                nl -= 1
        nb = 2 if nl >= 2 else 1                       # base rows for the lift
        rows = list(range(nb))
        qq = s.ev._mm_consts(rows)
        m_ntt = add_mod(data[:, 0, :nb], mul_mod(data[:, 1, :nb],
                                                 s.keys.s_ntt[:nb], *qq),
                        qq[0])                           # [B, nb, N]
        c = s.ev.intt(m_ntt.reshape(B * nb, ctx.n),
                      rows * B).reshape(B, nb, ctx.n)
        if nb == 2:
            lifted = pair_crt_expand(ctx, c[:, 0], c[:, 1], nl2)
        else:
            lifted = single_crt_expand(ctx, c[:, 0], nl2)
        if K != 1:
            lifted = _reheat(ctx, lifted, nl2, K)
            scale = orig_scale
        m2 = s.ev.ntt(lifted.reshape(B * nl2, ctx.n),
                      list(range(nl2)) * B).reshape(B, nl2, ctx.n)

        kg = s.keygen
        def rand_planes(gen):
            return jnp.stack([kg._ntt_planes(gen(), list(range(nl2)))
                              for _ in range(B)])
        v = rand_planes(kg._ternary)
        e0 = rand_planes(kg._gauss)
        e1 = rand_planes(kg._gauss)
        qq2 = s.ev._mm_consts(list(range(nl2)))
        q2 = qq2[0]
        pk = s.keys.pk[:, :nl2, :]
        c0 = add_mod(add_mod(mul_mod(v, pk[0], *qq2), e0, q2), m2, q2)
        c1 = add_mod(mul_mod(v, pk[1], *qq2), e1, q2)
        return jnp.stack([c0, c1], axis=1), (nl2, scale)


def Bootstrapper(scheme, native=None):
    """Pick the native path when its keys are available, else emulate."""
    nb = getattr(scheme, "_native_bs", None)
    if nb is not None and native is not False:
        return nb
    if native is None:
        native = getattr(scheme, "bootstrap_keys", None) is not None
    if native:
        from .bootstrap_native import NativeBootstrapper
        return NativeBootstrapper(scheme)
    return EmulatedBootstrapper(scheme)
