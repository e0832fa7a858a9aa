"""Device-side CKKS evaluator primitives over RNS limb planes.

This is the TPU-native replacement for the seal::Evaluator /HEaaN evaluator
calls issued by the reference bytecode VM (lib/Runtime/SEAL_HEVM.cpp:268-334).
Every function is pure, shape-static, and jit-traceable; metadata (level,
scale) is compile-time and handled by the caller (vm/executor.py tracks it the
way SEAL tracks ciphertext.scale()).

Ciphertext polys: uint32 [2, nl, N] in NTT domain, rows = Q primes 0..nl-1.
Plaintext:        uint32 [nl, N] in NTT domain.
Key-switch keys:  uint32 [dnum, 2, num_all, N] (NTT domain, full QP basis).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .modmath import (
    add_mod, sub_mod, neg_mod, mul_mod, mul_mod_shoup,
)
from .ntt import ntt_fwd, ntt_inv


def _c(x):
    """Host uint32 scalar/array -> jnp constant."""
    return jnp.asarray(x, dtype=jnp.uint32)


class Evaluator:
    """Stateless op library bound to one CKKSContext (tables as closures).

    Methods are jit-cached per static signature (rows tuple / level / offset),
    so eager use (tests, keygen) compiles each op once as a fused XLA unit;
    whole-program jit (vm/executor.py) simply inlines them.
    """

    def __init__(self, ctx):
        self.ctx = ctx
        self.dev = ctx.dev
        self.n = ctx.n
        self._tab_cache = {}
        self._fn_cache = {}
        self._pallas_ntt = None
        self._ntt_backend = self._pick_ntt_backend()

    def _pick_ntt_backend(self):
        """'pallas' on real TPU hardware (fused single-pass kernel), 'xla'
        otherwise. Override with DACAPO_TPU_NTT=pallas|xla."""
        import os

        mode = os.environ.get("DACAPO_TPU_NTT", "auto")
        if mode in ("pallas", "xla"):
            return mode
        if self.n < 1024:            # kernel layout needs >= 8 sublane rows
            return "xla"
        try:
            import jax

            plat = jax.devices()[0].platform
        except Exception:
            return "xla"
        return "pallas" if plat in ("tpu", "axon") else "xla"

    def _get_pallas_ntt(self):
        if self._pallas_ntt is None:
            from .pallas.ntt_kernel import PallasNTT

            self._pallas_ntt = PallasNTT(self.ctx)
        return self._pallas_ntt

    def _jit(self, key, make_fn):
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = jax.jit(make_fn())
            self._fn_cache[key] = fn
        return fn

    # ------------------------------------------------------------- tables
    def _tabs(self, rows, names):
        key = (tuple(rows), names)
        out = self._tab_cache.get(key)
        if out is None:
            # Cache HOST numpy slices: always safe to close over (they embed
            # as constants per trace), never tracers from an enclosing jit.
            idx = np.asarray(rows, dtype=np.int32)
            host = self.ctx.host_tables
            scalars = ("q", "qinv_neg", "rconst", "rconst_shoup", "ninv", "ninv_shoup")
            out = tuple(
                np.ascontiguousarray(host[n][idx][:, None] if n in scalars else host[n][idx])
                for n in names
            )
            self._tab_cache[key] = out
        return out

    def _rows(self, rows):
        return self._tabs(tuple(rows), ("tw", "tw_shoup", "itw", "itw_shoup", "q", "ninv", "ninv_shoup"))

    def _q(self, rows):
        return self._tabs(tuple(rows), ("q",))[0]

    def _mm_consts(self, rows):
        return self._tabs(tuple(rows), ("q", "qinv_neg", "rconst", "rconst_shoup"))

    # ---------------------------------------------------------------- NTT
    def ntt(self, x, rows):
        rows = tuple(rows)
        if self._ntt_backend == "pallas":
            return self._get_pallas_ntt()(x, rows, inverse=False)
        tw, tws, _, _, q, _, _ = self._rows(rows)
        return self._jit(("ntt", rows, x.shape), lambda: lambda y: ntt_fwd(y, tw, tws, q))(x)

    def intt(self, x, rows):
        rows = tuple(rows)
        if self._ntt_backend == "pallas":
            return self._get_pallas_ntt()(x, rows, inverse=True)
        _, _, itw, itws, q, ninv, ninvs = self._rows(rows)
        return self._jit(
            ("intt", rows, x.shape), lambda: lambda y: ntt_inv(y, itw, itws, q, ninv, ninvs)
        )(x)

    # ---------------------------------------------------- pointwise basics
    def add_ct(self, a, b, nl):
        q = self._q(range(nl))
        return self._jit(("add_ct", nl), lambda: lambda x, y: add_mod(x, y, q))(a, b)

    def sub_ct(self, a, b, nl):
        q = self._q(range(nl))
        return self._jit(("sub_ct", nl), lambda: lambda x, y: sub_mod(x, y, q))(a, b)

    def neg_ct(self, a, nl):
        q = self._q(range(nl))
        return self._jit(("neg_ct", nl), lambda: lambda x: neg_mod(x, q))(a)

    def add_pt(self, ct, pt, nl):
        q = self._q(range(nl))
        return self._jit(
            ("add_pt", nl), lambda: lambda c, p: c.at[0].set(add_mod(c[0], p, q))
        )(ct, pt)

    def mul_pt(self, ct, pt, nl):
        qq = self._mm_consts(range(nl))
        return self._jit(
            ("mul_pt", nl),
            lambda: lambda c, p: jnp.stack([mul_mod(c[0], p, *qq), mul_mod(c[1], p, *qq)]),
        )(ct, pt)

    def mul_pt_scalar(self, ct, consts, consts_shoup, nl):
        """Multiply by a per-row scalar constant (e.g. native upscale by 2^k).

        consts: host uint32 [nl] (value mod q_i), with shoup companions.
        """
        c = _c(consts)[:, None]
        cs = _c(consts_shoup)[:, None]
        q = self._q(range(nl))
        return mul_mod_shoup(ct, c, cs, q)

    def upscale(self, ct, nl, up_bits: int):
        """Exact multiply by 2^up_bits. The per-row constants are passed as
        arguments so ONE compiled signature per level serves every factor."""
        from .modmath import host_shoup
        vals = [pow(2, up_bits, q) for q in self.ctx.q_primes[:nl]]
        sh = [host_shoup(v, q) for v, q in zip(vals, self.ctx.q_primes[:nl])]
        c = _c(np.array(vals, np.uint32))[:, None]
        cs = _c(np.array(sh, np.uint32))[:, None]
        q = self._q(range(nl))
        return self._jit(
            ("upscale", nl),
            lambda: lambda x, cc, ss: mul_mod_shoup(x, cc, ss, q),
        )(ct, c, cs)

    def mod_drop(self, ct, k: int):
        """modswitch by k levels = drop the top k RNS rows (SEAL semantics)."""
        return ct[:, : ct.shape[1] - k, :]

    # -------------------------------------------------------------- rescale
    def rescale(self, ct, nl):
        return self._jit(("rescale", nl), lambda: lambda x: self._rescale(x, nl))(ct)

    def rescale_k(self, ct, nl, k: int):
        """Drop k top rows with exact division (composite-level rescale),
        fused into one compiled unit."""
        if k == 1:
            return self.rescale(ct, nl)
        return self._jit(
            ("rescale_k", nl, k), lambda: lambda x: self._rescale_k(x, nl, k)
        )(ct)

    def _rescale_k(self, x, nl, k):
        for i in range(k):
            x = self._rescale(x, nl - i)
        return x

    def _rescale(self, ct, nl):
        """Divide by the top prime q_{nl-1}: exact RNS rescale with centered lift."""
        lc = self.ctx.level(nl)
        rows_lo = list(range(nl - 1))
        top = ct[:, nl - 1, :]                      # [2, N] NTT domain
        top_c = self.intt(top, [nl - 1] * 2)        # both polys, same prime row
        # centered lift: v' = v or v - q_top; residue mod q_i. q_top may be
        # larger than q_i (balanced-pair chains, q_top/q_i < 2), so reduce v
        # mod q_i first, then add the precomputed correction and reduce again.
        half = jnp.uint32(lc.rs_half)
        diff = _c(lc.rs_diff)[None, :, None]        # [1, nl-1, 1]
        qrow = self._q(rows_lo)[None, :, :]         # [1, nl-1, 1]
        v = top_c[:, None, :]                       # [2, 1, N]
        vm = jnp.where(v >= qrow, v - qrow, v)      # v mod q_i  (q_top < 2 q_i)
        r2 = vm + diff
        r2 = jnp.where(r2 >= qrow, r2 - qrow, r2)
        lifted = jnp.where(v > half, r2, vm)        # [2, nl-1, N]
        conv = self.ntt(lifted.reshape(2 * (nl - 1), self.n), rows_lo + rows_lo)
        conv = conv.reshape(2, nl - 1, self.n)
        q = self._q(rows_lo)
        num = sub_mod(ct[:, : nl - 1, :], conv, q)
        inv = _c(lc.rs_inv)[:, None]
        invs = _c(lc.rs_inv_shoup)[:, None]
        return mul_mod_shoup(num, inv, invs, q)

    # ---------------------------------------------------------- keyswitch
    def keyswitch(self, c_ntt, nl, ksk):
        return self._jit(
            ("keyswitch", nl), lambda: lambda c, k: self._keyswitch(c, nl, k)
        )(c_ntt, ksk)

    def _modup(self, c_ntt, nl):
        """ModUp decomposition of `c_ntt` (uint32 [nl, N], NTT domain).

        Returns uint32 [dnum_active, len(qp_rows), N] digit planes in NTT
        domain over the full Q^{(nl)}P basis (hybrid GHS/RNS with approximate
        base conversion; see params.py). Factored out of the key-switch so
        rotations of one ciphertext can HOIST it (Halevi-Shoup hoisting: the
        decomposition is coefficient-wise, so automorphisms commute with it
        and many rotations can share one ModUp).
        """
        ctx = self.ctx
        lc = ctx.level(nl)
        alpha = ctx.config.alpha
        sp_rows = [ctx.config.num_q + i for i in range(alpha)]
        qp_rows = list(range(nl)) + sp_rows

        c_coeff = self.intt(c_ntt, range(nl))

        # compute all groups' coeff-domain extensions, then ONE batched NTT
        # over the concatenated target planes (fewer Mosaic kernels per graph
        # -> faster XLA compiles and fewer launches)
        exts_coeff = []
        all_target_rows = []
        for g in lc.groups:
            own = g.rows
            u = mul_mod_shoup(
                c_coeff[np.asarray(own)],
                _c(g.t_coef)[:, None], _c(g.t_coef_shoup)[:, None],
                self._q(own),
            )
            tq = self._q(g.targets)
            ext = None
            for gi in range(len(own)):
                term = mul_mod_shoup(
                    u[gi][None, :], _c(g.m[gi])[:, None], _c(g.m_shoup[gi])[:, None], tq
                )
                ext = term if ext is None else add_mod(ext, term, tq)
            exts_coeff.append(ext)
            all_target_rows.extend(g.targets)
        ext_ntt = self.ntt(jnp.concatenate(exts_coeff, axis=0), all_target_rows)

        digits = []
        off = 0
        for g in lc.groups:
            own = g.rows
            ext = ext_ntt[off: off + len(g.targets)]
            off += len(g.targets)
            # own planes stay in NTT domain, scaled by S
            own_planes = mul_mod_shoup(
                c_ntt[np.asarray(own)],
                _c(g.s_ntt)[:, None], _c(g.s_ntt_shoup)[:, None],
                self._q(own),
            )
            # assemble digit planes in qp_rows order
            planes = {}
            for i, r in enumerate(own):
                planes[r] = own_planes[i]
            for i, r in enumerate(g.targets):
                planes[r] = ext[i]
            digits.append(jnp.stack([planes[r] for r in qp_rows]))
        return jnp.stack(digits)

    def _ks_inner(self, digits, nl, ksk):
        """Inner product of ModUp digits with the key-switch key.

        digits: [dnum_active, |QP|, N]; returns (acc0, acc1) over the QP basis.
        """
        ctx = self.ctx
        alpha = ctx.config.alpha
        sp_rows = [ctx.config.num_q + i for i in range(alpha)]
        qp_rows = list(range(nl)) + sp_rows
        kq = self._mm_consts(qp_rows)
        idx = np.asarray(qp_rows)
        nd = digits.shape[0]
        k = ksk[:nd][:, :, idx]           # [nd, 2, |QP|, N]
        t0 = mul_mod(digits, k[:, 0], *kq)
        t1 = mul_mod(digits, k[:, 1], *kq)
        qfull = kq[0]
        acc0, acc1 = t0[0], t1[0]
        for j in range(1, nd):
            acc0 = add_mod(acc0, t0[j], qfull)
            acc1 = add_mod(acc1, t1[j], qfull)
        return acc0, acc1

    def _keyswitch(self, c_ntt, nl, ksk):
        """Switch the key under poly `c_ntt` (uint32 [nl, N], NTT domain).

        Returns (b_add, a_add): uint32 [nl, N] each, to be added to (c0, 0) or
        (c0, c1') depending on the operation (relin vs rotate).
        Hybrid GHS/RNS key-switching with approximate ModUp (see params.py).
        """
        ctx = self.ctx
        lc = ctx.level(nl)
        sp_rows = [ctx.config.num_q + i for i in range(ctx.config.alpha)]
        digits = self._modup(c_ntt, nl)
        acc0, acc1 = self._ks_inner(digits, nl, ksk)
        return self._mod_down_pair(acc0, acc1, nl, lc, sp_rows)

    def _mod_down_pair(self, x0, x1, nl, lc, sp_rows):
        """ModDown of both keyswitch halves with batched NTT passes."""
        alpha = self.ctx.config.alpha
        xp = jnp.concatenate([x0[nl:], x1[nl:]], axis=0)      # [2a, N]
        xp_c = self.intt(xp, sp_rows + sp_rows)
        tq = self._q(sp_rows)
        u = mul_mod_shoup(
            xp_c.reshape(2, alpha, self.n),
            _c(lc.md_t)[None, :, None], _c(lc.md_t_shoup)[None, :, None], tq[None],
        )
        q = self._q(range(nl))
        conv = None
        for gi in range(alpha):
            term = mul_mod_shoup(
                u[:, gi][:, None, :],
                _c(lc.md_m[gi])[None, :, None], _c(lc.md_m_shoup[gi])[None, :, None],
                q[None],
            )
            conv = term if conv is None else add_mod(conv, term, q[None])
        conv = self.ntt(conv.reshape(2 * nl, self.n), list(range(nl)) * 2)
        conv = conv.reshape(2, nl, self.n)
        pv = _c(lc.pinv)[:, None]
        pvs = _c(lc.pinv_shoup)[:, None]
        out0 = mul_mod_shoup(sub_mod(x0[:nl], conv[0], q), pv, pvs, q)
        out1 = mul_mod_shoup(sub_mod(x1[:nl], conv[1], q), pv, pvs, q)
        return out0, out1

    # ------------------------------------------------------------ mul / rot
    def mul_ct(self, a, b, nl, rlk):
        return self._jit(
            ("mul_ct", nl), lambda: lambda x, y, k: self._mul_ct(x, y, nl, k)
        )(a, b, rlk)

    def _mul_ct(self, a, b, nl, rlk):
        """ct*ct multiply + relinearization."""
        qq = self._mm_consts(range(nl))
        q = qq[0]
        d0 = mul_mod(a[0], b[0], *qq)
        d1 = add_mod(mul_mod(a[0], b[1], *qq), mul_mod(a[1], b[0], *qq), q)
        d2 = mul_mod(a[1], b[1], *qq)
        ks0, ks1 = self._keyswitch(d2, nl, rlk)
        return jnp.stack([add_mod(d0, ks0, q), add_mod(d1, ks1, q)])

    def square_ct(self, a, nl, rlk):
        return self._jit(
            ("square_ct", nl), lambda: lambda x, k: self._square_ct(x, nl, k)
        )(a, rlk)

    def _square_ct(self, a, nl, rlk):
        qq = self._mm_consts(range(nl))
        q = qq[0]
        d0 = mul_mod(a[0], a[0], *qq)
        d1 = mul_mod(a[0], a[1], *qq)
        d1 = add_mod(d1, d1, q)
        d2 = mul_mod(a[1], a[1], *qq)
        ks0, ks1 = self._keyswitch(d2, nl, rlk)
        return jnp.stack([add_mod(d0, ks0, q), add_mod(d1, ks1, q)])

    def automorphism(self, planes, perm):
        """Apply slot permutation (Galois automorphism in NTT domain)."""
        return planes[..., jnp.asarray(perm, dtype=jnp.int32)]

    def rotate(self, ct, nl, steps: int, gk):
        """Left-rotate slots by `steps` using the galois key for that step.

        The permutation table is an argument, so one compiled signature per
        level serves every rotation offset."""
        perm = jnp.asarray(self.ctx.rot_perm(steps), dtype=jnp.int32)
        return self._jit(
            ("rotate", nl), lambda: lambda c, p, k: self._rotate(c, nl, p, k)
        )(ct, perm, gk)

    def _rotate(self, ct, nl, perm, gk):
        c0p = ct[0][..., perm]
        c1p = ct[1][..., perm]
        ks0, ks1 = self._keyswitch(c1p, nl, gk)
        q = self._q(range(nl))
        return jnp.stack([add_mod(c0p, ks0, q), ks1])

    def conjugate(self, ct, nl, ck):
        """Complex-conjugate the slots (automorphism X -> X^{-1})."""
        return self._jit(
            ("conj", nl), lambda: lambda c, k: self._conjugate(c, nl, k)
        )(ct, ck)

    def _conjugate(self, ct, nl, ck):
        perm = self.ctx.conj_perm
        c0p = self.automorphism(ct[0], perm)
        c1p = self.automorphism(ct[1], perm)
        ks0, ks1 = self._keyswitch(c1p, nl, ck)
        q = self._q(range(nl))
        return jnp.stack([add_mod(c0p, ks0, q), ks1])

    # ------------------------------------------------- hoisted rotation bank
    # Bank sizes compiled for rotate_apply: a bank of K rotations dispatches
    # as greedy chunks of these sizes, so XLA compiles at most
    # len(BANK_BUCKETS) signatures per level instead of one per distinct K
    # (compile time dominates on remote-compile TPU setups).
    BANK_BUCKETS = (8, 4, 2, 1)

    def modup(self, c_ntt, nl):
        """Hoisted ModUp digits of one poly (jitted per level)."""
        return self._jit(
            ("modup", nl), lambda: lambda c: self._modup(c, nl)
        )(c_ntt)

    def rotate_apply(self, digits, c0, nl, perms, gks):
        """Apply K rotations given hoisted ModUp digits of c1.

        perms: int32 [K, N]; gks: uint32 [K, dnum, 2, num_all, N].
        Returns uint32 [K, 2, nl, N]. Jitted per (nl, K); callers chunk K
        into BANK_BUCKETS sizes.
        """
        k = int(perms.shape[0])
        return self._jit(
            ("rotate_apply", nl, k),
            lambda: lambda d, c, p, g: self._rotate_apply(d, c, nl, p, g),
        )(digits, c0, perms, gks)

    def _rotate_apply(self, digits, c0, nl, perms, gks):
        ctx = self.ctx
        lc = ctx.level(nl)
        sp_rows = [ctx.config.num_q + i for i in range(ctx.config.alpha)]
        q = self._q(range(nl))

        def one(perm, gk):
            d = digits[..., perm]                # σ commutes with ModUp
            acc0, acc1 = self._ks_inner(d, nl, gk)
            b, a = self._mod_down_pair(acc0, acc1, nl, lc, sp_rows)
            c0p = c0[..., perm]
            return jnp.stack([add_mod(c0p, b, q), a])

        return jax.vmap(one)(perms, gks)

    def rotate_batch(self, ct, nl, perms, gks):
        """K rotations of ONE ciphertext with a single hoisted ModUp.

        Halevi-Shoup hoisting: the ModUp decomposition is coefficient-wise,
        so the Galois automorphism commutes with it — decompose c1 once, then
        each rotation is only a plane permutation + evk inner product +
        ModDown. This replaces K (iNTT + base-conv + NTT) pipelines with one,
        and the per-rotation work batches into big TPU-friendly ops.

        Dispatches as bucket-sized rotate_apply chunks sharing one modup.
        Returns uint32 [K, 2, nl, N].
        """
        k = int(perms.shape[0])
        digits = self.modup(ct[1], nl)
        outs = []
        i = 0
        while i < k:
            step = next(b for b in self.BANK_BUCKETS if b <= k - i)
            outs.append(self.rotate_apply(
                digits, ct[0], nl, perms[i: i + step], gks[i: i + step]))
            i += step
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
