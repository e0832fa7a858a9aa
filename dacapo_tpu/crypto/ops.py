"""Device-side CKKS evaluator primitives over RNS limb planes.

This is the TPU-native replacement for the seal::Evaluator /HEaaN evaluator
calls issued by the reference bytecode VM (lib/Runtime/SEAL_HEVM.cpp:268-334).
Every function is pure, shape-static, and jit-traceable; metadata (level,
scale) is compile-time and handled by the caller (vm/executor.py tracks it the
way SEAL tracks ciphertext.scale()).

Ciphertext polys: uint32 [2, nl, N] in NTT domain, rows = Q primes 0..nl-1.
Plaintext:        uint32 [nl, N] in NTT domain.
Key-switch keys:  uint32 [dnum, 2, num_all, N] (NTT domain, full QP basis).

Table-argument discipline
-------------------------
All N-sized precomputed tables (NTT twiddle/stage planes) are device-resident
ONCE in a "pack" (pytree of jnp arrays) and passed to every jitted op as an
ARGUMENT, never closed over: a closed-over array embeds as a constant in each
trace, so compiled-program size would scale with the twiddle stacks (tens of
MB at N=2^15 x 35 primes) and blow remote-compile payload limits. With the
pack as an argument, jit keys on shapes only and programs stay KB-sized.
Per-level scalar constants ([nl]-sized) are harmless and stay closures.
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

from .modmath import (
    add_mod, sub_mod, neg_mod, mul_mod, mul_mod_shoup, mulhi_u32, mullo_u32,
)
from .ntt import ntt_fwd, ntt_inv


def _c(x):
    """Host uint32 scalar/array -> jnp constant."""
    return jnp.asarray(x, dtype=jnp.uint32)


def _mac_buckets():
    import os
    mb = int(os.environ.get("DACAPO_TPU_MAC_BUCKET", "16"))
    return tuple(b for b in (16, 8, 4, 2, 1) if b <= mb)


# pack entries that are per-prime scalars ([num_all]); the rest are planes
_PACK_SCALARS = ("q", "qinv_neg", "rconst", "rconst_shoup", "ninv",
                 "ninv_shoup", "m32")


class Evaluator:
    """Stateless op library bound to one CKKSContext.

    Methods are jit-cached per static signature (level / rows tuple / bank
    size); the shared table pack rides along as an argument (see module
    docstring), so eager use (tests, keygen) compiles each op once as a fused
    XLA unit and whole-program jit (vm/executor.py) threads one pack through
    the entire program via `use_pack`.
    """

    def __init__(self, ctx):
        self.ctx = ctx
        self.dev = ctx.dev
        self.n = ctx.n
        self._tab_cache = {}
        self._fn_cache = {}
        self._pallas_ntt = None
        self._pack_cache = None
        self._pack_override = None
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

    # ---------------------------------------------------------------- pack
    def pack(self):
        """Device-resident global table bundle (passed as jit ARGUMENTS).

        Contains per-prime scalar vectors [num_all] plus the NTT tables for
        the active backend: compact twiddle rows [num_all, N] (xla) or
        per-stage plane stacks [num_all, S, N] (pallas)."""
        if self._pack_override is not None:
            return self._pack_override
        if self._pack_cache is None:
            host = self.ctx.host_tables
            with jax.ensure_compile_time_eval():
                d = {k: jnp.asarray(host[k]) for k in _PACK_SCALARS}
                d["pow2"] = jnp.asarray(host["pow2"])   # [P, 256]
                if self._ntt_backend == "pallas":
                    pn = self._get_pallas_ntt()
                    d["ptw"], d["ptws"] = pn.device_planes(False)
                    d["pitw"], d["pitws"] = pn.device_planes(True)
                else:
                    for k in ("tw", "tw_shoup", "itw", "itw_shoup"):
                        d[k] = jnp.asarray(host[k])
            self._pack_cache = d
        return self._pack_cache

    @contextlib.contextmanager
    def use_pack(self, pk):
        """Route ops to a caller-supplied pack (an outer jit's traced
        arguments) for the duration — the whole-program/segment jit hook."""
        old = self._pack_override
        self._pack_override = pk
        try:
            yield
        finally:
            self._pack_override = old

    # in-trace gathers from the pack (constant indices, tiny)
    @staticmethod
    def _pk_col(pk, name, rows):
        idx = np.asarray(rows, dtype=np.int32)
        return pk[name][idx][:, None]

    def _pkq(self, pk, rows):
        return self._pk_col(pk, "q", rows)

    def _pkmm(self, pk, rows):
        idx = np.asarray(rows, dtype=np.int32)
        return tuple(
            pk[n][idx][:, None]
            for n in ("q", "qinv_neg", "rconst", "rconst_shoup")
        )

    # ------------------------------------------------------- host tables
    def _tabs(self, rows, names):
        key = (tuple(rows), names)
        out = self._tab_cache.get(key)
        if out is None:
            # Host numpy slices for EAGER (non-jitted) callers: keygen,
            # scheme encrypt/decrypt. Never used inside jitted ops.
            idx = np.asarray(rows, dtype=np.int32)
            host = self.ctx.host_tables
            out = tuple(
                np.ascontiguousarray(
                    host[n][idx][:, None] if n in _PACK_SCALARS else host[n][idx]
                )
                for n in names
            )
            self._tab_cache[key] = out
        return out

    def _q(self, rows):
        return self._tabs(tuple(rows), ("q",))[0]

    def _mm_consts(self, rows):
        return self._tabs(tuple(rows), ("q", "qinv_neg", "rconst", "rconst_shoup"))

    # ---------------------------------------------------------------- NTT
    def _ntt(self, x, rows, pk, inverse=False):
        """In-trace NTT/iNTT: x uint32 [B, N], tables gathered from `pk`.

        Device NTT-domain data lives in ORBIT ORDER (params.orbit_perm): the
        fixed reorder is fused here as a STATIC gather on the kernel
        boundary, so every rotation downstream is a roll."""
        rows = tuple(rows)
        idx = np.asarray(rows, dtype=np.int32)
        if inverse:
            x = x[..., self.ctx.orbit_inv]         # orbit -> kernel order
        if self._ntt_backend == "pallas":
            from .pallas.ntt_kernel import ntt_pallas

            key = "pitw" if inverse else "ptw"
            out = ntt_pallas(
                x, jnp.asarray(idx), pk[key], pk[key + "s"],
                pk["q"][idx], pk["ninv"][idx], pk["ninv_shoup"][idx],
                self.ctx.logn, inverse,
            )
        elif inverse:
            out = ntt_inv(
                x, pk["itw"][idx], pk["itw_shoup"][idx], pk["q"][idx][:, None],
                pk["ninv"][idx][:, None], pk["ninv_shoup"][idx][:, None],
            )
        else:
            out = ntt_fwd(x, pk["tw"][idx], pk["tw_shoup"][idx],
                          pk["q"][idx][:, None])
        if not inverse:
            out = out[..., self.ctx.orbit_perm]    # kernel -> orbit order
        return out

    def ntt(self, x, rows):
        rows = tuple(rows)
        return self._jit(
            ("ntt", rows), lambda: lambda y, p: self._ntt(y, rows, p, False)
        )(x, self.pack())

    def intt(self, x, rows):
        rows = tuple(rows)
        return self._jit(
            ("intt", rows), lambda: lambda y, p: self._ntt(y, rows, p, True)
        )(x, self.pack())

    # ---------------------------------------------------- pointwise basics
    def add_ct(self, a, b, nl):
        return self._jit(
            ("add_ct", nl),
            lambda: lambda x, y, p: add_mod(x, y, self._pkq(p, range(nl))),
        )(a, b, self.pack())

    def sub_ct(self, a, b, nl):
        return self._jit(
            ("sub_ct", nl),
            lambda: lambda x, y, p: sub_mod(x, y, self._pkq(p, range(nl))),
        )(a, b, self.pack())

    def neg_ct(self, a, nl):
        return self._jit(
            ("neg_ct", nl),
            lambda: lambda x, p: neg_mod(x, self._pkq(p, range(nl))),
        )(a, self.pack())

    def add_pt(self, ct, pt, nl):
        return self._jit(
            ("add_pt", nl),
            lambda: lambda c, q, p: c.at[0].set(
                add_mod(c[0], q, self._pkq(p, range(nl)))),
        )(ct, pt, self.pack())

    def mul_pt(self, ct, pt, nl):
        def make():
            def f(c, t, p):
                qq = self._pkmm(p, range(nl))
                return jnp.stack([mul_mod(c[0], t, *qq), mul_mod(c[1], t, *qq)])
            return f
        return self._jit(("mul_pt", nl), make)(ct, pt, self.pack())

    def mul_pt_scalar(self, ct, consts, consts_shoup, nl):
        """Multiply by a per-row scalar constant (e.g. native upscale by 2^k).

        consts: host uint32 [nl] (value mod q_i), with shoup companions.
        """
        c = _c(consts)[:, None]
        cs = _c(consts_shoup)[:, None]
        q = self._q(range(nl))
        return mul_mod_shoup(ct, c, cs, q)

    def scalar_rows(self, k: int, nl: int):
        """Host (residue, shoup) u32 arrays [2, nl] of an arbitrary integer
        multiplier K against the bottom nl q-rows — the argument form of
        upscale_res/upscale_rescale_res. K need not be a power of two: the
        scale-steering pass (vm/steer.py) uses K = round(2^(u+x)*correction)
        to re-anchor composite-rescale drift."""
        from .modmath import host_shoup
        vals = [k % q for q in self.ctx.q_primes[:nl]]
        sh = [host_shoup(v, q) for v, q in zip(vals, self.ctx.q_primes[:nl])]
        return np.stack([np.array(vals, np.uint32), np.array(sh, np.uint32)])

    def upscale_res(self, ct, nl, ccs):
        """Multiply by a per-row scalar passed as a [2, nl] (residue, shoup)
        argument — one compiled signature per level serves every factor,
        including inside traced segment windows (the constants ride as
        arguments, never baked into the HLO)."""
        return self._jit(
            ("upscale", nl),
            lambda: lambda x, cc, p: mul_mod_shoup(
                x, cc[0][:, None], cc[1][:, None],
                self._pkq(p, range(nl))),
        )(ct, ccs, self.pack())

    def upscale(self, ct, nl, up_bits: int):
        """Exact multiply by 2^up_bits (argument-passed constants)."""
        return self.upscale_res(ct, nl, _c(self.scalar_rows(1 << up_bits, nl)))

    # ------------------------------------------- compact plaintext decode
    def decode_plain(self, lohi, rows):
        """Compact plaintexts -> NTT-domain RNS planes, fully ON DEVICE.

        lohi: uint32 [B, 2, N] (Encoder.encode_compact_batch layout: abs
        mantissa lo / packed hi|sign|exp). rows: target prime rows. Returns
        uint32 [B, len(rows), N]. Replaces host-side residue computation +
        per-use H2D streaming of multi-GB pre-encoded plaintext pools."""
        rows = tuple(rows)
        b = int(lohi.shape[0])
        return self._jit(
            ("dec_pt", rows, b),
            lambda: lambda x, p: self._decode_plain(x, rows, p),
        )(lohi, self.pack())

    def _decode_plain(self, lohi, rows, pk):
        idx = np.asarray(rows, dtype=np.int32)
        b = lohi.shape[0]
        nrows = len(rows)
        lo = lohi[:, None, 0, :]                    # [B, 1, N]
        hi = lohi[:, None, 1, :]
        hi_abs = hi & jnp.uint32(0x7FFFFF)          # < 2^23 < q
        sign = (hi >> 23) & jnp.uint32(1)
        k = (hi >> 24).astype(jnp.int32)
        q = pk["q"][idx][None, :, None]             # [1, R, 1]
        m32 = pk["m32"][idx][None, :, None]
        qq = tuple(pk[n][idx][None, :, None] for n in
                   ("q", "qinv_neg", "rconst", "rconst_shoup"))
        # lo mod q via Barrett (m32 = floor(2^32/q); quotient off by <= 1,
        # then one more conditional subtract for safety)
        t = mulhi_u32(lo, m32)
        r = lo - mullo_u32(t, q)
        r = jnp.where(r >= q, r - q, r)
        r = jnp.where(r >= q, r - q, r)
        # + hi_abs * (2^32 mod q)
        val = add_mod(r, mul_mod(hi_abs, qq[2] * jnp.uint32(1), *qq), q)
        val = jnp.where(sign.astype(jnp.bool_), neg_mod(val, q), val)
        # * 2^k
        p2 = pk["pow2"][idx][None, :, :]            # [1, R, 256]
        p2k = jnp.take_along_axis(
            jnp.broadcast_to(p2, (b, nrows, 256)),
            jnp.broadcast_to(k, (b, nrows, lohi.shape[-1])) % 256, axis=2)
        val = mul_mod(val, p2k, *qq)
        flat = val.reshape(b * nrows, lohi.shape[-1])
        out = self._ntt(flat, list(rows) * b, pk)
        return out.reshape(b, nrows, lohi.shape[-1])

    def upscale_rescale_res(self, ct, nl, ccs, k: int):
        """Fused scalar multiply ([2, nl] argument, see upscale_res)
        followed by a k-row rescale — the PARS scale-alignment idiom, one
        launch instead of two."""
        return self._jit(
            ("uprescale", nl, k),
            lambda: lambda x, cc, p: self._rescale_k(
                mul_mod_shoup(x, cc[0][:, None], cc[1][:, None],
                              self._pkq(p, range(nl))), nl, k, p),
        )(ct, ccs, self.pack())

    def upscale_rescale(self, ct, nl, up_bits: int, k: int):
        """Fused exact multiply by 2^up_bits + k-row rescale."""
        return self.upscale_rescale_res(
            ct, nl, _c(self.scalar_rows(1 << up_bits, nl)), k)

    def mod_drop(self, ct, k: int):
        """modswitch by k levels = drop the top k RNS rows (SEAL semantics)."""
        return ct[:, : ct.shape[1] - k, :]

    # -------------------------------------------------------------- rescale
    def rescale(self, ct, nl):
        return self._jit(
            ("rescale", nl), lambda: lambda x, p: self._rescale(x, nl, p)
        )(ct, self.pack())

    def rescale_k(self, ct, nl, k: int):
        """Drop k top rows with exact division (composite-level rescale),
        fused into one compiled unit."""
        if k == 1:
            return self.rescale(ct, nl)
        return self._jit(
            ("rescale_k", nl, k), lambda: lambda x, p: self._rescale_k(x, nl, k, p)
        )(ct, self.pack())

    def _rescale_k(self, x, nl, k, pk):
        for i in range(k):
            x = self._rescale(x, nl - i, pk)
        return x

    def _rescale(self, ct, nl, pk):
        """Divide by the top prime q_{nl-1}: exact RNS rescale with centered lift."""
        lc = self.ctx.level(nl)
        rows_lo = list(range(nl - 1))
        top = ct[:, nl - 1, :]                      # [2, N] NTT domain
        top_c = self._ntt(top, [nl - 1] * 2, pk, inverse=True)
        # centered lift: v' = v or v - q_top; residue mod q_i. q_top may be
        # larger than q_i (balanced-pair chains, q_top/q_i < 2), so reduce v
        # mod q_i first, then add the precomputed correction and reduce again.
        half = jnp.uint32(lc.rs_half)
        diff = _c(lc.rs_diff)[None, :, None]        # [1, nl-1, 1]
        qrow = self._pkq(pk, rows_lo)[None, :, :]   # [1, nl-1, 1]
        v = top_c[:, None, :]                       # [2, 1, N]
        vm = jnp.where(v >= qrow, v - qrow, v)      # v mod q_i  (q_top < 2 q_i)
        r2 = vm + diff
        r2 = jnp.where(r2 >= qrow, r2 - qrow, r2)
        lifted = jnp.where(v > half, r2, vm)        # [2, nl-1, N]
        conv = self._ntt(lifted.reshape(2 * (nl - 1), self.n), rows_lo + rows_lo, pk)
        conv = conv.reshape(2, nl - 1, self.n)
        q = self._pkq(pk, rows_lo)
        num = sub_mod(ct[:, : nl - 1, :], conv, q)
        inv = _c(lc.rs_inv)[:, None]
        invs = _c(lc.rs_inv_shoup)[:, None]
        return mul_mod_shoup(num, inv, invs, q)

    # ---------------------------------------------------------- keyswitch
    def keyswitch(self, c_ntt, nl, ksk):
        return self._jit(
            ("keyswitch", nl), lambda: lambda c, k, p: self._keyswitch(c, nl, k, p)
        )(c_ntt, ksk, self.pack())

    def _modup(self, c_ntt, nl, pk):
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

        c_coeff = self._ntt(c_ntt, range(nl), pk, inverse=True)

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
                self._pkq(pk, own),
            )
            tq = self._pkq(pk, g.targets)
            ext = None
            for gi in range(len(own)):
                term = mul_mod_shoup(
                    u[gi][None, :], _c(g.m[gi])[:, None], _c(g.m_shoup[gi])[:, None], tq
                )
                ext = term if ext is None else add_mod(ext, term, tq)
            exts_coeff.append(ext)
            all_target_rows.extend(g.targets)
        ext_ntt = self._ntt(jnp.concatenate(exts_coeff, axis=0), all_target_rows, pk)

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
                self._pkq(pk, own),
            )
            # assemble digit planes in qp_rows order
            planes = {}
            for i, r in enumerate(own):
                planes[r] = own_planes[i]
            for i, r in enumerate(g.targets):
                planes[r] = ext[i]
            digits.append(jnp.stack([planes[r] for r in qp_rows]))
        return jnp.stack(digits)

    def _ks_inner(self, digits, nl, ksk, pk):
        """Inner product of ModUp digits with the key-switch key.

        digits: [dnum_active, |QP|, N]; returns (acc0, acc1) over the QP basis.
        """
        ctx = self.ctx
        alpha = ctx.config.alpha
        sp_rows = [ctx.config.num_q + i for i in range(alpha)]
        qp_rows = list(range(nl)) + sp_rows
        kq = self._pkmm(pk, qp_rows)
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

    def _keyswitch(self, c_ntt, nl, ksk, pk):
        """Switch the key under poly `c_ntt` (uint32 [nl, N], NTT domain).

        Returns (b_add, a_add): uint32 [nl, N] each, to be added to (c0, 0) or
        (c0, c1') depending on the operation (relin vs rotate).
        Hybrid GHS/RNS key-switching with approximate ModUp (see params.py).
        """
        ctx = self.ctx
        lc = ctx.level(nl)
        sp_rows = [ctx.config.num_q + i for i in range(ctx.config.alpha)]
        digits = self._modup(c_ntt, nl, pk)
        acc0, acc1 = self._ks_inner(digits, nl, ksk, pk)
        return self._mod_down_pair(acc0, acc1, nl, lc, sp_rows, pk)

    def _mod_down_pair(self, x0, x1, nl, lc, sp_rows, pk):
        """ModDown of both keyswitch halves with batched NTT passes."""
        alpha = self.ctx.config.alpha
        xp = jnp.concatenate([x0[nl:], x1[nl:]], axis=0)      # [2a, N]
        xp_c = self._ntt(xp, sp_rows + sp_rows, pk, inverse=True)
        tq = self._pkq(pk, sp_rows)
        u = mul_mod_shoup(
            xp_c.reshape(2, alpha, self.n),
            _c(lc.md_t)[None, :, None], _c(lc.md_t_shoup)[None, :, None], tq[None],
        )
        q = self._pkq(pk, range(nl))
        conv = None
        for gi in range(alpha):
            term = mul_mod_shoup(
                u[:, gi][:, None, :],
                _c(lc.md_m[gi])[None, :, None], _c(lc.md_m_shoup[gi])[None, :, None],
                q[None],
            )
            conv = term if conv is None else add_mod(conv, term, q[None])
        conv = self._ntt(conv.reshape(2 * nl, self.n), list(range(nl)) * 2, pk)
        conv = conv.reshape(2, nl, self.n)
        pv = _c(lc.pinv)[:, None]
        pvs = _c(lc.pinv_shoup)[:, None]
        out0 = mul_mod_shoup(sub_mod(x0[:nl], conv[0], q), pv, pvs, q)
        out1 = mul_mod_shoup(sub_mod(x1[:nl], conv[1], q), pv, pvs, q)
        return out0, out1

    # ------------------------------------------------------------ mul / rot
    def mul_ct(self, a, b, nl, rlk):
        return self._jit(
            ("mul_ct", nl), lambda: lambda x, y, k, p: self._mul_ct(x, y, nl, k, p)
        )(a, b, rlk, self.pack())

    def _mul_ct(self, a, b, nl, rlk, pk):
        """ct*ct multiply + relinearization."""
        qq = self._pkmm(pk, range(nl))
        q = qq[0]
        d0 = mul_mod(a[0], b[0], *qq)
        d1 = add_mod(mul_mod(a[0], b[1], *qq), mul_mod(a[1], b[0], *qq), q)
        d2 = mul_mod(a[1], b[1], *qq)
        ks0, ks1 = self._keyswitch(d2, nl, rlk, pk)
        return jnp.stack([add_mod(d0, ks0, q), add_mod(d1, ks1, q)])

    def square_ct(self, a, nl, rlk):
        return self._jit(
            ("square_ct", nl), lambda: lambda x, k, p: self._square_ct(x, nl, k, p)
        )(a, rlk, self.pack())

    def _square_ct(self, a, nl, rlk, pk):
        qq = self._pkmm(pk, range(nl))
        q = qq[0]
        d0 = mul_mod(a[0], a[0], *qq)
        d1 = mul_mod(a[0], a[1], *qq)
        d1 = add_mod(d1, d1, q)
        d2 = mul_mod(a[1], a[1], *qq)
        ks0, ks1 = self._keyswitch(d2, nl, rlk, pk)
        return jnp.stack([add_mod(d0, ks0, q), add_mod(d1, ks1, q)])

    def automorphism(self, planes, shift):
        """Slot-rotation automorphism in the ORBIT layout: roll each half of
        the lane axis by -shift (see params.CKKSContext.orbit_perm). `shift`
        may be a traced scalar — XLA lowers the roll to two dynamic slices
        at copy bandwidth, vs the arbitrary-gather path that ran ~2 orders
        below roofline on TPU."""
        s = self.ctx.n // 2
        shp = planes.shape
        v = planes.reshape(shp[:-1] + (2, s))
        v = jnp.roll(v, -shift, axis=-1)
        return v.reshape(shp)

    def conj_apply(self, planes):
        """Conjugation automorphism in the orbit layout: half swap."""
        s = self.ctx.n // 2
        shp = planes.shape
        v = planes.reshape(shp[:-1] + (2, s))
        return v[..., ::-1, :].reshape(shp)

    def rotate(self, ct, nl, steps: int, gk):
        """Left-rotate slots by `steps` using the galois key for that step.

        The shift rides as a traced scalar argument, so one compiled
        signature per level serves every rotation offset."""
        return self._jit(
            ("rotate", nl), lambda: lambda c, sh, k, p: self._rotate(c, nl, sh, k, p)
        )(ct, jnp.int32(steps % (self.ctx.n // 2)), gk, self.pack())

    def _rotate(self, ct, nl, shift, gk, pk):
        c0p = self.automorphism(ct[0], shift)
        c1p = self.automorphism(ct[1], shift)
        ks0, ks1 = self._keyswitch(c1p, nl, gk, pk)
        q = self._pkq(pk, range(nl))
        return jnp.stack([add_mod(c0p, ks0, q), ks1])

    def conjugate(self, ct, nl, ck):
        """Complex-conjugate the slots (automorphism X -> X^{-1})."""
        def make():
            def f(c, k, p):
                c0p = self.conj_apply(c[0])
                c1p = self.conj_apply(c[1])
                ks0, ks1 = self._keyswitch(c1p, nl, k, p)
                q = self._pkq(p, range(nl))
                return jnp.stack([add_mod(c0p, ks0, q), ks1])
            return f
        return self._jit(("conj", nl), make)(ct, ck, self.pack())

    # ------------------------------------------------- hoisted rotation bank
    # Bank sizes compiled for rotate_apply: a bank of K rotations dispatches
    # as greedy chunks of these sizes, so XLA compiles at most
    # len(BANK_BUCKETS) signatures per level instead of one per distinct K
    # (compile time dominates on remote-compile TPU setups).
    BANK_BUCKETS = (8, 4, 2, 1)

    def modup(self, c_ntt, nl):
        """Hoisted ModUp digits of one poly (jitted per level)."""
        return self._jit(
            ("modup", nl), lambda: lambda c, p: self._modup(c, nl, p)
        )(c_ntt, self.pack())

    def rotate_apply(self, digits, c0, nl, shifts, gks):
        """Apply K rotations given hoisted ModUp digits of c1.

        shifts: int32 [K] slot shifts; gks: uint32 [K, dnum, 2, num_all, N].
        Returns uint32 [K, 2, nl, N]. Jitted per (nl, K); callers chunk K
        into BANK_BUCKETS sizes.
        """
        k = int(shifts.shape[0])
        return self._jit(
            ("rotate_apply", nl, k),
            lambda: lambda d, c, sh, g, p: self._rotate_apply(d, c, nl, sh, g, p),
        )(digits, c0, shifts, gks, self.pack())

    def _rotate_apply(self, digits, c0, nl, shifts, gks, pk):
        ctx = self.ctx
        lc = ctx.level(nl)
        sp_rows = [ctx.config.num_q + i for i in range(ctx.config.alpha)]
        q = self._pkq(pk, range(nl))

        def one(shift, gk):
            d = self.automorphism(digits, shift)   # σ commutes with ModUp
            acc0, acc1 = self._ks_inner(d, nl, gk, pk)
            b, a = self._mod_down_pair(acc0, acc1, nl, lc, sp_rows, pk)
            c0p = self.automorphism(c0, shift)
            return jnp.stack([add_mod(c0p, b, q), a])

        return jax.vmap(one)(shifts, gks)

    # ------------------------------------------------ fused conv bank (MAC)
    # chunk width trades launches against XLA program size (remote-compile
    # time grows superlinearly); override with DACAPO_TPU_MAC_BUCKET
    ROT_MAC_BUCKETS = _mac_buckets()

    def rot_mac(self, ct, nl, shifts, gks, pts, extras=(), fold_rescale_rows=0,
                extras_post=False, digits=None, plain_vals=(), plain_pts=()):
        """sum_k pts[k] * rot_{steps_k}(ct) (+ extras): the hoisted conv bank.

        ONE ModUp of ct[1] serves every rotation (Halevi-Shoup), and the
        ModDown runs ONCE per accumulation group (lazy ModDown): plaintext
        masks multiply the keyswitch accumulators in the extended Q^{(nl)}P
        basis, which commutes with ModDown up to the usual rounding noise.
        Replaces K*(rotate + mulcp) + (K-1) addcc VM instructions — the MPCB
        conv hot loop (reference MPCB.py MultParConvBN) — with ceil(K/16)+1
        launches and 1/K of the ModDown work.

        shifts: int32 [K] slot shifts; gks: list of K keys; pts: list of K
        uint32 [nl+alpha, N] planes (Q rows then special rows); extras: ciphertext
        addends [2, nl, N] at the product's (level, scale). Returns
        [2, nl - fold_rescale_rows, N]. `digits`: precomputed hoisted ModUp
        of ct[1] (executor-shared across the groups of one conv bank)."""
        pk = self.pack()
        k = int(shifts.shape[0]) if shifts is not None else 0
        if digits is None and k:
            digits = self.modup(ct[1], nl)
        accs = None
        i = 0
        while i < k:
            step = next(b for b in self.ROT_MAC_BUCKETS if b <= k - i)
            gk_c = jnp.stack([gks[j] for j in range(i, i + step)])
            pt_c = jnp.stack([pts[j] for j in range(i, i + step)])
            pm_c = shifts[i: i + step]
            if accs is None:
                accs = self._jit(
                    ("rot_mac_chunk0", nl, step),
                    lambda: lambda d, c0, pm, g, t, p: self._rot_mac_chunk(
                        d, c0, pm, g, t, nl, p),
                )(digits, ct[0], pm_c, gk_c, pt_c, pk)
            else:
                accs = self._jit(
                    ("rot_mac_chunk", nl, step),
                    lambda: lambda d, c0, pm, g, t, a, p: self._rot_mac_chunk(
                        d, c0, pm, g, t, nl, p, a),
                )(digits, ct[0], pm_c, gk_c, pt_c, accs, pk)
            i += step
        return self._jit(
            ("rot_mac_fin", nl, len(extras), fold_rescale_rows, extras_post,
             len(plain_vals), accs is None),
            lambda: lambda a, v, t, e, p: self._rot_mac_fin(
                a, v, t, e, nl, fold_rescale_rows, extras_post, p),
        )(accs, list(plain_vals), list(plain_pts), list(extras), pk)

    def _rot_mac_chunk(self, digits, c0, shifts, gks, pts, nl, pk, accs=None):
        ctx = self.ctx
        alpha = ctx.config.alpha
        sp_rows = [ctx.config.num_q + i for i in range(alpha)]
        qp_rows = list(range(nl)) + sp_rows
        kqp = self._pkmm(pk, qp_rows)
        kq = self._pkmm(pk, range(nl))

        def one(shift, gk, pt):
            d = self.automorphism(digits, shift)   # σ commutes with ModUp
            a0, a1 = self._ks_inner(d, nl, gk, pk)
            c0p = self.automorphism(c0, shift)
            return (mul_mod(c0p, pt[:nl], *kq),
                    mul_mod(a0, pt, *kqp), mul_mod(a1, pt, *kqp))

        tc, t0, t1 = jax.vmap(one)(shifts, gks, pts)

        def red(x, q):
            acc = x[0]
            for j in range(1, x.shape[0]):
                acc = add_mod(acc, x[j], q)
            return acc

        rc, r0, r1 = red(tc, kq[0]), red(t0, kqp[0]), red(t1, kqp[0])
        if accs is not None:
            rc = add_mod(rc, accs[0], kq[0])
            r0 = add_mod(r0, accs[1], kqp[0])
            r1 = add_mod(r1, accs[2], kqp[0])
        return rc, r0, r1

    def _rot_mac_fin(self, accs, plain_vals, plain_pts, extras, nl, rs_rows,
                     extras_post, pk):
        """Finish an accumulation group: one ModDown of the keyswitch
        accumulators, plus the keyswitch-free PLAIN taps (mask times an
        existing ciphertext), then the folded rescale. extras_post: extras
        join AFTER the rescale (the PARS per-tap-rescale shape, where the
        tree operands sit at nl - rs_rows)."""
        q = self._pkq(pk, range(nl))
        out = None
        if accs is not None:
            rc, r0, r1 = accs
            lc = self.ctx.level(nl)
            sp_rows = [self.ctx.config.num_q + i
                       for i in range(self.ctx.config.alpha)]
            b, a = self._mod_down_pair(r0, r1, nl, lc, sp_rows, pk)
            out = jnp.stack([add_mod(rc, b, q), a])
        if plain_vals:
            qq = self._pkmm(pk, range(nl))
            vs = jnp.stack(plain_vals)            # [J, 2, nl, N]
            ps = jnp.stack(plain_pts)             # [J, nl, N]
            prod = mul_mod(vs, ps[:, None], *qq)
            s = prod[0]
            for j in range(1, prod.shape[0]):
                s = add_mod(s, prod[j], q)
            out = s if out is None else add_mod(out, s, q)
        if not extras_post:
            for e in extras:
                out = add_mod(out, e, q)
        if rs_rows:
            out = self._rescale_k(out, nl, rs_rows, pk)
        if extras_post:
            q2 = self._pkq(pk, range(nl - rs_rows))
            for e in extras:
                out = add_mod(out, e, q2)
        return out

    def rotate_batch(self, ct, nl, shifts, gks):
        """K rotations of ONE ciphertext with a single hoisted ModUp.

        Halevi-Shoup hoisting: the ModUp decomposition is coefficient-wise,
        so the Galois automorphism commutes with it — decompose c1 once, then
        each rotation is only a plane permutation + evk inner product +
        ModDown. This replaces K (iNTT + base-conv + NTT) pipelines with one,
        and the per-rotation work batches into big TPU-friendly ops.

        Dispatches as bucket-sized rotate_apply chunks sharing one modup.
        Returns uint32 [K, 2, nl, N].
        """
        k = int(shifts.shape[0])
        digits = self.modup(ct[1], nl)
        outs = []
        i = 0
        while i < k:
            step = next(b for b in self.BANK_BUCKETS if b <= k - i)
            outs.append(self.rotate_apply(
                digits, ct[0], nl, shifts[i: i + step], gks[i: i + step]))
            i += step
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
