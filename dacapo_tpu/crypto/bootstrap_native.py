"""Native CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

This is the component the reference licenses out to HEaaN (the SEAL build
ships only a decrypt/re-encrypt emulation, lib/Runtime/SEAL_HEVM.cpp:324-334;
the real path is HEAAN_HEVM.cpp:386-399 `bootstrapper->bootstrap`). Here it is
built from our own RNS/JAX primitives:

* ModRaise: centered lift of the level-1 residue plane to the full Q chain.
* CoeffToSlot / SlotToCoeff: the "twisted DFT" A[j,k] = zeta^{5^j k}. Because
  5^j = 1 mod 4, slots of any ciphertext satisfy z = A (a + i b) where (a, b)
  are the low/high coefficient halves — so ONE s x s transform suffices in
  each direction (full packing). Evaluated as BSGS diagonal matrix-vector
  products whose baby rotations ride the hoisted rotation bank
  (ops.Evaluator.rotate_batch).
* EvalMod: Re/Im split via the conjugation key, then Chebyshev approximation
  of cos((2*pi*K*x - pi/2) / 2^r) followed by r double-angle steps — yielding
  sin(2*pi*t), i.e. t mod 1, with the 1/(2*pi) folded into the metadata scale
  (a free "scale trick" in the RNS representation).

Scale management here is manual and exact: every plaintext is encoded at the
scale that makes the post-rescale result land on its target scale, so adds
never mix drifted scales (the HEaaN VM does the same bookkeeping at runtime,
HEAAN_HEVM.cpp:313-343).
"""

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from numpy.polynomial import chebyshev as C

from .modmath import add_mod


@dataclass(frozen=True)
class BootstrapConfig:
    K: int = 16           # ModRaise integer range bound |I + m/q0| <= K
    r: int = 3            # double-angle iterations
    degree: int = 30      # Chebyshev degree for the base cos approx
    baby: int = 8         # Chebyshev BSGS baby-step count (power of two)
    radix: int = 5        # butterfly stages merged per CtS/StC level
    #   Each merged level costs 1 multiplicative depth and ~2*sqrt(2^radix)
    #   hoisted rotations; total levels = ceil(log2(slots)/radix). radix=5
    #   -> 3 levels at N=2^16, matching HEaaN-class FFT bootstrapping.


# --------------------------------------------------------------------------
# ciphertext value wrapper with manual (nl, scale) bookkeeping
# --------------------------------------------------------------------------

class CtVal:
    """(data [2, nl, N], scale) with exact host-side scale tracking."""

    __slots__ = ("bs", "data", "scale")

    def __init__(self, bs, data, scale):
        self.bs = bs
        self.data = data
        self.scale = float(scale)

    @property
    def nl(self):
        return int(self.data.shape[1])

    def drop_to(self, nl):
        if nl == self.nl:
            return self
        assert nl < self.nl
        return CtVal(self.bs, self.data[:, :nl, :], self.scale)

    def add(self, o):
        assert self.nl == o.nl
        assert abs(self.scale / o.scale - 1) < 1e-9, (self.scale, o.scale)
        return CtVal(self.bs, self.bs.ev.add_ct(self.data, o.data, self.nl), self.scale)

    def sub(self, o):
        assert self.nl == o.nl
        assert abs(self.scale / o.scale - 1) < 1e-9
        return CtVal(self.bs, self.bs.ev.sub_ct(self.data, o.data, self.nl), self.scale)

    def mul_ct(self, o):
        assert self.nl == o.nl
        assert self.nl >= 2, "bootstrap pipeline exhausted the modulus chain"
        s = self.bs.s
        return CtVal(self.bs, s.ev.mul_ct(self.data, o.data, self.nl, s.keys.rlk),
                     self.scale * o.scale).rescale()

    def square(self):
        assert self.nl >= 2, "bootstrap pipeline exhausted the modulus chain"
        s = self.bs.s
        return CtVal(self.bs, s.ev.square_ct(self.data, self.nl, s.keys.rlk),
                     self.scale * self.scale).rescale()

    def rescale(self):
        q_top = self.bs.s.ctx.q_primes[self.nl - 1]
        return CtVal(self.bs, self.bs.ev.rescale(self.data, self.nl),
                     self.scale / q_top)

    def mul_const(self, c, target_scale):
        """Multiply by scalar c (complex ok), rescaling onto target_scale
        exactly: the constant is encoded at scale target*q_top/self.scale."""
        q_top = self.bs.s.ctx.q_primes[self.nl - 1]
        pt_scale = target_scale * q_top / self.scale
        pt = self.bs.encode_const(c, pt_scale, self.nl)
        out = self.bs.ev.mul_pt(self.data, pt, self.nl)
        return CtVal(self.bs, out, self.scale * pt_scale).rescale()

    def add_const(self, c):
        pt = self.bs.encode_const(c, self.scale, self.nl)
        return CtVal(self.bs, self.bs.ev.add_pt(self.data, pt, self.nl), self.scale)

    def scale_by(self, factor):
        """Metadata-only division of the value by `factor` (free)."""
        return CtVal(self.bs, self.data, self.scale * factor)

    def double_val(self):
        """value *= 2 at the SAME declared scale via a native 1-bit upscale
        (multiply the RNS ints by 2; no rescale, no level cost).

        Chebyshev doubling steps T_2k = 2*T_k^2 - 1 must use this instead of
        scale_by(0.5): halving the declared scale compounds quadratically
        through squarings (scale_k = q/2^(2^k - 1) -> precision collapse),
        while doubling the ints keeps scale ~= q stable through the chain."""
        return CtVal(self.bs, self.bs.ev.upscale(self.data, self.nl, 1),
                     self.scale)

    def conj(self):
        s = self.bs.s
        s.keygen.ensure_conj(s.keys)
        return CtVal(self.bs, s.ev.conjugate(self.data, self.nl, s.keys.conj),
                     self.scale)


# --------------------------------------------------------------------------
# BSGS linear transform over slots
# --------------------------------------------------------------------------

class SlotLinearTransform:
    """z -> M z for a sparse-diagonal complex matrix, BSGS diagonal method.

    out = sum_g rot_{g*b}( sum_j rot_{-g*b}(diag_{g*b+j}) * rot_j(z) )

    Baby rotations rot_j(z) share one hoisted ModUp (rotate_batch); the
    plaintext diagonals are encoded lazily per (level, scale) signature.
    `diags`: {offset: complex [s]} with convention (Mz)_j = sum_d
    diags[d][j] * z[(j+d) % s] (dft_factor level dicts), or a dense [s, s]
    matrix for small ad-hoc transforms.
    """

    def __init__(self, bs, mat=None, diags=None, s=None):
        self.bs = bs
        if diags is None:
            s = mat.shape[0]
            diags = {}
            for off in range(s):
                d = np.array([mat[k, (k + off) % s] for k in range(s)])
                if np.max(np.abs(d)) > 1e-12 * max(1.0, np.max(np.abs(mat))):
                    diags[off] = d
        else:
            s = s or bs.s.ctx.config.n_slots
        self.s = s
        self.diags = {
            off: np.asarray(v) for off, v in diags.items()
            if np.max(np.abs(v)) > 1e-15
        }
        offs = sorted(self.diags)
        b = max(1, int(np.ceil(np.sqrt(len(offs)))))
        # group offsets by giant step g*b
        self.b = b
        self.groups = {}
        for off in offs:
            self.groups.setdefault(off // b, []).append(off)
        self._pt_cache = {}

    def _pt(self, off, g, nl, pt_scale):
        key = (off, g, nl, pt_scale)
        pt = self._pt_cache.get(key)
        if pt is None:
            d = np.roll(self.diags[off], g * self.b)
            pt = self.bs.encode_vec(d, pt_scale, nl)
            self._pt_cache[key] = pt
        return pt

    def apply(self, ct: CtVal, target_scale: float) -> CtVal:
        bs = self.bs
        s_obj = bs.s
        nl = ct.nl
        q_top = s_obj.ctx.q_primes[nl - 1]
        pt_scale = target_scale * q_top / ct.scale

        baby_steps = sorted({off % self.b for offs in self.groups.values()
                             for off in offs} | {0})
        rots = bs.rotate_bank(ct.data, nl, baby_steps)
        rot_of = dict(zip(baby_steps, rots))

        acc = None
        for g, offs in sorted(self.groups.items()):
            inner = None
            for off in offs:
                pt = self._pt(off, g, nl, pt_scale)
                term = bs.ev.mul_pt(rot_of[off % self.b], pt, nl)
                inner = term if inner is None else bs.ev.add_ct(term, inner, nl)
            gsteps = (g * self.b) % s_obj.ctx.config.n_slots
            if gsteps != 0:
                s_obj.ensure_galois([gsteps])
                inner = bs.ev.rotate(inner, nl, gsteps, s_obj.keys.galois[gsteps])
            acc = inner if acc is None else bs.ev.add_ct(acc, inner, nl)
        return CtVal(bs, acc, ct.scale * pt_scale).rescale()


# --------------------------------------------------------------------------
# the bootstrapper
# --------------------------------------------------------------------------

class NativeBootstrapper:
    def __init__(self, scheme, cfg: BootstrapConfig = None):
        self.s = scheme
        self.ev = scheme.ev
        self.cfg = cfg or BootstrapConfig()
        ctx = scheme.ctx
        self.q0 = ctx.q_primes[0]
        # Slot transforms are the FFT-factored twisted DFT (dft_factor.py):
        # ceil(log2 s / radix) sparse-diagonal levels per direction instead
        # of one dense s x s matrix (which is O(s^2) memory — infeasible at
        # N=2^16). Bit-reversal stays implicit: CtS leaves coefficients in
        # brv order, EvalMod is pointwise, StC undoes it.
        self._cts = None
        self._stc = None
        self._cheb = None
        self._enc_cache = {}

    # ------------------------------------------------------------ helpers
    def encode_vec(self, vec, scale, nl):
        planes = self.s.encoder.encode(vec, float(scale), nl)
        return self.ev.ntt(jnp.asarray(planes), list(range(nl)))

    def encode_const(self, c, scale, nl):
        key = (complex(c), float(scale), nl)
        pt = self._enc_cache.get(key)
        if pt is None:
            vec = np.full(self.s.ctx.config.n_slots, c, dtype=np.complex128)
            pt = self.encode_vec(vec, scale, nl)
            self._enc_cache[key] = pt
        return pt

    def rotate_bank(self, data, nl, steps):
        """Hoisted batch of rotations; returns list aligned with `steps`."""
        nz = [st for st in steps if st % self.s.ctx.config.n_slots != 0]
        out = {}
        if nz:
            self.s.ensure_galois(nz)
            perms = jnp.asarray(
                np.stack([self.s.ctx.rot_perm(st) for st in nz]), dtype=jnp.int32)
            gks = jnp.stack([self.s.keys.galois[st % self.s.ctx.config.n_slots]
                             for st in nz])
            res = self.ev.rotate_batch(data, nl, perms, gks)
            for i, st in enumerate(nz):
                out[st] = res[i]
        for st in steps:
            if st % self.s.ctx.config.n_slots == 0:
                out[st] = data
        return [out[st] for st in steps]

    # --------------------------------------------------------- mod raise
    def mod_raise(self, data, nl):
        """ct mod q0 -> ct mod Q_full (centered lift), NTT domain in/out."""
        ctx = self.s.ctx
        num_q = ctx.config.num_q
        if nl > 1:
            data = data[:, :1, :]
        c = self.ev.intt(data[:, 0, :], [0, 0])          # [2, N] coeffs mod q0
        q0 = np.uint32(self.q0)
        half = jnp.uint32(self.q0 // 2)
        qs = np.array(ctx.q_primes[:num_q], dtype=np.int64)
        assert (qs > self.q0 // 2).all(), "mod_raise needs q_i > q0/2"
        # v <= q0/2: v already < q_i; v > q0/2: v - (q0 - q_i) in [0, q_i)
        corr = jnp.asarray(((qs - np.int64(self.q0)) % (1 << 32)).astype(np.uint32))
        v = c[:, None, :]                                 # [2, 1, N]
        lifted = jnp.where(v > half, v + corr[None, :, None], v)
        flat = lifted.reshape(2 * num_q, ctx.n)
        rows = list(range(num_q)) * 2
        rows = [r for r in range(num_q)] + [r for r in range(num_q)]
        out = self.ev.ntt(flat, rows).reshape(2, num_q, ctx.n)
        return out

    # ------------------------------------------------------ chebyshev eval
    def _cheb_coeffs(self):
        if self._cheb is None:
            K, r, deg = self.cfg.K, self.cfg.r, self.cfg.degree
            f = lambda x: np.cos((2 * np.pi * K * x - np.pi / 2) / (2 ** r))
            self._cheb = C.chebinterpolate(f, deg)
        return self._cheb

    def _eval_cheb_bsgs(self, t1: CtVal, coeffs):
        """Evaluate sum_i coeffs[i] T_i(t1), Paterson-Stockmeyer over the
        Chebyshev basis, with LEVEL-UNIFORM scheduling: all baby/giant powers
        are normalized to one (level, scale) base, every leaf sits at rank 1
        below the base, and each PS recursion adds exactly one level — total
        depth ceil(log2 b) + 1 + ceil(log2(deg/b)) + 1 instead of the
        cascading alignments a naive walk pays (each stray mismatch costs a
        whole extra level via alignment const-muls)."""
        b = self.cfg.baby
        deg = len(coeffs) - 1

        # baby steps T_1..T_b and giants T_{2b}, T_{4b}, ...
        T = {1: t1}
        for i in range(2, b + 1):
            if i % 2 == 0:
                h = T[i // 2]
                T[i] = h.square().double_val().add_const(-1.0)
            else:
                # T_i = 2 T_{(i+1)/2} T_{(i-1)/2} - T_1  (i odd)
                a_, b_ = T[(i + 1) // 2], T[(i - 1) // 2]
                nl = min(a_.nl, b_.nl)
                prod = a_.drop_to(nl).mul_ct(b_.drop_to(nl)).double_val()
                t1d = t1.drop_to(prod.nl)
                t1a = t1d.mul_const(1.0, prod.scale) if abs(
                    t1d.scale / prod.scale - 1) > 1e-9 else t1d
                nl_c = min(prod.nl, t1a.nl)
                T[i] = prod.drop_to(nl_c).sub(t1a.drop_to(nl_c))
        g = 2 * b
        while g <= deg:
            h = T[g // 2]
            T[g] = h.square().double_val().add_const(-1.0)
            g *= 2

        # Level invariants (no separate normalize pass — the leaf const-muls
        # double as normalization): leaves output at nl_leaf - 1 on a common
        # scale; giants T_{2^k b} sit at nl_leaf - k + ... >= any quotient
        # that multiplies them, so each PS recursion costs exactly 1 level.
        delta = max(t1.scale, float(2.0 ** self.s.ctx.config.prime_bits))
        nl_leaf = min(T[k].nl for k in T if k <= b)

        def leaf(c):
            terms = [(i, c[i]) for i in range(1, len(c)) if abs(c[i]) > 1e-15]
            acc = None
            for i, ci in terms:
                term = T[i].drop_to(nl_leaf).mul_const(ci, delta)
                acc = term if acc is None else acc.add(term)
            if acc is None:
                acc = T[1].drop_to(nl_leaf).mul_const(0.0, delta)
            if abs(c[0]) > 1e-15:
                acc = acc.add_const(complex(c[0]))
            return acc

        def eval_poly(c):
            """CtVal for sum c[i] T_i at exactly rank(deg c) below base."""
            d = len(c) - 1
            while d > 0 and abs(c[d]) < 1e-15:
                d -= 1
            c = c[: d + 1]
            if d <= b:
                return leaf(c)
            gg = b
            while gg * 2 <= d:
                gg *= 2
            tg = np.zeros(gg + 1)
            tg[gg] = 1.0
            q, r = C.chebdiv(c, tg)
            qv = eval_poly(q)           # rank(d) - 1
            rv = eval_poly(r)           # rank(deg r) <= rank(d) - 1
            prod = qv.mul_ct(T[gg].drop_to(qv.nl))     # rank(d)
            # rv sits >= 1 level above prod (rank(deg r) <= rank(d) - 1);
            # one const-mul lands it exactly on (prod.nl, prod.scale)
            rv = rv.drop_to(prod.nl + 1).mul_const(1.0, prod.scale)
            return prod.add(rv)

        return eval_poly(np.asarray(coeffs, dtype=np.complex128))

    # ----------------------------------------------------------- pipeline
    def _transforms(self):
        if self._cts is None:
            from .dft_factor import build_levels
            n = self.s.ctx.n
            radix = self.cfg.radix
            self._cts = [
                SlotLinearTransform(self, diags=d)
                for d in build_levels(n, radix, inverse=True)
            ]
            self._stc = [
                SlotLinearTransform(self, diags=d)
                for d in build_levels(n, radix, inverse=False)
            ]
        return self._cts, self._stc

    def bootstrap(self, data, nl, scale, target_level):
        """data: uint32 [2, nl, N]; returns (data', (nl', scale'))."""
        cfg = self.cfg
        s = self.s
        ctx = s.ctx
        q0 = float(self.q0)
        delta = float(scale)

        raised = self.mod_raise(data, nl)
        ct = CtVal(self, raised, delta)

        cts_levels, stc_levels = self._transforms()

        # Internal working scale ~= prime size: ct*ct squares then satisfy
        # scale^2/q_top ~= scale, so EvalMod's double-angle chain is
        # scale-stable even when the program scale delta << 2^prime_bits
        # (the drift that HEaaN's fixed-scale-per-level bookkeeping absorbs,
        # HEAAN_HEVM.cpp:313-343).
        delta_bs = float(2.0 ** ctx.config.prime_bits)

        # CoeffToSlot: u = A^{-1} z (coeffs in brv slot order); one level
        # per merged butterfly group
        u = ct
        for t in cts_levels:
            u = t.apply(u, delta_bs)

        # Re/Im split (the 1/2 rides the metadata scale)
        uc = u.conj()
        s_re = u.add(uc).scale_by(2.0)                 # value = Re(u)
        s_im = u.sub(uc).scale_by(2.0)                 # value = i*Im(u) -> fold -i below

        # normalize to [-1,1]: x = value*(delta/(q0*K)) ; -i for the imag leg
        norm = delta / (q0 * cfg.K)
        coeffs = self._cheb_coeffs()

        def evalmod(leg, pre):
            # leg.value = a/delta (coeff half over delta);
            # want t1.value = a/(q0*K) = leg.value * norm  (mul_const
            # multiplies the VALUE by its constant, exactly)
            t1 = leg.mul_const(pre * norm, delta_bs)
            y = self._eval_cheb_bsgs(t1, coeffs)
            for _ in range(cfg.r):
                y = y.square().double_val().add_const(-1.0)
            # y = sin(2*pi*t) ; value m/q0 = y / (2*pi)
            return y.scale_by(2.0 * np.pi)

        v_re = evalmod(s_re, 1.0)
        v_im = evalmod(s_im, -1j)

        # Repack w = v_re + i*v_im (one const-mul level on each leg — far
        # cheaper than a second full StC chain for the imaginary part),
        # then ONE factored SlotToCoeff: out = A w.
        nl_c = min(v_re.nl, v_im.nl)
        v_re = v_re.drop_to(nl_c)
        v_im = v_im.drop_to(nl_c)
        target0 = min(v_re.scale, v_im.scale)
        w = v_re.mul_const(1.0, target0).add(v_im.mul_const(1j, target0))

        out = w
        for t in stc_levels:
            out = t.apply(out, target0)

        # out value = z_orig * (delta/q0)... declare true scale:
        # underlying ints = out.scale * value = out.scale*(delta/q0)*z  ->
        # declared scale = out.scale * delta / q0 makes decrypt return z.
        final_scale = out.scale * delta / q0
        nl2 = target_level + 1
        assert out.nl >= nl2, (
            f"bootstrap consumed too many levels: have {out.nl}, need {nl2}")
        res = out.data[:, :nl2, :]
        return res, (nl2, final_scale)
