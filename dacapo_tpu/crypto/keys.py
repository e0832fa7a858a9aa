"""Key generation: secret/public/relinearization/Galois keys.

TPU-native replacement for the reference's `create_context` keyset generation
(lib/Runtime/SEAL_HEVM.cpp:44-89). Sampling happens host-side (numpy RNG);
the NTTs run through the same device kernels used at runtime. Keys can be
persisted to an on-disk keyset directory like the reference's ~/.hevm/seal.
"""

import os
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp


class GaloisStore:
    """Galois-key store: dict-like, optionally host-backed with a budgeted
    device LRU cache.

    A big program (ResNet: 202 distinct rotation offsets at N=2^15) needs
    more rotation-key bytes than one chip's HBM can spare, so — unlike the
    HEaaN VM, which moves its whole fixed keyset to the GPU up front
    (lib/Runtime/HEAAN_HEVM.cpp:133-141) — keys live in host RAM and at most
    `budget` bytes are device-resident at once, evicted LRU. With
    `budget=None` (tests, small profiles) entries stay device-resident and
    this behaves exactly like the plain dict it replaces.
    """

    def __init__(self, budget=None):
        self.budget = budget
        self._host = {}              # steps -> np.ndarray (authoritative)
        self._dev = OrderedDict()    # steps -> jnp array (LRU)
        self._dev_bytes = 0

    def set_budget(self, budget):
        """Switch to host-backed mode (or tighten the budget): device copies
        over budget are dropped, host copies become authoritative."""
        self.budget = budget
        if budget is None:
            return
        for st, arr in list(self._dev.items()):
            if st not in self._host:
                self._host[st] = np.asarray(arr)
        while self._dev_bytes > budget and self._dev:
            _, old = self._dev.popitem(last=False)
            self._dev_bytes -= old.nbytes

    def __setitem__(self, st, arr):
        if self.budget is None:
            dev = jnp.asarray(arr)
            if st in self._dev:
                self._dev_bytes -= self._dev[st].nbytes
            self._dev[st] = dev
            self._dev_bytes += dev.nbytes
            self._host.pop(st, None)   # drop stale host copy (items() prefers it)
        else:
            self._host[st] = np.asarray(arr)
            old = self._dev.pop(st, None)
            if old is not None:
                self._dev_bytes -= old.nbytes

    def put_host(self, st, arr):
        """Insert a key host-side only (no device upload): used by keyset
        loading so device residency is decided lazily by first use, under
        whatever budget the executor later applies — a keyset larger than
        HBM must never be eagerly uploaded."""
        self._host[st] = np.asarray(arr)
        old = self._dev.pop(st, None)
        if old is not None:
            self._dev_bytes -= old.nbytes

    def __getitem__(self, st):
        dev = self._dev.get(st)
        if dev is not None:
            self._dev.move_to_end(st)
            return dev
        arr = self._host[st]
        dev = jnp.asarray(arr)
        self._dev[st] = dev
        self._dev_bytes += dev.nbytes
        if self.budget is not None:
            while self._dev_bytes > self.budget and len(self._dev) > 1:
                _, old = self._dev.popitem(last=False)
                self._dev_bytes -= old.nbytes
        return dev

    def __contains__(self, st):
        return st in self._dev or st in self._host

    def __len__(self):
        return len(self._host.keys() | self._dev.keys())

    def __iter__(self):
        return iter(self._host.keys() | self._dev.keys())

    def keys(self):
        return self._host.keys() | self._dev.keys()

    def items(self):
        for st in self.keys():
            yield st, self.peek(st)

    def peek(self, st):
        """Read without promoting to the device cache (host copy preferred):
        for persistence paths, where a __getitem__ would pointlessly upload."""
        return self._host[st] if st in self._host else self._dev[st]


@dataclass
class KeySet:
    s_ntt: object                    # uint32 [num_all, N]  (secret; server-side tests only)
    pk: object                       # uint32 [2, num_q, N] (b, a)
    rlk: object                      # uint32 [dnum, 2, num_all, N]
    galois: GaloisStore = field(default_factory=GaloisStore)  # steps -> uint32 [dnum, 2, num_all, N]
    conj: object = None              # conjugation key, same shape as rlk


def _residues(coeffs: np.ndarray, primes) -> np.ndarray:
    """Signed int64 coeffs -> uint32 RNS planes [len(primes), N]."""
    out = np.empty((len(primes), coeffs.shape[-1]), dtype=np.uint32)
    for i, q in enumerate(primes):
        out[i] = np.mod(coeffs, q).astype(np.uint32)
    return out


class KeyGenerator:
    def __init__(self, ctx, evaluator, seed=None):
        self.ctx = ctx
        self.ev = evaluator
        self.rng = np.random.default_rng(ctx.config.seed if seed is None else seed)

    # ------------------------------------------------------------- samples
    def _ternary(self, h: int = 0):
        """Uniform dense ternary, or (h>0) sparse with Hamming weight h."""
        if h <= 0:
            return self.rng.integers(-1, 2, size=self.ctx.n).astype(np.int64)
        out = np.zeros(self.ctx.n, dtype=np.int64)
        idx = self.rng.choice(self.ctx.n, size=h, replace=False)
        out[idx] = self.rng.choice(np.array([-1, 1], dtype=np.int64), size=h)
        return out

    def _gauss(self):
        return np.round(self.rng.normal(0.0, 3.2, size=self.ctx.n)).astype(np.int64)

    def _uniform_planes(self, rows):
        qs = np.array([self.ctx.primes[r] for r in rows], dtype=np.uint64)
        u = self.rng.integers(0, qs[:, None], size=(len(rows), self.ctx.n))
        return u.astype(np.uint32)

    def _ntt_planes(self, coeffs: np.ndarray, rows):
        planes = _residues(coeffs, [self.ctx.primes[r] for r in rows])
        return self.ev.ntt(jnp.asarray(planes), rows)

    # ------------------------------------------------------------- keygen
    def generate(self, rot_steps=()) -> KeySet:
        ctx = self.ctx
        cfg = ctx.config
        all_rows = list(range(cfg.num_all))
        q_rows = list(range(cfg.num_q))

        s_coeff = self._ternary(cfg.secret_h)
        s_ntt = self._ntt_planes(s_coeff, all_rows)

        # public key over Q
        a = jnp.asarray(self._uniform_planes(q_rows))
        e = self._ntt_planes(self._gauss(), q_rows)
        qq = self.ev._mm_consts(q_rows)
        from .modmath import mul_mod, sub_mod, add_mod
        b = add_mod(sub_mod(jnp.zeros_like(a), mul_mod(a, s_ntt[: cfg.num_q], *qq), qq[0]), e, qq[0])
        pk = jnp.stack([b, a])

        # relinearization key: target s^2
        s2 = mul_mod(s_ntt, s_ntt, *self.ev._mm_consts(all_rows))
        rlk = self._ksk(s_ntt, s2)

        galois = GaloisStore()
        for st in rot_steps:
            s_rot = self.ev.automorphism(s_ntt, st % (ctx.n // 2))
            galois[st % (ctx.n // 2)] = self._ksk(s_ntt, s_rot)

        return KeySet(s_ntt=s_ntt, pk=pk, rlk=rlk, galois=galois)

    def extend_galois(self, keyset: KeySet, rot_steps):
        """Generate any missing galois keys for the given rotation steps."""
        missing = [st for st in rot_steps
                   if st % (self.ctx.n // 2) not in keyset.galois
                   and st % (self.ctx.n // 2) != 0]
        if missing and keyset.s_ntt is None:
            raise RuntimeError(
                f"server-mode keyset lacks galois keys for steps {missing[:8]}…; "
                "generate the full keyset for this program first (hc keygen)")
        for st in rot_steps:
            st = st % (self.ctx.n // 2)
            if st not in keyset.galois and st != 0:
                s_rot = self.ev.automorphism(keyset.s_ntt, st)
                keyset.galois[st] = self._ksk(keyset.s_ntt, s_rot)
        return keyset

    def ensure_conj(self, keyset: KeySet):
        """Generate the conjugation (X -> X^{-1}) key if missing."""
        if keyset.conj is None:
            s_conj = self.ev.conj_apply(keyset.s_ntt)
            keyset.conj = self._ksk(keyset.s_ntt, s_conj)
        return keyset

    def _ksk(self, s_ntt, target_ntt):
        """Key-switch key from key `target` to key `s`:
        ksk_j = (-a_j s + e_j + [P*Q̂_j^{full}]*target, a_j) over the full QP basis."""
        from .modmath import mul_mod, sub_mod, add_mod
        ctx = self.ctx
        cfg = ctx.config
        all_rows = list(range(cfg.num_all))
        qq = self.ev._mm_consts(all_rows)
        digits = []
        for j in range(cfg.dnum):
            rows_j = list(range(j * cfg.alpha, min((j + 1) * cfg.alpha, cfg.num_q)))
            qj = 1
            for r in rows_j:
                qj *= ctx.q_primes[r]
            factor_int = ctx.p_prod * (ctx.q_full // qj)
            fac = np.array([factor_int % p for p in ctx.primes], dtype=np.uint32)
            a_j = jnp.asarray(self._uniform_planes(all_rows))
            e_j = self._ntt_planes(self._gauss(), all_rows)
            msg = mul_mod(jnp.asarray(fac)[:, None] * jnp.uint32(1), target_ntt, *qq)
            b_j = add_mod(
                add_mod(sub_mod(jnp.zeros_like(a_j), mul_mod(a_j, s_ntt, *qq), qq[0]), e_j, qq[0]),
                msg, qq[0],
            )
            digits.append(jnp.stack([b_j, a_j]))
        return jnp.stack(digits)


def save_keyset(keyset: KeySet, dirpath: str, parts=("secret", "public", "eval"),
                skip_existing=False):
    """Persist a keyset directory (reference ~/.hevm/{seal,heaan} keysets,
    SEAL_HEVM.cpp:44-89). `parts` selects what is written so a deployment can
    ship the client (secret+public) and server (eval) halves separately.

    skip_existing: only write keys whose file is absent — the incremental
    path used after extend_galois so a load() never re-downloads (D2H is the
    slow direction on tunneled TPU setups) or rewrites the full keyset.
    Callers that REGENERATE keys must wipe the directory first."""
    os.makedirs(dirpath, exist_ok=True)

    def _put(name, arr):
        p = os.path.join(dirpath, name)
        if arr is None or (skip_existing and os.path.exists(p)):
            return
        np.save(p, np.asarray(arr))

    if "secret" in parts:
        _put("s_ntt.npy", keyset.s_ntt)
    if "public" in parts:
        _put("pk.npy", keyset.pk)
    if "eval" in parts:
        _put("rlk.npy", keyset.rlk)
        _put("conj.npy", keyset.conj)
        os.makedirs(os.path.join(dirpath, "galois"), exist_ok=True)
        for st in keyset.galois.keys():
            p = os.path.join(dirpath, "galois", f"{st}.npy")
            if skip_existing and os.path.exists(p):
                continue
            np.save(p, np.asarray(keyset.galois.peek(st)))


def load_keyset(dirpath: str, mode: str = "full") -> KeySet:
    """mode: 'full' (everything), 'client' (secret+public: encrypt/decrypt),
    'server' (public+eval keys only: can run but not decrypt) — the reference
    initFullVM/initClientVM/initServerVM split (SEAL_HEVM.cpp:404-436)."""

    def _load(name):
        p = os.path.join(dirpath, f"{name}.npy")
        return jnp.asarray(np.load(p)) if os.path.exists(p) else None

    want_secret = mode in ("full", "client")
    want_eval = mode in ("full", "server")
    ks = KeySet(
        s_ntt=_load("s_ntt") if want_secret else None,
        pk=_load("pk"),
        rlk=_load("rlk") if want_eval else None,
        conj=_load("conj") if want_eval else None,
    )
    gdir = os.path.join(dirpath, "galois")
    if want_eval and os.path.isdir(gdir):
        for f in os.listdir(gdir):
            # host-side: GaloisStore owns device residency (budget-aware)
            ks.galois.put_host(int(f[:-4]), np.load(os.path.join(gdir, f)))
    return ks
