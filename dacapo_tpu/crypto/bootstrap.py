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


class EmulatedBootstrapper:
    def __init__(self, scheme):
        self.s = scheme
        assert scheme.keys is not None and scheme.keys.s_ntt is not None, \
            "emulated bootstrapping needs the secret key (full VM mode)"

    def bootstrap(self, data, nl, scale, target_level):
        """Decrypt -> re-encrypt in the COEFFICIENT domain: no slot FFT
        round-trip, just a CRT lift (vectorized int64 — the planner pins
        bootstrap operands to the chain bottom, see refine_level) and an
        RNS re-expansion + fresh encryption of the same polynomial.
        `target_level` is in hevm levels; composite profiles expand it to
        rescale_rows RNS rows per level."""
        from .scheme import Ciphertext, Plaintext
        s = self.s
        planes = s.decrypt_planes(Ciphertext(data, scale))
        coeffs = s.encoder.crt_lift(planes)          # centered m + e, float64
        nl2 = (target_level + 1) * s.ctx.config.rescale_rows
        ci = coeffs.astype(np.int64)
        out = np.empty((nl2, s.ctx.n), dtype=np.uint32)
        for i in range(nl2):
            out[i] = np.mod(ci, s.ctx.q_primes[i]).astype(np.uint32)
        pt = Plaintext(s.ev.ntt(jnp.asarray(out), list(range(nl2))), scale)
        ct = s.encrypt_pt(pt)
        return ct.data, (nl2, scale)

    def bootstrap_batch(self, data, nl, scale, target_level):
        """Batched oracle: data [B, 2, nl, N]. One device->host transfer and
        one batched NTT per direction instead of B serial round-trips
        (run_encrypted_batch would otherwise serialize ~B*boots host trips)."""
        from .scheme import Ciphertext, Plaintext
        s = self.s
        B = int(data.shape[0])
        rows = list(range(nl))
        # batch decrypt: m = c0 + c1*s (NTT domain), then one big iNTT
        from .modmath import add_mod, mul_mod
        qq = s.ev._mm_consts(rows)
        m = add_mod(data[:, 0], mul_mod(data[:, 1], s.keys.s_ntt[:nl], *qq),
                    qq[0])                               # [B, nl, N]
        flat = m.reshape(B * nl, s.ctx.n)
        planes = np.asarray(s.ev.intt(flat, rows * B)).reshape(B, nl, -1)
        nl2 = (target_level + 1) * s.ctx.config.rescale_rows
        outs = np.empty((B, nl2, s.ctx.n), dtype=np.uint32)
        for b in range(B):
            ci = s.encoder.crt_lift(planes[b]).astype(np.int64)
            for i in range(nl2):
                outs[b, i] = np.mod(ci, s.ctx.q_primes[i]).astype(np.uint32)
        up = s.ev.ntt(jnp.asarray(outs.reshape(B * nl2, -1)),
                      list(range(nl2)) * B).reshape(B, nl2, -1)
        cts = [s.encrypt_pt(Plaintext(up[b], scale)).data for b in range(B)]
        return jnp.stack(cts), (nl2, scale)


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
