import numpy as np
import pytest

from dacapo_tpu.crypto.scheme import Scheme


@pytest.fixture(scope="module")
def sch():
    s = Scheme("test_n8")
    s.generate_keys(rot_steps=(1, 3, 17))
    return s


def _vals(sch, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=sch.ctx.config.n_slots)


def rms(a, b):
    d = np.asarray(a) - np.asarray(b)
    return float(np.sqrt(np.mean(d * d)))


def test_encode_decode_roundtrip(sch):
    v = _vals(sch)
    pt = sch.encode(v)
    planes = np.asarray(sch.ev.intt(pt.data, list(range(pt.nl))))
    got = sch.encoder.decode(planes, pt.scale)
    assert rms(got, v) < 1e-5


def test_encrypt_decrypt(sch):
    v = _vals(sch, 1)
    ct = sch.encrypt(v)
    got = sch.decrypt(ct)
    assert rms(got, v) < 1e-4


def test_add(sch):
    va, vb = _vals(sch, 2), _vals(sch, 3)
    out = sch.decrypt(sch.add(sch.encrypt(va), sch.encrypt(vb)))
    assert rms(out, va + vb) < 2e-4


def test_add_mul_plain(sch):
    va, vb = _vals(sch, 4), _vals(sch, 5)
    ct = sch.encrypt(va)
    pt = sch.encode(vb)
    out = sch.decrypt(sch.add_pt(ct, pt))
    assert rms(out, va + vb) < 2e-4
    ctm = sch.mul_pt(ct, pt)
    out = sch.decrypt(sch.rescale(ctm))
    assert rms(out, va * vb) < 2e-4


def test_mul_ct(sch):
    va, vb = _vals(sch, 6), _vals(sch, 7)
    ct = sch.mul(sch.encrypt(va), sch.encrypt(vb))
    out = sch.decrypt(sch.rescale(ct))
    assert rms(out, va * vb) < 5e-4


def test_mul_chain_with_rescale(sch):
    """Depth-3 multiply chain with PARS-style upscale back to the waterline
    after each rescale (what the scale-management compiler emits)."""
    wl = sch.ctx.config.scale_bits
    v = _vals(sch, 8, 0.5, 1.0)
    ct = sch.encrypt(v)
    cur = ct
    want = v.copy()
    for _ in range(3):
        cur = sch.rescale(sch.mul(cur, ct))
        up = wl - int(round(np.log2(cur.scale)))
        if up > 0:
            cur = sch.upscale(cur, up)
        ct = sch.mod_drop(ct, 1)
        want = want * v
    out = sch.decrypt(cur)
    assert rms(out, want) < 2e-3


def test_rotate(sch):
    v = _vals(sch, 9)
    ct = sch.encrypt(v)
    for st in (1, 3, 17):
        out = sch.decrypt(sch.rotate(ct, st))
        assert rms(out, np.roll(v, -st)) < 5e-4, f"steps={st}"


def test_upscale(sch):
    v = _vals(sch, 10)
    ct = sch.encrypt(v)
    out = sch.decrypt(sch.upscale(ct, 3))
    assert rms(out, v) < 2e-4


def test_negate_mod_drop(sch):
    v = _vals(sch, 11)
    ct = sch.mod_drop(sch.negate(sch.encrypt(v)), 2)
    out = sch.decrypt(ct)
    assert rms(out, -v) < 2e-4


def test_rotate_batch_hoisted(sch):
    """Hoisted batched rotation must match per-step rotation exactly in
    the decrypted slots (Halevi-Shoup hoisting correctness)."""
    import jax.numpy as jnp
    from dacapo_tpu.crypto.scheme import Ciphertext

    v = _vals(sch, 7)
    ct = sch.encrypt(v)
    steps = [1, 3, 17]
    shifts = jnp.asarray(steps, dtype=jnp.int32)
    gks = jnp.stack([sch.keys.galois[st] for st in steps])
    out = sch.ev.rotate_batch(ct.data, ct.nl, shifts, gks)
    for k, st in enumerate(steps):
        got = sch.decrypt(Ciphertext(out[k], ct.scale))
        want = np.roll(v, -st)
        assert rms(got, want) < 1e-4, f"step {st}"
