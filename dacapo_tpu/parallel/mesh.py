"""Multi-chip execution: ciphertext-batch + limb-plane sharding over a Mesh.

The reference has no distributed runtime (SURVEY.md §2.4); this is the
TPU-native scaling layer designed in its place:

* axis "dp": batches of ciphertexts are data-parallel (client batches,
  server-side throughput scaling) — no cross-device traffic.
* axis "mp": RNS limb planes are model-parallel. Pointwise ops and NTTs are
  limb-local; key-switch base conversion and the evk inner product cross
  limbs, where GSPMD inserts the collectives (all-gather of the alpha digit
  rows, psum-style accumulation) over ICI.

Everything is expressed with jax.sharding annotations under jit — the XLA
partitioner owns the collective schedule, per the standard JAX scaling
recipe. Hand-tuned shard_map/Pallas collectives can replace hot paths later
without changing this interface.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, dp=None, limbs=None):
    """Mesh over (dp, mp); mp must divide the sharded limb count `limbs`."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if dp is None:
        mp = 1
        for cand in (4, 3, 2, 1):
            if n % cand == 0 and (limbs is None or limbs % cand == 0):
                mp = cand
                break
        dp = n // mp
    else:
        mp = n // dp
    mesh_devs = np.array(devs).reshape(dp, mp)
    return Mesh(mesh_devs, ("dp", "mp"))


def batch_sharding(mesh):
    """[B, 2, nl, N] ciphertext batches: batch over dp, limbs over mp."""
    return NamedSharding(mesh, P("dp", None, "mp", None))


def key_sharding(mesh, rows=None):
    """[dnum, 2, rows, N] key-switch keys.

    When the QP row count divides the mp axis, keys shard on their ROW
    axis — aligned with the ciphertext limb sharding, the keyswitch inner
    product is row-pointwise so no collective touches the key bytes and
    each chip holds rows/mp of every key (a ResNet-class 7 GB keyset stops
    being replicated per chip). Otherwise fall back to replication."""
    if rows is not None and rows % mesh.shape["mp"] == 0:
        return NamedSharding(mesh, P(None, None, "mp", None))
    return NamedSharding(mesh, P(None, None, None, None))


def plain_sharding(mesh):
    return NamedSharding(mesh, P("mp", None))


def replicated(mesh, rank):
    return NamedSharding(mesh, P(*([None] * rank)))


class BatchedEvaluator:
    """vmapped evaluator ops over a ciphertext batch, mesh-sharded."""

    def __init__(self, scheme, mesh):
        self.s = scheme
        self.ev = scheme.ev
        self.mesh = mesh

    def eval_step(self, nl, rot_steps=1):
        """A representative jitted encrypted step over a batch:
        y = rescale( (a*b) + rotate(a, k) * pt ) — exercises mul+relin
        keyswitch, galois rotation, plaintext mul, and rescale, batched.

        The twiddle/scalar table pack rides in as an argument (replicated):
        see crypto/ops.py table-argument discipline."""
        ev = self.ev
        from ..crypto.modmath import mul_mod, add_mod

        def one(a, b, pt, rlk, gk, pk):
            m = ev._mul_ct(a, b, nl, rlk, pk)
            r = ev._rotate(a, nl, jnp.int32(rot_steps), gk, pk)
            qq = ev._pkmm(pk, range(nl))
            r = jnp.stack([mul_mod(r[0], pt, *qq), mul_mod(r[1], pt, *qq)])
            x = add_mod(m, r, qq[0])
            return ev._rescale(x, nl, pk)

        def step(abatch, bbatch, pt, rlk, gk, pk):
            return jax.vmap(lambda a, b: one(a, b, pt, rlk, gk, pk))(abatch, bbatch)

        return step

    def compile_step(self, batch, nl, rot_steps=1):
        """jit the batched step with mesh shardings; returns (fn, args)."""
        mesh = self.mesh
        s = self.s
        cs = batch_sharding(mesh)
        ks = key_sharding(mesh)
        ps = plain_sharding(mesh)
        pk = self.ev.pack()
        pk_shard = jax.tree.map(
            lambda x: NamedSharding(mesh, P(*([None] * x.ndim))), pk)
        step = self.eval_step(nl, rot_steps)
        fn = jax.jit(
            step,
            in_shardings=(cs, cs, ps, ks, ks, pk_shard),
            out_shardings=NamedSharding(mesh, P("dp", None, None, None)),
        )
        gk = s.keys.galois[rot_steps]
        return fn, (batch, batch, jnp.zeros_like(batch[0, 0]) + 1,
                    s.keys.rlk, gk, pk)


def dryrun_program(n_devices, profile="test_n10", batch=None, waterline=25):
    """Compile a REAL traced program (the MLP-style matvec+activation from
    __graft_entry__.entry) through the PARS pipeline and execute the full
    HEVM instruction stream BATCHED over an (dp, mp) mesh — the integrated
    multi-chip path (per-segment jit, vmapped, GSPMD-sharded). Returns the
    decrypted batch and the per-row RMS against row 0 semantics."""
    import dacapo_tpu as hc
    from ..crypto.params import COMPILER_PROFILES
    from ..crypto.scheme import Scheme
    from ..ir import trace as trace_mod
    from ..ir.config import load_profile
    from ..passes.rewrite import (
        cse, canonicalize, elide_constants, privatize_constants,
    )
    from ..passes.pipeline import compile_function
    from ..vm.executor import HEVMExecutor
    from ..crypto.scheme import Ciphertext

    load_profile(COMPILER_PROFILES[profile])
    s = Scheme(profile)
    s.generate_keys()
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.3, (8, n))

    def model(x):
        acc = None
        for i in range(8):
            t = x.rotate(i) * hc.Plain(w[i])
            acc = t if acc is None else acc + t
        h = acc + 0.1
        h = h * h
        h = hc.bootstrap(h)     # exercises the BATCHED bootstrap window
        return h * hc.Plain(w[0])

    def golden(x):
        acc = sum(np.roll(x, -i) * w[i] for i in range(8))
        h = acc + 0.1
        return h * h * w[0]

    trace_mod._module.reset()
    fn_ir = hc.func("c")(model).eval()
    cse(fn_ir); canonicalize(fn_ir)
    payloads = elide_constants(fn_ir)
    privatize_constants(fn_ir)
    canonicalize(fn_ir)
    prog = compile_function(fn_ir, "pars", waterline)
    ex = HEVMExecutor(s, prog, payloads)
    ex.preprocess()

    nl = (prog.arg_level[0] + 1) * s.ctx.config.rescale_rows
    scale = float(2.0 ** prog.arg_scale[0])
    mesh = make_mesh(n_devices, limbs=nl)
    b = batch or max(2, 2 * mesh.shape["dp"])
    xs = rng.uniform(-1, 1, (b, n))
    cts = np.stack([np.asarray(s.encrypt(x, scale=scale, nl=nl).data)
                    for x in xs])
    outs, out_meta = ex.run_encrypted_batch([(cts, nl, scale)], mesh=mesh)
    res = np.stack([
        s.decrypt(Ciphertext(outs[0][i], out_meta[0][1])) for i in range(b)
    ])
    want = np.stack([golden(x) for x in xs])
    rms = float(np.sqrt(np.mean((res - want) ** 2)))
    assert rms < 5e-2, f"mesh-batched program wrong: rms={rms}"
    return res, rms


def dryrun(n_devices, profile="test_n8", batch=None):
    """Create an n-device mesh and run ONE batched encrypted evaluation step
    with real (dp, mp) shardings on tiny shapes. Used by __graft_entry__'s
    dryrun_multichip and tests/test_parallel.py."""
    from ..crypto.scheme import Scheme

    s = Scheme(profile)
    s.generate_keys(rot_steps=(1,))
    nl = s.ctx.config.num_q
    mesh = make_mesh(n_devices, limbs=nl)
    be = BatchedEvaluator(s, mesh)
    b = batch or max(2, mesh.shape["dp"])
    rng = np.random.default_rng(0)
    cts = []
    for i in range(b):
        cts.append(np.asarray(
            s.encrypt(rng.uniform(-1, 1, s.ctx.config.n_slots)).data))
    batch_arr = jnp.asarray(np.stack(cts))
    fn, args = be.compile_step(batch_arr, nl)
    out = fn(*args)
    out.block_until_ready()
    assert out.shape == (b, 2, nl - 1, s.ctx.n)
    return out
