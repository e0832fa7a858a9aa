"""Debug probe: run the compiled flagship program window-by-window on the
chip, decrypting every window's outputs and comparing them to a float
interpretation of the fused op stream. Prints the first window where the
encrypted execution diverges from exact float semantics.

Usage: window_probe.py [profile] [hevm] [cst] (defaults: flagship artifacts)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DACAPO_TPU_PRECOMPILE", "0")
import numpy as np
import jax.numpy as jnp

import torch
from dacapo_tpu.runtime import runner as runner_mod
from dacapo_tpu.crypto.scheme import Ciphertext
from dacapo_tpu.vm.hevm import (OP_ENCODE, OP_ALLOC, OP_ROTATE, OP_NEGATE,
    OP_RESCALE, OP_MODSWITCH, OP_UPSCALE, OP_ADDCC, OP_ADDCP, OP_MULCC,
    OP_MULCP, OP_BOOTSTRAP)
from dacapo_tpu.vm.fuse import OP_ROTMAC, OP_UPRESCALE

profile = sys.argv[1] if len(sys.argv) > 1 else "tpu_n15"
hevm_path = sys.argv[2] if len(sys.argv) > 2 else \
    "optimized/dacapo/ResNet.40._hecate_ResNet.hevm"
cst_path = sys.argv[3] if len(sys.argv) > 3 else "traced/_hecate_ResNet.cst"

hevm = runner_mod.HEVM(profile=profile)
hevm.load(cst_path, hevm_path)
ex = hevm.executor
s = ex.s
n_slots = s.ctx.config.n_slots

# ---- input (matches examples/tests/ResNet.py)
from dacapo_tpu.models.cnn_he import resnet_pack_input
from examples.benchmarks.ResNet import get_model
model = get_model()
x = torch.randn(1, 3, 32, 32, dtype=torch.double,
                generator=torch.Generator().manual_seed(100))
packed = resnet_pack_input(x.numpy(), model, nt=n_slots)

# ---- float interpretation of the fused stream
def embed(d):
    d = np.asarray(d, np.float64).ravel()
    return d[np.arange(n_slots) % len(d)]

pmap = {}
for op in ex.prog.ops:
    if op.opcode == OP_ENCODE:
        pmap[op.dst] = embed(np.ones(1) if op.lhs == 0xFFFF
                             else ex.constants[op.lhs])

fv = {0: embed(packed)}
def fstep(op):
    oc = op.opcode
    if oc in (OP_ALLOC, OP_ENCODE):
        return
    if oc == OP_ROTMAC:
        acc = np.zeros(n_slots)
        if op.src >= 0:
            sv = fv[op.src]
            for st, pr in zip(op.steps, op.pt_regs):
                acc = acc + np.roll(sv, -int(st)) * pmap[pr]
        for cv, pr in zip(op.plain_vals, op.plain_pts):
            acc = acc + fv[cv] * pmap[pr]
        for e in op.extra:
            acc = acc + fv[e]
        fv[op.rescale_dst if op.fold_rescale else op.dst] = acc
    elif oc == OP_UPRESCALE:
        fv[op.dst] = fv[op.lhs]
    elif oc == OP_ROTATE:
        fv[op.dst] = np.roll(fv[op.lhs], -int(op.rhs))
    elif oc == OP_NEGATE:
        fv[op.dst] = -fv[op.lhs]
    elif oc in (OP_RESCALE, OP_MODSWITCH, OP_UPSCALE, OP_BOOTSTRAP):
        fv[op.dst] = fv[op.lhs]
    elif oc == OP_ADDCC:
        fv[op.dst] = fv[op.lhs] + fv[op.rhs]
    elif oc == OP_ADDCP:
        fv[op.dst] = fv[op.lhs] + pmap[op.rhs]
    elif oc == OP_MULCC:
        fv[op.dst] = fv[op.lhs] * fv[op.rhs]
    elif oc == OP_MULCP:
        fv[op.dst] = fv[op.lhs] * pmap[op.rhs]
    else:
        raise RuntimeError(oc)

# ---- run the real segmented path window by window, probing outputs
ct = s.encrypt(packed,
               scale=float(2.0 ** ex.prog.arg_scale[0]),
               nl=(ex.prog.arg_level[0] + 1) * ex.rr)
plan = ex._segment_plan()
ciphers = {0: jnp.asarray(ct.data)}
meta = {0: (ct.nl, ct.scale)}
rlk = s.keys.rlk
pk = ex.ev.pack()
worst = 0.0
for wi, info in enumerate(plan):
    if info["kind"] == "boot":
        op = info["ops"][0]
        nl, sc = meta[op.lhs]
        # probe the INPUT before bootstrapping it
        got_in = s.decrypt(Ciphertext(np.asarray(ciphers[op.lhs])[:, :nl], sc))
        ref_in = fv.get(op.lhs)
        if ref_in is not None:
            rm_in = float(np.sqrt(np.mean((got_in - ref_in) ** 2)))
            print(f"w{wi:3d} boot-IN reg{op.lhs} nl={nl} "
                  f"arr_rows={np.asarray(ciphers[op.lhs]).shape[1]} "
                  f"scale={sc:.4e}: rms {rm_in:.3e}", flush=True)
        ciphers[op.dst], meta[op.dst] = ex._bootstrap(
            ciphers[op.lhs], nl, sc, op.rhs)
    elif len(info["ops"]) < ex.SEGMENT_MIN_OPS:
        ex._exec_stream(
            info["ops"], ciphers, meta,
            getplain=lambda idx, nl: ex._plain(ex.plains, idx, nl),
            getgk=lambda st: s.keys.galois[st],
            getperm=ex._getperm_eager,
            rlk=rlk, out_regs=info["outs"],
            prefetch=ex._plain_prefetch,
        )
    else:
        in_meta = {r: meta[r] for r in info["ins"]}
        fn = ex._seg_fn(wi, info, in_meta)
        in_cts = [ciphers[r] for r in info["ins"]]
        ex._plain_prefetch(info["plain_regs"])
        plains_l = [ex._plain(ex.plains, r, None) for r in info["plain_regs"]]
        gks_l = [s.keys.galois[st] for st in info["rot_steps"]]
        perms_arr = jnp.asarray(info["rot_steps"], dtype=jnp.int32)
        out_cts = fn(in_cts, plains_l, gks_l, perms_arr, rlk, pk)
        for op in info["ops"]:
            ex._meta_step(op, meta)
        for r, v in zip(info["outs"], out_cts):
            ciphers[r] = v
    for op in info["ops"]:
        fstep(op)
    # probe every window output
    for r in info["outs"]:
        if r not in ciphers:
            continue
        nl_r, sc_r = meta[r]
        got = s.decrypt(Ciphertext(np.asarray(ciphers[r]), sc_r))
        ref = fv.get(r)
        if ref is None:
            print(f"w{wi} reg{r}: no float value", flush=True)
            continue
        rm = float(np.sqrt(np.mean((got - ref) ** 2)))
        denom = float(np.sqrt(np.mean(ref ** 2))) or 1.0
        mark = " <<<<" if rm / denom > 3e-2 else ""
        if rm / denom > 3e-2 or wi % 10 == 0 or wi < 6:
            print(f"w{wi:3d} {info['kind']:5s} reg{r}: rms {rm:.3e} "
                  f"(rel {rm/denom:.2e}){mark}", flush=True)
        worst = max(worst, rm / denom)
    if os.environ.get("PROBE_STOP") and wi >= int(os.environ["PROBE_STOP"]):
        break
print("max rel divergence:", worst, flush=True)
