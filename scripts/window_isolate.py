"""Isolate segment-window cost on the real chip (VERDICT r4 #3).

Loads the compiled flagship program, builds the segment plan, and for the
heaviest window structures measures STEADY-STATE latency of the jitted
window function on synthetic device-resident inputs — removing the
flagship's scheduling/upload/bootstrap context. If isolated windows are
fast, the flagship gap is orchestration; if slow, it's the compiled code.

Also dumps a per-window op-mix table and (optionally, PROFILE=1) a
jax.profiler trace of a few window invocations.

Usage: window_isolate.py [profile] [pipeline] [waterline] [topk]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

profile = sys.argv[1] if len(sys.argv) > 1 else "tpu_n15"
pipeline = sys.argv[2] if len(sys.argv) > 2 else "dacapo"
waterline = sys.argv[3] if len(sys.argv) > 3 else "40"
topk = int(sys.argv[4]) if len(sys.argv) > 4 else 4

import dacapo_tpu as hc  # noqa: E402
from dacapo_tpu.runtime.runner import HEVM  # noqa: E402
from dacapo_tpu.vm.executor import OP_ROTMAC, OP_ROTATE, OP_ADDCC  # noqa: E402

hevm = HEVM(profile=profile, jit="segment")
hevm.load(f"traced/_hecate_ResNet.cst",
          f"optimized/{pipeline}/ResNet.{waterline}._hecate_ResNet.hevm")
ex = hevm.executor
plan = ex._segment_plan()

# metadata walk to get every window's input metas
meta = {}
for i in range(ex.prog.arg_length):
    meta[i] = ((ex.prog.arg_level[i] + 1) * ex.rr,
               float(2.0 ** ex.prog.arg_scale[i]))
win_inmeta = []
for info in plan:
    win_inmeta.append({r: meta[r] for r in info["ins"]})
    for op in info["ops"]:
        ex._meta_step(op, meta)


def op_mix(info):
    mix = {}
    for op in info["ops"]:
        if op.opcode == OP_ROTMAC:
            key = f"rotmac(K={len(op.steps)},J={len(op.plain_vals)})"
        else:
            key = {OP_ROTATE: "rotate", OP_ADDCC: "addcc"}.get(
                op.opcode, f"op{op.opcode}")
        mix[key] = mix.get(key, 0) + 1
    return mix


# rank candidate seg windows by op count (proxy for heaviness)
cands = [(wi, info) for wi, info in enumerate(plan)
         if info["kind"] == "seg" and len(info["ops"]) >= ex.SEGMENT_MIN_OPS]
cands.sort(key=lambda t: -len(t[1]["ops"]))
seen_struct = set()
picked = []
for wi, info in cands:
    key = ex._seg_struct_key(info, win_inmeta[wi])
    if key in seen_struct:
        continue
    seen_struct.add(key)
    picked.append((wi, info))
    if len(picked) >= topk:
        break

rng = np.random.default_rng(0)
n = ex.s.ctx.n
rlk = ex.s.keys.rlk
pk = ex.ev.pack()

for wi, info in picked:
    in_meta = win_inmeta[wi]
    fn = ex._seg_fn(wi, info, in_meta)
    in_cts = [jnp.asarray(rng.integers(0, 1 << 20, (2, in_meta[r][0], n),
                                       dtype=np.uint32))
              for r in info["ins"]]
    plains_l = ex._seg_plains_arg(info)
    gks_l = [ex.s.keys.galois[st] for st in info["rot_steps"]]
    perms_arr = jnp.asarray(info["rot_steps"], dtype=jnp.int32)
    uks_l = ex._seg_uks_arg(info)
    t0 = time.perf_counter()
    out = fn(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk)
    jax.block_until_ready(out)
    cold = time.perf_counter() - t0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk)
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t0) / iters
    print(f"w{wi}: ops={len(info['ops'])} ins={len(info['ins'])} "
          f"pts={len(info['plain_regs'])} rots={len(info['rot_steps'])} "
          f"cold={cold:.3f}s steady={steady*1e3:.1f}ms  mix={op_mix(info)}",
          flush=True)

if os.environ.get("PROFILE", "0") == "1" and picked:
    wi, info = picked[0]
    in_meta = win_inmeta[wi]
    fn = ex._seg_fn(wi, info, in_meta)
    in_cts = [jnp.asarray(rng.integers(0, 1 << 20, (2, in_meta[r][0], n),
                                       dtype=np.uint32))
              for r in info["ins"]]
    plains_l = ex._seg_plains_arg(info)
    gks_l = [ex.s.keys.galois[st] for st in info["rot_steps"]]
    perms_arr = jnp.asarray(info["rot_steps"], dtype=jnp.int32)
    uks_l = ex._seg_uks_arg(info)
    with jax.profiler.trace("_logs/window_trace"):
        for _ in range(3):
            out = fn(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk)
        jax.block_until_ready(out)
    print("trace written to _logs/window_trace", flush=True)
