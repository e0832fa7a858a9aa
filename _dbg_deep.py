import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, math
from dacapo_tpu.runtime.runner import HEVM
from dacapo_tpu.crypto.scheme import Ciphertext
from dacapo_tpu.vm.hevm import OP_ALLOC, OP_ENCODE

hevm = HEVM(profile="tpu_n15", keyset_dir="/tmp/deepkeys", jit=False)
hevm.load("/tmp/deep/_hecate_Deep.cst", "/tmp/deep/opt/dacapo/Deep.28._hecate_Deep.hevm")
ex = hevm.executor
s = hevm.scheme

rng = np.random.default_rng(0)
n = 2**14
x = rng.uniform(-1, 1, n)
w = rng.uniform(0.9, 1.1, n)
want = x.copy()
roll = [None]*30
for i in range(24):
    want = want * w

# monkeypatch: wrap _run_trace dispatch by instrumenting run with a shim —
# simplest: reimplement the loop with decrypt checks via ex internals
prog = ex.prog
arg_cts = []
for i in range(prog.arg_length):
    nl = prog.arg_level[i]+1; sc = float(2.0**prog.arg_scale[i])
    ct = s.encrypt(x, scale=sc, nl=nl)
    arg_cts.append((ct.data, nl, sc))

# instrument: use executor's own trace but intercept after each op via debug
# simpler: replicate by calling _run_trace on a copy of ops, stepping
# manually and decrypting after each op
import dacapo_tpu.vm.executor as E
orig = E.HEVMExecutor._run_trace
step_log = []

# patch each evaluator call? Easier: run op-by-op using a mini interpreter that
# mirrors _run_trace without banking.
ev = ex.ev
ciphers = [None]*prog.num_ctxt
meta = [None]*prog.num_ctxt
for i,(d,nl,sc) in enumerate(arg_cts):
    ciphers[i] = d; meta[i] = (nl, sc)
rlk = s.keys.rlk
from dacapo_tpu.vm.hevm import (OP_ROTATE, OP_NEGATE, OP_RESCALE, OP_MODSWITCH,
    OP_UPSCALE, OP_ADDCC, OP_ADDCP, OP_MULCC, OP_MULCP, OP_BOOTSTRAP)
names = E.HEVMExecutor._OPNAMES
for k, op in enumerate(prog.ops):
    oc = op.opcode
    if oc in (OP_ALLOC, OP_ENCODE): continue
    if oc == OP_ROTATE:
        nl, sc = meta[op.lhs]
        ciphers[op.dst] = ev.rotate(ciphers[op.lhs], nl, op.rhs, s.keys.galois[op.rhs]) if op.rhs else ciphers[op.lhs]
        meta[op.dst] = (nl, sc)
    elif oc == OP_NEGATE:
        nl, sc = meta[op.lhs]; ciphers[op.dst] = ev.neg_ct(ciphers[op.lhs], nl); meta[op.dst]=(nl,sc)
    elif oc == OP_RESCALE:
        nl, sc = meta[op.lhs]; ciphers[op.dst] = ev.rescale(ciphers[op.lhs], nl); meta[op.dst]=(nl-1, sc/s.ctx.q_primes[nl-1])
    elif oc == OP_MODSWITCH:
        nl, sc = meta[op.lhs]; ciphers[op.dst] = ev.mod_drop(ciphers[op.lhs], op.rhs); meta[op.dst]=(nl-op.rhs, sc)
    elif oc == OP_UPSCALE:
        nl, sc = meta[op.lhs]; ciphers[op.dst] = ev.upscale(ciphers[op.lhs], nl, op.rhs); meta[op.dst]=(nl, sc*2.0**op.rhs)
    elif oc == OP_ADDCC:
        nl, _ = meta[op.lhs]; _, sc = meta[op.rhs]
        ciphers[op.dst] = ev.add_ct(ciphers[op.lhs], ciphers[op.rhs], nl); meta[op.dst]=(nl, sc)
    elif oc == OP_ADDCP:
        nl, _ = meta[op.lhs]; _, psc = ex.plain_meta[op.rhs]
        ciphers[op.dst] = ev.add_pt(ciphers[op.lhs], ex.plains[op.rhs][:nl], nl); meta[op.dst]=(nl, psc)
    elif oc == OP_MULCC:
        nl, sa = meta[op.lhs]; _, sb = meta[op.rhs]
        ciphers[op.dst] = ev.mul_ct(ciphers[op.lhs], ciphers[op.rhs], nl, rlk); meta[op.dst]=(nl, sa*sb)
    elif oc == OP_MULCP:
        nl, sa = meta[op.lhs]; _, psc = ex.plain_meta[op.rhs]
        ciphers[op.dst] = ev.mul_pt(ciphers[op.lhs], ex.plains[op.rhs][:nl], nl); meta[op.dst]=(nl, sa*psc)
    elif oc == OP_BOOTSTRAP:
        nl, sc = meta[op.lhs]
        ciphers[op.dst], meta[op.dst] = ex._bootstrap(ciphers[op.lhs], nl, sc, op.rhs)
    nl2, sc2 = meta[op.dst]
    vals = s.decrypt(Ciphertext(ciphers[op.dst], sc2))
    mx = float(np.max(np.abs(vals)))
    flag = "  <<<<" if (not np.isfinite(mx) or mx > 50) else ""
    print(f"{k:3d} {names.get(oc)}{'':2} dst={op.dst} nl={nl2} log2sc={math.log2(sc2):6.2f} max|v|={mx:.4g}{flag}", flush=True)
    if flag: break
