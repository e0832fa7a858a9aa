"""User-facing HEVM runner: mirrors the reference python driver UX.

Reference: python/hecate/hecate/runner.py — `setLibnHW(argv)` backend
selection, `HEVM` with keyset autogeneration, `load(cst, hevm)`,
`setInput` (encrypt), `run`, `getOutput` (decrypt all results), `printer`
result block (runner.py:256-271). Here the "backend library" is the in-repo
JAX/TPU crypto layer; profiles replace the SEAL/HEAAN lib+hw pairs.
"""

import json
import os
import time

import numpy as np

from ..crypto.params import PROFILES, COMPILER_PROFILES
from ..crypto.scheme import Scheme
from ..crypto import keys as keymod
from ..ir.config import load_profile
from ..ir.serialize import read_cst
from ..vm.hevm import HEVMProgram

_LAST_EXECUTOR = None   # most recently loaded executor (profiling hooks)
from ..vm.executor import HEVMExecutor

_selected_profile = os.environ.get("DACAPO_TPU_PROFILE", "tpu_n15")


def setLibnHW(argv):
    """argv-compatible backend selection (reference runner.py:123-171).

    Accepts the reference's trailing `<lib> <hw>` pair (mapped onto TPU
    profiles) or a direct profile name.
    """
    global _selected_profile
    cand = [a for a in argv[1:] if isinstance(a, str)]
    for a in cand:
        if a in PROFILES:
            _selected_profile = a
            return _selected_profile
    # reference-style: "SEAL CPU" -> parity profile, "HEAAN GPU" -> big profile
    joined = " ".join(cand).upper()
    if "HEAAN" in joined:
        _selected_profile = "tpu_n16"
    elif "SEAL" in joined:
        _selected_profile = "tpu_n15"
    return _selected_profile


def current_profile():
    return _selected_profile


class HEVM:
    """The VM driver. `mode` mirrors the reference's three init entry points
    (runner.py:174-217, SEAL_HEVM.cpp:404-436):

    * "full"   — initFullVM: all keys; encrypt + run + decrypt in-process.
    * "client" — initClientVM: secret/public keys only; encrypt inputs and
      decrypt results, but cannot evaluate. Ships ciphertexts via getCtxt.
    * "server" — initServerVM: eval keys only (no secret); receives
      ciphertexts via setCtxt, runs, returns handles via getCtxt/getResIdx.
    """

    def __init__(self, profile=None, keyset_dir=None, jit="auto", mode="full"):
        assert mode in ("full", "client", "server")
        self.profile = profile or _selected_profile
        self.mode = mode
        self.compiler_cfg = load_profile(COMPILER_PROFILES[self.profile])
        self.scheme = Scheme(self.profile)
        self.jit = jit
        self.keyset_dir = keyset_dir or os.path.expanduser(
            f"~/.hevm/tpu/{self.profile}")
        self._load_or_gen_keys()
        if self.scheme.ctx.config.native_bootstrap and mode != "client":
            # real CKKS bootstrapping (no secret key / host round-trip at
            # runtime) — the HEAAN_HEVM-class path. Larger slot counts use a
            # bigger butterfly radix: fewer CtS/StC levels, more rotations
            # per level (depth is the scarce resource at flagship chains).
            from ..crypto.bootstrap_native import BootstrapConfig
            radix = 7 if self.scheme.ctx.config.n_slots >= (1 << 14) else 5
            self.scheme.enable_native_bootstrap(BootstrapConfig(radix=radix))
        self.executor = None
        self.prog = None
        self.inputs = {}
        self._arg_cts = {}

    def _load_or_gen_keys(self):
        d = self.keyset_dir
        have = os.path.exists(os.path.join(d, "s_ntt.npy")) or (
            self.mode == "server" and os.path.exists(os.path.join(d, "rlk.npy")))
        fp_path = os.path.join(d, "params.json")
        # "orbit-v1": NTT planes stored in orbit order (params.orbit_perm) —
        # keysets from the gather-layout era decrypt garbage and must regen
        fingerprint = "orbit-v1:" + repr(sorted(self.scheme.ctx.primes))
        if have:
            # stale keysets (profile parameters changed) must not be reused
            try:
                with open(fp_path) as f:
                    have = json.load(f)["primes"] == fingerprint
            except (OSError, ValueError, KeyError):
                have = False
        if have:
            self.scheme.keys = keymod.load_keyset(d, mode=self.mode)
        if not have:
            if self.mode == "server":
                raise RuntimeError(
                    f"server VM needs a pregenerated keyset at {d} (run hc keygen)")
            if os.path.isdir(d):
                # stale keyset: wipe so incremental saves can't mix old keys
                import shutil
                shutil.rmtree(d)
            self.scheme.generate_keys()
            keymod.save_keyset(self.scheme.keys, d)
            with open(fp_path, "w") as f:
                json.dump({"primes": fingerprint}, f)

    def setDebug(self, flag=True):
        if self.executor is not None:
            self.executor.setDebug(flag)
        self._debug = bool(flag)

    def load(self, cst_path, hevm_path):
        """Full/server loader: constants + bytecode -> executor + preencode."""
        assert self.mode in ("full", "server")
        constants = read_cst(cst_path)
        prog = HEVMProgram.load(hevm_path)
        self.prog = prog
        if os.environ.get("DACAPO_TPU_BOOT", "") == "native":
            # HEaaN-class runtime: real ModRaise->CtS->EvalMod->StC bootstrap
            # instead of the SEAL-parity decrypt/re-encrypt oracle
            # (reference HEAAN_HEVM.cpp:386-399 vs SEAL_HEVM.cpp:324-334).
            # Requires a bootstrappable (sparse-secret, deep-chain) profile.
            self.scheme.enable_native_bootstrap()
        self.executor = HEVMExecutor(self.scheme, prog, constants)
        global _LAST_EXECUTOR   # profiling hooks (scripts/resnet_flagship.py)
        _LAST_EXECUTOR = self.executor
        if getattr(self, "_debug", False):
            self.executor.setDebug(True)
        self.executor.preprocess()
        if (os.environ.get("DACAPO_TPU_PRECOMPILE", "1") != "0"
                and self.jit in ("auto", "segment")):
            # parallel ahead-of-run compilation of all segment windows
            # (serial tracing, threaded XLA compiles -> persistent cache)
            import sys as _sys
            import time as _time
            try:
                t0 = _time.time()
                k = self.executor.precompile_segments()
                print(f"[load] precompiled {k} segment structs in "
                      f"{_time.time() - t0:.1f}s", file=_sys.stderr, flush=True)
            except Exception as e:   # best-effort: lazy path still works
                print(f"[load] precompile skipped: {e!r}", file=_sys.stderr)
        if self.mode == "full":
            # persist any newly generated galois keys for next runs
            # (incremental: existing key files are never re-downloaded/rewritten)
            keymod.save_keyset(self.scheme.keys, self.keyset_dir,
                               skip_existing=True)
        self._galois_count = len(self.scheme.keys.galois)

    def loadClient(self, hevm_path):
        """Client loader: header only (arg/res scales+levels), no constants,
        no executor (reference loadClient, SEAL_HEVM.cpp:431-436)."""
        assert self.mode == "client"
        self.prog = HEVMProgram.load(hevm_path)

    # --------------------------------------------------------------- client
    def setInput(self, i, data):
        """Encode+encrypt argument i at its compiled (level, scale)."""
        self.inputs[i] = np.asarray(data, dtype=np.float64)
        nl = (self.prog.arg_level[i] + 1) * self.scheme.ctx.config.rescale_rows
        scale = float(2.0 ** self.prog.arg_scale[i])
        ct = self.scheme.encrypt(self.inputs[i], scale=scale, nl=nl)
        self._arg_cts[i] = (ct.data, nl, scale)

    def setInputBatch(self, i, data):
        """Encrypt a BATCH for argument i: data [B, slots]. Batched inputs
        run via runBatch (multi-chip dp/mp sharding; parallel/mesh.py)."""
        arr = np.asarray(data, dtype=np.float64)
        nl = (self.prog.arg_level[i] + 1) * self.scheme.ctx.config.rescale_rows
        scale = float(2.0 ** self.prog.arg_scale[i])
        cts = [np.asarray(self.scheme.encrypt(arr[b], scale=scale, nl=nl).data)
               for b in range(arr.shape[0])]
        if not hasattr(self, "_arg_cts_batch"):
            self._arg_cts_batch = {}
        self._arg_cts_batch[i] = (np.stack(cts), nl, scale)

    def runBatch(self, mesh=None):
        """Run the loaded program over the encrypted batch; returns decrypted
        [B, results, slots]. With a mesh, batch rows shard over "dp" and limb
        planes over "mp" (the multi-chip scaling path, SURVEY §7 step 9)."""
        assert self.mode in ("full", "server")
        n_args = self.prog.arg_length
        arg_cts = [self._arg_cts_batch[i] for i in range(n_args)]
        outs, out_meta = self.executor.run_encrypted_batch(arg_cts, mesh=mesh)
        if self.mode != "full":
            self._out = None
            return self._out
        from ..crypto.scheme import Ciphertext
        bsz = outs[0].shape[0]
        res = np.stack([
            np.stack([
                self.scheme.decrypt(Ciphertext(outs[r][b], out_meta[r][1]))
                for r in range(len(outs))
            ]) for b in range(bsz)
        ])
        self._out = res
        return self._out

    def getCtxt(self, i):
        """Serialized argument/result ciphertext for transport
        (reference getCtxt 'we need this for communication code',
        SEAL_HEVM.cpp:463-473)."""
        if i in self._arg_cts:
            data, nl, scale = self._arg_cts[i]
        else:
            outs, meta = self.executor._last_outputs
            data, (nl, scale) = outs[i], meta[i]
        return serialize_ct(np.asarray(data), nl, scale)

    def setCtxt(self, i, blob):
        """Receive a transported ciphertext as argument i (server side)."""
        self._arg_cts[i] = deserialize_ct(blob)

    def getResIdx(self, i):
        return self.prog.res_dst[i]

    def decrypt_result(self, blob):
        """Client-side decrypt of a transported result ciphertext."""
        from ..crypto.scheme import Ciphertext
        import jax.numpy as jnp
        data, nl, scale = deserialize_ct(blob)
        return self.scheme.decrypt(Ciphertext(jnp.asarray(data), scale))

    # --------------------------------------------------------------- server
    def run(self):
        assert self.mode in ("full", "server")
        n_args = self.prog.arg_length
        if len(self._arg_cts) == n_args:       # pre-encrypted (server path)
            arg_cts = [self._arg_cts[i] for i in range(n_args)]
            self.executor.run_encrypted(arg_cts, jit=self.jit)
            if self.mode == "full":
                self._out = self.executor.decrypt_outputs()
            else:
                self._out = None
        else:
            args = [self.inputs[i] for i in range(n_args)]
            self._out = self.executor.run(args, jit=self.jit)
        # keys generated lazily DURING the run (native-bootstrap CtS/StC
        # rotations, conj) persist incrementally so later runs reload them
        if self.mode == "full" and len(self.scheme.keys.galois) > getattr(
                self, "_galois_count", 1 << 60):
            keymod.save_keyset(self.scheme.keys, self.keyset_dir,
                               skip_existing=True)
            self._galois_count = len(self.scheme.keys.galois)
        return self._out

    def getOutput(self):
        return self._out

    def getOutputCtxt(self, i):
        """Serialized i-th result ciphertext (server -> client transport)."""
        outs, meta = self.executor._last_outputs
        data, (nl, scale) = outs[i], meta[i]
        return serialize_ct(np.asarray(data), nl, scale)

    def printer(self, latency, rms):
        print("=======================================")
        print(f"Profile: {self.profile} (TPU-HEVM, {self.mode})")
        print(f"Latency: {latency}")
        print(f"RMS: {rms}")
        print("=======================================")


# ------------------------------------------------------- ciphertext transport
def serialize_ct(data, nl, scale):
    """uint32 [2, nl, N] + metadata -> bytes (network/disk transport)."""
    import struct
    arr = np.ascontiguousarray(np.asarray(data, dtype=np.uint32))
    header = struct.pack("<IId", arr.shape[1], arr.shape[2], float(scale))
    return header + arr.tobytes()


def deserialize_ct(blob):
    import struct
    nl, n, scale = struct.unpack_from("<IId", blob, 0)
    off = struct.calcsize("<IId")
    arr = np.frombuffer(blob, dtype=np.uint32, offset=off).reshape(2, nl, n)
    import jax.numpy as jnp
    return (jnp.asarray(arr), int(nl), float(scale))
