"""User-facing HEVM runner: mirrors the reference python driver UX.

Reference: python/hecate/hecate/runner.py — `setLibnHW(argv)` backend
selection, `HEVM` with keyset autogeneration, `load(cst, hevm)`,
`setInput` (encrypt), `run`, `getOutput` (decrypt all results), `printer`
result block (runner.py:256-271). Here the "backend library" is the in-repo
JAX/TPU crypto layer; profiles replace the SEAL/HEAAN lib+hw pairs.
"""

import os
import time

import numpy as np

from ..crypto.params import PROFILES, COMPILER_PROFILES
from ..crypto.scheme import Scheme
from ..crypto import keys as keymod
from ..ir.config import load_profile
from ..ir.serialize import read_cst
from ..vm.hevm import HEVMProgram
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
    def __init__(self, profile=None, keyset_dir=None, jit=True):
        self.profile = profile or _selected_profile
        self.compiler_cfg = load_profile(COMPILER_PROFILES[self.profile])
        self.scheme = Scheme(self.profile)
        self.jit = jit
        self.keyset_dir = keyset_dir or os.path.expanduser(
            f"~/.hevm/tpu/{self.profile}")
        self._load_or_gen_keys()
        self.executor = None
        self.inputs = {}

    def _load_or_gen_keys(self):
        d = self.keyset_dir
        if os.path.exists(os.path.join(d, "s_ntt.npy")):
            self.scheme.keys = keymod.load_keyset(d)
        else:
            self.scheme.generate_keys()
            keymod.save_keyset(self.scheme.keys, d)

    def load(self, cst_path, hevm_path):
        constants = read_cst(cst_path)
        prog = HEVMProgram.load(hevm_path)
        self.executor = HEVMExecutor(self.scheme, prog, constants)
        self.executor.preprocess()
        # persist any newly generated galois keys for next runs
        keymod.save_keyset(self.scheme.keys, self.keyset_dir)

    def setInput(self, i, data):
        self.inputs[i] = np.asarray(data, dtype=np.float64)

    def run(self):
        args = [self.inputs[i] for i in range(self.executor.prog.arg_length)]
        self._out = self.executor.run(args, jit=self.jit)
        return self._out

    def getOutput(self):
        return self._out

    def printer(self, latency, rms):
        print("=======================================")
        print(f"Profile: {self.profile} (TPU-HEVM)")
        print(f"Latency: {latency}")
        print(f"RMS: {rms}")
        print("=======================================")
