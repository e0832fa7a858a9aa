"""dacapo_tpu: a TPU-native CKKS FHE compiler and runtime.

Brand-new implementation with the capabilities of the Hecate/DaCapo reference
(corelab-src/dacapo): tracing frontend, scale-management + bootstrapping
placement compiler, and — unlike the reference, which delegates cryptography
to SEAL/HEaaN — a from-scratch RNS/NTT crypto layer running on TPU via
JAX/XLA/Pallas.

The top-level namespace is API-compatible with `import hecate as hc`:
`@hc.func("c")`, `hc.Plain`, `hc.Empty`, `hc.save`, `hc.bootstrap`,
`hc.setLibnHW`, `hc.HEVM` (reference python/hecate/hecate/{expr,runner}.py).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache, on by default: HE op graphs (key-switch,
# NTT Mosaic kernels) take minutes to compile per (op, level) signature —
# especially under remote-compile TPU setups — and are 100% shape-static, so
# every process after the first should hit the disk cache. Opt out with
# DACAPO_TPU_COMPILE_CACHE=0.
if _os.environ.get("DACAPO_TPU_COMPILE_CACHE", "1") != "0":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/dacapo_tpu_xla"))
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .ir.trace import func, Plain, Empty, Expr, save, bootstrap, resolve
from .ir.config import load_profile, current_config, set_config, CompilerConfig


def setLibnHW(argv):
    from .runtime.runner import setLibnHW as _s
    return _s(argv)


def HEVM(*a, **k):
    from .runtime.runner import HEVM as _H
    return _H(*a, **k)
