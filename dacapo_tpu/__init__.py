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

from .ir.trace import func, Plain, Empty, Expr, save, bootstrap, resolve
from .ir.config import load_profile, current_config, set_config, CompilerConfig


def setLibnHW(argv):
    from .runtime.runner import setLibnHW as _s
    return _s(argv)


def HEVM(*a, **k):
    from .runtime.runner import HEVM as _H
    return _H(*a, **k)
