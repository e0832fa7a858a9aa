# Compatibility shim: `import poly` like the reference's python/poly package.
from dacapo_tpu.poly import MPCB, Poly, Func
import sys as _sys
_sys.modules[__name__ + ".MPCB"] = MPCB
_sys.modules[__name__ + ".Poly"] = Poly
_sys.modules[__name__ + ".Func"] = Func
