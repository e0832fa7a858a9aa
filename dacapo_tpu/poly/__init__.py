"""HE-CNN ops library (MPCB packing, activation polynomials, layer wrappers).

Importable both as `dacapo_tpu.poly` and, via the repo-root `poly/` shim, as
`import poly` for reference-compatible model/benchmark code
(`import poly.MPCB`, `import poly.Func`, `import poly.Poly`)."""

from . import mpcb as MPCB
from . import activations as Poly
from . import hefunc as Func
