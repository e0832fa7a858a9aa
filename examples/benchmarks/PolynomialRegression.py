"""PolynomialRegression benchmark: 2-epoch encrypted gradient descent over
[1, x, x^2] features (reference examples/benchmarks/PolynomialRegression.py)."""

import numpy as np

from dacapo_tpu.models.kernels import polyreg_body
from examples.common import trace_and_save


def trace(dirs="traced", cst_dirs=None, nt=4096):
    log_n = int(np.log2(nt))
    return trace_and_save(
        "PolynomialRegression", "c,c",
        lambda x, y: polyreg_body(x, y, log_n=log_n, n_mean=nt // 2),
        dirs, cst_dirs)


if __name__ == "__main__":
    print(trace())
