"""SobelFilter golden test (reference examples/tests/SobelFilter.py)."""

import numpy as np

from dacapo_tpu.models.kernels import sobel_golden
from examples.common import run_test
from examples.benchmarks.SobelFilter import trace


def run(pipeline="pars", waterline=40, profile=None, nt=4096, w=64):
    profile = profile or "tpu_n14"
    img = np.random.default_rng(100).uniform(0, 1, nt) * 0.5
    trace(nt=nt, w=w)
    # decrypt returns the full slot vector (n_slots of the profile, e.g.
    # 8192 at tpu_n14); the traced image occupies the first nt slots
    return run_test("SobelFilter", pipeline, waterline, profile,
                    [img], sobel_golden(img, w=w),
                    postprocess=lambda res: np.asarray(res)[..., :nt])


if __name__ == "__main__":
    import sys
    run(*(sys.argv[1:] or []))
