"""HarrisCornerDetection golden test (reference examples/tests/
HarrisCornerDetection.py)."""

import numpy as np

from dacapo_tpu.models.kernels import harris_golden
from examples.common import run_test
from examples.benchmarks.HarrisCornerDetection import trace


def run(pipeline="pars", waterline=40, profile=None, nt=4096, w=64):
    profile = profile or "tpu_n14"
    img = np.random.default_rng(100).uniform(0, 1, nt) * 0.5
    trace(nt=nt, w=w)
    return run_test("HarrisCornerDetection", pipeline, waterline, profile,
                    [img], harris_golden(img, w=w),
                    postprocess=lambda res: np.asarray(res)[..., :nt])


if __name__ == "__main__":
    import sys
    run(*(sys.argv[1:] or []))
