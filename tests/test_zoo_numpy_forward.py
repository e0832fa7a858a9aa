"""Full model-zoo forwards through the MPCB packing algebra on plain numpy
vectors vs torch (use_bootstrap=False; SiLU via the same polynomial the HE
path uses, so the poly approximation is the only error source).

These exercise the multi-ciphertext (ni/no > 1) packing paths the reference
gets wrong: tile-reduction wrap in conv (MPCB.py:499), collapsed per-ct
partial sums + post-roll masks in strided depthwise (MPCB.py:440-455), and
inverted Concat boundary masks (MPCB.py:296-306) — see poly/mpcb.py fixes.
"""

import numpy as np
import pytest
import torch

from dacapo_tpu.models import zoo
from dacapo_tpu.models.cnn_he import (
    cnn_pack_input, resnet_postprocess, alexnet_he_forward,
    vgg16_he_forward, squeezenet_he_forward, mobilenet_he_forward,
)


def rms(a, b):
    d = np.asarray(a, np.float64).ravel() - np.asarray(b, np.float64).ravel()
    return float(np.sqrt(np.mean(d * d)))


CASES = {
    "alexnet": (zoo.alexnet, alexnet_he_forward, "Conv2d_1"),
    "vgg16": (zoo.vgg16, vgg16_he_forward, "conv_1_1.Conv2d"),
    "squeezenet": (zoo.squeezenet, squeezenet_he_forward, "conv_1.Conv2d"),
    "mobilenet": (zoo.mobilenet, mobilenet_he_forward, "pre_layer.Conv2d"),
}


@pytest.mark.parametrize("name", list(CASES))
def test_zoo_numpy_forward_matches_torch(name):
    ctor, fwd, first_conv = CASES[name]
    nt, bb = 2 ** 14, 32
    model = zoo.randomize(ctor(), seed=5).double()
    x = torch.randn(1, 3, 32, 32, dtype=torch.double,
                    generator=torch.Generator().manual_seed(6))
    first = model
    for part in first_conv.split("."):
        first = getattr(first, part)
    packed = cnn_pack_input(x.numpy(), first, nt=nt, bb=bb)
    out = fwd(packed, model, nt=nt, bb=bb, use_bootstrap=False)
    got = resnet_postprocess(out, out_dim=10, bb=bb)
    with torch.no_grad():
        want = model(x).numpy().ravel()
    assert np.max(np.abs(want)) > 1e-3          # non-degenerate logits
    # only error source is the polynomial SiLU; bound scales with depth
    assert rms(got, want) < 5e-3 * max(1.0, np.max(np.abs(want))), \
        (got, want)
