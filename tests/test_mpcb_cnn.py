"""MPCB packed-CNN math vs torch golden models.

Layer closures run directly on numpy vectors (the packing algebra is
HE-agnostic: `roll` = np.roll on plain arrays), so the whole CNN graph is
validated fast and exactly; one small ConvBN additionally runs encrypted
end-to-end. Mirrors the reference golden-comparison harness
(examples/tests/ResNet.py:85-118) at unit-test scale.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from dacapo_tpu.poly.mpcb import (
    CascadeConv, CascadeDS, CascadePool, makeClose, abstractBN,
)
from dacapo_tpu.poly import hefunc as HE
from dacapo_tpu.models.resnet import resnet20, randomize


def rms(a, b):
    d = np.asarray(a, np.float64).ravel() - np.asarray(b, np.float64).ravel()
    return float(np.sqrt(np.mean(d * d)))


def _mini_convbn(ci=3, co=4, stride=1, seed=0):
    g = torch.Generator().manual_seed(seed)
    conv = nn.Conv2d(ci, co, 3, stride=stride, padding=1, bias=False)
    nn.init.normal_(conv.weight, 0, 0.3, generator=g)
    bn = nn.BatchNorm2d(co)
    bn.weight.data = 0.7 + 0.6 * torch.rand(co, generator=g)
    bn.bias.data = 0.2 * torch.randn(co, generator=g)
    bn.running_mean = 0.2 * torch.randn(co, generator=g)
    bn.running_var = (0.5 + torch.rand(co, generator=g)).abs()
    return conv.eval().double(), bn.eval().double()


def _np_wrap(vec_list):
    a = np.empty(len(vec_list), dtype=object)
    a[:] = list(vec_list)
    return a


@pytest.mark.parametrize("stride", [1, 2])
def test_convbn_packing_matches_torch(stride):
    """HE-layout conv+bn on plain vectors == OutPack(torch conv+bn)."""
    nt, bb, h = 1024, 2, 8
    conv, bn = _mini_convbn(stride=stride)
    shapes = {"nt": nt, "bb": bb, "ko": 1, "ho": h, "wo": h}
    cs = CascadeConv(shapes, conv)
    close = makeClose(cs)

    x = torch.randn(1, 3, h, h, generator=torch.Generator().manual_seed(1),
                    dtype=torch.double)
    packed = close["MPP"](x.numpy())            # [ni, nt]
    out = close["MPCB"](_np_wrap(packed), conv.weight, *abstractBN(bn))

    with torch.no_grad():
        want = bn(conv(x))
    want_packed = close["OP"](want.numpy())
    got = np.stack([np.asarray(o, np.float64) for o in out])
    assert rms(got, want_packed) < 1e-10, rms(got, want_packed)


def test_downsample_matches_optionA_shortcut():
    """HE_DS == stride-2 subsample + zero channel pad (ResNet option A).

    ci/2 must be a multiple of ko^2 for the centering roll to express the
    channel pad (always true at the real ResNet downsample points)."""
    nt, bb, h, c = 1024, 2, 8, 8
    shapes = {"nt": nt, "bb": bb, "ko": 1, "ho": h, "wo": h}
    conv = nn.Conv2d(c, c, 3, padding=1, bias=False)
    cs = CascadeConv(shapes, conv)              # sets ci/co/hi/wi state
    ds = CascadeDS(cs)
    close_in = makeClose(cs)
    close = makeClose(ds)

    x = torch.randn(1, c, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(2))
    packed = close_in["OP"](x.numpy())          # pack in the conv OUT layout
    out = close["DS"](_np_wrap(packed))

    want = F.pad(x[:, :, ::2, ::2], (0, 0, 0, 0, (2 * c) // 4, (2 * c) // 4))
    want_packed = close["OP"](want.numpy())
    got = np.stack([np.asarray(o, np.float64) for o in out])
    assert rms(got, want_packed) < 1e-10, rms(got, want_packed)


def test_pool_linear_matches_torch():
    nt, bb, h, c = 1024, 2, 8, 4
    shapes = {"nt": nt, "bb": bb, "ko": 1, "ho": h, "wo": h}
    conv = nn.Conv2d(c, c, 3, padding=1, bias=False)
    cs = CascadeConv(shapes, conv)
    pool = CascadePool(cs)
    close_in = makeClose(cs)
    close = makeClose(pool)
    lin = nn.Linear(c, 3).double()
    g = torch.Generator().manual_seed(3)
    nn.init.normal_(lin.weight, 0, 0.5, generator=g)
    nn.init.normal_(lin.bias, 0, 0.5, generator=g)

    x = torch.randn(1, c, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(4))
    packed = close_in["OP"](x.numpy())
    out = close["AP"](_np_wrap(packed))
    out = HE.HE_Linear(close, out, lin, scale=float(bb), nt=nt)

    with torch.no_grad():
        want = lin(F.avg_pool2d(x, h).view(1, -1))
    got = np.asarray(out[0], np.float64)[:3] * bb
    assert rms(got, want.numpy().ravel()) < 1e-10, got


def test_resnet20_numpy_forward_matches_torch():
    """Full ResNet20 graph through the MPCB packing on plain vectors
    (use_bootstrap=False; SiLU evaluated by the same degree-95 poly the HE
    path uses) vs the torch model."""
    from dacapo_tpu.models.cnn_he import (
        resnet_he_forward, resnet_pack_input, resnet_postprocess)

    nt, bb = 2 ** 14, 32
    model = randomize(resnet20(), seed=5).double()
    x = torch.randn(1, 3, 32, 32, dtype=torch.double,
                    generator=torch.Generator().manual_seed(6))

    packed = resnet_pack_input(x.numpy(), model, nt=nt, bb=bb)
    out = resnet_he_forward(packed, model, nt=nt, bb=bb, use_bootstrap=False)
    got = resnet_postprocess(out, out_dim=10, bb=bb)

    with torch.no_grad():
        want = model(x).numpy().ravel()
    # only error source is the degree-95 SiLU polynomial
    assert np.max(np.abs(want)) > 1e-3          # non-degenerate logits
    assert rms(got, want) < 5e-3 * max(1.0, np.max(np.abs(want))), (got, want)
