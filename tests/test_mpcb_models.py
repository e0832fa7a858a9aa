"""Golden tests for the wider model-zoo MPCB ops: depthwise conv (MobileNet),
Fire expand + Concat (SqueezeNet), and the full LeNet forward — all on plain
numpy vectors (packing algebra is HE-agnostic) vs torch."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from dacapo_tpu.poly.mpcb import (
    CascadeConv, CascadeMax, CascadeConcat, makeClose, abstractBN,
)
from dacapo_tpu.poly import hefunc as HE
from dacapo_tpu.models.zoo import LeNet, Fire, randomize


def rms(a, b):
    d = np.asarray(a, np.float64).ravel() - np.asarray(b, np.float64).ravel()
    return float(np.sqrt(np.mean(d * d)))


def _np_wrap(vec_list):
    a = np.empty(len(vec_list), dtype=object)
    a[:] = list(vec_list)
    return a


def _bn(c, seed):
    g = torch.Generator().manual_seed(seed)
    bn = nn.BatchNorm2d(c)
    bn.weight.data = 0.7 + 0.6 * torch.rand(c, generator=g)
    bn.bias.data = 0.2 * torch.randn(c, generator=g)
    bn.running_mean = 0.2 * torch.randn(c, generator=g)
    bn.running_var = (0.5 + torch.rand(c, generator=g)).abs()
    return bn.eval().double()


def test_dwconv_matches_torch():
    """HE_DwConv == torch grouped (depthwise) conv + BN."""
    nt, bb, h, c = 1024, 2, 8, 4
    g = torch.Generator().manual_seed(0)
    dw = nn.Conv2d(c, c, 3, padding=1, groups=c, bias=False).double()
    nn.init.normal_(dw.weight, 0, 0.3, generator=g)
    bn = _bn(c, 1)
    shapes = {"nt": nt, "bb": bb, "ko": 1, "ho": h, "wo": h}
    prev = CascadeConv(shapes, nn.Conv2d(3, c, 3, padding=1))
    cs = CascadeConv(prev, dw)
    close = makeClose(cs)

    x = torch.randn(1, c, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(2))
    packed = makeClose(prev)["OP"](x.numpy())
    out = HE.HE_DwConv(close, _np_wrap(packed), dw,
                       bn if dw.bias is None else bn)

    with torch.no_grad():
        want = bn(dw(x))
    want_packed = close["OP"](want.numpy())
    got = np.stack([np.asarray(o, np.float64) for o in out])
    assert rms(got, want_packed) < 1e-10, rms(got, want_packed)


def test_fire_concat_matches_torch():
    """SqueezeNet Fire: squeeze ConvBN, parallel expands, channel Concat."""
    nt, bb, h = 2048, 2, 8
    fire = Fire(8, "fire2").double()   # squeeze 16, expand 64+64
    fire = randomize(fire, seed=3, calib_shape=(8, h, h))
    shapes = {"nt": nt, "bb": bb, "ko": 1, "ho": h, "wo": h}
    prev = CascadeConv(shapes, nn.Conv2d(3, 8, 3, padding=1))

    x = torch.randn(1, 8, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(4))
    packed = makeClose(prev)["OP"](x.numpy())
    out = _np_wrap(packed)

    sq = CascadeConv(prev, fire.squeeze.Conv2d)
    out = HE.HE_ConvBN(makeClose(sq), out, fire.squeeze.Conv2d, fire.squeeze.bn)
    e1 = CascadeConv(sq, fire.expand1x1)
    out1 = HE.HE_Conv(makeClose(e1), out, fire.expand1x1)
    e3 = CascadeConv(sq, fire.expand3x3)
    out2 = HE.HE_Conv(makeClose(e3), out, fire.expand3x3)
    cc = CascadeConcat(e1, e3)
    got = HE.HE_Concat(makeClose(cc), out1, out2)

    with torch.no_grad():
        s = fire.squeeze.bn(fire.squeeze.Conv2d(x))      # no act: linear test
        want = torch.cat([fire.expand1x1(s), fire.expand3x3(s)], dim=1)
    want_packed = makeClose(cc)["OP"](want.numpy())
    gotv = np.stack([np.asarray(o, np.float64) for o in got])
    assert rms(gotv, want_packed) < 1e-10, rms(gotv, want_packed)


def test_lenet_full_numpy_matches_torch():
    from dacapo_tpu.models.cnn_he import lenet_he_full_forward
    nt = 2 ** 12
    model = randomize(LeNet(), seed=5, calib_shape=(1, 32, 32)).double()
    x = torch.randn(1, 1, 32, 32, dtype=torch.double,
                    generator=torch.Generator().manual_seed(6))
    shapes = {"nt": nt, "bb": 1, "ko": 1, "ho": 32, "wo": 32}
    cs = CascadeConv(shapes, model.conv1)
    packed = makeClose(cs)["MPP"](x.numpy())[0]
    got = lenet_he_full_forward(packed, model, nt=nt, bb=1)
    with torch.no_grad():
        want = model(x).numpy().ravel()
    assert rms(np.asarray(got)[:10], want) < 1e-9, (got[:10], want)
