"""Isolated multi-ciphertext (ni/no > 1) MPCB golden tests vs torch.

The reference's packing algebra is only numerically correct when a layer
fits in one ciphertext; these lock in our fixes for the multi-ct paths
(see poly/mpcb.py: _conv_core tile reduction, _repack_strided mask-before-
roll + per-ct partial sums, _upc_in/_upc_out ct indexing, Concat masks).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from dacapo_tpu.poly.mpcb import CascadeConv, CascadeMax, CascadeConcat, makeClose
from dacapo_tpu.poly import hefunc as HE


def rms(a, b):
    d = np.asarray(a, np.float64).ravel() - np.asarray(b, np.float64).ravel()
    return float(np.sqrt(np.mean(d * d)))


def _np_wrap(vecs):
    a = np.empty(len(vecs), dtype=object)
    a[:] = list(vecs)
    return a


def _bn(c, seed=1):
    g = torch.Generator().manual_seed(seed)
    bn = nn.BatchNorm2d(c)
    bn.weight.data = 0.7 + 0.6 * torch.rand(c, generator=g)
    bn.bias.data = 0.2 * torch.randn(c, generator=g)
    bn.running_mean = 0.2 * torch.randn(c, generator=g)
    bn.running_var = (0.5 + torch.rand(c, generator=g)).abs()
    return bn.eval().double()


def _pooled_input(cin=16, h=16, nt=512, seed=2):
    """A pooled (ki=2, multi-ct) activation + its cascade shapes."""
    conv0 = nn.Conv2d(3, cin, 3, padding=1)
    pool = nn.AvgPool2d((3, 3), stride=2, padding=1)
    shapes = {"nt": nt, "bb": 2, "ko": 1, "ho": h, "wo": h}
    c0 = CascadeConv(shapes, conv0)
    p1 = CascadeMax(c0, pool)
    x = torch.randn(1, cin, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(seed))
    packed = makeClose(c0)["OP"](x.numpy())
    pooled = HE.HE_Avg(makeClose(p1), _np_wrap(packed))
    with torch.no_grad():
        tp = pool(x)
    return p1, pooled, tp


@pytest.mark.parametrize("k,pad", [(3, 1), (5, 2)])
def test_conv_multict_matches_torch(k, pad):
    """ni=2 conv: reference's SumSlots(ti) wraps past nt and double-counts."""
    p1, pooled, tp = _pooled_input()
    g = torch.Generator().manual_seed(0)
    conv = nn.Conv2d(16, 16, k, padding=pad, bias=False).double()
    nn.init.normal_(conv.weight, 0, 0.3, generator=g)
    bn = _bn(16)
    cs = CascadeConv(p1, conv)
    assert cs["ni"] == 2
    out = HE.HE_ConvBN(makeClose(cs), pooled, conv, bn)
    with torch.no_grad():
        want = bn(conv(tp))
    got = np.stack([np.asarray(o, np.float64) for o in out])
    assert rms(got, makeClose(cs)["OP"](want.numpy())) < 1e-10


@pytest.mark.parametrize("nt,want_ni", [(1024, 1), (512, 2), (256, 4)])
def test_strided_dwconv_matches_torch(nt, want_ni):
    """Stride-2 depthwise at ni in {1,2,4}: post-roll masks + collapsed
    per-ct partial sums in the reference corrupt every one of these."""
    cin, h = 16, 8
    conv0 = nn.Conv2d(3, cin, 3, padding=1)
    shapes = {"nt": nt, "bb": 2, "ko": 1, "ho": h, "wo": h}
    c0 = CascadeConv(shapes, conv0)
    g = torch.Generator().manual_seed(0)
    dw = nn.Conv2d(cin, cin, 3, stride=2, padding=1, groups=cin,
                   bias=False).double()
    nn.init.normal_(dw.weight, 0, 0.3, generator=g)
    bn = _bn(cin)
    ds = CascadeConv(c0, dw)
    assert ds["ni"] == want_ni
    x = torch.randn(1, cin, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(2))
    packed = makeClose(c0)["OP"](x.numpy())
    out = HE.HE_DwConv(makeClose(ds), _np_wrap(packed), dw, bn)
    with torch.no_grad():
        want = bn(dw(x))
    got = np.stack([np.asarray(o, np.float64) for o in out])
    assert rms(got, makeClose(ds)["OP"](want.numpy())) < 1e-10


def test_midpool_multict_matches_torch():
    """ni=8 -> no=2 stride-2 avg pool (ct index divisors)."""
    p1, pooled, tp = _pooled_input(cin=16, h=16, nt=512)
    assert (p1["ni"], p1["no"]) == (8, 2)
    got = np.stack([np.asarray(o, np.float64) for o in pooled])
    assert rms(got, makeClose(p1)["OP"](tp.numpy())) < 1e-10


def test_concat_unaligned_boundary_matches_torch():
    """Concat whose first stream does not end on a ct boundary
    (SqueezeNet fire6 shape class): reference's masks are inverted."""
    nt, h, cs_ch, ex = 1024, 8, 12, 12    # ex*h*h = 768, 768 % 1024 != 0
    conv0 = nn.Conv2d(3, cs_ch, 3, padding=1)
    shapes = {"nt": nt, "bb": 2, "ko": 1, "ho": h, "wo": h}
    c0 = CascadeConv(shapes, conv0)
    g = torch.Generator().manual_seed(0)
    e1 = nn.Conv2d(cs_ch, ex, 1).double()
    e3 = nn.Conv2d(cs_ch, ex, 3, padding=1).double()
    for m in (e1, e3):
        nn.init.normal_(m.weight, 0, 0.3, generator=g)
        nn.init.normal_(m.bias, 0, 0.05, generator=g)
    x = torch.randn(1, cs_ch, h, h, dtype=torch.double,
                    generator=torch.Generator().manual_seed(2))
    packed = _np_wrap(makeClose(c0)["OP"](x.numpy()))
    ce1 = CascadeConv(c0, e1)
    out1 = HE.HE_Conv(makeClose(ce1), packed, e1)
    ce3 = CascadeConv(c0, e3)
    out2 = HE.HE_Conv(makeClose(ce3), packed, e3)
    cc = CascadeConcat(ce1, ce3)
    assert (cc["ci"] * cc["wi"] * cc["hi"]) % nt != 0   # masked branch
    got_arr = HE.HE_Concat(makeClose(cc), out1, out2)
    with torch.no_grad():
        want = torch.cat([e1(x), e3(x)], dim=1)
    want_packed = makeClose(cc)["OP"](want.numpy())
    # compare only the occupied slots of each output ct (the tail of the
    # last ct beyond the concatenated stream is unspecified filler)
    used = cc["ci"] * cc["wi"] * cc["hi"] * 2
    for i in range(cc["no"]):
        n_valid = min(nt, used - i * nt)
        assert n_valid > 0
        g_i = np.asarray(got_arr[i], np.float64)[:n_valid]
        w_i = np.asarray(want_packed[i], np.float64)[:n_valid]
        assert rms(g_i, w_i) < 1e-10
