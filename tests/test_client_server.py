"""Client/server VM split (reference initFullVM/initClientVM/initServerVM,
runner.py:174-217; ciphertext transport hooks getCtxt/getResIdx,
SEAL_HEVM.cpp:463-473).

Flow: a full VM generates the keyset for the program; a client VM (secret key
only) encrypts inputs and serializes ciphertexts; a server VM (eval keys only,
NO secret key) receives them, runs the bytecode, and ships result ciphertexts
back; the client decrypts and matches the golden model.
"""

import os

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.runtime.runner import HEVM, serialize_ct, deserialize_ct
from examples.common import trace_and_save, compile_traced

PROFILE = "test_n10"


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cs"))
    rng = np.random.default_rng(11)
    n = 512  # test_n10 slots
    w = rng.normal(0, 0.5, n)

    def body(x):
        t = x * hc.Plain(w)
        t = t + x.rotate(3)
        return t * t

    trace_and_save("CSBench", "c", body, dirs=d)
    hv = compile_traced("CSBench", "pars", 25, PROFILE, traced_dir=d, out_dir=d)
    x = rng.uniform(-1, 1, n)
    want = (x * w + np.roll(x, -3)) ** 2
    return d, hv, x, want


def test_client_server_roundtrip(artifacts, tmp_path):
    d, hv, x, want = artifacts
    keydir = str(tmp_path / "keys")

    # 1. trusted keygen: full keyset incl. galois keys for the program
    full = HEVM(profile=PROFILE, keyset_dir=keydir, mode="full")
    full.load(os.path.join(d, "_hecate_CSBench.cst"), hv)

    # 2. client: secret+public only — encrypt input, serialize
    client = HEVM(profile=PROFILE, keyset_dir=keydir, mode="client")
    client.loadClient(hv)
    assert client.scheme.keys.rlk is None          # no eval keys
    client.setInput(0, x)
    blob = client.getCtxt(0)
    assert isinstance(blob, bytes)

    # 3. server: eval keys only — receive, run, ship result back
    server = HEVM(profile=PROFILE, keyset_dir=keydir, mode="server")
    assert server.scheme.keys.s_ntt is None        # no secret key
    server.load(os.path.join(d, "_hecate_CSBench.cst"), hv)
    server.setCtxt(0, blob)
    out = server.run()
    assert out is None                             # server cannot decrypt
    res_blob = server.getOutputCtxt(0)

    # 4. client decrypts the transported result
    got = client.decrypt_result(res_blob)
    rms = float(np.sqrt(np.mean((got[: len(want)] - want) ** 2)))
    assert rms < 5e-3, rms


def test_ct_serialization_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2**31, size=(2, 4, 256)).astype(np.uint32)
    blob = serialize_ct(data, 4, 12345.5)
    d2, nl, sc = deserialize_ct(blob)
    assert nl == 4 and sc == 12345.5
    np.testing.assert_array_equal(np.asarray(d2), data)


def test_server_requires_keyset(tmp_path):
    with pytest.raises(RuntimeError, match="pregenerated keyset"):
        HEVM(profile=PROFILE, keyset_dir=str(tmp_path / "nokeys"), mode="server")
