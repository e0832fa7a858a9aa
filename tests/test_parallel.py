"""Multi-chip sharding: batched encrypted step over a (dp, mp) mesh on the
virtual 8-device CPU backend (the driver separately dry-runs __graft_entry__)."""

import pytest
import jax


@pytest.mark.slow
def test_dryrun_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dacapo_tpu.parallel.mesh import dryrun
    out = dryrun(8, profile="test_n8")
    assert out is not None


def test_dryrun_program_8dev():
    """Integrated multi-chip path: a full compiled HEVM program executed
    batched over the virtual 8-device (dp, mp) mesh."""
    from dacapo_tpu.parallel.mesh import dryrun_program

    res, rms = dryrun_program(8, profile="test_n10")
    assert res.shape[0] >= 2
    assert rms < 5e-2
