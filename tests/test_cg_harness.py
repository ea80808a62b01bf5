"""Smoke-test the standalone distributed-CG harness in the suite (reference
equivalent: dist_iterative_test/ — which only runs on the LUMI cluster; this
one runs on the virtual CPU mesh)."""

import pytest

from akmc_tpu.solvers.cg_harness import run


def test_cg_harness_single_device():
    res = run(n=4096, devices=1, contrast=1e8)
    assert res["rel_l2_error"] < 1e-8
    assert 0 < res["iterations"] < 20000


def test_cg_harness_8dev_mesh_matches_single():
    r1 = run(n=4096, devices=1, contrast=1e8)
    r8 = run(n=4096, devices=8, contrast=1e8)
    assert r8["rel_l2_error"] < 1e-8
    # same operator, same stopping rule: iteration counts agree
    assert r8["iterations"] == pytest.approx(r1["iterations"], abs=2)
