"""Smoke-test the standalone distributed-CG harness in the suite (reference
equivalent: dist_iterative_test/ — which only runs on the LUMI cluster; this
one runs on the virtual CPU mesh)."""

import numpy as np
import pytest

from akmc_tpu.solvers.cg_harness import make_system_split, run, run_split


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


def test_split_system_structure():
    """The synthetic T-class subblock matches the reference instance's
    structural invariants (main_test.cpp:46-52): symmetric, ~43% dense,
    zero diagonal, positive weights."""
    _, _, sub_idx, W_off, sub_rowsum = make_system_split(2000, 290)
    assert np.array_equal(W_off, W_off.T)
    assert np.all(np.diag(W_off) == 0.0)
    density = np.count_nonzero(W_off) / W_off.size
    assert 0.35 < density < 0.50
    assert np.allclose(sub_rowsum, W_off.sum(1))
    assert np.all(np.diff(sub_idx) > 0)   # sorted unique node subset


def test_cg_harness_t_class_single_device():
    """Split operator (sparse neighbor ⊕ dense tunnel subblock) solves to
    the same accuracy class as the K-class system (reference:
    main_test_cg_split.cpp drives conjugate_gradient_jacobi_split_sparse)."""
    res = run_split(n=4096, n_sub=592, devices=1)
    assert res["rel_l2_error"] < 1e-8
    assert 0 < res["iterations"] < 20000


def test_cg_harness_t_class_8dev_matches_single():
    r1 = run_split(n=4096, n_sub=592, devices=1)
    r8 = run_split(n=4096, n_sub=592, devices=8)   # 592 = 8*74: row-sharded W
    assert r8["rel_l2_error"] < 1e-8
    assert r8["iterations"] == pytest.approx(r1["iterations"], abs=2)
