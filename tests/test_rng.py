"""RNG parity with the reference's std::mt19937 + uniform_real_distribution
(random_num.h:1-26). Expected values generated with g++/libstdc++."""

import numpy as np

from akmc_tpu.rng import MT19937, ReferenceRNG


def test_mt19937_standard_vector():
    # the canonical test vector: 10000th output of mt19937(5489)
    m = MT19937(5489)
    assert int(m.next_uint32(10000)[-1]) == 4123659995


def test_uniform_real_parity_seed5():
    # printf("%.17g") outputs of uniform_real_distribution<double>(0,1) on
    # mt19937(5), libstdc++ (the reference Device stream seeding, rnd_seed=5)
    expected = [
        0.055180120799223235,
        0.83132784019008565,
        0.36373689542680959,
        0.97944499783185568,
        0.089821034224799645,
    ]
    r = ReferenceRNG(5)
    got = r.uniform(5)
    np.testing.assert_array_equal(got, np.array(expected))
    # 2006th draw
    later = r.uniform(2001)[-1]
    assert later == 0.28593785152985535


def test_uniform_range():
    r = ReferenceRNG(123)
    u = r.uniform(10000)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.02
