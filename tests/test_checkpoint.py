"""Full checkpoint/resume must be bit-identical to an uninterrupted run —
a capability the reference lacks (xyz-only restart loses RNG/clock state,
SURVEY.md §5)."""

import os

import numpy as np

from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from akmc_tpu.state import make_device_state, make_substoichiometric


def test_checkpoint_resume_bit_identical(tmp_path):
    from tests.util_toy import toy_device

    p, lat = toy_device()
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))
    model = VCMModel(p, lat)

    # uninterrupted: 4 supersteps
    s = make_device_state(lat, p.background_temp)
    stream = BufferedStream(ReferenceRNG(1))
    for _ in range(4):
        s, _ = model.superstep(s, 2.0, stream)

    # interrupted: 2 steps, checkpoint, reload, 2 more
    s2 = make_device_state(lat, p.background_temp)
    st2 = BufferedStream(ReferenceRNG(1))
    for _ in range(2):
        s2, _ = model.superstep(s2, 2.0, st2)
    ck = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(ck, s2, st2, vt_counter=0, kmc_step_count=2, extra={"Vd": 2.0})
    s3, st3, vt, steps, extra = load_checkpoint(ck)
    assert vt == 0 and steps == 2 and extra["Vd"] == 2.0
    for _ in range(2):
        s3, _ = model.superstep(s3, 2.0, st3)

    np.testing.assert_array_equal(np.asarray(s.element), np.asarray(s3.element))
    np.testing.assert_array_equal(np.asarray(s.charge), np.asarray(s3.charge))
    assert float(s.kmc_time) == float(s3.kmc_time)
    np.testing.assert_array_equal(
        np.asarray(s.potential_charge), np.asarray(s3.potential_charge)
    )
