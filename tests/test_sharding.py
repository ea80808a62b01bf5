"""Multi-device sharding: the superstep on an 8-device 'sites' mesh must
reproduce single-device results (the TPU-native replacement for the
reference's MPI row decomposition, SURVEY.md §2.3)."""

import jax
import numpy as np
import pytest

from akmc_tpu.lattice import ELEM, Lattice
from akmc_tpu.models.vcm import VCMModel
from akmc_tpu.parallel.mesh import make_mesh, replicate_state, shard_model
from akmc_tpu.rng import BufferedStream, ReferenceRNG
from akmc_tpu.state import make_device_state, make_substoichiometric


def _padded_toy(n_devices: int):
    from tests.util_toy import toy_device

    p, lat = toy_device(nx=12, ny=4, nz=4)
    lat.element0[:] = make_substoichiometric(lat.element0, 0.2, ReferenceRNG(7))
    n = lat.N
    pad = (-n) % n_devices
    if pad:
        far = 1e6 + np.arange(pad) * 1e3
        lat = Lattice(
            element0=np.concatenate(
                [lat.element0, np.full(pad, int(ELEM.Ti), np.int32)]
            ),
            x=np.concatenate([lat.x, far]),
            y=np.concatenate([lat.y, np.zeros(pad)]),
            z=np.concatenate([lat.z, np.zeros(pad)]),
            lattice=lat.lattice,
            pbc=lat.pbc,
            nn_dist=lat.nn_dist,
            neigh_idx=np.concatenate(
                [lat.neigh_idx, np.full((pad, lat.neigh_idx.shape[1]), -1, np.int32)]
            ),
            k_neigh_idx=np.concatenate(
                [lat.k_neigh_idx, np.full((pad, lat.k_neigh_idx.shape[1]), -1, np.int32)]
            ),
            cutoff_idx=np.concatenate(
                [lat.cutoff_idx, np.full((pad, lat.cutoff_idx.shape[1]), -1, np.int32)]
            ),
            site_layer=np.concatenate(
                [lat.site_layer, np.full(pad, len(p.layers) - 1, np.int32)]
            ),
        )
    return p, lat


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_superstep_matches_single_device():
    p, lat = _padded_toy(8)

    def run(n_dev):
        model = VCMModel(p, lat)
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        if n_dev > 1:
            mesh = make_mesh(n_dev)
            shard_model(model, mesh)
            state = replicate_state(state, mesh)
        out = []
        for _ in range(3):
            state, stats = model.superstep(state, 2.0, stream)
            out.append(stats["n_events"])
        return state, out

    s1, ev1 = run(1)
    s8, ev8 = run(8)
    assert ev1 == ev8
    np.testing.assert_array_equal(np.asarray(s1.element), np.asarray(s8.element))
    np.testing.assert_array_equal(np.asarray(s1.charge), np.asarray(s8.charge))
    # field solves: sharded psum reduction order changes CG iterates within
    # the solver tolerance (the K system is ill-conditioned by construction,
    # high_G/low_G = 1e8) — compare at solver-tolerance level
    np.testing.assert_allclose(
        np.asarray(s1.potential_charge),
        np.asarray(s8.potential_charge),
        rtol=1e-6,
        atol=1e-6,
    )
    assert float(s1.kmc_time) == pytest.approx(float(s8.kmc_time), rel=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_full_physics_matches_single_device():
    """The fused full-physics superstep (charge -> potentials -> current/
    power -> events -> heat) must also run sharded: row-sharded pair tables,
    replicated atom-level tunnel tables (their VMAX blocks are small), psum'd
    CG dots in BOTH solves."""
    p, lat = _padded_toy(8)
    p = p.replace(
        solve_current=True, solve_heating_global=True,
        dissipation_constant=1e-13, t_ox=5e-9,
        A=(12 * 2.0e-10) ** 2, c_p=1.92,
    )
    Vd = 2.0

    def run(n_dev):
        model = VCMModel(p, lat, vmax=64, ne_max=256)
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        if n_dev > 1:
            mesh = make_mesh(n_dev)
            shard_model(model, mesh)
            state = replicate_state(state, mesh)
        state = model.update_cb_edge(state, Vd)
        m = None
        stats = None
        for _ in range(2):
            state, stats, m = model.superstep_full(state, Vd, stream, m_prev=m)
        return state, stats

    s1, st1 = run(1)
    s8, st8 = run(8)
    assert st8["n_events"] == st1["n_events"]
    np.testing.assert_array_equal(np.asarray(s1.element), np.asarray(s8.element))
    # I_macro is an extraction-rail difference of large virtual potentials:
    # it amplifies the CG solution scatter (psum reduction order differs per
    # mesh) by ~1e9 — measured cross-device agreement ~2e-7 relative at the
    # 1e-16 solver tolerance (cf. the LU-accuracy ladder in
    # test_current_oracle.py::test_cg_tolerance_scaling_at_2k_atoms)
    np.testing.assert_allclose(st8["I_macro"], st1["I_macro"], rtol=1e-5)
    np.testing.assert_allclose(st8["T_bg"], st1["T_bg"], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s8.power), np.asarray(s1.power), rtol=1e-8, atol=1e-30
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_batched_dispatch_matches_single_device():
    """The production mode (superstep_multi, k steps per dispatch) must also
    run correctly over the 8-device 'sites' mesh — lax.scan over the sharded
    fused step with a shared rand-buffer cursor."""
    p, lat = _padded_toy(8)

    model1 = VCMModel(p, lat)
    s1 = make_device_state(lat, p.background_temp)
    st1 = BufferedStream(ReferenceRNG(1))
    ev1 = []
    for _ in range(2):
        s1, stats = model1.superstep(s1, 2.0, st1, rand_chunk=512)
        ev1.append(stats["n_events"])

    model8 = VCMModel(p, lat)
    mesh = make_mesh(8)
    shard_model(model8, mesh)
    s8 = make_device_state(lat, p.background_temp)
    s8 = replicate_state(s8, mesh)
    st8 = BufferedStream(ReferenceRNG(1))
    s8, stats_list = model8.superstep_multi(s8, 2.0, st8, k=2, rand_chunk=512)

    assert [s["n_events"] for s in stats_list] == ev1
    np.testing.assert_array_equal(np.asarray(s1.element), np.asarray(s8.element))
    np.testing.assert_array_equal(np.asarray(s1.charge), np.asarray(s8.charge))
    assert float(s1.kmc_time) == pytest.approx(float(s8.kmc_time), rel=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_concern_group_split_matches_sequential():
    """P7 split=true equivalent: the K solve and the pairwise solve run as
    concurrent dispatches on disjoint device groups (reference KMC_comm.h:
    132-223, ratio {8,24}) and reproduce the sequential _fields result."""
    from akmc_tpu.parallel.mesh import ConcernGroups

    p, lat = _padded_toy(8)
    model = VCMModel(p, lat)
    state = make_device_state(lat, p.background_temp)
    Vd = 2.0

    fr = model._run_fields(state, Vd)
    groups = ConcernGroups(model, ratio=(1, 3))
    assert groups.mesh_k.size >= 1 and groups.mesh_pair.size >= 1
    assert not (
        set(groups.mesh_k.devices.ravel()) & set(groups.mesh_pair.devices.ravel())
    )
    charge, pot_b, pot_sum, cg_iters, q_ovf, c_ovf, v_ovf = groups.fields(
        state.element, state.charge, state.potential_boundary, state.T_bg, Vd
    )
    assert not bool(np.asarray(c_ovf)) and not bool(np.asarray(v_ovf))
    np.testing.assert_array_equal(np.asarray(charge), np.asarray(fr.charge))
    np.testing.assert_allclose(
        np.asarray(pot_b), np.asarray(fr.potential_boundary), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(pot_sum), np.asarray(fr.potential_sum), rtol=1e-10, atol=1e-12
    )
    assert int(cg_iters) > 0
    assert not bool(np.asarray(q_ovf))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_tiled_pairwise_matches_single_device():
    """The tiled-pairwise path (the crossbar-scale production config) must
    shard: tile tables row-sharded over the tile axis (or replicated when
    indivisible), identical event trajectory to the single-device run."""
    p, lat = _padded_toy(8)

    def run(n_dev):
        model = VCMModel(p, lat, pair_table_budget=0, pair_tiling_min_n=1)
        assert model.tables.pair_tiling is not None
        state = make_device_state(lat, p.background_temp)
        stream = BufferedStream(ReferenceRNG(1))
        if n_dev > 1:
            mesh = make_mesh(n_dev)
            shard_model(model, mesh)
            state = replicate_state(state, mesh)
        out = []
        for _ in range(3):
            state, stats = model.superstep(state, 2.0, stream)
            out.append(stats["n_events"])
        return state, out

    s1, ev1 = run(1)
    s8, ev8 = run(8)
    assert ev1 == ev8
    np.testing.assert_array_equal(np.asarray(s1.element), np.asarray(s8.element))
    np.testing.assert_allclose(
        np.asarray(s1.potential_charge),
        np.asarray(s8.potential_charge),
        rtol=1e-6, atol=1e-6,
    )
    assert float(s1.kmc_time) == pytest.approx(float(s8.kmc_time), rel=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_power_system_bytes_divide_across_mesh():
    """_shard_power_system must actually DIVIDE the W-block footprint over
    the mesh (the fused-f64 single-chip OOM at the reference's distributed
    scale is solved by row-sharding — BENCH_T_sharded_r05): every dense
    tunnel block's max-per-device bytes ~= total/n_dev, asserted on real
    addressable shards, not on the PartitionSpec."""
    import jax.numpy as jnp

    from akmc_tpu.solvers.current import build_power_system

    n_dev = 8
    p, lat = _padded_toy(n_dev)
    p = p.replace(solve_current=True)
    model = VCMModel(p, lat, vmax=64, ne_max=256)
    mesh = make_mesh(n_dev)
    shard_model(model, mesh)
    state = make_device_state(lat, p.background_temp)
    state = replicate_state(state, mesh)
    state = model.update_cb_edge(state, 2.0)
    ct = model.current_tables

    def _build(element, charge, cb):
        ps = build_power_system(
            ct, element[ct.atom_ind], charge[ct.atom_ind], cb[ct.atom_ind],
            jnp.asarray(np.asarray(p.lattice)), bool(p.pbc), p.nn_dist,
            p.high_G * 100000, p.low_G, p.high_G * 10000000,
            p.q * 0.01, p.m_e, p.V0,
            vmax=model.vmax, ne_max=model.ne_max, wkb_f32=False,
        )
        return model._shard_power_system(ps)

    ps = jax.jit(_build)(state.element, state.charge, state.cb_edge)
    for name in ("W_tt", "W_ct", "W_cc"):
        arr = getattr(ps, name)
        per_dev = {}
        for s in arr.addressable_shards:
            per_dev[s.device.id] = per_dev.get(s.device.id, 0) + s.data.nbytes
        assert len(per_dev) == n_dev, (name, per_dev)
        assert max(per_dev.values()) <= arr.nbytes // n_dev, (
            name, arr.nbytes, per_dev,
        )
