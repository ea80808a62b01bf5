"""parameters.txt parser parity (reference: src/input_parser.cpp)."""

import os

from akmc_tpu.config import KMCParameters


def test_parse_5nm_parameters(ref_5nm_dir):
    p = KMCParameters.from_file(os.path.join(ref_5nm_dir, "parameters.txt"))
    assert p.rnd_seed == 5
    assert p.restart is True
    assert p.restart_xyz_file == "reordered_device_5.xyz"
    assert p.lattice == [108.984220, 51.150000, 51.150000]
    assert p.pristine is True
    assert p.initial_vacancy_concentration == 0.05
    assert p.freq == 10e13
    assert p.nn_dist == 3.5
    assert p.perturb_structure is True
    assert p.solve_potential is True
    assert p.solve_current is True
    assert p.solve_heating_global is False
    assert p.sigma == 3.5e-10
    assert p.epsilon == 23.0
    assert p.m_r == 0.85
    assert p.V0 == 1.6
    assert p.k_therm == 1.1
    assert p.background_temp == 300
    assert p.pbc is False
    assert p.V_switch == [5.0]
    assert p.t_switch == [1e-12]
    assert p.Icc == 10000
    assert p.Rs == 1e-16
    assert p.output_freq == 1
    assert p.num_atoms_first_layer == 576
    assert p.num_layers_contact == 10
    assert p.num_atoms_contact == 5760
    assert p.num_atoms_reservoir == 2160
    assert p.metals == ["Ti", "N"]
    assert abs(p.A - 51.15e-10 * 51.15e-10) < 1e-30
    assert p.c_p == 1.92
    assert p.k_th_metal == 29
    assert p.alpha == [0.1]
    assert p.dissipation_constant == 1e-13
    assert p.L_char == 3.5e-10
    # derived (input_parser.cpp:391-398)
    assert p.high_G == 1.0
    assert p.low_G == 1e-8
    assert abs(p.k - 8.987552e9 / 23.0) < 1e-6
    assert abs(p.m_e - 0.85 * 9.11e-31) < 1e-45


def test_derived_expressions():
    p = KMCParameters(
        epsilon=10.0,
        k_th_non_vacancy=0.5,
        k_th_vacancies=5.0,
        initial_vacancy_concentration=0.1,
        L_char=3.5e-10,
        c_p=1.92,
        m_r=0.85,
    )
    assert p.k == 8.987552e9 / 10.0
    assert abs(p.k_th_interface - (0.5 + 4.5 * 0.1)) < 1e-12
    assert p.tau == p.k_th_interface / (3.5e-10**2 * 1.92 * 1e6)
