"""A tiny synthetic VCM-like device for fast CPU tests.

Simple-cubic lattice, x-axis = transport direction:
first/last `contact_layers` yz-planes are metal (Ti), the middle is oxide O
with a couple of interstitial DEFECT sites; layer table scaled to the x-span.
"""

import numpy as np

from akmc_tpu.config import KMCParameters, Layer
from akmc_tpu.lattice import ELEM, Lattice, build_lattice


def toy_device(nx=10, ny=4, nz=4, a=2.0, contact_layers=2, seed=0):
    rng = np.random.RandomState(seed)
    xs, ys, zs, elems = [], [], [], []
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                xs.append(ix * a)
                ys.append(iy * a)
                zs.append(iz * a)
                if ix < contact_layers or ix >= nx - contact_layers:
                    elems.append(int(ELEM.Ti))
                else:
                    elems.append(int(ELEM.O))
    x = np.array(xs)
    y = np.array(ys)
    z = np.array(zs)
    e = np.array(elems, np.int32)

    # sort by x then y then z so contacts are contiguous index ranges
    order = np.lexsort((z, y, x))
    x, y, z, e = x[order], y[order], z[order], e[order]

    # sprinkle interstitial defect sites (off-lattice midpoints) in the oxide
    n_def = max(2, (nx - 2 * contact_layers) * ny * nz // 8)
    ox_ids = np.nonzero(e == int(ELEM.O))[0]
    picked = rng.choice(ox_ids, n_def, replace=False)
    xd = x[picked] + a / 2
    yd = y[picked] + a / 2
    zd = z[picked] + a / 2
    ed = np.full(n_def, int(ELEM.DEFECT), np.int32)

    x = np.concatenate([x, xd])
    y = np.concatenate([y, yd])
    z = np.concatenate([z, zd])
    e = np.concatenate([e, ed])
    order = np.lexsort((z, y, x))
    x, y, z, e = x[order], y[order], z[order], e[order]

    x0, x1 = x.min(), x.max()
    cL = contact_layers * a
    layers = [
        Layer("contact", 0.0, 0.0, 0.0, 0.76, x0 - 1, x0 + cL - a / 2),
        Layer("oxide", 1.5, 0.1, 1.09, 0.76, x0 + cL - a / 2, x1 - cL + a / 2),
        Layer("contact", 1.73, 0.0, 0.0, 2.8, x1 - cL + a / 2, x1 + 1),
    ]

    n_first = int((x <= x0 + 1e-9).sum())
    p = KMCParameters(
        lattice=[x1 - x0 + a, ny * a, nz * a],
        nn_dist=a * 1.2,
        freq=10e13,
        sigma=3.5e-10,
        epsilon=23.0,
        metals=["Ti", "N"],
        num_atoms_first_layer=n_first,
        num_layers_contact=contact_layers,
        background_temp=300.0,
        layers=layers,
        max_num_neighbors=20,
        cutoff_radius=3 * a + 0.1,
        solve_potential=True,
        perturb_structure=True,
    )
    lat = build_lattice(e, x, y, z, p)
    return p, lat
