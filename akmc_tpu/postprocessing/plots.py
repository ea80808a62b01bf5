"""Plotting utilities — functional equivalents of the reference's
postprocessing scripts (plot_IV.py, plot_current.py, plot_conductance.py,
plot_temperature.py, plot_kmc_timeline.py, show_device.py).

CLI:  python -m akmc_tpu.postprocessing.plots <kind> <output_txt|workdir> [out.png]
      kind in {iv, timeline, temperature, device}
"""

from __future__ import annotations

import sys

import numpy as np

from akmc_tpu.postprocessing.extract import parse_output_txt


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_iv(output_txt: str, out_png: str = "iv.png"):
    """I-V hysteresis (plot_IV.py equivalent): current at end of each bias
    point vs applied voltage."""
    plt = _mpl()
    d = parse_output_txt(output_txt)
    n = min(len(d.voltages), len(d.currents_uA))
    fig, ax = plt.subplots(figsize=(5, 4))
    if n:
        ax.semilogy(d.voltages[:n], np.abs(d.currents_uA[:n]), "o-")
    ax.set_xlabel("Applied Voltage [V]")
    ax.set_ylabel("|I| [uA]")
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    return out_png


def plot_kmc_timeline(output_txt: str, out_png: str = "kmc_timeline.png"):
    plt = _mpl()
    d = parse_output_txt(output_txt)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.semilogy(np.arange(1, len(d.kmc_times) + 1), d.kmc_times, ".-")
    ax.set_xlabel("KMC superstep")
    ax.set_ylabel("KMC time [s]")
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    return out_png


def plot_temperature(output_txt: str, out_png: str = "temperature.png"):
    plt = _mpl()
    d = parse_output_txt(output_txt)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(d.temperatures_K, ".-")
    ax.set_xlabel("KMC superstep")
    ax.set_ylabel("Global temperature [K]")
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    return out_png


def plot_device(snapshot_xyz: str, out_png: str = "device.png"):
    """Filament visualization (show_device.py equivalent): vacancy /
    oxygen-defect positions colored by species, side view."""
    from akmc_tpu.lattice import ELEM, read_xyz

    plt = _mpl()
    e, x, y, z = read_xyz(snapshot_xyz)
    fig, ax = plt.subplots(figsize=(8, 4))
    groups = [
        (ELEM.VACANCY, "tab:red", "V", 8),
        (ELEM.OXYGEN_DEFECT, "tab:blue", "Od", 8),
        (ELEM.Ti, "0.8", "Ti", 1),
        (ELEM.N, "0.9", "N", 1),
    ]
    for el, color, label, size in groups:
        m = e == int(el)
        if m.any():
            ax.scatter(x[m], y[m], s=size, c=color, label=label, linewidths=0)
    ax.set_xlabel("x [A]")
    ax.set_ylabel("y [A]")
    ax.legend(markerscale=2, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    return out_png


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    kind, src = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else f"{kind}.png"
    fn = {
        "iv": plot_iv,
        "timeline": plot_kmc_timeline,
        "temperature": plot_temperature,
        "device": plot_device,
    }[kind]
    print(fn(src, out))


if __name__ == "__main__":
    main()
