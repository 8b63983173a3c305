"""Generate synthetic data tables in the reference ``dat/`` formats.

The reference ships measured tables (dat/absorption, dat/refractive_index,
dat/molecules); this tool writes physically-plausible synthetic stand-ins in
the same file formats so every pipeline (opacityGas, opacityMie,
opacityMolecules) can be exercised without the proprietary data:

  * absorption table:  wavelength [micron]  cross-section [cm2/molecule]
  * refractive index:  wavelength [micron]  n  k
  * molecules dir:     PTgrid.dat + opacity_aver_NNNN.dat per (P, T) point

Usage: python examples/make_demo_data.py <out_dir>
"""

import os
import sys

import numpy as np


def write_absorption(path, wl_min=0.3, wl_max=2.0, n=1200):
    """Synthetic molecular band spectrum (smooth continuum + bands)."""
    wl = np.linspace(wl_min, wl_max, n)
    bands = sum(a * np.exp(-0.5 * ((wl - c) / w) ** 2)
                for a, c, w in [(3.0, 0.73, 0.02), (8.0, 0.89, 0.03),
                                (20.0, 1.15, 0.05), (60.0, 1.4, 0.07)])
    sigma = 1e-24 * (0.05 + bands)  # [cm2/molecule]
    with open(path, "w") as fh:
        fh.write("# Wavelength [micron] - Opacity [cm2/molecule]\n\n")
        for w, s in zip(wl, sigma):
            fh.write(f"{w:.18e} {s:.18e}\n")


def write_refractive_index(path, n0=1.48, dn=0.02, k0=5e-3):
    """Sellmeier-ish dielectric with weak absorption (ice-like)."""
    wl = np.logspace(np.log10(0.2), np.log10(50.0), 200)
    n = n0 + dn / (wl * wl)
    k = k0 * (1.0 + 5.0 * np.exp(-0.5 * ((wl - 3.1) / 0.2) ** 2))
    with open(path, "w") as fh:
        fh.write("# wavelength [micron]  n  k\n")
        for w, nn, kk in zip(wl, n, k):
            fh.write(f"{w:.10e} {nn:.10e} {kk:.10e}\n")


def write_molecule_grid(out_dir, pressures=(1e-3, 1e-1, 1e1), temps=(200.0, 600.0, 1500.0)):
    os.makedirs(out_dir, exist_ok=True)
    wl = np.linspace(0.5, 15.0, 400)
    rows = []
    idx = 1
    for t in temps:
        for p in pressures:
            # opacity grows with P (pressure broadening) and T (hot bands)
            op = 1e-26 * (p / 1e-3) ** 0.4 * (t / 200.0) ** 1.2 * (
                1.0 + 10.0 * np.exp(-0.5 * ((wl - 4.3) / 0.3) ** 2))
            np.savetxt(os.path.join(out_dir, f"opacity_aver_{idx:04d}.dat"),
                       np.column_stack([wl, op]))
            rows.append((idx, p, t))
            idx += 1
    with open(os.path.join(out_dir, "PTgrid.dat"), "w") as fh:
        fh.write("# File - Pressure [bar] - Temperature [K]\n")
        for i, p, t in rows:
            fh.write(f"{i}\t{p}\t{t}\t\n")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dat_demo"
    os.makedirs(os.path.join(out, "absorption"), exist_ok=True)
    os.makedirs(os.path.join(out, "refractive_index"), exist_ok=True)
    write_absorption(os.path.join(out, "absorption", "demo_molecule.dat"))
    write_refractive_index(os.path.join(out, "refractive_index", "demo_ice.dat"))
    write_molecule_grid(os.path.join(out, "molecules"))
    print(f"synthetic data written under {out}/")
