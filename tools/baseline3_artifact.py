"""BASELINE #3 end-to-end artifact: the full molecular thermal pipeline.

Chain (VERDICT r3 missing #3):
  ptprofile.self_luminous  ->  molecules.generate_layers (reads the
  reference's dat/molecules tables, 1,060 opacity_aver files + PTgrid.dat)
  ->  cli build (hydrostatic grid, gas: on; atmosphere.py:216-276 semantics)
  ->  thermal spectrum transport  ->  luminosity conservation check
  (emitted vs emergent, the de-facto energy oracle, ARTES.f90:3654-3685).

Writes BASELINE3.json at the repo root with per-wavelength throughput and the
conservation ratios. Run on the TPU for the recorded artifact; runs anywhere
(CPU fallback) for a smoke check with --photons 1e5.
"""

import argparse
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_MOLECULES = "/root/reference/dat/molecules"


def unscattered_oracle_flux(atm, wl, distance, n_mu=96, n_r=16):
    """Deterministic unscattered emergent flux toward the detector
    [W m-2 m-1]: sum over cells of L_cell * <e^-tau(p->detector)> / (4 pi
    d^2), the no-scattering limit of the thermal transport (albedo at these
    wavelengths is ~1e-3, far below the quadrature/MC tolerance).

    For a spherically symmetric grid tau depends only on (r, mu), mu the
    angle between the radius vector and the detector direction, so a 2-D
    volume-weighted midpoint quadrature per radial cell suffices; tau is the
    exact chord sum over the shells crossed (tangent geometry included).
    The MC detector estimate is the Monte-Carlo integral of exactly this
    quantity (birth peel e^-tau/4pi, ARTES.f90:4519-4598), so agreement
    within MC error is the energy-conservation oracle for BASELINE #3."""
    import numpy as np

    from artes_tpu.constants import PI, planck_lambda
    from artes_tpu.transport.tables import compute_cell_depth

    k = atm.k_ext[:, 0, 0, wl]
    k_abs = atm.k_abs[:, 0, 0, wl]
    rf = atm.rfront
    nr = atm.nr
    cd = compute_cell_depth(atm, wl, photon_source=2)
    temp = atm.temperature[:, 0, 0]
    wavelength = atm.wavelengths[wl]
    vol = 4.0 / 3.0 * PI * (rf[1:] ** 3 - rf[:-1] ** 3)
    planck = np.where(temp > 0, planck_lambda(np.maximum(temp, 1.0), wavelength), 0.0)
    lum = 4.0 * PI * vol * k_abs * planck          # [W m-1] per cell
    lum[:cd] = 0.0

    def tau_from(r, mu):
        # ray from radius r with cos(angle to outward radial) = mu
        b = r * np.sqrt(max(0.0, 1.0 - mu * mu))   # impact parameter
        s0 = r * mu                                 # signed position on ray
        tau = 0.0
        for j in range(nr):
            for r_in, r_out in ((rf[j], rf[j + 1]),):
                pass
            # chord of shell [rf[j], rf[j+1]] ahead of s0
            def half_chord(R):
                return np.sqrt(max(0.0, R * R - b * b))
            lo, hi = rf[j], rf[j + 1]
            if hi <= b:
                continue
            h_hi = half_chord(hi)
            h_lo = half_chord(lo) if lo > b else 0.0
            # segments of the full line in this shell: [-h_hi,-h_lo],[h_lo,h_hi]
            for a0, a1 in ((-h_hi, -h_lo), (h_lo, h_hi)):
                seg = max(0.0, min(a1, 1e99) - max(a0, s0))
                seg = min(seg, a1 - a0)
                if seg > 0.0 and a1 > s0:
                    tau += seg * k[j]
        # stop at the planet floor: rays with b < rf[cd] moving inward hit it
        if b < rf[cd] and mu < 0.0:
            return np.inf
        return tau

    total = 0.0
    for j in range(nr):
        if lum[j] == 0.0:
            continue
        # volume-weighted midpoints in r^3 and uniform in mu
        r3 = np.linspace(rf[j] ** 3, rf[j + 1] ** 3, n_r + 1)
        rs = ((r3[:-1] + r3[1:]) / 2.0) ** (1.0 / 3.0)
        mus = np.linspace(-1.0, 1.0, n_mu + 1)
        mus = (mus[:-1] + mus[1:]) / 2.0
        acc = 0.0
        for r in rs:
            for mu in mus:
                t = tau_from(r, mu)
                if np.isfinite(t):
                    acc += np.exp(-t)
        total += lum[j] * acc / (n_r * n_mu)
    return total / (4.0 * PI * distance ** 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=float, default=2e7)
    ap.add_argument("--levels", type=int, default=40,
                    help="P-T levels (the repo ptprofile default; nr = levels-1)")
    ap.add_argument("--wl-min", type=float, default=0.9)
    ap.add_argument("--wl-max", type=float, default=1.4)
    ap.add_argument("--workdir", default=os.path.join(ROOT, "artifacts", "baseline3"))
    args = ap.parse_args()

    import numpy as np

    from artes_tpu import cli
    from artes_tpu.opacity import molecules, ptprofile

    t_all = time.perf_counter()
    base = args.workdir
    shutil.rmtree(base, ignore_errors=True)
    d = os.path.join(base, "input", "b3")
    os.makedirs(os.path.join(d, "opacity"), exist_ok=True)

    # 1. P-T profile (pressureTemperatureSelfLuminous.py equivalent)
    pressure, temperature = ptprofile.self_luminous(
        t_eff=900.0, kappa=1e-2, log_g=3.4, levels=args.levels)
    ptprofile.write_profile(os.path.join(d, "pressureTemperature.dat"),
                            pressure, temperature)

    # 2. per-layer molecular opacities from the reference data tables
    # (profile rows are written top-down; generate_layers numbers NN so
    # gas_opacity_01 is the deepest layer — the builder's radial order).
    # The builder uses the lower n_lev-1 rows as cells.
    t0 = time.perf_counter()
    molecules.generate_layers(REF_MOLECULES, pressure[:-1], temperature[:-1],
                              args.wl_min, args.wl_max,
                              os.path.join(d, "opacity"))
    t_opac = time.perf_counter() - t0

    # 3. atmosphere build (gas: on, hydrostatic grid)
    with open(os.path.join(d, "atmosphere.in"), "w") as fh:
        fh.write("[grid]\nradius: 1.\ntheta:\nphi:\n\n"
                 "[composition]\ngas: on\nmolweight: 2.3\nlog_g: 3.4\n")
    with open(os.path.join(d, "artes.in"), "w") as fh:
        fh.write("photon:source=planet\nphoton:emission=isotropic\n"
                 "detector:type=spectrum\ndetector:theta=90\ndetector:phi=90\n")
    t0 = time.perf_counter()
    assert cli.main(["build", "b3", "--root", base]) == 0
    t_build = time.perf_counter() - t0

    # 4. thermal spectrum transport
    import jax
    import jax.numpy as jnp

    from artes_tpu.atmosphere import load_artifact
    from artes_tpu.config import detector_setup, load_config
    from artes_tpu.runner import run_wavelength

    cfg = load_config(os.path.join(d, "artes.in"))
    atm = load_artifact(os.path.join(d, "atmosphere.fits"))
    det = detector_setup(cfg, float(atm.rfront[-1]))
    packages = int(args.photons)
    backend = jax.default_backend()

    rows = []
    n_err = 0
    # warm-up: the Mosaic kernel is compiled SERVER-side at first execution
    # (~35-85 s through the tunneled device; the XLA client compile is ~1 s
    # and the normalized spec shares one compile across the spectrum), so
    # absorb it with a tiny run before the measured rows — exactly what a
    # production spectrum pays once per process, reported separately.
    t0 = time.perf_counter()
    run_wavelength(atm, cfg, det, 0, 1 << 16, seed=7, dtype=jnp.float32)
    t_warm = time.perf_counter() - t0

    for wl in range(atm.n_wavelength):
        t0 = time.perf_counter()
        res = run_wavelength(atm, cfg, det, wl, packages, seed=7,
                             dtype=jnp.float32)
        dt = time.perf_counter() - t0
        # conservation: emitted Stokes-I tallies vs (emergent + absorbed);
        # emergent/emitted < 1 by absorption, and the DETECTED luminosity
        # (4 pi d^2 * flux / emissivity) must track emergent within MC error
        emitted = float(res.flux_emitted)
        emergent = float(res.flux_exit)
        e_pack = res.prep.emissivity_total / packages
        detected = float(res.detector[..., 0, 0].sum())  # I [W m-2 m-1]
        # conservation oracle: the deterministic unscattered emergent flux
        # integral of the same emission field (albedo here is ~2e-3, so the
        # scattered excess is below the tolerance)
        oracle = unscattered_oracle_flux(atm, wl, cfg.distance_planet)
        albedo_max = float(atm.albedo[:, 0, 0, wl].max())
        rows.append({
            "albedo_max": albedo_max,
            "wavelength_um": float(atm.wavelengths[wl] * 1e6),
            "photons_per_s": packages / dt,
            "seconds": dt,
            "flux_emitted_tally": emitted,
            "flux_emergent_tally": emergent,
            "luminosity_emitted_W_per_m": emitted * e_pack,
            "luminosity_emergent_W_per_m": emergent * e_pack,
            "detected_flux_W_m2_per_m": detected,
            "oracle_flux_W_m2_per_m": oracle,
            "detected_over_oracle": detected / max(oracle, 1e-300),
            "cell_depth": res.cell_depth,
            "n_error": res.n_error,
        })
        n_err += res.n_error
        print(f"wl {atm.wavelengths[wl]*1e6:7.3f} um: "
              f"{packages/dt/1e6:8.2f}M photons/s  "
              f"detected/oracle {rows[-1]['detected_over_oracle']:.4f}",
              flush=True)

    rates = [r["photons_per_s"] for r in rows]
    result = {
        "config": "BASELINE #3: self-luminous gas giant, molecular opacities",
        "backend": backend,
        "pipeline": {
            "pt_profile": f"self_luminous(t_eff=900, levels={args.levels})",
            "molecular_data": REF_MOLECULES,
            "opacity_generation_seconds": t_opac,
            "atmosphere_build_seconds": t_build,
            "nr": atm.nr,
            "n_wavelength": atm.n_wavelength,
            "wl_range_um": [args.wl_min, args.wl_max],
        },
        "photons_per_wavelength": packages,
        "kernel_warmup_seconds": t_warm,
        "throughput_photons_per_s": {
            "median": float(np.median(rates)),
            "min": float(np.min(rates)),
            "max": float(np.max(rates)),
        },
        "conservation": {
            "check": "MC detected flux vs deterministic unscattered-emission "
                     "integral (energy oracle; see unscattered_oracle_flux). "
                     "Scattering ADDS detected flux beyond the unscattered "
                     "oracle by up to ~1.5x the max single-scattering albedo "
                     "(Rayleigh windows at short wavelengths), so the "
                     "per-wavelength allowance scales with albedo.",
            "worst_excess_beyond_albedo_allowance": float(np.max(
                [(r["detected_over_oracle"] - 1.0)
                 - 1.5 * r["albedo_max"] for r in rows])),
            "worst_deficit": float(np.min(
                [r["detected_over_oracle"] - 1.0 for r in rows])),
            "tolerance": "ratio-1 in [-tol, 1.5*albedo_max + tol], "
                         "tol = max(5/sqrt(N), 0.005 quadrature floor)",
            "pass": bool(
                np.max([(r["detected_over_oracle"] - 1.0)
                        - 1.5 * r["albedo_max"] for r in rows])
                < max(5.0 / np.sqrt(packages), 0.005)
                and np.min([r["detected_over_oracle"] - 1.0 for r in rows])
                > -max(5.0 / np.sqrt(packages), 0.005)),
            "mc_error_scale": 1.0 / np.sqrt(packages),
        },
        "n_error_total": n_err,
        "total_seconds": time.perf_counter() - t_all,
        "rows": rows,
    }
    out = os.path.join(ROOT, "BASELINE3.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print("median throughput: "
          f"{result['throughput_photons_per_s']['median']/1e6:.2f}M photons/s"
          f" on {backend}; conservation pass="
          f"{result['conservation']['pass']}")
    print("written:", out)


if __name__ == "__main__":
    main()
