import math

import pytest

from artes_tpu.config import ArtesConfig, ConfigError, detector_setup, load_config, parse_lines
from artes_tpu.constants import AU, PARSEC, PI, R_SUN


ARTES_IN = """\
======================================================================
* ARTES input parameters
* comment line
general:log=off
photon:source=star
photon:fstop=1d-5
photon:minimum=1d-20
photon:weight=on
photon:emission=isotropic
photon:bias=0.8
star:temperature=5800
star:radius=1
planet:surface_albedo=0
planet:oblateness=0
planet:orbit=5
planet:ring=off
detector:type=imaging_mono
detector:theta=90
detector:phi=90
detector:pixel=25
detector:distance=10
output:flow_global=off
output:flow_latitudinal=off
"""


def test_parse_template_defaults():
    cfg = parse_lines(ARTES_IN.splitlines()).validate()
    assert cfg.photon_source == "star"
    assert cfg.fstop == pytest.approx(1e-5)
    assert cfg.r_star == pytest.approx(R_SUN)
    assert cfg.orbit == pytest.approx(5 * AU)
    assert cfg.distance_planet == pytest.approx(10 * PARSEC)
    assert cfg.mode == "imaging_mono"
    assert cfg.npix == 25
    assert cfg.det_theta == pytest.approx(PI / 2)


def test_defaults_match_reference():
    # ARTES.f90:280-336
    cfg = ArtesConfig()
    assert cfg.packages == 100000
    assert cfg.fstop == 1e-5
    assert cfg.photon_minimum == 1e-20
    assert cfg.thermal_weight is True
    assert cfg.photon_bias == 0.8
    assert cfg.t_star == 5800.0
    assert cfg.surface_albedo == 0.0


def test_unknown_key_raises():
    cfg = ArtesConfig()
    with pytest.raises(ConfigError):
        parse_lines(["bogus:key=1"], cfg)


def test_cli_override_precedence(tmp_path):
    p = tmp_path / "artes.in"
    p.write_text(ARTES_IN)
    cfg = load_config(p, overrides=["detector:pixel=77", "photon:fstop=0.1"])
    assert cfg.npix == 77
    assert cfg.fstop == pytest.approx(0.1)


def test_angle_clamping():
    cfg = ArtesConfig()
    parse_lines(["detector:theta=0", "detector:phi=180"], cfg)
    assert cfg.det_theta == pytest.approx(1e-3)
    # ARTES.f90:492-493: phi clamped away from pi in detector setup
    det = detector_setup(cfg, r_max=7.0e7)
    assert det.det_phi == pytest.approx(PI - 1e-3)


def test_detector_setup_modes():
    cfg = ArtesConfig()
    det = detector_setup(cfg, r_max=7.0e7)
    assert det.nx == det.ny == 25
    assert det.x_max == pytest.approx(1.3 * 7.0e7)
    # direction is a unit vector
    assert sum(d * d for d in det.direction) == pytest.approx(1.0)

    cfg.mode = "spectrum"
    det = detector_setup(cfg, r_max=7.0e7)
    assert det.nx == det.ny == 1

    cfg.mode = "phase"
    det = detector_setup(cfg, r_max=7.0e7)
    assert det.det_theta == pytest.approx(PI / 2)


def test_phase_observer_angle():
    # star at default theta=90,phi=0; detector at theta=90,phi=90 -> 90 deg
    cfg = ArtesConfig()
    det = detector_setup(cfg, r_max=1.0)
    assert det.phase_observer == pytest.approx(90.0, abs=0.1)


def test_oblateness_fov():
    cfg = ArtesConfig()
    cfg.oblateness = 0.5
    det = detector_setup(cfg, r_max=1.0e7)
    assert det.x_max == pytest.approx(1.3e7 * 1.5)
    expected_fov = 2 * math.atan(det.x_max / cfg.distance_planet) * 3600 * 180 / PI * 1000
    assert det.x_fov == pytest.approx(expected_fov)


def test_max_scatter_key():
    """photon:max_scatter (extension key; the reference runs photons to
    roulette death, ARTES.f90:786-951 — VERDICT r3 weak #5)."""
    from artes_tpu.config import ConfigError, apply_key, parse_lines, snapshot

    cfg = parse_lines(["photon:max_scatter=8"])
    assert cfg.max_scatter == 8
    assert "photon:max_scatter=8" in snapshot(cfg)
    cfg2 = ArtesConfig()
    assert cfg2.max_scatter == 256
    cfg2.max_scatter = 0
    with pytest.raises(ConfigError):
        cfg2.validate()
    cfg3 = ArtesConfig()
    with pytest.raises(ConfigError):
        apply_key(cfg3, "photon:nonsense", "1")


def test_max_scatter_reaches_kernel():
    """The config cap flows into KernelStatic and truncated photons are
    tallied as n_alive_at_cap."""
    import jax.numpy as jnp
    import numpy as np
    from artes_tpu import presets
    from artes_tpu.runner import _kernel_static, run_wavelength

    atm = presets.rayleigh_single_layer(tau=8.0)
    cfg = ArtesConfig()
    cfg.mode = "spectrum"
    cfg.max_scatter = 2
    det = detector_setup(cfg, float(atm.rfront[-1]))
    assert _kernel_static(cfg, det, atm, False).max_scatter == 2
    res = run_wavelength(atm, cfg, det, 0, 400, seed=1, dtype=jnp.float32)
    assert res.n_alive_at_cap > 0

    cfg.max_scatter = 256
    res2 = run_wavelength(atm, cfg, det, 0, 400, seed=1, dtype=jnp.float32)
    assert res2.n_alive_at_cap == 0
