"""ARTES-TPU: TPU-native polarized Monte Carlo radiative transfer for exoplanet atmospheres.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
ARTES code (Stolker et al. 2017): 3-D spherical-grid photon transport with full
4x4 Mueller-matrix polarization, stellar and thermal photon sources, peel-off
(next-event estimation) imaging/spectroscopy/phase-curve detectors, and the
offline atmosphere/opacity tooling that feeds it.

Reference parity anchors are cited throughout as ``ARTES.f90:<line>`` (the
Fortran core) and ``python/<tool>.py:<line>`` (the offline tooling).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA/Mosaic compilation cache: the fused pool kernel costs
# 35-85 s to compile (nr-dependent unroll), which used to land on the first
# wavelength of every process (BASELINE3 rows[0]: 138 s). The disk cache
# amortises it across processes/runs; the spec is already normalized so a
# whole spectrum shares one compile within a process. Opt out with
# ARTES_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("ARTES_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "artes_tpu", "jax_cache"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimisation only

from artes_tpu import constants  # noqa: F401
