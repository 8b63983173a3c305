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

from artes_tpu import constants  # noqa: F401
