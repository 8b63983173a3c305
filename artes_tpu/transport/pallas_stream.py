"""Fused Pallas transport kernel: the regeneration pool in one TPU kernel.

The XLA stream kernel (``kernel.run_stream``) is latency/HBM-bound: every
round body materialises dozens of (width,)-shaped intermediates through HBM,
so the VPU runs at <0.1 % utilisation (measured ~4M photons/s on TPU v5e
against a compute ceiling in the hundreds of millions). This module compiles
the *entire* pool loop — refill, emission, scattering, the transport march,
the detector peel walk and the splat — into a single Pallas kernel whose
state lives in VMEM, eliminating the HBM round-trips. Measured on TPU v5e
(r5): 106-123M photons/s reflected-light spectrum, 267M+ thermal, 87M for
a 25x25 imaging detector (26M at 101x101) — 20-100x the XLA pool.

Semantics: bit-identical photon streams to ``run_stream`` (same hand-rolled
threefry2x32, same per-lane event-history draw-site schedule, same geometry
and Mueller algebra re-derived in structure-of-arrays form); detector splat
counts are bit-equal and moments differ only by f32 evaluation order when
both kernels compile through a common compiler — the contract the CPU
interpreter-mode parity suite pins. Across INDEPENDENT compilers (XLA-TPU
vs Mosaic on hardware), f32 FMA-contraction choices differ, which flips a
small fraction of trajectories (~0.06% of flagship photons; detector I
agrees at the MC-noise level, rel ~5e-5 at 2^16 photons) and adds
~1e-2-relative noise to 3-D moments (near-tangent cone/plane chords
amplify the ulps) — all far below MC error. One known count-level caveat: phi cell binning uses an
``_acos`` polynomial (Mosaic has no arctan2) while the XLA kernel uses
arctan2, so a photon healed/located within ~1e-7 of a phi face can bin to
the neighbouring cell and diverge — never observed in the parity suites,
but not excluded by construction. ``tests/test_pallas_stream.py`` checks
all of this against the XLA kernel in interpreter mode.

Scope (everything else falls back to ``run_stream``; see :func:`supports`):

* stellar (incl. off-axis/crescent) and thermal (isotropic or Gordon-biased
  emission, birth peel, flux bookkeeping) sources, scattering on, no flow
  tracking,
* full 3-D r/theta/phi grids up to nr<=128, ntheta/nphi<=64, 4096 cells
  (theta cones with nappe rejection, the z=0 plane face, phi half-planes
  with wraparound — the geometry of BASELINE #4's patchy zones;
  ARTES.f90:2800-3470), oblateness, up to 8 distinct scattering MIXTURES
  over those cells (see :class:`MixTables` — per-cell matrix content
  dedupes to a handful of mixtures in every realistic atmosphere, so
  matrix/CDF gathers cost O(n_mix), not O(ncell)),
* detectors up to 16384 pixels, all accumulated IN-KERNEL: single-pixel
  runs as per-lane tiles, multi-pixel images as VMEM-resident detector
  rows fed by an MXU one-hot dot per pool-row per round (counts exact,
  Stokes values as a bf16 hi/lo split at f32-roundoff fidelity — see the
  splat block in ``_build_kernel``),
* Lambert surfaces (any ``surface_albedo``): the march stops at a
  reflection and the next round runs the surface NEE + resumes the march
  with the banked tau budget on the same draw-site schedule,
* float32 tables. Flow tracking, f64 and the debug Stokes-anomaly check
  fall back to the XLA kernel.

Layout: the lane pool is structure-of-arrays — every per-photon variable is
its own ``(width/128, 128)`` tile-aligned array, so each physics formula is a
VPU op with no minor-dimension padding. Small scalars live in SMEM; every
per-mixture/per-cell/per-face table (scattering-matrix columns, alpha-CDF
edges, opacity, albedo, emissivity CDF, face radii/trig) is a row table in
VMEM read by 128-lane dynamic gathers (``take_along_axis``, the one
vector-subscript form Mosaic lowers natively) — O(1) per lookup where
compare-select chains cost O(n). Monotone searches (emissivity CDF, cell
healing, locate_cell) run as branchless binary searches over those tables.
The host wrapper deduplicates scattering-matrix columns (equal/negated/zero,
e.g. the 6 distinct entries of a Rayleigh matrix) so only distinct columns
are gathered.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from artes_tpu.transport import jumps as JMP
from artes_tpu.transport import radial as RAD
from artes_tpu.transport import rng as R
from artes_tpu.transport import sampling as SAMP

i32 = jnp.int32
u32 = jnp.uint32
f32 = jnp.float32

BIG = 1.0e30
N_ANGLE = 180
N_COARSE = 15
N_FINE = 12
_DEG = np.pi / 180.0
TWO_PI = 2.0 * np.pi

STAGE_DEAD = 0
STAGE_BIRTH_PEEL = 1
STAGE_PREWALK = 2
STAGE_FIRST_WALK = 3
STAGE_LIVE = 4
STAGE_SURF_PEEL = 5   # just Lambert-reflected: surface NEE + resume march

# Continuous azimuth-CDF basis at the 17 coarse edges (sampling.py)
_BETA_EDGES = np.linspace(0.0, np.pi, 17)
_BETA_BASIS = np.stack([_BETA_EDGES,
                        0.5 * np.sin(2.0 * _BETA_EDGES),
                        0.5 * (1.0 - np.cos(2.0 * _BETA_EDGES))])  # (3, 17)


@dataclasses.dataclass(frozen=True)
class PallasSpec:
    """Compile-time specialisation extracted from concrete tables."""

    nr: int
    cell_depth: int
    max_scatter: int
    max_crossings: int
    crescent: bool
    stellar_direction: bool
    ob: tuple           # (ax, by, cz)
    pos_eps: float
    same_eps: float
    sel1: float
    sel2: float
    boundary_tol: float
    # scattering-matrix column reuse: 16 entries, each one of
    # ('d', j) distinct column j | ('r', e) reuse entry e | ('n', e) negated
    # entry e | ('z',) all-zero
    scat_reps: tuple
    n_distinct: int
    alpha_active: tuple  # indices of nonzero alpha-CDF weight rows
    nx: int = 1          # detector pixels (multi-pixel images accumulate
    ny: int = 1          # in-kernel via the MXU one-hot splat)
    thermal: bool = False    # planet source: emissivity-CDF emission,
    emission: int = 1        # birth peel, flux tallies; 1 iso / 2 biased
    ntheta: int = 1          # 3-D grids: theta cones/z=0 plane + phi
    nphi: int = 1            # half-planes (ARTES.f90:3030-3350)
    surface: bool = False    # Lambert surface (surface_albedo > 0)
    n_mix: int = 1           # distinct scattering mixtures over cells
    # 3-D jump-walk structure (transport/jumps.py): radial faces with a
    # nonzero dk diff (trace-time pruned; exact zeros elsewhere keep
    # bit-equality with the XLA kernel's all-faces evaluation), and the
    # theta faces' cone-vs-plane / nappe structure
    jfaces: tuple = ()
    tcone: tuple = ()
    tabove: tuple = ()
    mband: tuple = (0, 0)    # painted-shell range [lo, hi) for the
                             # band-limited locate (jumps.py locate_m)
    flow: bool = False       # closed-form radial flow diagnostics


# caps of the fast path (everything else falls back to run_stream)
MAX_NR = 128
MAX_NTHETA = 64
MAX_NPHI = 64
MAX_NCELL = 4096        # per-cell tables are 128-lane gather rows, so the
                        # cost of a cell is VMEM rows + per-lookup chunk
                        # selects, not per-round ALU (r5; r4 capped at 512)
MAX_NMIX = 8            # distinct per-cell scattering mixtures
MAX_DISTINCT = 12       # distinct scattering-matrix columns after dedup
MAX_PIXELS = 16384


@dataclasses.dataclass(frozen=True)
class MixTables:
    """Per-MIXTURE scattering tables, deduplicated over cells.

    Cells index the physics only through their scattering mixture (matrix +
    angular integrals + CDF prefix) — a hydrostatic molecular atmosphere has
    hundreds of cells but ONE Rayleigh mixture, a patchy-cloud 3-D grid two
    or three. Gathering by mixture id keeps the in-kernel matrix/CDF tables
    at a handful of 128-entry rows regardless of cell count (the r3 kernel
    indexed them per-cell, so nr=32 already cost a 45-chunk gather per
    lookup and the kernel was capped at 32 cells)."""

    mix: np.ndarray            # (ncell,) i32 cell -> mixture id
    scatter_rows: np.ndarray   # (n_mix*180, 16)
    alpha_prefix: np.ndarray   # (n_mix, 4, 181)
    p_int: np.ndarray          # (n_mix, 4)
    distinct: tuple            # matrix-column indices gathered as tables


def _dedupe_mixtures(tables) -> MixTables:
    # memoized on the tables object: supports() and make_spec() both need
    # the dedup, and the np.unique over an (ncell, ~3.7k) key is not free
    memo = getattr(tables, "_mix_memo", None)
    if memo is not None:
        return memo
    ncell = tables.grid.nr * tables.grid.ntheta * tables.grid.nphi
    scat = np.asarray(tables.scatter_rows, np.float32)       # (ncell*180, 16)
    prefix = np.asarray(tables.alpha_prefix, np.float32)     # (ncell, 4, 181)
    pint = np.asarray(tables.p_int, np.float32).reshape(ncell, 4)
    key = np.concatenate([scat.reshape(ncell, -1),
                          prefix.reshape(ncell, -1), pint], axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    nm = uniq.shape[0]
    mt = MixTables(
        mix=inv.astype(np.int32).reshape(-1),
        scatter_rows=uniq[:, :180 * 16].reshape(nm * 180, 16),
        alpha_prefix=uniq[:, 180 * 16:180 * 16 + 4 * 181].reshape(nm, 4, 181),
        p_int=uniq[:, -4:].reshape(nm, 4),
        distinct=(),
    )
    try:
        tables._mix_memo = mt
    except Exception:
        pass
    return mt


def _column_reps(scat: np.ndarray):
    """Dedup the 16 matrix columns: equal / negated / zero reuse."""
    reps = []
    distinct = []
    for e in range(16):
        col = scat[:, e]
        if not np.any(col):
            reps.append(("z",))
            continue
        hit = None
        for e2 in range(e):
            prev = scat[:, e2]
            if np.array_equal(col, prev):
                hit = ("r", e2)
                break
            if np.array_equal(col, -prev):
                hit = ("n", e2)
                break
        if hit is None:
            reps.append(("d", len(distinct)))
            distinct.append(e)
        else:
            reps.append(hit)
    return tuple(reps), distinct


def preferred_width(tables, static) -> int | None:
    """Config-dependent pool width: 3-D jump-walk configs run ~4% faster at
    16384 lanes (the wider pool amortises the short march loop's cross-pool
    reductions and the fixed walk costs; measured 27.2/29.5/30.6 M
    photons/s at 4096/8192/16384 on the 39x8x8 cloud deck, TPU v5e).
    Returns None for the default width."""
    g = tables.grid
    try:
        has_surface = float(tables.surface_albedo) > 0.0
    except Exception:
        return None
    if (g.ntheta > 1 or g.nphi > 1) and not has_surface:
        return 16384
    return None


def supports(tables, static) -> bool:
    """True when this kernel covers the configuration (else use run_stream)."""
    g = tables.grid
    try:
        float(tables.surface_albedo)
    except Exception:
        return False  # traced tables: cannot specialise eagerly
    ncell = g.nr * g.ntheta * g.nphi
    # flow diagnostics ride the closed-form radial march (radial.py flow
    # hook) on single-pixel radial surfaceless configs; elsewhere they
    # still fall back to the XLA marching kernel
    flow_ok = (g.ntheta == 1 and g.nphi == 1
               and float(tables.surface_albedo) <= 0.0
               and static.nx * static.ny == 1)
    ok = (static.photon_source in (1, 2)
          and static.photon_scattering
          and (not static.track_flow or flow_ok)
          and not static.det_f64      # f32 in-kernel accumulators only
          and not static.debug_stokes  # error-050 check: XLA kernel only
          and 1 <= static.nx * static.ny <= MAX_PIXELS
          and 1 <= g.nr <= MAX_NR and g.ntheta <= MAX_NTHETA
          and g.nphi <= MAX_NPHI
          and ncell <= MAX_NCELL
          and tables.opacity.dtype == jnp.float32)
    if not ok:
        return False
    mt = _dedupe_mixtures(tables)
    if mt.alpha_prefix.shape[0] > MAX_NMIX:
        return False
    _, distinct = _column_reps(mt.scatter_rows)
    return len(distinct) <= MAX_DISTINCT


def make_spec(tables, static):
    g = tables.grid
    mt = _dedupe_mixtures(tables)
    n_mix = mt.alpha_prefix.shape[0]
    reps, distinct = _column_reps(mt.scatter_rows)
    alpha_active = tuple(int(k) for k in range(4)
                         if np.any(mt.alpha_prefix[:, k, :]))
    mt = dataclasses.replace(mt, distinct=tuple(distinct))
    # closed-form radial configs read the photon floor radius from a runtime
    # scalar (sf "rfloor"), so cell_depth is normalized out of the spec and
    # per-wavelength floor changes share one compiled kernel
    closed = (g.ntheta == 1 and g.nphi == 1
              and float(tables.surface_albedo) <= 0.0)
    # 3-D jump-walk structure (see jumps.py): prune radial faces whose dk
    # diff row is identically zero (kbar absorbs the purely-radial
    # structure), and freeze the theta faces' cone/plane + nappe flags
    jumps3d = ((g.ntheta > 1 or g.nphi > 1)
               and float(tables.surface_albedo) <= 0.0)
    jfaces = ()
    tcone = ()
    tabove = ()
    if jumps3d:
        k3 = np.asarray(tables.opacity, np.float32).reshape(
            g.nr, g.ntheta, g.nphi)
        dk = k3 - k3[:, :1, :1]          # kbar[m] = k[m, 0, 0]
        jfaces = tuple(j for j in range(1, g.nr)
                       if np.any(dk[j] != dk[j - 1]))
        painted = [m for m in range(g.nr) if np.any(dk[m])]
        mband = (min(painted), max(painted) + 1) if painted else (0, 0)
        plane = np.asarray(tables.grid.thetaplane_cone)
        above = np.asarray(tables.grid.theta_above)
        tcone = tuple(bool(plane[j]) for j in range(1, g.ntheta))
        tabove = tuple(bool(above[j]) for j in range(1, g.ntheta))
    return PallasSpec(
        nr=g.nr, cell_depth=0 if closed else int(tables.cell_depth),
        max_scatter=static.max_scatter, max_crossings=static.max_crossings,
        crescent=static.crescent, stellar_direction=static.stellar_direction,
        ob=(g.ob_ax, g.ob_by, g.ob_cz),
        pos_eps=g.pos_eps, same_eps=g.same_eps, sel1=g.sel1, sel2=g.sel2,
        boundary_tol=g.boundary_tol,
        scat_reps=reps, n_distinct=len(distinct),
        alpha_active=alpha_active,
        nx=static.nx, ny=static.ny,
        thermal=static.photon_source == 2,
        emission=static.photon_emission,
        ntheta=g.ntheta, nphi=g.nphi,
        surface=float(tables.surface_albedo) > 0.0,
        n_mix=n_mix,
        flow=bool(static.track_flow),
        jfaces=jfaces, tcone=tcone, tabove=tabove,
        mband=mband if jumps3d else (0, 0),
    ), mt


def _emit_basis(tables, spec):
    """Stellar-beam orthonormal basis on the ellipsoid silhouette — the
    trace-time constants of the emit stage (kernel.py _emit, stellar)."""
    ax, by, cz = spec.ob
    if spec.stellar_direction:
        th, ph = tables.star_theta, tables.star_phi
        cy, sy = jnp.cos(-(np.pi / 2.0 - th)), jnp.sin(-(np.pi / 2.0 - th))
        cf, sf_ = jnp.cos(ph), jnp.sin(ph)
        # rot = Rz(phi) @ Ry(-(pi/2 - theta)) applied to -x, y, z axes
        u_hat = jnp.stack([-cy * cf, -cy * sf_, sy])
        e1 = jnp.stack([-sf_, cf, jnp.zeros_like(cf)])
        e2 = jnp.stack([sy * cf, sy * sf_, cy])
    else:
        u_hat = jnp.asarray([-1.0, 0.0, 0.0], f32)
        e1 = jnp.asarray([0.0, 1.0, 0.0], f32)
        e2 = jnp.asarray([0.0, 0.0, 1.0], f32)
    s_diag = jnp.asarray([ax, by, cz], f32)
    w = s_diag * u_hat
    w_hat = w / jnp.linalg.norm(w)
    e1s = s_diag * e1
    e1s = e1s - jnp.dot(e1s, w_hat) * w_hat
    e1s = e1s / jnp.linalg.norm(e1s)
    e2s = jnp.cross(e1s, w_hat)
    return u_hat.astype(f32), e1s.astype(f32), e2s.astype(f32), w_hat.astype(f32)


def _acos(x):
    """arccos via the Abramowitz-Stegun 4.4.45 polynomial (|err| < 2e-8):
    Mosaic has no native arccos; this feeds the half-degree matrix
    interpolation where f32 resolution dominates the error anyway."""
    y = jnp.abs(x)
    p = -0.0012624911
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * y + c
    r = jnp.sqrt(jnp.maximum(1.0 - y, 0.0)) * p
    return jnp.where(x < 0.0, np.pi - r, r)


def _gt_layout(spec: PallasSpec) -> dict:
    """Row layout of the lane-gather table stack ``gt``.

    Every per-mixture / per-cell / per-face table lives here as rows of 128
    f32 entries, read in-kernel by 128-lane dynamic gathers; the kernel and
    the host packer both derive offsets from this single function. Returns
    ``name -> (row0, nch, count)`` (``count`` parallel tables of ``nch``
    chunks each) plus ``"_total"``."""
    NC = spec.nr * spec.ntheta * spec.nphi
    nm = spec.n_mix
    n_act = len(spec.alpha_active)
    closed = _radial_closed(spec)
    lay = {}
    off = 0

    def alloc(name, entries, count=1):
        nonlocal off
        nch = -(-entries // 128)
        lay[name] = (off, nch, count)
        off += nch * count

    alloc("mat", nm * N_ANGLE, spec.n_distinct)
    alloc("fine", nm * N_COARSE, n_act * (N_FINE + 1))
    alloc("btrig", 16, 2)       # sin/cos(2*edge) at the beta bracket edges
    if nm > 1:
        alloc("coarse", nm, n_act * (N_COARSE + 1))
        alloc("pint", nm, 4)
    if NC > 1:
        if not closed:               # closed-form path reads opacity as
            alloc("opac", NC)        # SMEM scalars (trace-time loop index)
        alloc("alb", NC)
        if nm > 1:
            alloc("mix", NC)
        if spec.thermal:
            alloc("ecum", NC)
            alloc("cw", NC)
    if spec.nr > 1:
        alloc("rf", spec.nr + 1)
    if spec.ntheta > 1:
        alloc("tcombo", spec.ntheta, 6)
        alloc("tcos", spec.ntheta + 1)
    if spec.nphi > 1:
        alloc("pcombo", spec.nphi, 4)
        alloc("phif", spec.nphi + 1)
    if _jumps3d(spec):
        # jump-walk diff tables (jumps.py): per-FACE rows, so every gather
        # in a crossing costs <= a few chunks regardless of cell count
        NA = spec.ntheta * spec.nphi
        if spec.jfaces:
            alloc("drj", NA, len(spec.jfaces))
        if spec.ntheta > 1:
            alloc("dtt", spec.nr * spec.nphi, spec.ntheta - 1)
        if spec.nphi > 1:
            alloc("dpp", spec.nr * spec.ntheta, spec.nphi)
        alloc("dkall", NC)
    lay["_total"] = off
    return lay


def _radial_closed(spec: PallasSpec) -> bool:
    """Closed-form radial transport applies (see transport/radial.py)."""
    return spec.ntheta == 1 and spec.nphi == 1 and not spec.surface


def _jumps3d(spec: PallasSpec) -> bool:
    """3-D jump walks apply (see transport/jumps.py)."""
    return (spec.ntheta > 1 or spec.nphi > 1) and not spec.surface


def _sf_layout(spec: PallasSpec) -> dict:
    """Offsets of the scalar (SMEM) parameter vector ``sf``."""
    NC = spec.nr * spec.ntheta * spec.nphi
    lay = {}
    off = 0

    def alloc(name, n):
        nonlocal off
        lay[name] = off
        off += n

    alloc("rf", spec.nr + 1)     # scalar uses (r_outer/r_floor) + nr==1 path
    if _radial_closed(spec):
        alloc("opac", NC)        # per-cell scalars for the closed-form walks
        alloc("rfloor", 1)       # rfront[cell_depth] as a RUNTIME scalar, so
        # per-wavelength cell_depth changes do not recompile the kernel
        # (spec.cell_depth is normalized to 0 for closed-form configs)
    elif NC == 1:
        alloc("opac", 1)
    if NC == 1:
        alloc("alb", 1)
        alloc("cw", 1)
    alloc("scal", 4)             # fstop, pmin, x_max, y_max
    alloc("det", 7)              # det_dir(3) + det_trig(4)
    alloc("basis", 12)           # stellar-beam basis u_hat/e1/e2/w_hat
    alloc("ec_total", 1)         # thermal emissivity CDF total
    alloc("bias", 1)             # Gordon emission bias
    if spec.n_mix == 1:
        alloc("pint", 4)
    alloc("salb", 1)
    if _jumps3d(spec):
        # jump-walk scalars (jumps.py env): per-shell baseline opacity,
        # theta_cos faces, interior theta-face tan^2, phi-face trig
        alloc("kbar", spec.nr)
        alloc("tcosf", spec.ntheta + 1)
        if spec.ntheta > 1:
            alloc("tftan", spec.ntheta - 1)
        if spec.nphi > 1:
            alloc("fsin", spec.nphi)
            alloc("fcos", spec.nphi)
    lay["_n"] = off
    return lay


def _build_kernel(spec: PallasSpec, width: int):
    """Construct the Pallas kernel body for one (spec, width).

    Single- and multi-pixel detectors both accumulate IN-KERNEL: a single
    pixel as per-lane (RR, C) tiles summed once at the end; a multi-pixel
    image as VMEM-resident feature-major detector rows fed by one MXU
    one-hot dot per pool-row per round (see the splat block in ``body``).
    The r3/r4 segmented form — pool state round-tripped through aliased
    refs, scatter-peel records streamed out and flushed through an XLA
    (records, npix) one-hot einsum — is gone: its flush was HBM-bound on
    the one-hot materialisation (O(record slots x npix) bytes, the
    imaging bottleneck), while the in-kernel dot splat is MXU-bound and
    20-100x cheaper per record (measured: 25x25 imaging 55.6 -> 87M
    photons/s, 101x101 8.5 -> 26.5M on TPU v5e).
    """
    C = 128
    RR = width // C
    nr = spec.nr
    NT = spec.ntheta
    NP = spec.nphi
    NC = nr * NT * NP               # flat cell count for per-cell tables
    NPIX = spec.nx * spec.ny
    # in-kernel MXU splat geometry (multi-pixel detectors): the detector
    # lives in VMEM as feature-major ((NCNT+8)*NRP, 128) rows — groups
    # [cnt0, cnt_full, I, Q, U, V, I2, Q2, U2, V2], each (NRP, C) with
    # pixel p at (row p>>7, lane p&127). Without first-only events
    # (thermal birth / surface peels) cnt0 == cnt_full exactly, so one
    # count row suffices (NCNT=1) and the host duplicates it.
    NROWS = -(-NPIX // C)
    NRP = max(-(-NROWS // 8) * 8, 8)
    NCNT = 2 if (spec.thermal or spec.surface) else 1
    # Stokes values ride the MXU as a bf16 hi/lo(/lo2) split: 3-way keeps
    # every contribution at f32-roundoff (<=1 ulp), used up to 2048 px;
    # larger detectors drop to 2-way (~1e-5 relative per contribution,
    # ~300x below MC noise at realistic photon counts). Counts are 0/1 —
    # exact in bf16 — and squares (MC error bars) take a single bf16 copy
    # (~0.4% per contribution, averaging to ~0.4%/sqrt(N) on the bar).
    VSPLIT = 3 if NPIX <= 2048 else 2
    nm = spec.n_mix
    ax, by, cz = spec.ob
    a2, b2, c2 = ax * ax, by * by, cz * cz
    pos_eps = spec.pos_eps
    D = spec.n_distinct
    lay = _gt_layout(spec)
    offs = _sf_layout(spec)

    def sel_n(read, idx, n):
        """table[idx] for a per-lane index via unrolled selects.

        ``read(i)`` returns the scalar for entry i (an SMEM load)."""
        if n == 1:
            return jnp.zeros(idx.shape, f32) + read(0)
        acc = jnp.zeros(idx.shape, f32)
        for i in range(n):
            acc = jnp.where(idx == i, read(i), acc)
        return acc

    # gather-table geometry: lane tables are rows of 128 entries; per-lane
    # lookups are 128-lane dynamic gathers (jnp.take_along_axis along lanes,
    # the one vector-subscript form Mosaic lowers natively) instead of
    # O(n_bins) compare-select chains — measured 2.3x on the whole kernel.
    # Matrix/CDF tables index by MIXTURE id (see MixTables), so their chunk
    # counts scale with n_mix, not cell count.
    nch_m = -(-(nm * N_ANGLE) // 128)      # scattering-matrix bin chunks
    nch_f = -(-(nm * N_COARSE) // 128)     # fine-CDF block chunks
    RADIAL = _radial_closed(spec)          # closed-form walks (radial.py)
    JUMPS3D = _jumps3d(spec)               # 3-D jump walks (jumps.py)

    def kernel(sf, si, coarse, gt, lt_c, lt_r, *rest):
        if NPIX > 1:
            outf, outi, outd = rest[:3]
            rest = rest[3:]
        else:
            outf, outi = rest[:2]
            rest = rest[2:]
        outei, outef = rest[0], rest[1]
        if spec.flow:
            # flow tallies accumulate IN-PLACE into a VMEM output ref:
            # carrying 5 (FR, 128) tiles through the while_loop cost the
            # nr=39 flow round ~40% by itself (measured 60 -> 35 M
            # photons/s with booking arithmetic DCE'd away)
            outfl = rest[2]
        n_photons = si[0]
        seed = si[1]       # pre-mixed with the id high word (rng.key_hi)
        id_lo = si[2]      # low word of the chunk's first global photon id

        # ---- scalar parameter loads (SMEM; layout = _sf_layout) ----
        rf = [sf[offs["rf"] + i] for i in range(nr + 1)]
        sc = offs["scal"]
        fstop = sf[sc]; pmin = sf[sc + 1]
        x_max = sf[sc + 2]; y_max = sf[sc + 3]
        dof = offs["det"]
        ddx, ddy, ddz = sf[dof], sf[dof + 1], sf[dof + 2]
        st_d, ct_d, sp_d, cp_d = (sf[dof + 3], sf[dof + 4],
                                  sf[dof + 5], sf[dof + 6])
        bs = offs["basis"]
        uhx, uhy, uhz = sf[bs], sf[bs + 1], sf[bs + 2]
        e1x, e1y, e1z = sf[bs + 3], sf[bs + 4], sf[bs + 5]
        e2x, e2y, e2z = sf[bs + 6], sf[bs + 7], sf[bs + 8]
        whx, why, whz = sf[bs + 9], sf[bs + 10], sf[bs + 11]
        ec_total = sf[offs["ec_total"]]
        ph_bias = sf[offs["bias"]]
        surf_alb = sf[offs["salb"]]

        dshape = (RR, C)
        zf = jnp.zeros(dshape, f32)
        zb = jnp.zeros(dshape, jnp.bool_)
        zi = jnp.zeros(dshape, i32)
        zu = jnp.zeros(dshape, u32)

        cd = spec.cell_depth
        r_outer = rf[nr]
        r_floor = rf[cd]
        if RADIAL:
            kx = [sf[offs["opac"] + m] for m in range(NC)]
            rfloor = sf[offs["rfloor"]]

        # ---- lane-gather tables (loop-invariant (RR, C) broadcasts of the
        # gt rows; Mosaic hoists them out of the pool loop) ----
        gbc = [jnp.broadcast_to(gt[r:r + 1, :], dshape)
               for r in range(lay["_total"])]

        if NPIX > 1:
            # splat one-hot comparands (loop-invariant)
            iota_m = jax.lax.broadcasted_iota(i32, (NRP, C), 0)
            iota_c = jax.lax.broadcasted_iota(i32, (C, C), 0)

        def lane_gather(row0, nch, idx):
            """table[idx] for a table spread over gt rows row0..row0+nch-1."""
            res = zf
            for c_ in range(nch):
                sub = idx - c_ * 128
                g = jnp.take_along_axis(gbc[row0 + c_],
                                        jnp.clip(sub, 0, 127), axis=1)
                res = jnp.where((sub >= 0) & (sub < 128), g, res) \
                    if nch > 1 else g
            return res

        def gat(name, idx, sub=0):
            """Entry ``idx`` of lane table ``name`` (sub-table ``sub``)."""
            row0, nch, _ = lay[name]
            return lane_gather(row0 + sub * nch, nch, idx)

        def mono_count(n, probe):
            """Count of leading True of the monotone predicate ``probe(i)``
            over i in [0, n) — the branchless binary search that replaces
            the O(n) compare-select scans (emissivity CDF, cell healing,
            locate_cell) at realistic grid sizes."""
            if n <= 0:
                return zi
            if n <= 8:
                c_ = zi
                for i in range(n):
                    c_ = c_ + probe(zi + i).astype(i32)
                return c_
            b = 1
            while b * 2 < n:
                b *= 2
            c_ = zi
            while b >= 1:
                t_ = c_ + b
                ok_ = (t_ <= n) & probe(jnp.minimum(t_, n) - 1)
                c_ = jnp.where(ok_, t_, c_)
                b //= 2
            return c_

        def opacity_at(fc):
            if NC == 1:
                return sel_n(lambda i: sf[offs["opac"]], fc, 1)
            return gat("opac", fc)

        def albedo_at(fc):
            if NC == 1:
                return sel_n(lambda i: sf[offs["alb"]], fc, 1)
            return gat("alb", fc)

        def mix_of(fc):
            if nm == 1:
                return zi
            return gat("mix", fc).astype(i32)

        def rf_at(idx, plus=0):
            """rfront[idx+plus] per lane (cell_face faces, heal, emit).

            ``plus`` keeps the nr==1 case a loop-invariant scalar broadcast
            (a dynamic select here would perturb FMA fusion in the quadratic
            solves and break bit-identity with the r3 kernel)."""
            if nr == 1:
                return zf + rf[plus]
            return gat("rf", idx + plus)

        # ---- 3-D jump-walk environment (transport/jumps.py): the same
        # arithmetic as kernel._jump_env, with lane-gather callbacks ----
        if JUMPS3D:
            jenv = JMP.JumpEnv()
            jenv.nr, jenv.NT, jenv.NP = nr, NT, NP
            jenv.a2, jenv.b2, jenv.c2 = a2, b2, c2
            jenv.pos_eps = pos_eps
            jenv.rf = rf
            jenv.rf_floor = rf[cd]
            jenv.kbar = [sf[offs["kbar"] + m] for m in range(nr)]
            jenv.tcos = [sf[offs["tcosf"] + j] for j in range(NT + 1)]
            jenv.theta_faces = [
                (sf[offs["tftan"] + (j - 1)], spec.tcone[j - 1],
                 spec.tabove[j - 1]) for j in range(1, NT)]
            jenv.phi_trig = [(sf[offs["fsin"] + p], sf[offs["fcos"] + p])
                             for p in range(NP)] if NP > 1 else []
            jenv.jfaces = spec.jfaces
            _jpos = {j: s for s, j in enumerate(spec.jfaces)}
            jenv.dr = lambda j, a: gat("drj", a, sub=_jpos[j])
            jenv.dtt = lambda j, idx: gat("dtt", idx, sub=j - 1)
            jenv.dpp = lambda p, idx: gat("dpp", idx, sub=p)
            jenv.dk0 = lambda idx: gat("dkall", idx)
            # band-limited locate: exact within the painted-shell band,
            # masked (False) outside — out-of-band dtt/dpp rows are exact
            # zeros, so this is bit-equal to the XLA kernel's full locate
            m_lo, m_hi = spec.mband
            if m_hi <= m_lo:
                jenv.locate_m = lambda r2: (zi, jnp.zeros(dshape, f32))
            else:
                rf2_lo = sf[offs["rf"] + m_lo] * sf[offs["rf"] + m_lo]
                rf2_hi = sf[offs["rf"] + m_hi] * sf[offs["rf"] + m_hi]
                span = m_hi - 1 - m_lo     # interior band faces

                def _locate_band(r2, _lo=rf2_lo, _hi=rf2_hi, _sp=span,
                                 _ml=m_lo):
                    inb = ((r2 >= _lo) & (r2 < _hi)).astype(f32)
                    if _sp <= 0:
                        return zi + _ml, inb
                    cnt = mono_count(
                        _sp, lambda i: gat("rf", i + (_ml + 1)) ** 2 <= r2)
                    return cnt + _ml, inb

                jenv.locate_m = _locate_band

        # ---- geometry: radial-only cell_face (geometry.py:224-397) ----
        def quadratic(qa, qb, qc):
            disc = qb * qb - 4.0 * qa * qc
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            sgn = jnp.where(qb > 0.0, 1.0, jnp.where(qb < 0.0, -1.0, 0.0))
            q = -0.5 * (qb + sgn * sq)
            q = jnp.where(qb == 0.0, -0.5 * sq, q)
            s1 = jnp.where(ok & (jnp.abs(qa) > 1.0e-30),
                           q / jnp.where(qa == 0.0, 1.0, qa), 0.0)
            s2 = jnp.where(ok & (jnp.abs(q) > 1.0e-30),
                           qc / jnp.where(q == 0.0, 1.0, q), 0.0)
            return s1, s2

        def pick_root(s1, s2, eps):
            v1 = (s1 > eps) & (s1 < BIG)
            v2 = (s2 > eps) & (s2 < BIG)
            return jnp.where(v1 & v2, jnp.minimum(s1, s2),
                             jnp.where(v1, s1, jnp.where(v2, s2, 0.0)))

        def sphere_distance(px, py, pz, dx, dy, dz, r_face, eps):
            qa = a2 * dx * dx + b2 * dy * dy + c2 * dz * dz
            qb = 2.0 * (a2 * px * dx + b2 * py * dy + c2 * pz * dz)
            qc = a2 * px * px + b2 * py * py + c2 * pz * pz - r_face * r_face
            return pick_root(*quadratic(qa, qb, qc), eps)

        def cell_face(px, py, pz, dx, dy, dz, cr, ct, cp, fax, fidx):
            """Full 3-D traversal step (geometry.py cell_face in SoA form):
            oblate radial spheres, theta cones / z=0 plane with nappe
            rejection, phi half-planes with wraparound, two-tier epsilon
            selection and the boundary-pinned rescue."""
            cur_r = fax == 1
            rp0 = rf_at(cr)
            rp1 = rf_at(cr, 1)
            r_in_active = ~(cur_r & (cr == fidx))
            d_r_in = jnp.where(
                r_in_active,
                sphere_distance(px, py, pz, dx, dy, dz, rp0, pos_eps), 0.0)
            r_same = cur_r & (cr == fidx - 1)
            d_r_out = sphere_distance(px, py, pz, dx, dy, dz, rp1,
                                      jnp.where(r_same, spec.same_eps,
                                                pos_eps))

            if NT > 1:
                cur_t = fax == 2

                def tcol(k):
                    return gat("tcombo", ct, sub=k)

                def cone_distance(tan_t, is_cone, above, eps):
                    t2 = tan_t * tan_t
                    qa = a2 * dx * dx + b2 * dy * dy - c2 * dz * dz * t2
                    qb = 2.0 * (a2 * px * dx + b2 * py * dy
                                - c2 * pz * dz * t2)
                    qc = a2 * px * px + b2 * py * py - c2 * pz * pz * t2
                    s1, s2 = quadratic(qa, qb, qc)

                    def nappe_ok(s):
                        z_test = pz + s * dz
                        wrong = ((z_test > 0.0) & ~above) \
                            | ((z_test < 0.0) & above)
                        return jnp.where((s > pos_eps) & wrong, 0.0, s)

                    d_cone = pick_root(nappe_ok(s1), nappe_ok(s2), eps)
                    s_plane = -pz / jnp.where(dz == 0.0, 1.0, dz)
                    return is_cone, d_cone, s_plane

                tan_in, cone_in, above_in = tcol(0), tcol(1) > 0.5, tcol(2) > 0.5
                tan_out, cone_out, above_out = tcol(3), tcol(4) > 0.5, tcol(5) > 0.5
                t_in_same = cur_t & (ct == fidx) & ~above_in
                t_in_active = (ct > 0) & (
                    ~cur_t | (cur_t & (ct == fidx - 1)) | t_in_same)
                ic_in, dc_in, sp_in = cone_distance(
                    tan_in, cone_in, above_in,
                    jnp.where(t_in_same, spec.same_eps, pos_eps))
                d_plane_in = jnp.where((sp_in > 0.0) & (dz > pos_eps),
                                       sp_in, 0.0)
                d_t_in = jnp.where(t_in_active,
                                   jnp.where(ic_in, dc_in, d_plane_in), 0.0)
                t_out_same = cur_t & (ct == fidx - 1) & above_out
                t_out_active = (ct + 1 < NT) & (
                    ~cur_t | (cur_t & (ct == fidx)) | t_out_same)
                ic_out, dc_out, sp_out = cone_distance(
                    tan_out, cone_out, above_out,
                    jnp.where(t_out_same, spec.same_eps, pos_eps))
                d_plane_out = jnp.where((sp_out > 0.0) & (dz < -pos_eps),
                                        sp_out, 0.0)
                d_t_out = jnp.where(t_out_active,
                                    jnp.where(ic_out, dc_out, d_plane_out),
                                    0.0)
            else:
                d_t_in = zf
                d_t_out = zf

            if NP > 1:
                cur_p = fax == 3

                def pcol(k):
                    return gat("pcombo", cp, sub=k)

                def phi_plane(sin_p, cos_p):
                    denom = by * dy * cos_p - ax * dx * sin_p
                    s = (ax * px * sin_p - by * py * cos_p) \
                        / jnp.where(denom == 0.0, 1.0, denom)
                    valid = (jnp.abs(denom) > 0.0) & (s > pos_eps) & (s < BIG)
                    return jnp.where(valid, s, 0.0)

                p_outer_idx = jnp.where(cp + 1 == NP, 0, cp + 1)
                p_inward = cur_p & ((cp == fidx - 1)
                                    | ((cp == NP - 1) & (fidx == 0)))
                p_outward = cur_p & (cp == fidx) & ~p_inward
                d_p_in = jnp.where(~cur_p | p_inward,
                                   phi_plane(pcol(0), pcol(1)), 0.0)
                d_p_out = jnp.where(~cur_p | p_outward,
                                    phi_plane(pcol(2), pcol(3)), 0.0)
            else:
                p_outer_idx = zi
                d_p_in = zf
                d_p_out = zf

            # candidate scan; inactive axes are dropped at trace time so the
            # radial-only kernel keeps its 2-candidate cost. Slot order within
            # the list mirrors geometry.py (in faces first, then out faces).
            ins = [(d_r_in, 1, cr)]
            outs = [(d_r_out, 1, cr + 1)]
            if NT > 1:
                ins.append((d_t_in, 2, ct))
                outs.append((d_t_out, 2, ct + 1))
            if NP > 1:
                ins.append((d_p_in, 3, cp))
                outs.append((d_p_out, 3, p_outer_idx))
            cands = ins + outs
            n_in = len(ins)

            def tier(eps):
                best = jnp.full(dshape, BIG, f32)
                slot = jnp.full(dshape, -1, i32)
                for s_i, (d_c, _, _) in enumerate(cands):
                    d_m = jnp.where(d_c > eps, d_c, BIG)
                    take = d_m < best
                    best = jnp.where(take, d_m, best)
                    slot = jnp.where(take, s_i, slot)
                return best, slot

            dist1, slot1 = tier(spec.sel1)
            dist2, slot2 = tier(spec.sel2)
            fb = dist1 >= BIG
            dist = jnp.where(fb, dist2, dist1)
            slot = jnp.where(fb, slot2, slot1)
            no_cand = dist >= BIG
            dist = jnp.where(no_cand, 0.0, dist)

            # boundary-pinned rescue (geometry.py:347-367)
            rho2 = a2 * px * px + b2 * py * py + c2 * pz * pz
            rad_dot = a2 * px * dx + b2 * py * dy + c2 * pz * dz
            tol = spec.boundary_tol
            on_outer = no_cand & (rho2 >= (r_outer * (1.0 - tol)) ** 2) \
                & (rad_dot > 0.0)
            on_floor = no_cand & ~on_outer \
                & (rho2 <= (r_floor * (1.0 + tol)) ** 2) \
                & (rad_dot < 0.0) & (cr == cd)
            rescued = on_outer | on_floor
            err_nocand = no_cand & ~rescued

            next_ax = zi
            next_idx = zi
            for s_i, (_, ax_i, fi_i) in enumerate(cands):
                hit = slot == s_i
                next_ax = jnp.where(hit, ax_i, next_ax)
                next_idx = jnp.where(hit, fi_i, next_idx)
            next_ax = jnp.where(rescued, 1, next_ax)
            next_idx = jnp.where(on_outer, nr,
                                 jnp.where(on_floor, cd, next_idx))

            # boolean algebra, not where: Mosaic cannot truncate i32 selects
            # to i1 vectors
            outward = (rescued & on_outer) | (~rescued & (slot >= n_in))
            cr_out = jnp.where(next_ax == 1,
                               jnp.where(outward, cr + 1, cr - 1), cr)
            if NT > 1:
                ct_out = jnp.where(next_ax == 2,
                                   jnp.where(outward, ct + 1, ct - 1), ct)
            else:
                ct_out = ct
            if NP > 1:
                cp_next = jnp.where(outward, cp + 1, cp - 1)
                cp_next = jnp.where(cp_next < 0, NP - 1,
                                    jnp.where(cp_next >= NP, 0, cp_next))
                cp_out = jnp.where(next_ax == 3, cp_next, cp)
            else:
                cp_out = cp
            grid_exit = (next_ax == 1) & (next_idx == nr)
            err_degen = cur_r & (fidx == cd) & (next_ax == 1) & (next_idx == cd)
            return dict(distance=dist, next_ax=next_ax, next_idx=next_idx,
                        cr_out=cr_out, ct_out=ct_out, cp_out=cp_out,
                        grid_exit=grid_exit, err_nocand=err_nocand,
                        err_degen=err_degen, error=err_nocand | err_degen)

        def flatc(cr, ct, cp):
            if NT == 1 and NP == 1:
                return cr
            return (cr * NT + ct) * NP + cp

        # Loop-carried booleans are stored as i32 masks: Mosaic cannot
        # legalize vector<i1> carries through scf.yield.
        def b2i(x):
            return x.astype(i32)

        # ---- transport march (kernel.py _march, transport half) ----
        def march(px, py, pz, dx, dy, dz, cr, ct, cp, fax, fidx, tau,
                  active, ctr, k0=None, k1=None, energy=None,
                  flow_acc=None):
            if RADIAL:
                # closed-form shell-chord march (radial.py): loop-free,
                # error-free, consumes no RNG sites — arithmetic shared
                # with kernel.py _march_radial for bit-compatible streams
                mo = RAD.march(a2, b2, c2, rf, kx, rfloor, pos_eps,
                               px, py, pz, dx, dy, dz, tau, active, i32,
                               energy=energy, flow=flow_acc)
                moved = mo["inter"] | mo["surface"]
                return dict(
                    px=jnp.where(moved, px + mo["s_stop"] * dx, px),
                    py=jnp.where(moved, py + mo["s_stop"] * dy, py),
                    pz=jnp.where(moved, pz + mo["s_stop"] * dz, pz),
                    cr=jnp.where(mo["inter"], mo["cr"], cr),
                    ct=ct, cp=cp,
                    fax=jnp.where(mo["inter"], 0, fax),
                    fidx=jnp.where(mo["inter"], 0, fidx),
                    ctr=ctr, tau_run=mo["tau_surf"],
                    refl=zb, rdx=zf, rdy=zf, rdz=zf,
                    inter=mo["inter"], err=zb, e031=zb, e034=zb, e032=zb,
                    exited=mo["exited"])

            if JUMPS3D:
                # exit-PRECHECK (kernel.py _march jumps branch): lanes whose
                # sampled tau exceeds the exact path total exit/absorb
                # without marching — the lockstep loop below is then bounded
                # by interaction depths, not the grid diameter
                w = JMP.tau_walk_jumps(jenv, px, py, pz, dx, dy, dz,
                                       cr, ct, cp)
                no_reach = active & (tau >= w["tau"])
                active = active & ~no_reach
            else:
                no_reach = None

            def cond(c):
                return jnp.any(c["m"] != 0) & (c["it"] < spec.max_crossings)

            def body(c):
                m = c["m"] != 0
                out = cell_face(c["px"], c["py"], c["pz"], dx, dy, dz,
                                c["cr"], c["ct"], c["cp"], c["fax"], c["fidx"])
                d = out["distance"]
                k = opacity_at(flatc(c["cr"], c["ct"], c["cp"]))
                tau_cell = d * k
                interact = c["tau_run"] + tau_cell > tau
                s_int = (tau - c["tau_run"]) / jnp.where(k == 0.0, 1.0, k)
                step = jnp.where(interact, s_int, d)
                hit_surface = ~interact & (out["next_ax"] == 1) \
                    & (out["next_idx"] == cd)
                crossing = m & ~interact
                err = (c["err"] != 0) | (m & out["error"])
                if spec.surface:
                    # Lambert surface (ARTES.f90:755-774, :1369-1402): the
                    # crossing's 3 draw sites decide absorb-vs-reflect and
                    # the cosine-weighted direction; a reflected lane STOPS
                    # here (stage SURF_PEEL next round: surface NEE + march
                    # resumption with the remaining tau budget)
                    u_s, u_l1, u_l2 = R.uniform_n_kk(k0, k1, c["ctr"], 3, f32)
                    absorbed = m & hit_surface & (u_s > surf_alb)
                    reflected = m & hit_surface & ~absorbed & ~out["error"]
                    npx_ = jnp.where(m, c["px"] + step * dx, c["px"])
                    npy_ = jnp.where(m, c["py"] + step * dy, c["py"])
                    npz_ = jnp.where(m, c["pz"] + step * dz, c["pz"])
                    nrx = npx_ * a2
                    nry = npy_ * b2
                    nrz = npz_ * c2
                    inv_nn = 1.0 / jnp.maximum(
                        jnp.sqrt(nrx * nrx + nry * nry + nrz * nrz), 1e-30)
                    lamx, lamy, lamz = direction_cosine(
                        jnp.sqrt(u_l1), TWO_PI * u_l2,
                        nrx * inv_nn, nry * inv_nn, nrz * inv_nn)
                    refl_acc = c["refl"] | b2i(reflected)
                    rdx = jnp.where(reflected, lamx, c["rdx"])
                    rdy = jnp.where(reflected, lamy, c["rdy"])
                    rdz = jnp.where(reflected, lamz, c["rdz"])
                    still = crossing & ~out["grid_exit"] & ~absorbed & ~err \
                        & ~reflected
                    # reflected photon re-enters the cell above the surface
                    # (ARTES.f90:770): cr_out is cd-1 after the inward
                    # crossing, +1 puts it back in cell cd
                    cr_next = jnp.where(reflected, out["cr_out"] + 1,
                                        out["cr_out"])
                else:
                    absorbed = m & hit_surface          # surface_albedo == 0
                    reflected = jnp.zeros(dshape, jnp.bool_)
                    refl_acc, rdx, rdy, rdz = c["refl"], c["rdx"], c["rdy"], c["rdz"]
                    still = crossing & ~out["grid_exit"] & ~absorbed & ~err
                    cr_next = out["cr_out"]
                return dict(
                    refl=refl_acc, rdx=rdx, rdy=rdy, rdz=rdz,
                    px=jnp.where(m, c["px"] + step * dx, c["px"]),
                    py=jnp.where(m, c["py"] + step * dy, c["py"]),
                    pz=jnp.where(m, c["pz"] + step * dz, c["pz"]),
                    cr=jnp.where(crossing, cr_next, c["cr"]),
                    ct=jnp.where(crossing, out["ct_out"], c["ct"]),
                    cp=jnp.where(crossing, out["cp_out"], c["cp"]),
                    fax=jnp.where(crossing, out["next_ax"],
                                  jnp.where(m & interact, 0, c["fax"])),
                    fidx=jnp.where(crossing, out["next_idx"],
                                   jnp.where(m & interact, 0, c["fidx"])),
                    tau_run=c["tau_run"] + jnp.where(crossing, tau_cell, 0.0),
                    inter=c["inter"] | b2i(m & interact),
                    err=b2i(err),
                    e031=c["e031"] | b2i(m & out["err_nocand"]),
                    e034=c["e034"] | b2i(m & out["err_degen"]),
                    exb=c["exb"] | b2i(crossing & out["grid_exit"]
                                       & ~hit_surface),
                    ctr=c["ctr"] + jnp.where(m, u32(3), u32(0)),
                    m=b2i(still),
                    it=c["it"] + 1,
                )

            init = dict(px=px, py=py, pz=pz, cr=cr, ct=ct, cp=cp,
                        fax=fax, fidx=fidx,
                        tau_run=zf, inter=zi, err=zi, e031=zi, e034=zi,
                        exb=zi, refl=zi, rdx=zf, rdy=zf, rdz=zf,
                        ctr=ctr, m=b2i(active), it=jnp.asarray(0, i32))
            o = jax.lax.while_loop(cond, body, init)
            marching = o["m"] != 0
            exited = o["exb"] != 0
            if JUMPS3D:
                exited = exited | (no_reach & w["exited"])
            return dict(px=o["px"], py=o["py"], pz=o["pz"],
                        cr=o["cr"], ct=o["ct"], cp=o["cp"],
                        fax=o["fax"], fidx=o["fidx"], ctr=o["ctr"],
                        tau_run=o["tau_run"],
                        refl=o["refl"] != 0, rdx=o["rdx"], rdy=o["rdy"],
                        rdz=o["rdz"],
                        inter=o["inter"] != 0,
                        err=(o["err"] != 0) | marching,
                        e031=o["e031"] != 0, e034=o["e034"] != 0,
                        e032=marching, exited=exited)

        # ---- peel / prewalk tau walk (the merged-march peel half) ----
        def tau_walk(px, py, pz, dx, dy, dz, cr, ct, cp, fax, fidx, active):
            if RADIAL:
                o = RAD.tau_walk(a2, b2, c2, rf, kx, rfloor, pos_eps,
                                 px, py, pz, dx, dy, dz)
                return dict(tau=o["tau"], exited=o["exited"],
                            surface=o["surface"], err=o["err"])
            if JUMPS3D:
                o = JMP.tau_walk_jumps(jenv, px, py, pz, dx, dy, dz,
                                       cr, ct, cp)
                return dict(tau=o["tau"], exited=o["exited"],
                            surface=o["surface"], err=o["err"])

            def cond(c):
                return jnp.any(c["m"] != 0) & (c["it"] < spec.max_crossings)

            def body(c):
                m = c["m"] != 0
                out = cell_face(c["px"], c["py"], c["pz"], dx, dy, dz,
                                c["cr"], c["ct"], c["cp"], c["fax"], c["fidx"])
                d = out["distance"]
                tau_cell = d * opacity_at(flatc(c["cr"], c["ct"], c["cp"]))
                hit_surface = (out["next_ax"] == 1) & (out["next_idx"] == cd)
                stop = out["grid_exit"] | out["error"] | hit_surface
                return dict(
                    px=jnp.where(m, c["px"] + d * dx, c["px"]),
                    py=jnp.where(m, c["py"] + d * dy, c["py"]),
                    pz=jnp.where(m, c["pz"] + d * dz, c["pz"]),
                    cr=jnp.where(m, out["cr_out"], c["cr"]),
                    ct=jnp.where(m, out["ct_out"], c["ct"]),
                    cp=jnp.where(m, out["cp_out"], c["cp"]),
                    fax=jnp.where(m, out["next_ax"], c["fax"]),
                    fidx=jnp.where(m, out["next_idx"], c["fidx"]),
                    tau=c["tau"] + jnp.where(m, tau_cell, 0.0),
                    exited=c["exited"] | b2i(m & out["grid_exit"]),
                    surface=c["surface"] | b2i(m & hit_surface),
                    err=c["err"] | b2i(m & out["error"]),
                    m=b2i(m & ~stop),
                    it=c["it"] + 1,
                )

            init = dict(px=px, py=py, pz=pz, cr=cr, ct=ct, cp=cp,
                        fax=fax, fidx=fidx,
                        tau=zf, exited=zi, surface=zi, err=zi,
                        m=b2i(active), it=jnp.asarray(0, i32))
            o = jax.lax.while_loop(cond, body, init)
            return dict(tau=o["tau"], exited=o["exited"] != 0,
                        surface=o["surface"] != 0,
                        err=(o["err"] != 0) | (o["m"] != 0))

        # ---- 180-bin matrix interpolation (sampling.matrix_at_angle_deg):
        # two lane-gathers per distinct column (bins r0, r0+1) ----
        def matrix_at(mx, angle_deg):
            t = angle_deg - 0.5
            r0 = jnp.clip(jnp.floor(t).astype(i32), 0, N_ANGLE - 2)
            frac = jnp.clip(t - r0.astype(f32), 0.0, 1.0)
            one_m = 1.0 - frac
            idx = mx * N_ANGLE + r0 if nm > 1 else r0
            cols = []
            for d_ in range(D):
                v0 = gat("mat", idx, sub=d_)
                v1 = gat("mat", idx + 1, sub=d_)
                cols.append(one_m * v0 + frac * v1)
            ent = []
            for rep in spec.scat_reps:
                if rep[0] == "z":
                    ent.append(zf)
                elif rep[0] == "d":
                    ent.append(cols[rep[1]])
                elif rep[0] == "r":
                    ent.append(ent[rep[1]])
                else:
                    ent.append(-ent[rep[1]])
            return ent  # 16 (RR,C) arrays, row-major m[i][j] = ent[4*i+j]

        # ---- Mueller pipeline (mueller.py) ----
        def rotate_cs(si_, sq, su, sv, c2p, s2p):
            qn = c2p * sq + s2p * su
            un = -s2p * sq + c2p * su
            p_in = jnp.sqrt(sq * sq + su * su + sv * sv)
            p_out = jnp.sqrt(qn * qn + un * un + sv * sv)
            nrm = jnp.where(p_out > 0.0,
                            p_in / jnp.where(p_out == 0.0, 1.0, p_out), 1.0)
            return si_, qn * nrm, un * nrm, sv * nrm

        def polarization_rotation(alpha, stokes, ent, dz_, dzn, peeling,
                                  c2b, s2b, beta_sign):
            si_, sq, su, sv = stokes
            salpha = jnp.sqrt(jnp.maximum(1.0 - alpha * alpha, 0.0))
            szn = jnp.sqrt(jnp.maximum(1.0 - dzn * dzn, 0.0))
            denom = salpha * szn
            cb2 = jnp.clip((dz_ - dzn * alpha) / jnp.where(denom == 0.0, 1.0, denom),
                           -1.0, 1.0)
            cb2 = jnp.where(denom == 0.0, 1.0, cb2)
            i1, q1, u1, v1 = rotate_cs(si_, sq, su, sv, c2b, s2b)
            o = [ent[4 * r + 0] * i1 + ent[4 * r + 1] * q1
                 + ent[4 * r + 2] * u1 + ent[4 * r + 3] * v1 for r in range(4)]
            if not peeling:
                nrm = jnp.where(o[0] > 0.0,
                                i1 / jnp.where(o[0] == 0.0, 1.0, o[0]), 0.0)
                o = [x * nrm for x in o]
            c2p2 = 2.0 * cb2 * cb2 - 1.0
            s2p2 = 2.0 * cb2 * jnp.sqrt(jnp.maximum(1.0 - cb2 * cb2, 0.0)) * beta_sign
            return rotate_cs(o[0], o[1], o[2], o[3], c2p2, s2p2)

        def direction_cosine(alpha, beta, dx, dy, dz_):
            sto2 = jnp.maximum(1.0 - dz_ * dz_, 0.0)
            sto = jnp.sqrt(sto2)
            degen = sto < 1.0e-12
            inv = 1.0 / jnp.where(degen, 1.0, sto)
            e1x_ = jnp.where(degen, 1.0, -dz_ * dx * inv)
            e1y_ = jnp.where(degen, 0.0, -dz_ * dy * inv)
            e1z_ = jnp.where(degen, 0.0, sto)
            e2x_ = jnp.where(degen, 0.0, -dy * inv)
            e2y_ = jnp.where(degen, -dz_, dx * inv)
            salpha = jnp.sqrt(jnp.maximum(1.0 - alpha * alpha, 0.0))
            cb = jnp.cos(beta)
            sb = jnp.sin(beta)
            wx = salpha * (cb * e1x_ + sb * e2x_)
            wy = salpha * (cb * e1y_ + sb * e2y_)
            wz = salpha * (cb * e1z_)
            nx = alpha * dx + wx
            ny = alpha * dy + wy
            nz = alpha * dz_ + wz
            inv_n = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
            return nx * inv_n, ny * inv_n, nz * inv_n

        # ---- scattering-angle samplers (sampling.py) ----
        def pint_at(mx, k):
            if nm == 1:
                return sel_n(lambda i: sf[offs["pint"] + k], mx, 1)
            return gat("pint", mx, sub=k)

        def sample_beta(mx, stokes, u1, u2):
            si_, sq, su, sv = stokes
            p11 = pint_at(mx, 0); p12 = pint_at(mx, 1)
            p13 = pint_at(mx, 2); p14 = pint_at(mx, 3)
            a = p11 * si_ + p14 * sv
            b = p12 * sq + p13 * su
            cc = p12 * su - p13 * sq
            a_safe = jnp.where(a == 0.0, 1.0, a)
            target = u1 * a * np.float32(np.pi)
            cum = [a * np.float32(_BETA_BASIS[0, j])
                   + b * np.float32(_BETA_BASIS[1, j])
                   + cc * np.float32(_BETA_BASIS[2, j]) for j in range(17)]
            k_ = zi
            for j in range(1, 16):
                k_ = k_ + (cum[j] < target).astype(i32)
            cum_lo = zf
            cum_hi = zf
            for j in range(17):
                cum_lo = jnp.where(k_ == j, cum[j], cum_lo)
                cum_hi = jnp.where(k_ + 1 == j, cum[j], cum_hi)
            w_ = np.float32(np.pi / 16.0)
            lo = k_.astype(f32) * w_
            hi = lo + w_
            # bracket-edge trig + angle-addition Newton (sampling.py
            # sincos_2beta — shared arithmetic, no transcendentals)
            lo0 = lo
            s2lo = gat("btrig", k_, sub=0)
            c2lo = gat("btrig", k_, sub=1)
            dcum = cum_hi - cum_lo
            beta = lo + w_ * jnp.where(
                dcum > 0.0, (target - cum_lo) / jnp.where(dcum == 0.0, 1.0, dcum), 0.5)
            gp_floor = 1e-12 * jnp.abs(a_safe)
            for _ in range(SAMP._NEWTON_ITERS):
                s2b, c2b = SAMP.sincos_2beta(beta - lo0, s2lo, c2lo)
                g = a * beta + 0.5 * b * s2b + 0.5 * cc * (1.0 - c2b) - target
                gp = a + b * c2b + cc * s2b
                lo = jnp.where(g < 0.0, beta, lo)
                hi = jnp.where(g < 0.0, hi, beta)
                beta_n = beta - g / jnp.maximum(gp, gp_floor)
                bad = (beta_n < lo) | (beta_n > hi) | ~jnp.isfinite(beta_n)
                beta = jnp.where(bad, 0.5 * (lo + hi), beta_n)
            # final trig exactly — see sampling.sample_beta (the in-loop
            # polynomial is compilation-sensitive; the root is not)
            c2b = jnp.cos(2.0 * beta)
            s2b = jnp.sin(2.0 * beta)
            beta = jnp.where(u2 > 0.5, beta + np.float32(np.pi), beta)
            beta = jnp.where(beta >= TWO_PI, np.float32(TWO_PI - 1.0e-10), beta)
            beta = jnp.where(beta <= 0.0, 1.0e-10, beta)
            return beta, c2b, s2b

        def sample_alpha(mx, stokes, c2b, s2b, u3):
            si_, sq, su, sv = stokes
            wts = [si_, c2b * sq + s2b * su, -s2b * sq + c2b * su, sv]
            act = spec.alpha_active

            cum_c = []
            for j in range(N_COARSE + 1):
                if nm == 1:
                    acc = zf
                    for k in act:
                        acc = acc + wts[k] * coarse[k * 16 + j]
                else:
                    acc = zf
                    for ai, k in enumerate(act):
                        acc = acc + wts[k] * gat(
                            "coarse", mx, sub=ai * (N_COARSE + 1) + j)
                cum_c.append(acc)
            target = u3 * cum_c[N_COARSE]
            k1 = zi
            for j in range(1, N_COARSE):
                k1 = k1 + (cum_c[j] < target).astype(i32)

            # fine CDF at the lane's (mixture, coarse-block): one gather per
            # (Stokes row, fine edge) from (n_mix*15)-entry tables
            fidx = mx * N_COARSE + k1 if nm > 1 else k1
            cum_f = []
            for j in range(N_FINE + 1):
                acc = zf
                for ai, k in enumerate(act):
                    acc = acc + wts[k] * gat("fine", fidx,
                                             sub=ai * (N_FINE + 1) + j)
                cum_f.append(acc)
            k2 = jnp.ones(dshape, i32)
            for j in range(1, N_FINE):
                k2 = k2 + (cum_f[j] < target).astype(i32)
            cum_lo = zf
            cum_hi = zf
            for j in range(N_FINE + 1):
                cum_lo = jnp.where(k2 - 1 == j, cum_f[j], cum_lo)
                cum_hi = jnp.where(k2 == j, cum_f[j], cum_hi)
            dcum = cum_hi - cum_lo
            frac = (target - cum_lo) / jnp.where(dcum == 0.0, 1.0, dcum)
            frac = jnp.where(dcum == 0.0, 0.5, frac)
            alpha_deg = (k1 * N_FINE + k2 - 1).astype(f32) + frac
            alpha = jnp.clip(jnp.cos(alpha_deg * np.float32(_DEG)),
                             -1.0 + 1e-10, 1.0 - 1e-10)
            return alpha, alpha_deg

        # ---- detector peel prep (kernel.py _peel_photon_prep) ----
        def peel_prep(px, py, pz, dx, dy, dz, mx, stokes):
            eps = 1.0e-10
            mu = dx * ddx + dy * ddy + dz * ddz
            mu = jnp.clip(mu, -1.0 + eps, 1.0 - eps)
            ent = matrix_at(mx, _acos(mu) * np.float32(1.0 / _DEG))
            denom = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0)) * \
                jnp.sqrt(jnp.maximum(1.0 - dz * dz, 0.0))
            num = (ddz - dz * mu) / jnp.where(denom == 0.0, 1.0, denom)
            cphi = jnp.clip(num, -1.0 + eps, 1.0 - eps)
            flip = (dy * ddx - dx * ddy) > 0.0
            sign = jnp.where(flip, -1.0, 1.0)
            c2b = 2.0 * cphi * cphi - 1.0
            s2b = 2.0 * cphi * jnp.sqrt(jnp.maximum(1.0 - cphi * cphi, 0.0)) * sign
            so = polarization_rotation(mu, stokes, ent, dz, ddz, True,
                                       c2b, s2b, sign)
            # detector Q sign flip (ARTES.f90:4956)
            contrib = (so[0], -so[1], so[2], so[3])
            # image-plane pixel (kernel.py _pixel_index)
            x_im = py * cp_d - px * sp_d
            y_im = pz * st_d - py * ct_d * sp_d - px * ct_d * cp_d
            if spec.nx * spec.ny == 1:
                ix = jnp.floor((x_im + x_max) / (2.0 * x_max))
                iy = jnp.floor((y_im + y_max) / (2.0 * y_max))
                return contrib, ((ix == 0.0) & (iy == 0.0)), zi
            ix = jnp.floor(spec.nx * (x_im + x_max) / (2.0 * x_max)).astype(i32)
            iy = jnp.floor(spec.ny * (y_im + y_max) / (2.0 * y_max)).astype(i32)
            pix_ok = (ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
            return contrib, pix_ok, ix * spec.ny + iy

        # ---- emission (kernel.py _emit) ----
        def emit(k0, k1):
            """Stellar: (pos,). Thermal: (pos, dir, cell, w0)."""
            if not spec.thermal:
                u1, u2 = R.uniform_n_kk(k0, k1, u32(0), 2, f32)
                if spec.crescent:
                    u1 = 0.81 + 0.19 * u1
                r_disk = jnp.sqrt(u1)
                phi_disk = TWO_PI * u2
                d1 = r_disk * jnp.sin(phi_disk)
                d2 = r_disk * jnp.cos(phi_disk)
                depth = jnp.sqrt(jnp.maximum(1.0 - d1 * d1 - d2 * d2, 0.0))
                qx = d1 * e1x + d2 * e2x - depth * whx
                qy = d1 * e1y + d2 * e2y - depth * why
                qz = d1 * e1z + d2 * e2z - depth * whz
                inv_s = (1.0 / ax, 1.0 / by, 1.0 / cz)
                return ((qx * inv_s[0], qy * inv_s[1], qz * inv_s[2]),)
            # thermal: cell from the emissivity CDF, uniform point in cell,
            # isotropic or Gordon-biased direction (kernel.py _emit, planet)
            u_cell, u_r, u_t, u_p, u_a, u_b = R.uniform_n_kk(
                k0, k1, u32(0), 6, f32)
            # keep the birth point off the cell faces (see kernel.py _emit)
            u_r = jnp.clip(u_r, 1.0e-4, 1.0 - 1.0e-4)
            u_t = jnp.clip(u_t, 1.0e-4, 1.0 - 1.0e-4)
            target = u_cell * ec_total
            if NC == 1:
                fc_e = zi
            else:
                # lower_bound on the nondecreasing emissivity CDF
                fc_e = mono_count(NC - 1,
                                  lambda i: gat("ecum", i) < target)
            # flat -> (cr, ct, cp): floor-divide via f32 (exact for
            # fc < 2^23 with the +0.5 midpoint guard; Mosaic has no i32 div)
            if NT == 1 and NP == 1:
                cr_e, ct_e, cp_e = fc_e, zi, zi
            else:
                d1 = NT * NP
                cr_e = jnp.floor((fc_e.astype(f32) + 0.5)
                                 * np.float32(1.0 / d1)).astype(i32)
                rem = fc_e - cr_e * d1
                ct_e = jnp.floor((rem.astype(f32) + 0.5)
                                 * np.float32(1.0 / NP)).astype(i32)
                cp_e = rem - ct_e * NP
            r0 = rf_at(cr_e)
            r1 = rf_at(cr_e, 1)
            r = r0 + u_r * (r1 - r0)
            if NT == 1:
                cos_t = 1.0 - 2.0 * u_t      # theta_cos [1, -1]
            else:
                tc0 = gat("tcos", ct_e)
                tc1 = gat("tcos", ct_e + 1)
                cos_t = tc0 + u_t * (tc1 - tc0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            if NP == 1:
                phi = TWO_PI * u_p
            else:
                pf0 = gat("phif", cp_e)
                pf1 = gat("phif", cp_e + 1)
                phi = pf0 + u_p * (pf1 - pf0)
            e_px = r * sin_t * jnp.cos(phi) / ax
            e_py = r * sin_t * jnp.sin(phi) / by
            e_pz = r * cos_t / cz
            if spec.emission == 1:
                alpha_e = 2.0 * u_a - 1.0
                beta_e = TWO_PI * u_b
                s_e = jnp.sqrt(jnp.maximum(1.0 - alpha_e * alpha_e, 0.0))
                e_d = (s_e * jnp.cos(beta_e), s_e * jnp.sin(beta_e), alpha_e)
                bias_w = 1.0 + 0.0 * u_a
            else:
                # Gordon 1987 upward-biased emission (ARTES.f90:1229-1254)
                bias = ph_bias
                y_b = (1.0 + bias) * jnp.tan(np.float32(np.pi / 2.0) * u_a) \
                    / jnp.sqrt(1.0 - bias * bias)
                cth = jnp.clip((1.0 - y_b * y_b) / (1.0 + y_b * y_b),
                               -1.0, 1.0)
                theta_s = _acos(cth)
                beta_e = TWO_PI * u_b
                rux = e_px * a2
                ruy = e_py * b2
                ruz = e_pz * c2
                inv_n = 1.0 / jnp.sqrt(rux * rux + ruy * ruy + ruz * ruz)
                e_d = direction_cosine(-cth, beta_e,
                                       rux * inv_n, ruy * inv_n, ruz * inv_n)
                sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
                bias_w = (np.float32(np.pi) * sth * (1.0 + bias * cth)) \
                    / (2.0 * jnp.sqrt(1.0 - bias * bias))
            if NC == 1:
                cw = sel_n(lambda i: sf[offs["cw"]], fc_e, 1)
            else:
                cw = gat("cw", fc_e)
            w0 = bias_w / cw
            return ((e_px, e_py, e_pz), e_d, (cr_e, ct_e, cp_e), w0)

        def locate_tp(px_, py_, pz_):
            """(theta, phi) cell of a point (geometry.locate_cell). Phi is
            binned via the _acos polynomial — Mosaic has no arctan2 — which
            only matters within ~1e-7 of a face."""
            if NT == 1 and NP == 1:
                return zi, zi
            x_ = ax * px_
            y_ = by * py_
            z_ = cz * pz_
            r_ = jnp.sqrt(x_ * x_ + y_ * y_ + z_ * z_)
            if NT > 1:
                cth = jnp.clip(z_ / jnp.maximum(r_, 1e-30), -1.0, 1.0)
                # theta_cos is decreasing: (cth < tcos[j]) is monotone in j
                ct_ = mono_count(NT - 1,
                                 lambda j: cth < gat("tcos", j + 1))
            else:
                ct_ = zi
            if NP > 1:
                rxy = jnp.sqrt(jnp.maximum(x_ * x_ + y_ * y_, 1e-30))
                base = _acos(jnp.clip(x_ / rxy, -1.0, 1.0))
                phi_ = jnp.where(y_ >= 0.0, base,
                                 np.float32(TWO_PI) - base)
                cp_ = mono_count(NP - 1,
                                 lambda j: phi_ >= gat("phif", j + 1))
                cp_ = jnp.clip(cp_, 0, NP - 1)
            else:
                cp_ = zi
            return ct_, cp_

        # ---- the pool loop ----
        round_cap = (n_photons // u32(width) + u32(2)) \
            * u32(spec.max_scatter + 4)

        def cond(c):
            return ((c["n_emitted"] < n_photons) | (c["n_active"] > 0)) \
                & (c["round"] < round_cap)

        def body(c):
            stage = c["stage"]
            px, py, pz = c["px"], c["py"], c["pz"]
            dx, dy, dz = c["dx"], c["dy"], c["dz"]
            sI, sQ, sU, sV = c["sI"], c["sQ"], c["sU"], c["sV"]
            ctr, pid = c["ctr"], c["pid"]
            cr, fax, fidx = c["cr"], c["fax"], c["fidx"]
            ct, cp = c["ct"], c["cp"]
            tau_first = c["tau_first"]
            pre_surface = c["pre_surface"] != 0
            n_scat = c["n_scat"]

            # ---- refill dead lanes (rank = row-major exclusive prefix) ----
            dead = stage == STAGE_DEAD
            dead_f = dead.astype(f32)
            within = jnp.dot(dead_f, lt_c[...], preferred_element_type=f32)
            rows = jnp.sum(dead_f, axis=1, keepdims=True)
            row_pre = jnp.dot(lt_r[...], rows, preferred_element_type=f32)
            rank = (within + row_pre).astype(i32).astype(u32)
            remaining = n_photons - c["n_emitted"]
            refill = dead & (rank < remaining)
            pid = jnp.where(refill, id_lo + c["n_emitted"] + rank, pid)
            n_emitted = c["n_emitted"] + jnp.sum(
                refill.astype(i32), dtype=i32).astype(u32)
            k0 = jnp.full(dshape, seed, u32)
            k1 = pid

            em = emit(k0, k1)
            e_px, e_py, e_pz = em[0]
            if spec.thermal:
                (e_dx, e_dy, e_dz), (e_cr, e_ct, e_cp), w0 = \
                    em[1], em[2], em[3]
                flux_em = jnp.sum(jnp.where(refill, w0, 0.0), dtype=f32)
                e_fax, e_fidx = 0, 0
                e_ctr, e_stage = u32(6), STAGE_BIRTH_PEEL
                e_sI = w0
            else:
                e_dx, e_dy, e_dz = uhx, uhy, uhz
                e_cr, w0 = nr - 1, 1.0
                e_ct, e_cp = locate_tp(e_px, e_py, e_pz)
                flux_em = jnp.zeros((), f32)
                e_fax, e_fidx = 1, nr
                e_ctr, e_stage = u32(2), STAGE_PREWALK
                e_sI = 1.0
            px = jnp.where(refill, e_px, px)
            py = jnp.where(refill, e_py, py)
            pz = jnp.where(refill, e_pz, pz)
            dx = jnp.where(refill, e_dx, dx)
            dy = jnp.where(refill, e_dy, dy)
            dz = jnp.where(refill, e_dz, dz)
            sI = jnp.where(refill, e_sI, sI)
            sQ = jnp.where(refill, 0.0, sQ)
            sU = jnp.where(refill, 0.0, sU)
            sV = jnp.where(refill, 0.0, sV)
            cr = jnp.where(refill, e_cr, cr)
            ct = jnp.where(refill, e_ct, ct)
            cp = jnp.where(refill, e_cp, cp)
            fax = jnp.where(refill, e_fax, fax)
            fidx = jnp.where(refill, e_fidx, fidx)
            ctr = jnp.where(refill, e_ctr, ctr)
            tau_first = jnp.where(refill, 0.0, tau_first)
            pre_surface = pre_surface & ~refill
            n_scat = jnp.where(refill, 0, n_scat)
            stage = jnp.where(refill, e_stage, stage)

            live = stage == STAGE_LIVE
            fw = stage == STAGE_FIRST_WALK
            nb1 = stage == STAGE_PREWALK
            nb0 = (stage == STAGE_BIRTH_PEEL) if spec.thermal else None
            surf = (stage == STAGE_SURF_PEEL) if spec.surface else None

            # heal (pos, cell) inconsistencies from f32 tangent-root error
            # (see geometry.heal_cell): triggered by a radial mismatch,
            # relocates all three indices
            rho = jnp.sqrt(a2 * px * px + b2 * py * py + c2 * pz * pz)
            rp0 = rf_at(cr)
            rp1 = rf_at(cr, 1)
            bad = live & ((rho < rp0 - spec.sel1) | (rho > rp1 + spec.sel1))
            if nr > 1:
                # rfront is increasing: (rho >= rf[i]) is monotone in i
                cr_loc = mono_count(nr - 1,
                                    lambda i: rho >= rf_at(i, 1))
                cr = jnp.where(bad, cr_loc, cr)
            if NT > 1 or NP > 1:
                ct_loc, cp_loc = locate_tp(px, py, pz)
                ct = jnp.where(bad, ct_loc, ct)
                cp = jnp.where(bad, cp_loc, cp)

            d0, d1, d2, d3, d4 = R.uniform_n_kk(k0, k1, ctr, 5, f32)

            # ---- LIVE: roulette + reweight + minimum ----
            fc = flatc(cr, ct, cp)
            killed = live & (d0 < fstop)
            alb = albedo_at(fc)
            gamma = jnp.where((alb < 1.0) & (alb > 0.0), alb / (1.0 - fstop), 1.0)
            lsurv0 = live & ~killed
            sI = jnp.where(lsurv0, sI * gamma, sI)
            sQ = jnp.where(lsurv0, sQ * gamma, sQ)
            sU = jnp.where(lsurv0, sU * gamma, sU)
            sV = jnp.where(lsurv0, sV * gamma, sV)
            too_small = lsurv0 & (sI <= pmin)
            live_surv = lsurv0 & ~too_small
            stage = jnp.where(killed | too_small, STAGE_DEAD, stage)

            # ---- LIVE: peel prep + scattering ----
            stokes = (sI, sQ, sU, sV)
            mx = mix_of(fc)
            (pcI, pcQ, pcU, pcV), pix_ok, pix = peel_prep(px, py, pz,
                                                          dx, dy, dz,
                                                          mx, stokes)
            beta, c2b, s2b = sample_beta(mx, stokes, d1, d2)
            alpha, alpha_deg = sample_alpha(mx, stokes, c2b, s2b, d3)
            ndx, ndy, ndz = direction_cosine(alpha, beta, dx, dy, dz)
            ent = matrix_at(mx, alpha_deg)
            beta_sign = jnp.where(beta < np.float32(np.pi), 1.0, -1.0)
            nI, nQ, nU, nV = polarization_rotation(alpha, stokes, ent, dz, ndz,
                                                   False, c2b, s2b, beta_sign)
            sI = jnp.where(live_surv, nI, sI)
            sQ = jnp.where(live_surv, nQ, sQ)
            sU = jnp.where(live_surv, nU, sU)
            sV = jnp.where(live_surv, nV, sV)
            tdx = jnp.where(live_surv, ndx, dx)
            tdy = jnp.where(live_surv, ndy, dy)
            tdz = jnp.where(live_surv, ndz, dz)
            n_scat = n_scat + live_surv.astype(i32)

            # ---- FUSED prewalk (loop-free walks: closed-form radial or
            # 3-D jumps, mirrors kernel.py): the tau walk resolves fresh
            # lanes' prewalk in this round, so they march their forced
            # first interaction immediately — one pool round less ----
            if RADIAL or JUMPS3D:
                pdx = jnp.where(nb1, dx, ddx)
                pdy = jnp.where(nb1, dy, ddy)
                pdz = jnp.where(nb1, dz, ddz)
                peel = tau_walk(px, py, pz, pdx, pdy, pdz, cr, ct, cp,
                                fax, fidx, zb)
                tau_first = jnp.where(nb1, peel["tau"], tau_first)
                pre_surface = (nb1 & peel["surface"]) | (~nb1 & pre_surface)
                fwx = fw | nb1
            else:
                fwx = fw

            # ---- optical depth: sampled (LIVE) / forced-first (FIRST_WALK) ----
            u_tau = jnp.where(live, d4, d0)
            thin = tau_first < 1.0e-6
            fw_drop = fwx & thin & ~pre_surface
            stage = jnp.where(fw_drop, STAGE_DEAD, stage)
            fw_go = fwx & ~fw_drop
            forced = fw_go & ~thin & (tau_first < 50.0)
            one_m_exp = 1.0 - jnp.exp(-tau_first)
            tau = jnp.where(forced,
                            -jnp.log(1.0 - u_tau * one_m_exp),
                            -jnp.log(1.0 - u_tau))
            sI = jnp.where(forced, sI * one_m_exp, sI)
            sQ = jnp.where(forced, sQ * one_m_exp, sQ)
            sU = jnp.where(forced, sU * one_m_exp, sU)
            sV = jnp.where(forced, sV * one_m_exp, sV)
            ctr = ctr + jnp.where(live, u32(5), u32(0)) \
                + jnp.where(fwx, u32(1), u32(0))

            # ---- transport march (SURF lanes resume with their remaining
            # tau budget, consuming no new draw sites) ----
            active_t = live_surv | fw_go
            if spec.surface:
                tau = jnp.where(surf, tau_first, tau)
                active_t = active_t | surf
            if spec.flow:
                # per-shell flow tallies: SUBLANE-reduce each segment's
                # contribution (cheap cross-sublane sum) to a (1, 128)
                # part, COLLECTED per trace-time shell index and folded
                # into the per-component (FR, 128) carry with one concat
                # per component per round (r5; the r4 version ran a
                # (FR, 128) masked select-add per segment — ~2M extra
                # element-ops/round on nr=39). The expensive cross-LANE
                # reduction still happens once at kernel end.
                FR = -(-nr // 8) * 8
                fparts = {k_: {} for k_ in ("g0", "g1", "g2", "t0", "t1")}

                def _fbook(key_, m, w_):
                    part = jnp.sum(w_, axis=0, keepdims=True)    # (1, 128)
                    fparts[key_].setdefault(m, []).append(part)

                class _FlowAccP:
                    def add_g(self, m, wr, wt, wp):
                        _fbook("g0", m, wr)
                        _fbook("g1", m, wt)
                        _fbook("g2", m, wp)

                    def add_t(self, m, col, w_):
                        _fbook(f"t{col}", m, w_)

                m_out = march(px, py, pz, tdx, tdy, tdz, cr, ct, cp, fax,
                              fidx, tau, active_t, ctr, k0, k1,
                              energy=sI, flow_acc=_FlowAccP())
                fz1 = jnp.zeros((1, 128), f32)
                for ki, k_ in enumerate(("g0", "g1", "g2", "t0", "t1")):
                    rows = []
                    for m in range(FR):
                        lst = fparts[k_].get(m)
                        acc = fz1
                        for p_ in (lst or ()):
                            acc = acc + p_ if acc is not fz1 else p_
                        rows.append(acc)
                    sl = slice(ki * FR, (ki + 1) * FR)
                    outfl[sl, :] = outfl[sl, :] \
                        + jnp.concatenate(rows, axis=0)
            else:
                m_out = march(px, py, pz, tdx, tdy, tdz, cr, ct, cp, fax,
                              fidx, tau, active_t, ctr, k0, k1)
            ctr = m_out["ctr"]

            # ---- peel/prewalk walk (scatter peel along det dir; prewalk
            # along the photon's own direction; birth peel along det dir).
            # The FUSED paths already ran it in the block above. ----
            if not (RADIAL or JUMPS3D):
                peel_active = live_surv | nb1
                if spec.thermal:
                    peel_active = peel_active | nb0
                if spec.surface:
                    peel_active = peel_active | surf
                pdx = jnp.where(nb1, dx, ddx)
                pdy = jnp.where(nb1, dy, ddy)
                pdz = jnp.where(nb1, dz, ddz)
                peel = tau_walk(px, py, pz, pdx, pdy, pdz, cr, ct, cp,
                                fax, fidx, peel_active)

            # scatter-peel splat: per-lane accumulators (single pixel) or
            # the in-kernel MXU one-hot splat (multi-pixel).
            # Thermal birth peel (ARTES.f90:4519-4598): Stokes-I only, weight
            # e^-tau/(4 pi) — a lane is either LIVE or BIRTH_PEEL, so both
            # share one record slot, first-only records marked by pix+npix.
            w_peel = jnp.exp(-jnp.minimum(peel["tau"], 500.0))
            ok = live_surv & peel["exited"] & (peel["tau"] < 50.0) \
                & ~peel["err"] & pix_ok
            if spec.thermal:
                ok_b = nb0 & peel["exited"] & (peel["tau"] < 50.0) \
                    & ~peel["err"] & pix_ok
                w_b = w_peel * np.float32(1.0 / (4.0 * np.pi))
                bI = w_b * sI
            if spec.surface:
                # Lambert NEE (ARTES.f90:4600-4708): e^-tau cos(theta)/pi,
                # visible when the outward normal faces the detector
                snx = px * a2
                sny = py * b2
                snz = pz * c2
                inv_sn = 1.0 / jnp.maximum(
                    jnp.sqrt(snx * snx + sny * sny + snz * snz), 1e-30)
                cosang = (snx * ddx + sny * ddy + snz * ddz) * inv_sn
                ok_s = surf & (cosang > 0.0) & peel["exited"] \
                    & (peel["tau"] < 50.0) & ~peel["err"] & pix_ok
                sIc = w_peel * cosang * np.float32(1.0 / np.pi) * sI
            if NPIX > 1:
                # ---- in-kernel MXU one-hot splat (r5) ----
                # Per pool-row: an (NRP, C) detector-row one-hot and a
                # (C, C) column one-hot; all peel features stacked into one
                # A matrix (counts exact bf16, Stokes values hi/lo split,
                # squares single bf16) and routed with ONE MXU dot per
                # pool-row into the VMEM-resident detector rows. Replaces
                # the r3/r4 segmented record stream + XLA one-hot flush,
                # whose HBM one-hot materialisation was the imaging
                # bottleneck (O(record slots x npix) bytes); the dot costs
                # ~2.5 us/round at 625 px, ~14 us at 10201 px (measured,
                # tools/probe_splat.py).
                vI = jnp.where(ok, pcI * w_peel, 0.0)
                cnt0 = ok
                if spec.thermal:
                    vI = vI + jnp.where(ok_b, bI, 0.0)
                    cnt0 = cnt0 | ok_b
                if spec.surface:
                    vI = vI + jnp.where(ok_s, sIc, 0.0)
                    cnt0 = cnt0 | ok_s
                vQ = jnp.where(ok, pcQ * w_peel, 0.0)
                vU = jnp.where(ok, pcU * w_peel, 0.0)
                vV = jnp.where(ok, pcV * w_peel, 0.0)
                vals = (vI, vQ, vU, vV)
                sqs = (vI * vI, vQ * vQ, vU * vU, vV * vV)
                cnt0f = cnt0.astype(f32)
                cntff = ok.astype(f32)
                pe = jnp.where(cnt0, pix, -1)
                pm = pe >> 7            # arithmetic: masked lanes row -1
                pcol = pe - pm * 128
                contrib = None
                for r in range(RR):
                    ohrow = (iota_m == jnp.broadcast_to(
                        pm[r:r + 1, :], (NRP, C))).astype(f32)
                    oht = (iota_c == jnp.broadcast_to(
                        pcol[r:r + 1, :], (C, C))).astype(jnp.bfloat16)
                    parts = [(ohrow * cnt0f[r:r + 1, :]).astype(jnp.bfloat16)]
                    if NCNT == 2:
                        parts.append((ohrow * cntff[r:r + 1, :])
                                     .astype(jnp.bfloat16))
                    resid = []
                    for v in vals:
                        a = ohrow * v[r:r + 1, :]        # exact: 0/1 * f32
                        hi = a.astype(jnp.bfloat16)
                        parts.append(hi)
                        resid.append(a - hi.astype(f32))
                    for _s in range(2, VSPLIT + 1):
                        nxt = []
                        for a in resid:
                            hi = a.astype(jnp.bfloat16)
                            parts.append(hi)
                            nxt.append(a - hi.astype(f32))
                        resid = nxt
                    for q in sqs:
                        parts.append((ohrow * q[r:r + 1, :])
                                     .astype(jnp.bfloat16))
                    A = jnp.concatenate(parts, axis=0)
                    d = jax.lax.dot_general(A, oht, (((1,), (1,)), ((), ())),
                                            preferred_element_type=f32)
                    contrib = d if contrib is None else contrib + d
                # fold the hi/lo split groups back into the value rows
                base = contrib[:NCNT * NRP]
                valrows = contrib[NCNT * NRP:(NCNT + 4) * NRP]
                for s in range(1, VSPLIT):
                    o = (NCNT + 4 * s) * NRP
                    valrows = valrows + contrib[o:o + 4 * NRP]
                sqrows = contrib[(NCNT + 4 * VSPLIT) * NRP:]
                detacc = c["detacc"] + jnp.concatenate(
                    [base, valrows, sqrows], axis=0)
            else:
                vI = jnp.where(ok, pcI * w_peel, 0.0)
                if spec.thermal:
                    vI = vI + jnp.where(ok_b, bI, 0.0)
                if spec.surface:
                    vI = vI + jnp.where(ok_s, sIc, 0.0)
                accI = c["accI"] + vI
                accQ = c["accQ"] + jnp.where(ok, pcQ * w_peel, 0.0)
                accU = c["accU"] + jnp.where(ok, pcU * w_peel, 0.0)
                accV = c["accV"] + jnp.where(ok, pcV * w_peel, 0.0)
                accI2 = c["accI2"] + jnp.where(ok, (pcI * w_peel) ** 2, 0.0)
                if spec.thermal:
                    accI2 = accI2 + jnp.where(ok_b, bI * bI, 0.0)
                if spec.surface:
                    accI2 = accI2 + jnp.where(ok_s, sIc * sIc, 0.0)
                accQ2 = c["accQ2"] + jnp.where(ok, (pcQ * w_peel) ** 2, 0.0)
                accU2 = c["accU2"] + jnp.where(ok, (pcU * w_peel) ** 2, 0.0)
                accV2 = c["accV2"] + jnp.where(ok, (pcV * w_peel) ** 2, 0.0)
                accN = c["accN"] + ok.astype(i32)
                accNI = c["accNI"] + (ok_b.astype(i32) if spec.thermal else 0) \
                    + (ok_s.astype(i32) if spec.surface else 0)

            # ---- birth-peel results -> PREWALK (thermal) ----
            nb0_err = jnp.zeros(dshape, jnp.bool_)
            if spec.thermal:
                nb0_err = nb0 & peel["err"]
                stage = jnp.where(nb0_err, STAGE_DEAD,
                                  jnp.where(nb0, STAGE_PREWALK, stage))

            # ---- prewalk results -> FIRST_WALK (non-fused only; the
            # fused path's nb1 lanes transition through the generic
            # outcome block) ----
            nb1_err = nb1 & peel["err"]
            if not (RADIAL or JUMPS3D):
                tau_first = jnp.where(nb1, peel["tau"], tau_first)
                pre_surface = (nb1 & peel["surface"]) | (~nb1 & pre_surface)
                stage = jnp.where(nb1_err, STAGE_DEAD,
                                  jnp.where(nb1, STAGE_FIRST_WALK, stage))

            # ---- transport outcomes + per-code tallies ----
            terr = m_out["err"] & active_t
            accErr = c["accErr"] + nb1_err.astype(i32) + terr.astype(i32) \
                + nb0_err.astype(i32)
            acc031 = c["acc031"] + (m_out["e031"] & active_t).astype(i32) \
                + nb1_err.astype(i32)
            acc032 = c["acc032"] + (m_out["e032"] & active_t).astype(i32)
            acc034 = c["acc034"] + (m_out["e034"] & active_t).astype(i32)
            accPeel = c["accPeel"] + (peel["err"] & live_surv).astype(i32) \
                + nb0_err.astype(i32)

            # ---- first-class error forensics (r5, VERDICT r4 item 7):
            # each lane keeps a state snapshot of the FIRST error it sees
            # — pure per-lane selects, no cross-pool reductions, no
            # dynamic indexing — harvested as two extra output tiles the
            # host only fetches when the tallies report errors. Replaces
            # the r4 XLA-prefix re-run harvest, which could not dump
            # errors past the prefix or Mosaic-only trajectory flips.
            # Mirrors the XLA ring's fields (kernel.py ERR_RECORD_W):
            # transport errors dump the post-march state, peel/prewalk
            # errors the walk's input state (ARTES.f90:3397-3416). ----
            peel_err_l = peel["err"] & live_surv
            err_new = terr | nb1_err | peel_err_l | nb0_err
            fresh = err_new & (c["ecode"] == 0)
            ecode_now = jnp.where(
                terr,
                jnp.where(m_out["e031"], 31,
                          jnp.where(m_out["e034"], 34, 32)),
                jnp.where(nb1_err, 31, 50))
            esite_now = jnp.where(terr, jnp.where(fw, 1, 0),
                                  jnp.where(nb1_err, 2, 3))
            # packed int fields: [code*8+site]*2^16 + n_scat; cell
            # ((cr+1) + 256*((ct+1) + 128*(cp+1))) and face
            # ((fax+2)*1024 + fidx+2) — the +1/+2 offsets keep negative
            # sentinel values (e.g. cell/face -1 in some error states)
            # round-tripping exactly through the floor-division decode
            epack_now = ((ecode_now * 8 + esite_now) * 65536
                         + jnp.minimum(n_scat, 65535))

            def _esel(post, pre):
                return jnp.where(terr, post, pre)

            ecell_now = (_esel(m_out["cr"], cr) + 1
                         + 256 * (_esel(m_out["ct"], ct) + 1
                                  + 128 * (_esel(m_out["cp"], cp) + 1)))
            eface_now = (_esel(m_out["fax"], fax) + 2) * 1024 \
                + _esel(m_out["fidx"], fidx) + 2
            ecode = jnp.where(fresh, epack_now, c["ecode"])
            epid = jnp.where(fresh, pid, c["epid"])
            ecell = jnp.where(fresh, ecell_now, c["ecell"])
            eface = jnp.where(fresh, eface_now, c["eface"])
            e_f = [jnp.where(fresh, v, c["ef%d" % k]) for k, v in enumerate(
                (_esel(m_out["px"], px), _esel(m_out["py"], py),
                 _esel(m_out["pz"], pz), tdx, tdy, tdz, sI))]

            # thermal energy bookkeeping (ARTES.f90:607, :780, :953)
            if spec.thermal:
                flux_ex = jnp.sum(jnp.where(m_out["exited"] & active_t,
                                            sI, 0.0), dtype=f32)
                accFluxM = c["accFluxM"] + flux_em
                accFluxX = c["accFluxX"] + flux_ex
            else:
                accFluxM = c["accFluxM"]
                accFluxX = c["accFluxX"]

            to_live = active_t & m_out["inter"] & ~m_out["err"]
            stage = jnp.where(active_t,
                              jnp.where(to_live, STAGE_LIVE, STAGE_DEAD), stage)
            if spec.surface:
                refl_new = m_out["refl"] & active_t & ~m_out["err"]
                stage = jnp.where(refl_new, STAGE_SURF_PEEL, stage)
                # depolarize + adopt the Lambert direction; bank the unused
                # tau budget for the resumed march (ARTES.f90:764-772)
                sQ = jnp.where(refl_new, 0.0, sQ)
                sU = jnp.where(refl_new, 0.0, sU)
                sV = jnp.where(refl_new, 0.0, sV)
                tdx = jnp.where(refl_new, m_out["rdx"], tdx)
                tdy = jnp.where(refl_new, m_out["rdy"], tdy)
                tdz = jnp.where(refl_new, m_out["rdz"], tdz)
                tau_first = jnp.where(refl_new, tau - m_out["tau_run"],
                                      tau_first)
            capped = (stage == STAGE_LIVE) & (n_scat >= spec.max_scatter)
            accCap = c["accCap"] + capped.astype(i32)
            stage = jnp.where(capped, STAGE_DEAD, stage)

            out = dict(
                stage=stage, pid=pid, ctr=ctr,
                px=m_out["px"], py=m_out["py"], pz=m_out["pz"],
                dx=tdx, dy=tdy, dz=tdz,
                sI=sI, sQ=sQ, sU=sU, sV=sV,
                cr=m_out["cr"], ct=m_out["ct"], cp=m_out["cp"],
                fax=m_out["fax"], fidx=m_out["fidx"],
                tau_first=tau_first, pre_surface=pre_surface.astype(i32),
                n_scat=n_scat,
                accErr=accErr, acc031=acc031, acc032=acc032,
                acc034=acc034, accPeel=accPeel, accCap=accCap,
                accFluxM=accFluxM, accFluxX=accFluxX,
                n_emitted=n_emitted,
                n_active=jnp.sum((stage != STAGE_DEAD).astype(i32), dtype=i32),
                round=c["round"] + u32(1),
                ecode=ecode, epid=epid, ecell=ecell, eface=eface,
                **{"ef%d" % k: v for k, v in enumerate(e_f)},
            )
            if NPIX > 1:
                out.update(detacc=detacc)
            else:
                out.update(accI=accI, accQ=accQ, accU=accU, accV=accV,
                           accI2=accI2, accQ2=accQ2, accU2=accU2, accV2=accV2,
                           accN=accN, accNI=accNI)
            return out

        init = dict(
            accErr=zi, acc031=zi, acc032=zi, acc034=zi,
            accPeel=zi, accCap=zi,
            accFluxM=jnp.zeros((), f32), accFluxX=jnp.zeros((), f32),
            n_active=jnp.asarray(0, i32),
            round=u32(0),
            ecode=zi, epid=zu, ecell=zi, eface=zi,
            **{"ef%d" % k: zf for k in range(7)},
        )
        init.update(
            stage=zi, pid=zu, ctr=zu,
            px=zf, py=zf, pz=zf,
            dx=zf + 1.0, dy=zf, dz=zf,
            sI=zf, sQ=zf, sU=zf, sV=zf,
            cr=zi, ct=zi, cp=zi, fax=zi, fidx=zi,
            tau_first=zf, pre_surface=zi, n_scat=zi,
            n_emitted=u32(0))
        if NPIX > 1:
            init.update(detacc=jnp.zeros(((NCNT + 8) * NRP, C), f32))
        else:
            init.update(
                accI=zf, accQ=zf, accU=zf, accV=zf,
                accI2=zf, accQ2=zf, accU2=zf, accV2=zf,
                accN=zi, accNI=zi)
        if spec.flow:
            FR0 = -(-nr // 8) * 8
            outfl[...] = jnp.zeros((5 * FR0, 128), f32)

        fin = jax.lax.while_loop(cond, body, init)

        row = jax.lax.broadcasted_iota(i32, (8, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (8, 128), 1)
        outv = jnp.zeros((8, 128), f32)
        floats = ([jnp.sum(fin[k], dtype=f32) for k in
                   ("accI", "accQ", "accU", "accV",
                    "accI2", "accQ2", "accU2", "accV2")]
                  if NPIX == 1 else [jnp.zeros((), f32)] * 8)
        floats += [fin["accFluxM"], fin["accFluxX"]]
        for e, v in enumerate(floats):
            outv = jnp.where((row == 0) & (lane == e), v, outv)
        if spec.flow:
            # final cross-lane reduction of the per-shell partials, once:
            # rows 1-3 (flow_global, m*3+c) and 4-5 (flow_theta, m*2+col)
            FR = -(-nr // 8) * 8
            fl_all = outfl[...]
            for m in range(nr):
                for c_, k_ in enumerate(("g0", "g1", "g2")):
                    idx = m * 3 + c_
                    v = jnp.sum(fl_all[c_ * FR + m:c_ * FR + m + 1],
                                dtype=f32)
                    outv = jnp.where((row == 1 + idx // 128)
                                     & (lane == idx % 128), v, outv)
                for col in range(2):
                    idx = m * 2 + col
                    v = jnp.sum(
                        fl_all[(3 + col) * FR + m:(3 + col) * FR + m + 1],
                        dtype=f32)
                    outv = jnp.where((row == 4 + idx // 128)
                                     & (lane == idx % 128), v, outv)
        outf[...] = outv

        outw = jnp.zeros((8, 128), i32)
        ints = [jnp.sum(fin["accErr"], dtype=i32), jnp.sum(fin["acc031"], dtype=i32),
                jnp.sum(fin["acc032"], dtype=i32), jnp.sum(fin["acc034"], dtype=i32),
                jnp.sum(fin["accPeel"], dtype=i32), jnp.sum(fin["accCap"], dtype=i32),
                (jnp.sum(fin["accN"], dtype=i32)
                 if NPIX == 1 else jnp.asarray(0, i32)),
                fin["n_emitted"].astype(i32), fin["round"].astype(i32),
                ((fin["n_emitted"] >= n_photons)
                 & (fin["n_active"] == 0)).astype(i32),
                (jnp.sum(fin["accNI"], dtype=i32)
                 if NPIX == 1 else jnp.asarray(0, i32))]
        for e, v in enumerate(ints):
            outw = jnp.where((row == 0) & (lane == e), v, outw)
        outi[...] = outw

        if NPIX > 1:
            outd[...] = fin["detacc"]

        # forensics lane snapshots: rows [k*RR, (k+1)*RR) = int field k
        # (packed code/site/n_scat, pid, cell, face) / float field k
        # (pos xyz, dir xyz, Stokes I)
        outei[...] = jnp.concatenate(
            [fin["ecode"], fin["epid"].astype(i32),
             fin["ecell"], fin["eface"]], axis=0)
        outef[...] = jnp.concatenate(
            [fin["ef%d" % k] for k in range(7)], axis=0)

    return kernel


_FN_CACHE: dict = {}


def _get_fn(spec: PallasSpec, width: int, interpret: bool):
    key = (spec, width, interpret)
    if key not in _FN_CACHE:
        kern = _build_kernel(spec, width)
        out_shape = (jax.ShapeDtypeStruct((8, 128), f32),
                     jax.ShapeDtypeStruct((8, 128), i32))
        npix = spec.nx * spec.ny
        if npix > 1:
            nrows = -(-npix // 128)
            nrp = max(-(-nrows // 8) * 8, 8)
            ncnt = 2 if (spec.thermal or spec.surface) else 1
            out_shape += (jax.ShapeDtypeStruct(((ncnt + 8) * nrp, 128), f32),)
        RR = width // 128
        out_shape += (jax.ShapeDtypeStruct((4 * RR, 128), i32),
                      jax.ShapeDtypeStruct((7 * RR, 128), f32))
        if spec.flow:
            FR = -(-spec.nr // 8) * 8
            out_shape += (jax.ShapeDtypeStruct((5 * FR, 128), f32),)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 \
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        # the default 16 MB scoped-VMEM budget is exceeded by ~1% once the
        # 3-D jump-walk diff tables join the broadcast table stack at
        # width 8192; v5e has headroom well beyond the default cap
        params = None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
        call = pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=jax.tree.map(
                lambda _: pl.BlockSpec(memory_space=pltpu.VMEM), out_shape),
            interpret=interpret,
            compiler_params=params,
        )
        _FN_CACHE[key] = jax.jit(call)
    return _FN_CACHE[key]


def _emit_basis_host(tables, spec):
    """:func:`_emit_basis` evaluated on the CPU backend, returned as numpy.

    The basis feeds the SMEM ``sf`` vector; computing it eagerly on the
    default device cost ~a dozen RPC round trips per wavelength through the
    tunneled TPU. Eager-on-CPU reproduces exactly what the parity suite has
    always compared against (tests pin the CPU platform)."""
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        u_hat, e1s, e2s, w_hat = _emit_basis(tables, spec)
        return (np.asarray(u_hat, np.float32), np.asarray(e1s, np.float32),
                np.asarray(e2s, np.float32), np.asarray(w_hat, np.float32))


def _key_hi_host(seed, id_hi) -> np.uint32:
    """Host mirror of :func:`rng.key_hi` (u32 wraparound arithmetic)."""
    return np.uint32((int(seed) + int(id_hi) * 0x9E3779B9) & 0xFFFFFFFF)


def _pack_inputs(tables, spec: PallasSpec, mt: MixTables, n_photons, seed,
                 id_hi=0, id_lo=0):
    """Flatten the concrete tables into the kernel's SMEM / lane-table
    operands, mirroring :func:`_sf_layout` and :func:`_gt_layout`.

    All assembly is HOST-side numpy: the packed operands transfer to the
    device in a handful of uploads when the kernel is dispatched (the r4
    jnp-eager version issued ~30 small device ops per wavelength, each a
    tunneled-RPC round trip)."""
    g = tables.grid
    nr = spec.nr
    nm = spec.n_mix
    ncell = nr * spec.ntheta * spec.nphi
    u_hat, e1s, e2s, w_hat = _emit_basis_host(tables, spec)
    emis_cum = np.broadcast_to(np.asarray(tables.emis_cum, np.float32),
                               (ncell,))
    cell_w = np.broadcast_to(np.asarray(tables.cell_weight, np.float32),
                             (ncell,))
    rfront = np.asarray(g.rfront, np.float32)
    opacity = np.asarray(tables.opacity, np.float32)
    albedo = np.asarray(tables.albedo, np.float32)

    # ---- scalar (SMEM) vector, _sf_layout order ----
    closed = _radial_closed(spec)
    sf = [rfront]
    if closed:
        sf += [opacity.reshape(ncell),
               rfront[int(tables.cell_depth)].reshape(1)]
    elif ncell == 1:
        sf += [opacity.reshape(1)]
    if ncell == 1:
        sf += [albedo.reshape(1),
               cell_w[:1]]
    sf += [np.asarray([tables.fstop, tables.photon_minimum,
                       tables.x_max, tables.y_max], np.float32),
           np.asarray(tables.det_dir, np.float32),
           np.asarray(tables.det_trig, np.float32),
           u_hat, e1s, e2s, w_hat,
           emis_cum[-1:],
           np.asarray(tables.photon_bias, np.float32).reshape(1)]
    if nm == 1:
        sf += [np.asarray(mt.p_int[0], np.float32)]
    sf += [np.asarray(tables.surface_albedo, np.float32).reshape(1)]
    if _jumps3d(spec):
        k3j = opacity.reshape(nr, spec.ntheta, spec.nphi)
        sf += [np.ascontiguousarray(k3j[:, 0, 0]),            # kbar
               np.asarray(g.theta_cos, np.float32)]
        if spec.ntheta > 1:
            tt = np.asarray(g.theta_tan, np.float32)[1:spec.ntheta]
            sf += [tt * tt]
        if spec.nphi > 1:
            sf += [np.asarray(g.phi_sin, np.float32),
                   np.asarray(g.phi_cos, np.float32)]
    sf = np.concatenate(sf)
    assert sf.shape[0] == _sf_layout(spec)["_n"]

    si = np.stack([np.uint32(int(n_photons)), _key_hi_host(seed, id_hi),
                   np.uint32(int(id_lo))])

    prefix = np.asarray(mt.alpha_prefix, np.float32)         # (nm, 4, 181)
    if nm == 1:
        coarse = np.ascontiguousarray(
            prefix[:, :, ::N_FINE]).reshape(-1)              # (4*16,)
    else:
        coarse = np.zeros(4 * (N_COARSE + 1), np.float32)    # gt path
    body = prefix[:, :, :N_ANGLE].reshape(nm, 4, N_COARSE, N_FINE)
    last = prefix[:, :, N_FINE::N_FINE].reshape(nm, 4, N_COARSE, 1)
    fine = np.concatenate([body, last], axis=-1)             # (nm,4,15,13)

    # ---- lane-gather table rows, _gt_layout order ----
    def rows_of(vec, nch):
        vec = np.asarray(vec, np.float32).reshape(-1)
        pad = np.zeros(nch * 128 - vec.shape[0], np.float32)
        return np.concatenate([vec, pad]).reshape(nch, 128)

    lay = _gt_layout(spec)
    nch_m = lay["mat"][1]
    nch_f = lay["fine"][1]
    act = spec.alpha_active
    scat_cols = np.asarray(
        mt.scatter_rows[:, np.asarray(mt.distinct, np.int64)]
        if spec.n_distinct else np.zeros((nm * N_ANGLE, 0)), np.float32)
    gt = [rows_of(scat_cols[:, d], nch_m) for d in range(spec.n_distinct)]
    for ai, k in enumerate(act):
        for j in range(N_FINE + 1):
            gt.append(rows_of(fine[:, k, :, j], nch_f))
    # beta bracket-edge trig (sampling.BETA_EDGE_*, f32-cast of the same
    # f64 master values the XLA kernel takes from)
    gt.append(rows_of(np.asarray(SAMP.BETA_EDGE_SIN2, np.float32), 1))
    gt.append(rows_of(np.asarray(SAMP.BETA_EDGE_COS2, np.float32), 1))
    if nm > 1:
        coarse_t = prefix[:, :, ::N_FINE]                    # (nm, 4, 16)
        for ai, k in enumerate(act):
            for j in range(N_COARSE + 1):
                gt.append(rows_of(coarse_t[:, k, j], lay["coarse"][1]))
        for k in range(4):
            gt.append(rows_of(np.asarray(mt.p_int[:, k], np.float32),
                              lay["pint"][1]))
    if ncell > 1:
        if not closed:
            gt.append(rows_of(opacity, lay["opac"][1]))
        gt.append(rows_of(albedo, lay["alb"][1]))
        if nm > 1:
            gt.append(rows_of(np.asarray(mt.mix, np.float32), lay["mix"][1]))
        if spec.thermal:
            gt.append(rows_of(emis_cum, lay["ecum"][1]))
            gt.append(rows_of(cell_w, lay["cw"][1]))
    if nr > 1:
        gt.append(rows_of(rfront, lay["rf"][1]))
    if spec.ntheta > 1:
        for k in range(6):
            gt.append(rows_of(np.asarray(g.theta_combo)[:, k],
                              lay["tcombo"][1]))
        gt.append(rows_of(g.theta_cos, lay["tcos"][1]))
    if spec.nphi > 1:
        pf = np.arctan2(np.asarray(g.phi_sin, np.float32),
                        np.asarray(g.phi_cos, np.float32))
        pf = np.where(pf < 0.0, pf + np.float32(TWO_PI), pf)
        phifront = np.concatenate([pf, np.asarray([TWO_PI], pf.dtype)])
        for k in range(4):
            gt.append(rows_of(np.asarray(g.phi_combo)[:, k],
                              lay["pcombo"][1]))
        gt.append(rows_of(phifront, lay["phif"][1]))
    if _jumps3d(spec):
        # jump-walk diff tables (same f32 arithmetic as the XLA kernel's
        # trace-time construction: dk = k - k[:, :1, :1], then per-face
        # differences — see kernel._jump_env)
        NT_, NP_ = spec.ntheta, spec.nphi
        k3j = opacity.reshape(nr, NT_, NP_)
        dkj = k3j - k3j[:, :1, :1]
        for j in spec.jfaces:
            gt.append(rows_of((dkj[j] - dkj[j - 1]).reshape(-1),
                              lay["drj"][1]))
        if NT_ > 1:
            for t_ in range(1, NT_):
                gt.append(rows_of((dkj[:, t_, :] - dkj[:, t_ - 1, :])
                                  .reshape(-1), lay["dtt"][1]))
        if NP_ > 1:
            for p_ in range(NP_):
                gt.append(rows_of((dkj[:, :, p_] - dkj[:, :, (p_ - 1) % NP_])
                                  .reshape(-1), lay["dpp"][1]))
        gt.append(rows_of(dkj.reshape(-1), lay["dkall"][1]))
    gt = (np.concatenate(gt, axis=0) if gt
          else np.zeros((1, 128), np.float32))
    assert gt.shape[0] == max(lay["_total"], 1)
    return sf, si, coarse, gt


def _unpack_pool_out(outf, outi, spec=None):
    """Result dict of the pool kernel from its (8,128) output tiles (also
    valid for psum-reduced tiles from a device mesh: every entry is an
    additive tally). ONE device->host round trip: both tiles packed into a
    single I32 array (floats bitcast INTO the int domain — the tunneled
    axon transport canonicalizes f32 payloads, so i32 bit patterns shipped
    as f32 rows come back zeroed; r5). Rows 1-5 of the float tile carry the
    per-shell flow tallies when ``spec.flow``."""
    import jax

    both = jnp.concatenate(
        [jax.lax.bitcast_convert_type(outf[:6], i32), outi[:1]], axis=0)
    host = np.asarray(both)                      # the single fetch
    frows = host[:6].view(np.float32)
    outf = frows[0]
    outi = host[6]
    # splat counts: full scatter-peel counts on every component; thermal
    # birth peels book component 0 only (kernel.py _splat first_only)
    n_full = np.float64(outi[6])
    counts = np.asarray([n_full + outi[10], n_full, n_full, n_full])
    detector = np.stack([outf[:4].astype(np.float64), outf[4:8], counts],
                        axis=-1).reshape(1, 4, 3).astype(np.float32)
    if spec is not None and spec.flow:
        nr = spec.nr
        flow_g = frows[1:4].reshape(-1)[:3 * nr].reshape(nr, 3).copy()
        ft2 = frows[4:6].reshape(-1)[:2 * nr].reshape(nr, 2)
        flow_t = np.zeros((nr, 4), np.float32)
        flow_t[:, :2] = ft2
    else:
        flow_g = np.zeros((1, 3), np.float32)
        flow_t = np.zeros((1, 4), np.float32)
    return {
        "detector": detector,
        "flow_global": flow_g,
        "flow_theta": flow_t,
        "flux_emitted": outf[8],
        "flux_exit": outf[9],
        "n_error": int(outi[0]),
        "error_codes": np.asarray([outi[1], outi[2], outi[3], outi[4]],
                                  np.int64),
        "n_alive_at_cap": int(outi[5]),
        "n_emitted": np.uint32(outi[7]),
        "n_rounds": np.uint32(outi[8]),
    }


def _detector_from_rows(outd, spec):
    """(npix, 4, 3) detector from the in-kernel splat rows (ONE f32 fetch).

    Row groups (each NRP sublanes, pixel p at (p>>7, p&127)):
    [cnt0, (cnt_full,) I, Q, U, V, I2, Q2, U2, V2]. Counts are
    integer-valued f32 (exact to 2^24); component 0 counts include
    first-only events (thermal birth / surface peels) and collapse to one
    row when such events cannot occur, matching kernel.py _splat."""
    npix = spec.nx * spec.ny
    ncnt = 2 if (spec.thermal or spec.surface) else 1
    nrp = outd.shape[0] // (ncnt + 8)
    da = np.asarray(outd, np.float32).reshape(ncnt + 8, nrp * 128)[:, :npix]
    det = np.zeros((npix, 4, 3), np.float32)
    det[:, :, 0] = da[ncnt:ncnt + 4].T
    det[:, :, 1] = da[ncnt + 4:ncnt + 8].T
    det[:, 0, 2] = da[0]
    det[:, 1:, 2] = da[ncnt - 1][:, None]
    return det


def _attach_error_records(res, outei, outef, width, n_dev=1):
    """Decode the in-kernel forensics snapshots into the XLA ring format.

    Each lane carries its FIRST error's state (code/site/n_scat, pid, cell,
    face packed in ``outei``; position/direction/Stokes-I in ``outef``) —
    see the forensics block in ``_build_kernel``. Fetched from the device
    ONLY when the scalar tallies report errors (clean runs pay nothing).
    Rows are ordered by photon id (the chronology proxy across lanes) and
    laid out ring-compatibly for :func:`kernel.order_error_records`, so the
    runner/output plumbing is shared with the XLA kernel unchanged."""
    from artes_tpu.transport.kernel import ERR_RECORD_K, ERR_RECORD_W

    n_err = int(res["n_error"]) + int(np.asarray(res["error_codes"]).sum())
    if n_err == 0:
        res["error_records"] = np.zeros((0, ERR_RECORD_W))
        res["n_error_records"] = 0
        return res
    RR = width // 128
    # mesh runs concatenate per-device tiles along axis 0: regroup fields
    ei = np.asarray(outei).reshape(n_dev, 4, RR * 128).transpose(1, 0, 2) \
        .reshape(4, n_dev * RR * 128).astype(np.int64)
    mask = ei[0] != 0
    ef = np.asarray(outef, np.float64).reshape(n_dev, 7, RR * 128) \
        .transpose(1, 0, 2).reshape(7, n_dev * RR * 128)[:, mask]
    packed = ei[0][mask]
    code = (packed >> 16) // 8
    site = (packed >> 16) % 8
    ns = packed & 0xFFFF
    pid = ei[1][mask].astype(np.uint32).astype(np.float64)
    cr = ei[2][mask] % 256 - 1
    ct = (ei[2][mask] // 256) % 128 - 1
    cp = ei[2][mask] // (256 * 128) - 1
    fax = ei[3][mask] // 1024 - 2
    fidx = ei[3][mask] % 1024 - 2
    rows = np.stack([code, pid, ef[0], ef[1], ef[2], ef[3], ef[4], ef[5],
                     cr, ct, cp, fax, fidx, ef[6], ns, site],
                    axis=1).astype(np.float64)
    rows = rows[np.argsort(rows[:, 1], kind="stable")]
    n = rows.shape[0]
    k = ERR_RECORD_K
    if n <= k:
        rec = rows
    else:               # first-K + ring-of-latest layout (kernel.py)
        rec = np.zeros((2 * k, ERR_RECORD_W))
        rec[:k] = rows[:k]
        for i in range(max(n - k, k), n):
            rec[k + i % k] = rows[i]
    res["error_records"] = rec
    res["n_error_records"] = min(n, 2 * k)
    return res


def run_stream_pallas(tables, static, n_photons, seed, width: int,
                      id_hi=0, id_lo=0, interpret: bool = False):
    """Drop-in for :func:`kernel.run_stream` on supported configs.

    Requires concrete (non-traced) tables — the wrapper specialises the
    kernel on grid shape and scattering-matrix structure eagerly. Multi-pixel
    detectors accumulate in-kernel via the MXU one-hot splat (detector rows
    live in VMEM; see _build_kernel).
    """
    spec, mt = make_spec(tables, static)
    if width % 128 != 0:
        raise ValueError("width must be a multiple of 128")
    sf, si, coarse, gt = _pack_inputs(tables, spec, mt,
                                      n_photons, seed, id_hi, id_lo)
    lt_c = np.tril(np.ones((128, 128), np.float32), -1).T
    lt_r = np.tril(np.ones((width // 128, width // 128), np.float32), -1)
    out = _get_fn(spec, width, interpret)(sf, si, coarse, gt, lt_c, lt_r)
    res = _unpack_pool_out(out[0], out[1], spec)
    ie = 2
    if spec.nx * spec.ny > 1:
        res["detector"] = _detector_from_rows(out[2], spec)
        ie = 3
    # (a trailing raw flow tile may follow the error tiles; the host reads
    # flow from the packed outf rows, so it is ignored here)
    return _attach_error_records(res, out[ie], out[ie + 1], width)


def _device_si(n_photons, seed, id_hi, id_lo, n_dev):
    """(n_dev, 3) u32 per-device [count, key_hi, id_lo]: contiguous id
    sub-ranges of one chunk. The chunk never straddles a 2^32 id boundary
    (runner chunking invariant), so every sub-range shares the hi word and
    the (seed, id) -> stream mapping is independent of device count."""
    n = int(n_photons)
    base, rem = divmod(n, n_dev)
    counts = np.asarray([base + (1 if d < rem else 0)
                         for d in range(n_dev)], np.uint32)
    starts = (np.concatenate([[0], np.cumsum(counts[:-1])])
              + int(id_lo)).astype(np.uint32)
    hi = np.full(n_dev, _key_hi_host(seed, id_hi), np.uint32)
    return np.stack([counts, hi, starts], axis=1)


def _get_mesh_fn(spec: PallasSpec, width: int, interpret: bool, mesh,
                 axis: str):
    """One jitted shard_map program running the pool kernel on every mesh
    device with its own id sub-range, psum-reducing the tally tiles — a
    single compile regardless of device count (committing inputs per device
    would compile the kernel once per placement instead)."""
    key = (spec, width, interpret, mesh, axis, "mesh")
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    import jax
    from functools import partial as _partial
    from jax.sharding import PartitionSpec as P

    fn = _get_fn(spec, width, interpret)
    n_red = 3 if spec.nx * spec.ny > 1 else 2
    n_raw = 3 if spec.flow else 2     # error tiles (+ raw flow tile)

    @jax.jit
    @_partial(jax.shard_map, mesh=mesh,
              in_specs=(P(), P(axis), P(), P(), P(), P()),
              out_specs=(P(),) * n_red + (P(axis),) * n_raw,
              check_vma=False)
    def stepped(sf, si_dev, coarse, gt, lt_c, lt_r):
        out = fn(sf, si_dev[0], coarse, gt, lt_c, lt_r)
        # tallies/detector psum over the mesh; the forensics lane tiles
        # (and the raw flow tile, unused by the host — flow ships in the
        # packed outf rows) stay per-device
        return tuple(jax.lax.psum(o, axis) for o in out[:n_red]) \
            + tuple(out[n_red:])

    _FN_CACHE[key] = stepped
    return stepped


def run_stream_pallas_mesh(tables, static, n_photons, seed, width: int,
                           id_hi=0, id_lo=0, *, mesh,
                           axis_name: str = "photons",
                           interpret: bool = False):
    """Multi-device :func:`run_stream_pallas`: the production pool kernel
    fanned out over a 1-D device mesh along the photon axis.

    Each device runs the SAME compiled kernel on a contiguous sub-range of
    the chunk's photon ids (the id — not the lane — keys the RNG, so the
    result is device-count independent: splat counts bit-equal, moments
    within f32 psum-order noise). The TPU-native analogue of the reference's
    whole-engine OpenMP region (ARTES.f90:534-546) at chip granularity.
    """
    spec, mt = make_spec(tables, static)
    if width % 128 != 0:
        raise ValueError("width must be a multiple of 128")
    n_dev = int(mesh.devices.size)
    sf, _, coarse, gt = _pack_inputs(tables, spec, mt,
                                     n_photons, seed, id_hi, id_lo)
    si_dev = _device_si(n_photons, seed, id_hi, id_lo, n_dev)
    lt_c = np.tril(np.ones((128, 128), np.float32), -1).T
    lt_r = np.tril(np.ones((width // 128, width // 128), np.float32), -1)
    stepped = _get_mesh_fn(spec, width, interpret, mesh, axis_name)
    out = stepped(sf, si_dev, coarse, gt, lt_c, lt_r)
    res = _unpack_pool_out(out[0], out[1], spec)
    ie = 2
    if spec.nx * spec.ny > 1:
        res["detector"] = _detector_from_rows(out[2], spec)
        ie = 3
    return _attach_error_records(res, out[ie], out[ie + 1], width,
                                 n_dev=n_dev)

