"""On-device decomposition of the scatter-round cost.

Each piece runs REPS times inside a jitted fori_loop with a carried data
dependency (so XLA cannot hoist or CSE the work), and the wall time is taken
around a single host fetch. This sidesteps both the ~27 ms tunnel RTT and the
useless block_until_ready on the axon platform.
"""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport import geometry as G
from artes_tpu.transport import mueller as M
from artes_tpu.transport import rng as R
from artes_tpu.transport import sampling as S
from artes_tpu.transport.kernel import (_march, _peel_photon_prep, _splat,
                                        flat_cell, start_batch)

dtype = jnp.float32
atm = presets.rayleigh_single_layer(tau=5.0)
cfg = ArtesConfig(); cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
static = _kernel_static(cfg, det, atm, False)
from artes_tpu.transport.tables import build_tables
prep = build_tables(atm, cfg, det, 0, dtype=dtype)
t = prep.tables

W = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

ids = jnp.arange(W, dtype=jnp.uint32)
state, out0 = start_batch(t, static, ids, 0)
_ = float(jnp.sum(out0["detector"]))
pos, dirn, cell, face, stokes = (state["pos"], state["dirn"], state["cell"],
                                 state["face"], state["stokes"])
alive = jnp.ones(W, bool)
keys = R.photon_keys(0, ids)
cf = flat_cell(t.grid, cell)
detector = jnp.zeros((static.nx * static.ny, 4, 3), dtype)
ctr0 = jnp.full((W,), 7, jnp.uint32)


def loop_time(name, body, carry0):
    """body(i, carry) -> carry; time REPS iterations on device."""
    fn = jax.jit(lambda c0: jax.lax.fori_loop(0, REPS, body, c0))
    out = fn(carry0)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # compile fence
    t0 = time.perf_counter()
    out = fn(carry0)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / REPS
    print("%-30s %9.3f ms/round" % (name, 1e3 * dt))
    return dt


# 1. RNG: the 5 per-round draws
def rng_body(i, c):
    s, ctr = c
    us = R.uniform_n(keys, ctr, 5, dtype)
    return (s + us[0] + us[4], ctr + 5)
loop_time("rng 5 draws", rng_body, (jnp.zeros(W, dtype), ctr0))

# 2. beta sampling
p_int_g = G.small_gather(t.p_int, cf)
def beta_body(i, c):
    st, u = c
    beta = S.sample_beta(p_int_g, st, u, 1.0 - u)
    u2 = jnp.abs(jnp.sin(beta)) * 0.998 + 1e-4
    return (st, u2)
u0 = R.uniform(keys, ctr0, dtype)
loop_time("sample_beta", beta_body, (stokes, u0))

# 3. alpha sampling (fused)
def alpha_body(i, c):
    st, u = c
    alpha = S.sample_alpha_fused(t.alpha_prefix, cf, st, u * 6.28, u)
    u2 = jnp.abs(alpha) * 0.998 + 1e-4
    return (st, u2)
loop_time("sample_alpha_fused", alpha_body, (stokes, u0))

# 3b. alpha sampling (old gather form)
def alpha_body_old(i, c):
    st, u = c
    ap = S.gather_alpha_prefix(t.alpha_prefix, cf)
    alpha = S.sample_alpha(ap, st, u * 6.28, u)
    u2 = jnp.abs(alpha) * 0.998 + 1e-4
    return (st, u2)
loop_time("sample_alpha (gather)", alpha_body_old, (stokes, u0))

# 4. direction + matrix + polarization rotation
def rot_body(i, c):
    st, d, a = c
    dn = M.direction_cosine(a, a * 3.0, d)
    sc = S.matrix_at_angle(t.scatter_rows, cf, jnp.arccos(a))
    st2 = M.polarization_rotation(a, a * 3.0, st, sc, d, dn, peeling=False)
    return (st2 * 0.5 + st * 0.5, dn, a)
alpha0 = u0 * 1.8 - 0.9
loop_time("dir+matrix+polrot", rot_body, (stokes, dirn, alpha0))

# 5. peel prep
def peel_body(i, c):
    st, acc = c
    contrib, pix = _peel_photon_prep(t, static, pos, dirn, cell, st)
    return (st, acc + contrib)
loop_time("peel_prep", peel_body, (stokes, jnp.zeros((W, 4), dtype)))

# 6. splat (npix=1)
pix = jnp.zeros((W,), jnp.int32)
def splat_body(i, c):
    det, st = c
    return (_splat(det, pix, st, alive), st)
loop_time("splat npix=1", splat_body, (detector, stokes))

# 7. full march (merged peel), real optical depths
tau0 = -jnp.log(1.0 - u0)
def march_body(i, c):
    p, d, ce, f, st, ctr = c
    m_out, ctr2, peel = _march(t, static, keys, ctr, p, d, ce, f, st, tau0,
                               alive, detector, None, None, merged_peel=True)
    return (jnp.where(m_out["interacted"][:, None], m_out["pos"], pos),
            m_out["dirn"],
            jnp.where(m_out["interacted"][:, None], m_out["cell"], cell),
            jnp.where(m_out["interacted"][:, None], m_out["face"], face),
            st, ctr2)
loop_time("march merged (full)", march_body,
          (pos, dirn, cell, face, stokes, ctr0))

# 8. one cell_face call
def cface_body(i, c):
    p, acc = c
    out = G.cell_face(t.grid, p, dirn, cell, face, t.cell_depth)
    return (p, acc + out["distance"])
loop_time("cell_face x1", cface_body, (pos, jnp.zeros(W, dtype)))
