"""Device-mesh distribution of the transport kernel.

The reference's only parallelism is one OpenMP loop over photons with
per-thread detectors reduced serially (ARTES.f90:534-546, :959-975). The
TPU-native equivalent (SURVEY.md section 2.4): the photon population is the
sharded axis of a ``jax.sharding.Mesh``, the atmosphere tables are replicated
per device, and detector/flux tallies are ``psum``-reduced over ICI. Because
photon ids (not batch positions) key the RNG, the result is bitwise
independent of device count.

Wavelengths are an embarrassingly parallel outer loop (``run`` dispatches one
transport per wavelength, ARTES.f90:130-204); multi-host runs shard the
wavelength loop over process index on top of the photon mesh axis.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from artes_tpu.transport.kernel import run_batch


def make_mesh(devices=None, axis_name: str = "photons") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_dispatch(mesh: Mesh, axis_name: str = "photons"):
    """Return a drop-in replacement for ``run_batch`` that shards photons
    across ``mesh`` and psum-reduces every output."""

    def dispatch(tables, static, photon_ids, seed):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P(axis_name), P()),
                 out_specs=P(), check_vma=False)
        def inner(tables, ids, seed_arr):
            out = run_batch(tables, static, ids, seed_arr[0])
            return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), out)

        n_dev = mesh.devices.size
        n = photon_ids.shape[0]
        if n % n_dev:
            pad = n_dev - n % n_dev
            # pad with extra photon ids; their contributions are real photons,
            # so instead pad by repeating the last id with a kill marker is
            # wrong -- callers must size batches divisible by the mesh.
            raise ValueError(f"batch of {n} photons not divisible by {n_dev} devices")
        import jax.numpy as jnp
        return inner(tables, photon_ids, jnp.asarray([seed], jnp.uint32))

    return dispatch


def round_up_batch(n: int, n_dev: int) -> int:
    return ((n + n_dev - 1) // n_dev) * n_dev
