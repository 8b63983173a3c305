"""Micro-benchmark: in-kernel MXU one-hot splat cost per pool round.

Validates the cost model for replacing the segmented record flush with an
in-kernel detector splat: per pool-row (128 lanes), build a (128,128)
column one-hot + an (nrows,128) det-row one-hot, stack F features x 3-way
bf16 split into one A matrix, one MXU dot per pool-row, accumulate a
(F*nrows, 128) f32 detector carry.

Usage: python tools/probe_splat.py [npix ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

i32 = jnp.int32
f32 = jnp.float32
bf16 = jnp.bfloat16

WIDTH = 8192
C = 128
RR = WIDTH // C
N_ROUNDS = 2000


def build(npix, nvals=8, ncnt=2, split=3):
    nrows = -(-npix // 128)

    def kernel(seed_ref, outd, outv):
        nrows_pad = max(-(-nrows // 8) * 8, 8)
        iota_c = jax.lax.broadcasted_iota(i32, (C, C), 0)       # sublane=c
        iota_m = jax.lax.broadcasted_iota(i32, (nrows_pad, C), 0)

        def body(t, carry):
            D, x = carry
            # fake per-lane state: cheap LCG so nothing constant-folds
            x = x * np.uint32(1664525) + np.uint32(1013904223)
            pix = (x >> np.uint32(17)).astype(i32) % npix
            v0 = ((x >> np.uint32(8)).astype(i32).astype(f32)
                  * np.float32(2.0 ** -24))
            m = pix >> 7
            col = pix - m * 128
            contribs = []
            for r in range(RR):
                col_r = col[r:r + 1, :]                          # (1, C)
                m_r = m[r:r + 1, :]
                oht = (iota_c == jnp.broadcast_to(col_r, (C, C)))
                oht = oht.astype(bf16)                           # (c, l)
                ohrow = (iota_m == jnp.broadcast_to(m_r, (nrows_pad, C)))
                ohrow = ohrow.astype(f32)                        # (m, l)
                vrow = v0[r:r + 1, :]
                parts = []
                # count features: exact in bf16, one copy
                for fq in range(ncnt):
                    parts.append((ohrow * (vrow < 0.5 + 0.1 * fq)
                                  .astype(f32)).astype(bf16))
                # value features: 3-way bf16 split
                vals = [vrow * np.float32(1.0 + 0.25 * f) for f in range(nvals)]
                As = [[] for _ in range(split)]
                for v in vals:
                    a = ohrow * v
                    for s in range(split):
                        hi = a.astype(bf16)
                        As[s].append(hi)
                        a = a - hi.astype(f32)
                for s in range(split):
                    parts.extend(As[s])
                A = jnp.concatenate(parts, axis=0)  # ((ncnt+split*nvals)*nrows_pad, C)
                d = jax.lax.dot_general(
                    A, oht, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                contribs.append(d)
            dsum = contribs[0]
            for d in contribs[1:]:
                dsum = dsum + d
            # fold the split groups back together
            g = ncnt * nrows_pad
            step = nvals * nrows_pad
            folded = dsum[:g + step]
            for s in range(1, split):
                folded = jnp.concatenate(
                    [folded[:g],
                     folded[g:] + dsum[g + s * step: g + (s + 1) * step]],
                    axis=0)
            D = D + folded
            return (D, x)

        nrows_pad = max(-(-nrows // 8) * 8, 8)
        F = ncnt + nvals
        seed = seed_ref[0]
        x0 = (jax.lax.broadcasted_iota(jnp.uint32, (RR, C), 0) * np.uint32(128)
              + jax.lax.broadcasted_iota(jnp.uint32, (RR, C), 1)
              + seed)
        D0 = jnp.zeros((F * nrows_pad, C), f32)
        D, _ = jax.lax.fori_loop(0, N_ROUNDS, body, (D0, x0))
        outd[...] = D
        outv[...] = jnp.zeros((8, 128), f32) + jnp.sum(D, dtype=f32)

    nrows_pad = max(-(-nrows // 8) * 8, 8)
    F = ncnt + nvals
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((F * nrows_pad, C), f32),
                   jax.ShapeDtypeStruct((8, 128), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def baseline():
    """Same loop without the splat (LCG only), to subtract loop overhead."""
    def kernel(seed_ref, outv):
        seed = seed_ref[0]
        x0 = (jax.lax.broadcasted_iota(jnp.uint32, (RR, C), 0) * np.uint32(128)
              + jax.lax.broadcasted_iota(jnp.uint32, (RR, C), 1) + seed)

        def body(t, x):
            return x * np.uint32(1664525) + np.uint32(1013904223)

        x = jax.lax.fori_loop(0, N_ROUNDS, body, x0)
        outv[...] = jnp.zeros((8, 128), f32) + jnp.sum(
            (x >> np.uint32(8)).astype(i32).astype(f32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[-1] if isinstance(out, tuple) else out))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / N_ROUNDS


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [625, 2025, 10201]
    seed = np.asarray([1], np.uint32)
    t0 = timeit(jax.jit(baseline()), seed)
    print(f"baseline loop: {t0*1e6:.2f} us/round", flush=True)
    for npix in sizes:
        # production config: 4 values at 3-way (<=2048px) or 2-way split,
        # 4 squares at 1-way bf16, 2 exact count rows
        vsplit = 3 if npix <= 2048 else 2
        fn = jax.jit(build(npix, nvals=4, ncnt=2, split=vsplit))
        fn1 = jax.jit(build(npix, nvals=4, ncnt=0, split=1))  # squares part
        t = timeit(fn, seed)
        t1 = timeit(fn1, seed)
        net = (t - t0) + (t1 - t0)
        print(f"npix={npix}: vals(x{vsplit})+cnts {(t-t0)*1e6:.2f} + "
              f"squares(x1) {(t1-t0)*1e6:.2f} = {net*1e6:.2f} us net",
              flush=True)
