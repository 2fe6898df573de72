# -*- coding: utf-8 -*-
"""Per-level decomposition of the f32 HODLR CONSTRUCTION error at large N.

``diag_1e6_precision.py`` bisected the N=1e6 f32 log-likelihood error to
the factor BUILD (quad -5.6e4, logdet -1.16e3 at N=1e6); this script
replicates the ``hodlr_factor`` upward sweep with per-level recording to
locate it: for each level, the SMW-core log-determinant computed by the
f32 build vs the f64 build, the same f32-built core re-slogdet'ed in f64
(isolating slogdet/inv arithmetic from core-ENTRY contamination), the
condition number of the worst core, and the contamination of the
finer-inverse-applied ``T`` factors feeding it.

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_logdet_levels.py [n]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as benchmod

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, np.float64)

    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, _all_lowrank, _block_matrix,
        _batched_cholesky, _cho_solve_lower, _factor_apply_inv,
    )

    st = build_structure(n, min_size=128, rank=12, seed=42, x_sorted=x)
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)])
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    select_aca_pivots(
        kernel.pair_fn, np.asarray(kernel.parameter_vector),
        xpad, valid, st,
    )
    diag_pad = np.ones(st.n_pad)
    diag_pad[:n] = yerr2
    theta = np.asarray(kernel.parameter_vector)
    pair = kernel.pair_fn

    def sweep(dt):
        """Replica of hodlr_factor's upward sweep (unsharded) that
        records per-level cores and T factors."""
        t0 = time.time()
        thj = jnp.asarray(theta, dtype=dt)
        xj = jnp.asarray(xpad, dtype=dt)
        vj = jnp.asarray(valid)
        dj = jnp.asarray(diag_pad, dtype=dt)
        n_pad, m, L = st.n_pad, st.m, st.L
        B = n_pad // m

        xb = xj.reshape(B, m, -1)
        vb = vj.reshape(B, m)

        @jax.jit
        def leaves(th, dd):
            Kb = jax.vmap(
                lambda xa, va: _block_matrix(pair, th, xa, va, xa, va,
                                             st.remat)
            )(xb, vb)
            Kb = Kb + jax.vmap(jnp.diag)(dd.reshape(B, m))
            return _batched_cholesky(Kb)

        Lleaf = leaves(thj, dj)
        leaf_ld = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(Lleaf, axis1=-2, axis2=-1))
        )

        def leaf_solve(X):
            Y = jax.vmap(_cho_solve_lower)(Lleaf, X.reshape(B, m, -1))
            return Y.reshape(X.shape)

        lowrank = jax.jit(
            lambda th: [
                jnp.stack([C, Q], axis=1).reshape(n_pad, lev["c"])
                for lev, (C, Q) in zip(
                    st.levels, _all_lowrank(pair, th, xj, vj, st, dt)
                )
            ]
        )
        Zs = lowrank(thj)
        widths = [Z.shape[1] for Z in Zs]
        Tcat = leaf_solve(jnp.concatenate(Zs, axis=1))
        T = list(jnp.split(Tcat, list(np.cumsum(widths))[:-1], axis=1))

        rec = {"leaf_ld": float(leaf_ld), "cores": [], "lds": [],
               "Ts": [], "Zs": [np.asarray(Z) for Z in Zs]}
        for li in range(L - 1, -1, -1):
            lev = st.levels[li]
            s, p, c = lev["s"], lev["p"], lev["c"]
            Zb = Zs[li].reshape(p, 2, s, c)
            Tb = T[li].reshape(p, 2, s, c)
            P, Q = Zb[:, 0], Zb[:, 1]
            Pt, Qt_ = Tb[:, 0], Tb[:, 1]
            with jax.default_matmul_precision("highest"):
                upper = jnp.einsum("psc,psd->pcd", Q, Qt_)
                lower = jnp.einsum("psc,psd->pcd", P, Pt)
                eye = jnp.eye(c, dtype=dt)
                zero = jnp.zeros((p, c, c), dtype=dt)
                core = jnp.concatenate(
                    [jnp.concatenate([eye + zero, upper], axis=-1),
                     jnp.concatenate([lower, eye + zero], axis=-1)],
                    axis=-2,
                )
                core_inv = jnp.linalg.inv(core)
                _, ld = jnp.linalg.slogdet(core)
            rec["cores"].insert(0, np.asarray(core, dtype=np.float64))
            rec["lds"].insert(0, float(jnp.sum(ld)))
            rec["Ts"].insert(0, np.asarray(T[li]))
            if li > 0:
                X = jnp.concatenate(T[:li], axis=1)
                X = _factor_apply_inv(Zs[li], T[li], core_inv, p, s, c,
                                      X, st.remat, st)
                if li > 1:
                    offs = list(
                        np.cumsum([t.shape[1] for t in T[:li]])
                    )[:-1]
                    T[:li] = list(jnp.split(X, offs, axis=1))
                else:
                    T[0] = X
        rec["sec"] = time.time() - t0
        return rec

    r64 = sweep(jnp.float64)
    print("f64 sweep %.0fs leaf_ld=%.4f" % (r64["sec"], r64["leaf_ld"]),
          flush=True)
    r32 = sweep(jnp.float32)
    print("f32 sweep %.0fs leaf_ld=%.4f (diff %+.4f)"
          % (r32["sec"], r32["leaf_ld"], r32["leaf_ld"] - r64["leaf_ld"]),
          flush=True)

    tot64 = r64["leaf_ld"] + sum(r64["lds"])
    tot32 = r32["leaf_ld"] + sum(r32["lds"])
    print("total logdet: f64 %.4f f32 %.4f (diff %+.4f)"
          % (tot64, tot32, tot32 - tot64), flush=True)
    print(
        "%3s %5s %22s %12s %12s %10s %10s %10s"
        % ("li", "p", "ld_f64 / ld_f32_diff", "ld64(core32)", "cond_max",
           "coreZrel", "Trel", "Zrel")
    )
    for li in range(st.L):
        c64, c32 = r64["cores"][li], r32["cores"][li]
        # slogdet of the f32-computed ENTRIES in f64 arithmetic: if this
        # matches ld_f32, the error is in the entries (contaminated T),
        # not in the f32 inv/slogdet arithmetic
        ld64_of_32 = float(np.sum(np.linalg.slogdet(c32)[1]))
        cond = float(np.max(np.linalg.cond(c64)))
        corerel = float(
            np.linalg.norm(c32 - c64) / np.linalg.norm(c64)
        )
        Trel = float(
            np.linalg.norm(r32["Ts"][li] - r64["Ts"][li])
            / np.linalg.norm(r64["Ts"][li])
        )
        Zrel = float(
            np.linalg.norm(r32["Zs"][li] - r64["Zs"][li])
            / np.linalg.norm(r64["Zs"][li])
        )
        print(
            "%3d %5d %12.4f %+9.4f %12.4f %12.3e %10.2e %10.2e %10.2e"
            % (li, st.levels[li]["p"], r64["lds"][li],
               r32["lds"][li] - r64["lds"][li], ld64_of_32, cond,
               corerel, Trel, Zrel),
            flush=True,
        )


if __name__ == "__main__":
    main()
