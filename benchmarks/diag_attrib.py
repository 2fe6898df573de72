# -*- coding: utf-8 -*-
"""Attribute the large-N f32 HODLR likelihood error: COMPRESSION vs
CASCADE, and within compression, kernel-entry rounding vs the f32
normal-equations ridge solve.

``diag_logdet_levels.py`` located the logdet bias in the SMW core
entries fed by contaminated T factors — but T is built FROM the
skeletons, so that doesn't separate "the f32 skeletons define a worse
operator" (compression) from "the f32 sweep corrupts a good operator"
(cascade). This ladder does, by mixing precisions per stage
(rungs patch ``hodlr._all_lowrank``; everything else runs f64):

  A  f64 skeletons + f64 cascade       (truth for this n, rank)
  B  f32 skeletons + f64 cascade       (compression error only)
  C  f64 entries, f32 ridge SOLVE only (normal-equations precision)
  D  f32 everything                    (the shipping f32 CPU path)

If B ~= D, the f32 skeletons ARE the biased operator and the fix
belongs in the interpolation solve (C tells whether solving the ridge
system in f32 — kappa(G) floored at ~1/(100 eps32) — is the mechanism).
If B ~= A, the cascade is the culprit and the fix belongs in the
core/T-factor chain.

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_attrib.py [n]
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
    import george_tpu.solvers.hodlr as H

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, np.float64)
    st = H.build_structure(n, min_size=128, rank=rank, seed=42,
                           x_sorted=x)
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)])
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    H.select_aca_pivots(
        kernel.pair_fn, np.asarray(kernel.parameter_vector), xpad, valid,
        st,
    )
    diag_pad = np.ones(st.n_pad)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad)
    r_pad[:n] = y
    pair = kernel.pair_fn

    orig_lowrank = H._all_lowrank

    def lowrank_f32(pair_fn, theta, xp, vl, struct, dtype):
        out = orig_lowrank(
            pair_fn, theta.astype(jnp.float32), xp.astype(jnp.float32),
            vl, struct, jnp.float32,
        )
        return [(C.astype(dtype), Q.astype(dtype)) for C, Q in out]

    def lowrank_f32solve(pair_fn, theta, xp, vl, struct, dtype):
        """f64 kernel entries; ONLY the ridge interpolation solve in f32
        (replicates the tail of ``_all_lowrank``, hodlr.py:444-465)."""
        flat = struct.flat
        if flat is None:
            return []
        c = flat["c"]
        rp = jnp.asarray(flat["rp_all"])
        cp = jnp.asarray(flat["cp_all"])
        pid = jnp.asarray(flat["pair_of_row"])
        xI, vI = xp[rp], vl[rp]
        xJ, vJ = xp[cp], vl[cp]
        blk = jax.vmap(
            lambda xa, va, xb_, vb_: H._block_matrix(
                pair_fn, theta, xa, va, xb_, vb_, struct.remat)
        )
        M = blk(xI, vI, xJ, vJ)
        # floor the ridge at f32 resolution so the f32 SOLVE below sees
        # the regularization the production f32 path would have
        rf = max(float(struct.ridge_floor or 0.0),
                 float(np.sqrt(np.finfo(np.float32).eps)))
        G = H.ridge_gram(M, rf)

        def ev(th, xa, xb):
            return jax.vmap(
                lambda a, B: jax.vmap(lambda b: pair_fn(th, a, b))(B)
            )(xa, xb)

        def rows_eval(rows, xP, vP):
            rows = jnp.asarray(rows)
            xa, va = xp[rows], vl[rows]
            xb, vb = xP[pid], vP[pid]
            E = ev(theta, xa, xb)
            return jnp.where(va[:, None] & vb, E, 0.0)

        C_flat = rows_eval(flat["rowsC"], xJ, vJ)
        Rt_flat = rows_eval(flat["rowsR"], xI, vI)
        out = []
        ro, po = flat["row_offset"], flat["pair_offset"]
        for li, lev in enumerate(struct.levels):
            s, p = lev["s"], lev["p"]
            C = C_flat[ro[li]:ro[li + 1]].reshape(p, s, c)
            Rt = Rt_flat[ro[li]:ro[li + 1]].reshape(p, s, c)
            Ml = M[po[li]:po[li + 1]]
            Gl = G[po[li]:po[li + 1]]
            rhs = jnp.einsum("pkc,psk->pcs", Ml, Rt)
            Qt32 = jnp.linalg.solve(
                Gl.astype(jnp.float32), rhs.astype(jnp.float32)
            )
            out.append((C, jnp.swapaxes(Qt32.astype(dtype), -1, -2)))
        return out

    def lowrank_f64solve(pair_fn, theta, xp, vl, struct, dtype):
        """f32 kernel entries; ONLY the ridge interpolation solve
        promoted to f64 (the inverse of rung C): isolates the
        normal-equations kappa^2 amplification from entry rounding."""
        flat = struct.flat
        if flat is None:
            return []
        c = flat["c"]
        f32 = jnp.float32
        th32, xp32 = theta.astype(f32), xp.astype(f32)
        rp = jnp.asarray(flat["rp_all"])
        cp = jnp.asarray(flat["cp_all"])
        pid = jnp.asarray(flat["pair_of_row"])
        xI, vI = xp32[rp], vl[rp]
        xJ, vJ = xp32[cp], vl[cp]
        blk = jax.vmap(
            lambda xa, va, xb_, vb_: H._block_matrix(
                pair_fn, th32, xa, va, xb_, vb_, struct.remat)
        )
        M = blk(xI, vI, xJ, vJ)                     # f32 entries
        # the f32-DEFINED ridge system (f32 lam floor!), solved
        # accurately — emulating the DS production path; an f64-eps
        # floor here would leave underflow-range couplings singular
        G = H.ridge_gram(M, struct.ridge_floor).astype(jnp.float64)

        def ev(th, xa, xb):
            return jax.vmap(
                lambda a, B: jax.vmap(lambda b: pair_fn(th, a, b))(B)
            )(xa, xb)

        def rows_eval(rows, xP, vP):
            rows = jnp.asarray(rows)
            xa, va = xp32[rows], vl[rows]
            xb, vb = xP[pid], vP[pid]
            E = ev(th32, xa, xb)
            return jnp.where(va[:, None] & vb, E, 0.0)

        C_flat = rows_eval(flat["rowsC"], xJ, vJ)
        Rt_flat = rows_eval(flat["rowsR"], xI, vI)
        out = []
        ro, po = flat["row_offset"], flat["pair_offset"]
        for li, lev in enumerate(struct.levels):
            s, p = lev["s"], lev["p"]
            C = C_flat[ro[li]:ro[li + 1]].reshape(p, s, c)
            Rt = Rt_flat[ro[li]:ro[li + 1]].reshape(p, s, c)
            Ml = M[po[li]:po[li + 1]].astype(jnp.float64)
            Gl = G[po[li]:po[li + 1]]
            rhs = jnp.einsum("pkc,psk->pcs", Ml,
                             Rt.astype(jnp.float64))
            Qt = jnp.linalg.solve(Gl, rhs)
            out.append((C.astype(dtype),
                        jnp.swapaxes(Qt, -1, -2).astype(dtype)))
        return out

    def run(tag, patch, dtype):
        H._all_lowrank = patch if patch is not None else orig_lowrank
        t0 = time.time()
        thj = jnp.asarray(kernel.parameter_vector, dtype=dtype)
        xj = jnp.asarray(xpad, dtype=dtype)
        vj = jnp.asarray(valid)
        dj = jnp.asarray(diag_pad, dtype=dtype)
        rj = jnp.asarray(r_pad, dtype=dtype)

        @jax.jit
        def ll_fn(th):
            factors, logdet = H.hodlr_factor(pair, th, xj, vj, dj, st)
            z = H.hodlr_solve(factors, st, rj)
            return jnp.dot(rj, z), logdet

        quad, ld = ll_fn(thj)
        quad, ld = float(quad), float(ld)
        ll = -0.5 * (quad + ld + n * np.log(2 * np.pi))
        print("%s quad=%.4f logdet=%.4f ll=%.4f (%.0fs)"
              % (tag, quad, ld, ll, time.time() - t0), flush=True)
        H._all_lowrank = orig_lowrank
        return quad, ld, ll

    rungs = (sys.argv[2] if len(sys.argv) > 2 else "ABCD").upper()
    out = {}
    if "A" in rungs:
        out["A"] = run("A f64/f64           ", None, jnp.float64)
    if "B" in rungs:
        out["B"] = run("B f32skel/f64casc   ", lowrank_f32, jnp.float64)
    if "C" in rungs:
        out["C"] = run("C f32solve/f64else  ", lowrank_f32solve,
                       jnp.float64)
    if "D" in rungs:
        out["D"] = run("D f32/f32           ", None, jnp.float32)
    if "F" in rungs:
        out["F"] = run("F f64ridge/f32else  ", lowrank_f64solve,
                       jnp.float32)
    if "G" in rungs:
        os.environ["GEORGE_TPU_CORE_F64"] = "1"
        out["G"] = run("G f64ridge+f64cores ", lowrank_f64solve,
                       jnp.float32)
        del os.environ["GEORGE_TPU_CORE_F64"]
    if "E" in rungs:
        # the fix candidate: full f32 EXCEPT the core inverse + slogdet,
        # which run in f64 and cast back (GEORGE_TPU_CORE_F64 rung in
        # hodlr_factor) — emulating what a double-single core step
        # would deliver on the chip
        os.environ["GEORGE_TPU_CORE_F64"] = "1"
        out["E"] = run("E f32+f64cores      ", None, jnp.float32)
        del os.environ["GEORGE_TPU_CORE_F64"]
    if "A" in out:
        llA = out["A"][2]
        for tag, k in (("B-A (compression)", "B"),
                       ("C-A (f32 ridge)  ", "C"),
                       ("D-A (full f32)   ", "D"),
                       ("E-A (f64 cores)  ", "E"),
                       ("F-A (f64 ridge)  ", "F"),
                       ("G-A (ridge+cores)", "G")):
            if k in out:
                d = out[k][2] - llA
                print("%s  d_ll=%+.4f  rel=%.3e"
                      % (tag, d, abs(d) / abs(llA)), flush=True)


if __name__ == "__main__":
    main()
