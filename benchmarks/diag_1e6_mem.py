# -*- coding: utf-8 -*-
"""Compile-only HBM probe for the N=1e6 two-program bench split.

Lowers and compiles BOTH programs of the bench.py very-large-N path
(factor; solve+refine+gradient) for the exact shipping config, then
prints each program's XLA memory analysis — argument, output and temp
bytes — WITHOUT executing anything. This answers "does it fit in the
v5e's 15.75 G" in one cached compile instead of a full on-chip run
(round 4 burned five runs discovering OOMs one at a time).

Usage::

    python benchmarks/diag_1e6_mem.py [n] [min_size]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from george_tpu.utils import expose_host_cpu
    expose_host_cpu()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    min_size = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from george_tpu import kernels
    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor,
        hodlr_loglike_and_grad_hutchinson,
    )

    dtype = np.float32
    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(0, 1000.0, n))[:, None]
    y = np.sin(0.1 * x[:, 0]) + 0.3 * rng.standard_normal(n)
    yerr2 = 0.09 * np.ones(n)
    kernel = 1.2 * kernels.ExpSquaredKernel(25.0) + 0.3 * (
        kernels.Matern32Kernel(8.0))

    st = build_structure(n, min_size=min_size, rank=12, seed=42, x_sorted=x)
    print("struct: L=%d m=%d n_pad=%d" % (st.L, st.m, st.n_pad), flush=True)
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
                          ).astype(dtype)
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    select_aca_pivots(kernel.pair_fn,
                      np.asarray(kernel.parameter_vector, dtype=dtype),
                      xpad, valid, st)
    diag_pad = np.ones(st.n_pad, dtype=dtype)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad, dtype=dtype)
    r_pad[:n] = y

    pair = kernel.pair_fn
    theta = jnp.asarray(kernel.parameter_vector, dtype=dtype)
    key = jax.random.PRNGKey(0)

    # ShapeDtypeStructs: lower/compile WITHOUT device data
    sds = lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
    xS = jax.ShapeDtypeStruct(xpad.shape, dtype)
    vS = jax.ShapeDtypeStruct(valid.shape, np.bool_)
    dS = jax.ShapeDtypeStruct(diag_pad.shape, dtype)
    rS = jax.ShapeDtypeStruct(r_pad.shape, dtype)
    thS = sds(theta)
    kS = jax.ShapeDtypeStruct(key.shape, key.dtype)

    fac_jit = jax.jit(
        lambda th, x_, v_, d_: hodlr_factor(pair, th, x_, v_, d_, st))

    def report(name, compiled):
        ma = compiled.memory_analysis()
        rec = {
            "program": name,
            "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
            "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
            "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
            "alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
            "peak_est_gib": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
                / 2**30, 3),
        }
        print(json.dumps(rec), flush=True)
        return rec

    print("lowering factor program...", flush=True)
    fac_l = fac_jit.lower(thS, xS, vS, dS)
    print("compiling factor program...", flush=True)
    fac_c = fac_l.compile()
    report("factor", fac_c)

    fac_out = jax.eval_shape(
        lambda th, x_, v_, d_: hodlr_factor(pair, th, x_, v_, d_, st),
        thS, xS, vS, dS)
    factorsS, logdetS = fac_out

    def rest_fn(th, x_, v_, d_, r_, key_, factors, logdet):
        return hodlr_loglike_and_grad_hutchinson(
            pair, th, x_, v_, d_, r_, st, key_,
            num_probes=8, n_real=n, refine_steps=1,
            factors_logdet=(factors, logdet),
        )

    rest_jit = jax.jit(rest_fn, donate_argnums=(6,))
    print("lowering remainder program...", flush=True)
    rest_l = rest_jit.lower(thS, xS, vS, dS, rS, kS, factorsS, logdetS)
    print("compiling remainder program...", flush=True)
    rest_c = rest_l.compile()
    report("remainder", rest_c)

    # the FUSED single program (factor + solves + gradient in one jit):
    # pre-transpose it needed ~16.4 G; the transposed cascade may fit.
    # Knobs for compile-only what-if sweeps:
    fprobes = int(os.environ.get("GEORGE_TPU_MEM_PROBES", 8))
    fchunk = os.environ.get("GEORGE_TPU_MEM_LEAF_CHUNK_MB")
    if fchunk:
        import george_tpu.solvers.hodlr as _h
        _h._LEAF_MATVEC_CHUNK_BYTES = int(fchunk) * 1024 * 1024

    def fused_fn(th, x_, v_, d_, r_, key_):
        return hodlr_loglike_and_grad_hutchinson(
            pair, th, x_, v_, d_, r_, st, key_,
            num_probes=fprobes, n_real=n, refine_steps=1,
        )

    print("lowering fused program...", flush=True)
    fused_l = jax.jit(fused_fn).lower(thS, xS, vS, dS, rS, kS)
    print("compiling fused program...", flush=True)
    try:
        report("fused", fused_l.compile())
    except Exception as e:
        print("fused: compile failed: %s" % str(e)[-200:], flush=True)


if __name__ == "__main__":
    main()
