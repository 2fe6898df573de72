# -*- coding: utf-8 -*-
"""Headline benchmark (BASELINE.json metric): GP marginal log-likelihood +
gradient throughput at N=1e5 through the hierarchical (HODLR-class) solver
— the per-step cost of every optimizer/MCMC iteration at scale (reference
call stacks SURVEY.md §3.2-3.3).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Usage::

    python bench.py [n] [variant]

``variant``:

* ``smooth`` (default) — ExpSquared + Matern32, the headline workload;
* ``qp`` — the genuinely quasi-periodic BASELINE config #3 kernel
  (ExpSquared x ExpSine2, period 3.7), a harder compression target that
  needs the kernel-adaptive ACA skeletons at a higher rank.

Every (n, variant) with a recorded CPU-f64 truth value enforces an
accuracy anchor before timing — a fast-but-wrong configuration fails
instead of reporting.

``vs_baseline`` is measured against the driver-set north-star target
(N=1e6 HODLR log-lik+grad < 1 s/eval, BASELINE.md), scaled to the
benchmarked N by the O(N log^2 N) cost model the reference documents for
HODLR (``docs/user/solvers.rst``): vs_baseline > 1 means beating the
target at this N.
"""

import json
import os
import sys
import time

import numpy as np


def _throughput(fn, thetas, repeats=3):
    """Pipelined seconds/eval: queue all evaluations (distinct parameter
    vectors, as an optimizer/sampler does), sync once. This measures
    device throughput rather than per-dispatch round-trip latency.
    Returns ``(best, all_times)`` — the spread is recorded so a
    degraded-tunnel run is visible in the artifact instead of silently
    shipping as the round's headline (round 4: a 25% low driver number
    with no spread to flag it)."""
    import jax

    jax.block_until_ready(fn(thetas[0]))  # compile / warm up
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(th) for th in thetas]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / len(thetas))
    return min(times), times


def target_seconds(n):
    """North-star (1 s at N=1e6) scaled by N log2(N)^2."""
    cost = lambda m: m * np.log2(m) ** 2
    return 1.0 * cost(n) / cost(1e6)


# CPU-f64 truth anchors per (variant, n): value, relative tolerance.
# Values from rank-96 (1e5) / rank-64 (1e6) float64 HODLR factorizations
# of the exact seeded datasets below (skeleton-truncation cross-checks:
# qp 1e5 |rank64 - rank96| = 3.3e-7 relative; smooth 1e6
# |rank48 - rank64| = 3.5e-9). Tolerances sit ~2x above the measured
# on-chip f32 floor — tight enough that the round-1 bf16 matmul bug
# (9e-2) or any precision regression fails loudly.
_TRUTH = {
    ("smooth", 100_000): (-23484.7706, 2e-3),
    ("qp", 100_000): (-6669.998996, 5e-3),
    ("smooth", 1_000_000): (-217929.3465, 5e-3),
}

# Physical throughput cross-checks (evals/s) from banked per-stage
# profiles of the same program on an undegraded tunnel — used only to
# decide whether to re-measure once, never to replace the measurement.
_EXPECTED = {
    ("smooth", 100_000): 23.3,   # results_r04/profile_1e5.out stage sum
}


def _dataset(variant, n, dtype):
    """Seeded benchmark datasets; MUST stay bit-compatible with the truth
    anchors above (same rng stream, same kernel constructors)."""
    from george_tpu import kernels

    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(0, 1000.0, n))[:, None]
    if variant == "smooth":
        # smooth decaying 1-D workload (the headline metric): ExpSquared
        # + Matern32 — easy rank-12 compression, our throughput target
        y = np.sin(0.1 * x[:, 0]) + 0.3 * rng.standard_normal(n)
        yerr2 = 0.09 * np.ones(n)
        kernel = 1.2 * kernels.ExpSquaredKernel(25.0) + 0.3 * (
            kernels.Matern32Kernel(8.0)
        )
        rank = 12
    else:
        # the genuinely quasi-periodic BASELINE config #3 kernel: an
        # oscillatory covariance whose off-diagonal blocks have
        # intrinsic rank ~35 — the workload the kernel-adaptive ACA
        # pivots exist for (geometric FPS pivots fail at any rank here)
        y = (np.sin(2 * np.pi * x[:, 0] / 3.7) * np.cos(0.13 * x[:, 0])
             + 0.25 * rng.standard_normal(n))
        yerr2 = 0.0625 * np.ones(n)
        kernel = 1.0 * kernels.ExpSquaredKernel(20.0) * (
            kernels.ExpSine2Kernel(gamma=1.0, log_period=np.log(3.7))
        )
        rank = 48
    return kernel, x, y, yerr2, rank


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the hierarchical graph is large (the level
    # sweep unrolls), so cache across bench invocations.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    # Expose a host CPU backend next to the accelerator so setup-time
    # numerics that are precision-sensitive (the ACA pivot argmax walk —
    # see select_aca_pivots) run in host arithmetic. Must happen before
    # any backend initializes; keep the accelerator first so it stays
    # the default.
    try:
        plats = jax.config.jax_platforms
        if plats and "cpu" not in plats:
            jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass

    if len(sys.argv) > 1:
        n = int(sys.argv[1])
    else:
        # headline N on an accelerator; a tractable size on CPU-only hosts
        n = 100_000 if jax.default_backend() != "cpu" else 20_000
    variant = sys.argv[2] if len(sys.argv) > 2 else "smooth"
    if variant not in ("smooth", "qp"):
        raise SystemExit("variant must be 'smooth' or 'qp'")

    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor, hodlr_solve,
        hodlr_loglike_and_grad_hutchinson,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    use_f64 = (not on_tpu) and jax.config.jax_enable_x64
    dtype = np.float64 if use_f64 else np.float32
    kernel, x, y, yerr2, rank = _dataset(variant, n, dtype)
    rank = int(os.environ.get("GEORGE_TPU_BENCH_RANK", rank))

    # min_size=128/rank=12 with ACA skeletons won the round-2 config sweep
    # for the smooth variant: 3e-8 relative log-likelihood / 1.2e-5
    # gradient error vs a rank-64 f64 reference (the kernel-adaptive
    # pivots buy back the accuracy the lower rank gives up). The
    # quasi-periodic variant needs rank 48 (intrinsic block rank ~35).
    #
    # At very large N the f32 SMW cascade is depth-limited, not
    # rank-limited: the T-update chain amplifies rounding with O(1) gain
    # per level (round-4 ladder: clean at L<=11, chaotic at L=13 — CPU
    # f32 1.3e-1, on-chip solve residual 9.0; f64-promoting the ridge or
    # core solves does NOT fix it). min_size=256 keeps N=1e6 at L=11 —
    # inside the measured-clean regime (CPU-f32 predictor: rel 4.0e-4
    # with refine=1, round 5) — and halves every leaf buffer vs the
    # min_size=512/L=10 config, whose FACTOR program alone needed
    # 18.8 G against the v5e's 15.75 G (round-5 compile-only probe).
    min_size = int(os.environ.get(
        "GEORGE_TPU_BENCH_MIN_SIZE",
        256 if (n >= 500_000 and not use_f64) else 128,
    ))
    st = build_structure(n, min_size=min_size, rank=rank, seed=42,
                         x_sorted=x)
    layout_env = os.environ.get("GEORGE_TPU_BENCH_LAYOUT")
    if layout_env in ("row", "t"):
        st.transposed = layout_env == "t"
    # kernel-adaptive skeletons (same default as HODLRSolver): tighter
    # compression per rank than geometric FPS pivots, selected once here
    # and reused across every theta evaluation below
    xpad_piv = np.concatenate(
        [x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
    ).astype(dtype)
    valid_piv = np.zeros(st.n_pad, dtype=bool)
    valid_piv[:n] = True
    select_aca_pivots(
        kernel.pair_fn,
        np.asarray(kernel.parameter_vector, dtype=dtype),
        xpad_piv, valid_piv, st,
    )
    xpad = np.concatenate(
        [x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
    ).astype(dtype)
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    diag_pad = np.ones(st.n_pad, dtype=dtype)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad, dtype=dtype)
    r_pad[:n] = y

    pair = kernel.pair_fn
    xj = jnp.asarray(xpad)
    vj = jnp.asarray(valid)
    dj = jnp.asarray(diag_pad)
    rj = jnp.asarray(r_pad)
    theta = jnp.asarray(kernel.parameter_vector, dtype=dtype)

    def make_vag():
        # build + jit the evaluation (single precision mode: ``highest``
        # is the measured optimum — see the precision note below)
        force_hutch = os.environ.get("GEORGE_TPU_BENCH_HUTCH") == "1"
        if n < 100_000 and not force_hutch:
            # small N: exact autodiff gradient — one reverse sweep of
            # the factorization, free of Monte-Carlo noise.
            def loglike(th):
                factors, logdet = hodlr_factor(pair, th, xj, vj, dj, st)
                z = hodlr_solve(factors, st, rj)
                return -0.5 * (
                    jnp.dot(rj, z) + logdet + n * jnp.log(2.0 * jnp.pi)
                )

            return jax.jit(jax.value_and_grad(loglike))
        # N >= 1e5: Hutchinson gradient on the TRANSPOSED cascade — the
        # reference's own large-N gradient (Regime B, ``gp.py:506-562``,
        # nvec~10 probes) built forward-mode from one factorization.
        # Measured round 5 (same serving window): 49.3 ms/eval vs
        # 56.8 ms for exact-reverse/row at N=1e5, with a BETTER ll
        # anchor (5.9e-4 vs 6.8e-4) — the reverse sweep through the
        # row cascade was the single largest stage, and the transposed
        # layout keeps every solve/probe buffer unpadded.
        st.transposed = True
        # the very-large-N regime: exact quadratic terms + Hutchinson
        # traces (the reference's own large-N gradient, Regime B
        # ``gp.py:506-562`` with nvec=10 probes) built from one
        # factorization, a multi-RHS solve and a single theta-batched
        # jacfwd matvec pass — the only path whose reverse-sweep memory
        # survives N >= 3e5.
        key = jax.random.PRNGKey(0)
        # f32 on-chip: one step of iterative refinement on the solves —
        # at N=1e6 the raw f32 cascade's forward error puts the
        # log-likelihood 1.1e-2 off truth (quad term +5.2e-3 relative)
        # while one matvec+resolve step brings it back under the anchor
        refine = 0 if use_f64 else 1

        if n <= 300_000:
            def vag_fn(th):
                return hodlr_loglike_and_grad_hutchinson(
                    pair, th, xj, vj, dj, rj, st, key,
                    num_probes=8, n_real=n, refine_steps=refine,
                )

            return jax.jit(vag_fn)

        # N=1e6 class: ONE fused program (factor + solves + gradient)
        # needs ~16.4 G HBM against the v5e's 15.75 G however its temps
        # are chunked (round-4 OOM ladder). Two programs bound the peak
        # at max(factor, remainder) instead of the sum; the factor
        # pytree, the data arrays AND the PRNG key move between them as
        # device ARGUMENTS — a closed-over device array becomes an MLIR
        # constant at lowering time, which both bloats the proto over
        # the remote-compile tunnel and forces a device->host fetch
        # mid-trace (measured round 4: RESOURCE_EXHAUSTED at rest-trace
        # time — the captured ``key`` fetch surfaced the async error
        # with the factors resident). Donating the factor pytree lets
        # the remainder program reuse its ~5 G for temps instead of
        # holding input and scratch simultaneously.
        fac_jit = jax.jit(
            lambda th, x_, v_, d_: hodlr_factor(pair, th, x_, v_, d_,
                                                st)
        )

        def rest_fn(th, x_, v_, d_, r_, key_, factors, logdet):
            return hodlr_loglike_and_grad_hutchinson(
                pair, th, x_, v_, d_, r_, st, key_,
                num_probes=8, n_real=n, refine_steps=refine,
                factors_logdet=(factors, logdet),
            )

        rest_jit = jax.jit(rest_fn, donate_argnums=(6,))

        def vag_fn(th):
            factors, logdet = fac_jit(th, xj, vj, dj)
            return rest_jit(th, xj, vj, dj, rj, key, factors, logdet)

        return vag_fn

    def check_anchor(ll0):
        """Accuracy anchor: CPU f64 truth for this exact dataset. Guards
        against a fast-but-wrong kernel or precision regression ever
        producing the headline number (the round-1 bf16-matmul bug this
        catches was 9e-2)."""
        if not np.isfinite(float(ll0)):
            raise RuntimeError("non-finite log-likelihood in benchmark")
        anchor = _TRUTH.get((variant, n))
        if anchor is None:
            return True
        truth, tol = anchor
        rel = abs(float(ll0) - truth) / abs(truth)
        if rel > tol:
            raise RuntimeError(
                "benchmark log-likelihood off truth by %.2e > %.0e "
                "(ll=%.3f, truth=%.3f)" % (rel, tol, float(ll0), truth)
            )
        return True

    # Precision: ``highest`` everywhere is the measured optimum on a
    # v5e — the GEORGE_TPU_MATMUL_PRECISION=high tier (3-pass bf16,
    # conditioning-critical blocks pinned to full f32 inside the solver)
    # measured BOTH slower and less accurate on the N=1e5 anchor
    # (round 4 on-chip: 18.5 evals/s at 1.51e-3 vs 23.7 evals/s at
    # ~9e-4) — at skeleton rank 12 these contractions are bandwidth/
    # overhead-bound, not MXU-pass-bound, so fewer bf16 passes buy
    # nothing and the mode boundary costs fusion. The env knob remains
    # for experiments; every timed run is anchor-gated either way.
    vag = make_vag()
    # the remote-compile tunnel intermittently drops the connection
    # mid-upload on the large unrolled programs ("response body closed
    # before all bytes were read" — round-4/5 killed several runs);
    # retrying recompiles from scratch and typically succeeds
    for attempt in range(3):
        try:
            ll0, _ = vag(theta)
            break
        except Exception as e:  # pragma: no cover - tunnel flake
            msg = str(e)
            if attempt < 2 and ("remote_compile" in msg
                                or "INTERNAL" in msg):
                sys.stderr.write(
                    "bench: remote compile dropped; retrying (%d)\n"
                    % (attempt + 1))
                time.sleep(10)
                continue
            raise
    check_anchor(ll0)

    # 16 queued evaluations: samplers/optimizers pipeline far more steps
    # than this, so the residual per-dispatch overhead (<2%) is realistic
    thetas = [theta + 1e-5 * k for k in range(16)]
    best, times = _throughput(vag, thetas)

    # Tunnel-degradation guard: the banked per-stage profile of this
    # exact N=1e5 program sums to 42.9 ms/eval (benchmarks/profile_1e5.py,
    # results_r04/profile_1e5.out) => ~23.3 evals/s. The serving tunnel
    # degrades for hours at a time; when the measurement lands >30% off
    # that physical cross-check, re-measure once before accepting
    # (round 4 shipped a 25% low headline this guard would have caught).
    expected = _EXPECTED.get((variant, n))
    if expected is not None and 1.0 / best < 0.7 * expected:
        best2, times2 = _throughput(vag, thetas)
        if best2 < best:
            best, times = best2, times2
    evals_per_sec = 1.0 / best

    rec = {
        "metric": "hodlr_loglik_grad_evals_per_sec%s_n%d"
                  % ("" if variant == "smooth" else "_" + variant, n),
        "value": round(evals_per_sec, 3),
        "unit": "evals/s",
        "vs_baseline": round(target_seconds(n) / best, 3),
        # provenance: which precision tier timed, and how far the timed
        # program's log-likelihood sat from the CPU-f64 truth anchor
        "precision": os.environ.get("GEORGE_TPU_MATMUL_PRECISION",
                                    "highest"),
        # every repeat's s/eval — a wide spread flags tunnel degradation
        "spread_s_per_eval": [float("%.4g" % t) for t in times],
    }
    anchor = _TRUTH.get((variant, n))
    if anchor is not None:
        rec["anchor_rel_err"] = float(
            "%.3g" % (abs(float(ll0) - anchor[0]) / abs(anchor[0]))
        )
    print(json.dumps(rec))


def _watchdog():
    """Run the benchmark in a child process with a timeout, falling back
    to a CPU run if the accelerator is unreachable.

    The serving tunnel to the TPU occasionally goes down for hours; a
    bare run would then hang forever on the first dispatch and the
    driver would record nothing. The child inherits this interpreter and
    argv; on timeout or a dead child the fallback child pins the CPU
    platform (env vars cannot override the pinned platform, so the
    fallback must be a fresh process that calls jax.config first)."""
    import os
    import subprocess

    here = os.path.abspath(__file__)
    env = dict(os.environ, GEORGE_TPU_BENCH_CHILD="1")

    last_text = [""]

    def run(cmd, timeout):
        try:
            out = subprocess.run(
                cmd, env=env, timeout=timeout,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            text = out.stdout.decode("utf-8", "replace")
        except subprocess.TimeoutExpired as e:
            # a child can print its metric line and THEN wedge in TPU
            # client teardown over the tunnel — keep the partial output
            text = (e.stdout or b"").decode("utf-8", "replace")
        last_text[0] = text
        for line in reversed(text.strip().splitlines()):
            if line.startswith("{") and '"metric"' in line:
                return line
        if text.strip():
            sys.stderr.write(text + "\n")
        return None

    # quick probe: is the accelerator reachable at all? (a dead tunnel
    # hangs on the first dispatch, so probe in a short-lived child)
    probe = (
        "import jax, jax.numpy as jnp; "
        "print('OK', float(jax.jit(lambda a: a.sum())(jnp.ones(8))))"
    )
    try:
        # generous budget: a degraded-but-alive tunnel can take minutes
        # on the first dispatch (measured round 4: a 180 s probe
        # repeatedly false-negatived and buried real chip runs under
        # the CPU fallback)
        out = subprocess.run(
            [sys.executable, "-c", probe], env=env, timeout=420,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        alive = b"OK" in out.stdout
    except subprocess.TimeoutExpired:
        alive = False

    # failure records carry the (variant, n) suffix so 0.0 lines don't
    # collide across workloads in banked artifacts
    n_arg = sys.argv[1] if len(sys.argv) > 1 else "100000"
    var_arg = sys.argv[2] if len(sys.argv) > 2 else "smooth"
    fail_metric = "hodlr_loglik_grad_evals_per_sec%s_n%s" % (
        "" if var_arg == "smooth" else "_" + var_arg, n_arg)

    line = None
    if alive:
        # normal attempt (TPU if available; generous budget for a cold
        # compile of the unrolled hierarchical graph)
        line = run([sys.executable, here] + sys.argv[1:], timeout=2400)
        if line is None and "off truth by" in last_text[0]:
            # the ACCURACY anchor failed — that is a real measurement of
            # the on-chip configuration, not a tunnel outage; a CPU
            # fallback here would bury it under a misleading n=20000
            # line. Record the failure honestly and stop.
            detail = ""
            for tl in last_text[0].splitlines():
                if "off truth by" in tl:
                    detail = tl.strip()
            line = json.dumps({
                "metric": fail_metric,
                "value": 0.0, "unit": "evals/s", "vs_baseline": 0.0,
                "note": "accuracy anchor FAILED on-chip: " + detail,
            })
        if line is None and any(
            pat in last_text[0] for pat in (
                "Ran out of memory in memory space",   # compile-time OOM
                "RESOURCE_EXHAUSTED",                  # runtime HBM OOM
                "ResourceExhausted",
            )
        ):
            # likewise an HBM OOM is a real property of the shipping
            # graph at this N on this chip, not an outage (round 4: two
            # compile-time 1e6 OOMs were mis-recorded as "accelerator
            # unreachable", and the runtime RESOURCE_EXHAUSTED form was
            # missed entirely)
            detail = ""
            for tl in last_text[0].splitlines():
                if ("Ran out of memory in memory space" in tl
                        or "RESOURCE_EXHAUSTED" in tl
                        or "ResourceExhausted" in tl):
                    detail = tl.strip()[-120:]
                    break
            line = json.dumps({
                "metric": fail_metric,
                "value": 0.0, "unit": "evals/s", "vs_baseline": 0.0,
                "note": "HBM OOM on-chip: " + detail,
            })
    if line is None:
        sys.stderr.write(
            "bench: accelerator run failed or timed out; "
            "falling back to a CPU measurement\n"
        )
        variant = sys.argv[2] if len(sys.argv) > 2 else "smooth"
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy, sys; sys.argv=[%r, '20000', %r]; "
            "runpy.run_path(%r, run_name='__main__')"
            % (here, variant, here)
        )
        line = run([sys.executable, "-c", code], timeout=1800)
        if line is not None:
            rec = json.loads(line)
            rec["note"] = (
                "CPU fallback at n=20000 — accelerator unreachable; "
                "NOT comparable to on-chip rounds"
            )
            line = json.dumps(rec)
    if line is None:
        line = json.dumps({
            "metric": fail_metric,
            "value": 0.0, "unit": "evals/s", "vs_baseline": 0.0,
            "note": "benchmark could not run (device unavailable)",
        })
    print(line, flush=True)


if __name__ == "__main__":
    if os.environ.get("GEORGE_TPU_BENCH_CHILD"):
        main()
    else:
        _watchdog()
