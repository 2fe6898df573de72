# -*- coding: utf-8 -*-
"""Gradient-based samplers: HMC and iterative NUTS with window adaptation.

The reference's inference layer is host-side ``emcee``/``scipy``
(``docs/tutorials/hyper.rst``); gradients there cost a full refactorization
per parameter set (SURVEY.md §3.2-3.3). Here the posterior gradient is one
reverse-mode sweep of the fused likelihood, and the whole sampler — warmup
adaptation included — is a single jitted ``lax.scan``:

* chains are a leading batch axis (``vmap``), the natural mesh-sharding
  axis (``parallel.py``);
* step size is adapted by Nesterov dual averaging on the **cross-chain
  mean** acceptance statistic and the diagonal mass matrix by **pooled
  cross-chain** Welford variance — under ``pjit`` these reductions compile
  to ``psum`` over the chain axis of the mesh, which is the framework's
  distributed-communication pattern;
* NUTS is the *iterative* formulation (checkpoint bit-trick for sub-tree
  U-turn checks) so the tree build is a bounded ``fori_loop`` — no
  recursion, SIMD-friendly across vmapped chains.

Checkpoint scheme: leaves are numbered 0..2^d-1 within a subtree. A state
is stored when its leaf index ``j`` is even, at slot ``popcount(j)``. At an
odd leaf ``i`` with ``i+1 = M * 2^v`` (M odd), the subtrees ending at ``i``
have left-boundary leaves at slots ``popcount(M-1) .. popcount(M-1)+v-1``,
a contiguous range — so all sub-tree U-turn checks are O(max_depth) array
lookups.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["sample_hmc", "sample_nuts", "HMC", "NUTS", "WarmupSchedule"]


# ---------------------------------------------------------------------------
# Leapfrog
# ---------------------------------------------------------------------------

def _mass_matvec(inv_mass, p):
    """``M^{-1} p``. ``inv_mass`` is a ``(dim,)`` diagonal or, for dense
    mass adaptation, a dict ``{"sigma": (dim, dim), "chol": (dim, dim)}``
    with ``sigma`` the inverse mass (the pooled posterior-covariance
    estimate) and ``chol`` its lower Cholesky factor."""
    if isinstance(inv_mass, dict):
        return inv_mass["sigma"] @ p
    return inv_mass * p


def _draw_momentum(key, inv_mass, shape, dtype):
    """p ~ N(0, M) with M the mass matrix (= inverse of ``inv_mass``).
    Dense: ``sigma = L L^T`` so ``p = L^{-T} z`` has covariance
    ``sigma^{-1}``."""
    z = jax.random.normal(key, shape, dtype)
    if isinstance(inv_mass, dict):
        return jax.scipy.linalg.solve_triangular(
            inv_mass["chol"].T, z, lower=False
        )
    return z / jnp.sqrt(inv_mass)


def _leapfrog(value_and_grad, q, p, grad, eps, inv_mass):
    """One leapfrog step. Returns (q, p, logp, grad)."""
    p_half = p + 0.5 * eps * grad
    q_new = q + eps * _mass_matvec(inv_mass, p_half)
    logp_new, grad_new = value_and_grad(q_new)
    p_new = p_half + 0.5 * eps * grad_new
    return q_new, p_new, logp_new, grad_new


def _energy_dtype():
    """Accumulation dtype for Hamiltonian energies: f64 when enabled
    (``canonicalize_dtype`` degrades to f32 otherwise). In f32 chains the
    energies are O(|logp|) while the divergence/acceptance logic consumes
    O(1) *differences* — accumulating the kinetic sums and the
    ``H - H0`` subtraction in f64 removes the cancellation noise that
    spuriously trips the divergence check (measured divergence_frac ~0.15
    at N=1e5 in pure f32)."""
    return jax.dtypes.canonicalize_dtype(jnp.float64)


def _kinetic_hi(p, inv_mass):
    hi = _energy_dtype()
    p = p.astype(hi)
    if isinstance(inv_mass, dict):
        return 0.5 * jnp.dot(p, inv_mass["sigma"].astype(hi) @ p)
    return 0.5 * jnp.sum(p * p * inv_mass.astype(hi))


# ---------------------------------------------------------------------------
# HMC transition (vmappable over chains)
# ---------------------------------------------------------------------------

def hmc_transition(key, q, logp, grad, value_and_grad, eps, inv_mass,
                   num_steps):
    """Single-chain HMC transition with ``num_steps`` leapfrog steps."""
    key_mom, key_acc = jax.random.split(key)
    hi = _energy_dtype()
    p0 = _draw_momentum(key_mom, inv_mass, q.shape, q.dtype)
    energy0 = -logp.astype(hi) + _kinetic_hi(p0, inv_mass)

    def body(i, state):
        qq, pp, lp, g = state
        return _leapfrog(value_and_grad, qq, pp, g, eps, inv_mass)

    qn, pn, lpn, gn = jax.lax.fori_loop(
        0, num_steps, body, (q, p0, logp, grad)
    )
    energy1 = -lpn.astype(hi) + _kinetic_hi(pn, inv_mass)
    log_accept = jnp.minimum(0.0, energy0 - energy1).astype(q.dtype)
    log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
    accept = jnp.log(jax.random.uniform(key_acc, dtype=q.dtype)) < log_accept
    q_out = jnp.where(accept, qn, q)
    lp_out = jnp.where(accept, lpn, logp)
    g_out = jnp.where(accept, gn, grad)
    return q_out, lp_out, g_out, jnp.exp(log_accept)


# ---------------------------------------------------------------------------
# Iterative NUTS transition (vmappable over chains)
# ---------------------------------------------------------------------------

def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(x):
    # number of trailing 1-bits of x = trailing zeros of x+1
    return _popcount(jnp.bitwise_and(jnp.bitwise_not(x), x + 1) - 1)


def _uturn(q_left, q_right, p_left, p_right, inv_mass):
    """Generalized U-turn criterion on trajectory-time-ordered endpoints:
    ``q_left``/``p_left`` must be the earlier point *in trajectory time*
    (not integration order — a backward integration visits points in
    reverse trajectory time)."""
    dq = q_right - q_left
    return jnp.logical_or(
        jnp.dot(dq, _mass_matvec(inv_mass, p_left)) < 0,
        jnp.dot(dq, _mass_matvec(inv_mass, p_right)) < 0,
    )


def nuts_transition(key, q, logp, grad, value_and_grad, eps, inv_mass,
                    max_depth=10, divergence_threshold=1000.0):
    """Single-chain multinomial NUTS transition (iterative, bounded loops).

    Returns ``(q, logp, grad, accept_prob_proxy, depth, diverged)``.
    """
    dtype = q.dtype
    dim = q.shape[0]
    key_mom, key_loop = jax.random.split(key)
    e_dtype = _energy_dtype()
    p0 = _draw_momentum(key_mom, inv_mass, (dim,), dtype)
    energy0 = -logp.astype(e_dtype) + _kinetic_hi(p0, inv_mass)

    # Trajectory state: l = backward end, r = forward end.
    traj = {
        "q_l": q, "p_l": p0, "g_l": grad, "lp_l": logp,
        "q_r": q, "p_r": p0, "g_r": grad, "lp_r": logp,
        "q_prop": q, "lp_prop": logp, "g_prop": grad,
        "log_w": jnp.zeros((), dtype),          # logsumexp of -dH over traj
        "depth": jnp.zeros((), jnp.int32),
        "turning": jnp.zeros((), bool),
        "diverging": jnp.zeros((), bool),
        "sum_acc": jnp.zeros((), dtype),        # sum of accept-prob proxies
        "n_leap": jnp.zeros((), dtype),
        "key": key_loop,
    }

    def build_subtree(key, z0, direction, depth):
        """Build a subtree of 2^depth leaves from z0 in ``direction``.

        Returns (z_end, subtree proposal, log_w, turning, diverging,
        sum_acc, n_leaf_done).
        """
        n_leaf = jnp.left_shift(jnp.ones((), jnp.int32), depth)
        q0, p0_, g0, lp0 = z0
        ckpt_q = jnp.zeros((max_depth + 1, dim), dtype)
        ckpt_p = jnp.zeros((max_depth + 1, dim), dtype)

        state = {
            "q": q0, "p": p0_, "g": g0, "lp": lp0,
            "q_prop": q0, "lp_prop": lp0, "g_prop": g0,
            "log_w": -jnp.inf * jnp.ones((), dtype),
            "turning": jnp.zeros((), bool),
            "diverging": jnp.zeros((), bool),
            "sum_acc": jnp.zeros((), dtype),
            "n_exec": jnp.zeros((), dtype),
            "ckpt_q": ckpt_q, "ckpt_p": ckpt_p,
            "key": key,
        }

        def leaf_body(i, st):
            def do_leaf(st):
                qq, pp, lpq, gg = _leapfrog(
                    value_and_grad, st["q"], st["p"], st["g"],
                    direction * eps, inv_mass,
                )
                energy = -lpq.astype(e_dtype) + _kinetic_hi(pp, inv_mass)
                d_energy = (energy - energy0).astype(dtype)
                d_energy = jnp.where(
                    jnp.isfinite(d_energy), d_energy, jnp.inf
                )
                diverging = d_energy > divergence_threshold
                log_w_leaf = -d_energy
                # accept-prob proxy for dual averaging (Stan's statistic)
                acc = jnp.exp(jnp.minimum(0.0, -d_energy))

                # progressive multinomial sampling within the subtree
                log_w_new = jnp.logaddexp(st["log_w"], log_w_leaf)
                key, sub = jax.random.split(st["key"])
                take = (
                    jnp.log(jax.random.uniform(sub, dtype=dtype))
                    < log_w_leaf - log_w_new
                )
                q_prop = jnp.where(take, qq, st["q_prop"])
                lp_prop = jnp.where(take, lpq, st["lp_prop"])
                g_prop = jnp.where(take, gg, st["g_prop"])

                # checkpoint store (even leaf) ------------------------------
                slot = _popcount(i)
                even = (i % 2) == 0
                ckpt_q = jnp.where(
                    even,
                    st["ckpt_q"].at[slot].set(qq),
                    st["ckpt_q"],
                )
                ckpt_p = jnp.where(
                    even,
                    st["ckpt_p"].at[slot].set(pp),
                    st["ckpt_p"],
                )

                # sub-tree U-turn checks (odd leaf) -------------------------
                v = _trailing_ones(i)
                M_minus_1 = jnp.right_shift(i + 1, v) - 1
                lo = _popcount(M_minus_1)
                hi = lo + v - 1

                def check(k, turning):
                    inside = jnp.logical_and(k >= lo, k <= hi)
                    # The checkpoint precedes the current leaf in
                    # *integration* order; in trajectory time the pair is
                    # reversed when integrating backward, so orient the
                    # displacement by ``direction`` (both endpoint momenta
                    # are tested either way, so only dq's sign matters).
                    dq = direction * (qq - ckpt_q[k])
                    t = jnp.logical_or(
                        jnp.dot(dq, _mass_matvec(inv_mass, ckpt_p[k])) < 0,
                        jnp.dot(dq, _mass_matvec(inv_mass, pp)) < 0,
                    )
                    return jnp.logical_or(
                        turning, jnp.logical_and(inside, t)
                    )

                turning = jax.lax.fori_loop(
                    0, max_depth + 1, check, st["turning"]
                )
                turning = jnp.where((i % 2) == 1, turning, st["turning"])

                return {
                    "q": qq, "p": pp, "g": gg, "lp": lpq,
                    "q_prop": q_prop, "lp_prop": lp_prop, "g_prop": g_prop,
                    "log_w": log_w_new,
                    "turning": jnp.logical_or(turning, st["turning"]),
                    "diverging": jnp.logical_or(diverging, st["diverging"]),
                    "sum_acc": st["sum_acc"] + acc,
                    "n_exec": st["n_exec"] + 1.0,
                    "ckpt_q": ckpt_q, "ckpt_p": ckpt_p,
                    "key": key,
                }

            stop = jnp.logical_or(st["turning"], st["diverging"])
            return jax.lax.cond(stop, lambda s: s, do_leaf, st)

        st = jax.lax.fori_loop(0, n_leaf, leaf_body, state)
        return st

    def doubling_cond(traj):
        return jnp.logical_and(
            traj["depth"] < max_depth,
            jnp.logical_not(
                jnp.logical_or(traj["turning"], traj["diverging"])
            ),
        )

    def doubling_body(traj):
        key, k_dir, k_sub, k_bias = jax.random.split(traj["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
        z0 = (
            jnp.where(go_right, traj["q_r"], traj["q_l"]),
            jnp.where(go_right, traj["p_r"], traj["p_l"]),
            jnp.where(go_right, traj["g_r"], traj["g_l"]),
            jnp.where(go_right, traj["lp_r"], traj["lp_l"]),
        )
        st = build_subtree(k_sub, z0, direction, traj["depth"])
        ok = jnp.logical_not(jnp.logical_or(st["turning"], st["diverging"]))

        # biased progressive sampling between old trajectory and subtree
        take = jnp.logical_and(
            ok,
            jnp.log(jax.random.uniform(k_bias, dtype=dtype))
            < st["log_w"] - traj["log_w"],
        )
        q_prop = jnp.where(take, st["q_prop"], traj["q_prop"])
        lp_prop = jnp.where(take, st["lp_prop"], traj["lp_prop"])
        g_prop = jnp.where(take, st["g_prop"], traj["g_prop"])

        # extend the trajectory end we grew
        q_l = jnp.where(go_right, traj["q_l"], st["q"])
        p_l = jnp.where(go_right, traj["p_l"], st["p"])
        g_l = jnp.where(go_right, traj["g_l"], st["g"])
        lp_l = jnp.where(go_right, traj["lp_l"], st["lp"])
        q_r = jnp.where(go_right, st["q"], traj["q_r"])
        p_r = jnp.where(go_right, st["p"], traj["p_r"])
        g_r = jnp.where(go_right, st["g"], traj["g_r"])
        lp_r = jnp.where(go_right, st["lp"], traj["lp_r"])

        # full-trajectory U-turn check
        turning_full = _uturn(q_l, q_r, p_l, p_r, inv_mass)
        turning = jnp.logical_or(
            st["turning"], jnp.logical_and(ok, turning_full)
        )

        return {
            "q_l": q_l, "p_l": p_l, "g_l": g_l, "lp_l": lp_l,
            "q_r": q_r, "p_r": p_r, "g_r": g_r, "lp_r": lp_r,
            "q_prop": q_prop, "lp_prop": lp_prop, "g_prop": g_prop,
            "log_w": jnp.logaddexp(traj["log_w"], st["log_w"]),
            "depth": traj["depth"] + 1,
            "turning": turning,
            "diverging": st["diverging"],
            "sum_acc": traj["sum_acc"] + st["sum_acc"],
            "n_leap": traj["n_leap"] + st["n_exec"],
            "key": key,
        }

    traj = jax.lax.while_loop(doubling_cond, doubling_body, traj)
    accept_stat = traj["sum_acc"] / jnp.maximum(traj["n_leap"], 1.0)
    return (
        traj["q_prop"], traj["lp_prop"], traj["g_prop"],
        accept_stat, traj["depth"], traj["diverging"],
    )


# ---------------------------------------------------------------------------
# Warmup adaptation (Stan-style windows, cross-chain statistics)
# ---------------------------------------------------------------------------

class WarmupSchedule(object):
    """Stan's three-phase warmup: fast start (step size only), expanding
    slow windows (mass matrix), fast tail. Precomputed host-side so the
    whole warmup is one ``lax.scan`` over static flag arrays."""

    def __init__(self, num_warmup, init_buffer=75, term_buffer=50,
                 base_window=25):
        num_warmup = int(num_warmup)
        if num_warmup < init_buffer + term_buffer + base_window:
            init_buffer = max(1, int(0.15 * num_warmup))
            term_buffer = max(1, int(0.1 * num_warmup))
            base_window = max(1, num_warmup - init_buffer - term_buffer)
        self.num_warmup = num_warmup
        in_slow = np.zeros(num_warmup, dtype=bool)
        window_end = np.zeros(num_warmup, dtype=bool)
        t = init_buffer
        w = base_window
        while t < num_warmup - term_buffer:
            end = min(t + w, num_warmup - term_buffer)
            # final window absorbs the remainder
            if end + 2 * w > num_warmup - term_buffer:
                end = num_warmup - term_buffer
            in_slow[t:end] = True
            window_end[end - 1] = True
            t = end
            w *= 2
        self.in_slow = in_slow
        self.window_end = window_end


def _robust_final_eps(log_eps_avg, clip):
    """Cross-chain robustified post-warmup step sizes.

    Per-chain dual averaging can leave one chain with a step size an
    order of magnitude above its siblings': the chain happened to spend
    its last adaptation window in a flat region, and once it wanders
    into the stiff part of the posterior that frozen step size diverges
    on a third of its transitions (measured on the 7-param GP posterior
    of ``benchmarks/bench_nuts.py``: the rogue chain sat at eps ~10x the
    cross-chain median with divergence_frac 0.32-0.46 while
    every other chain was clean). Capping each chain at ``clip`` times
    the median of the finite per-chain estimates removes exactly
    those outliers without touching healthy chains; a chain whose
    averaged estimate collapsed toward zero or non-finite (dual-averaging
    runaway, not geometry — measured at eps ~1e-4 against a clean-cluster
    median of 7e-3) is floored at ``median / clip**2`` instead of
    freezing forever. The anchor is the cross-chain *median* of the
    finite per-chain estimates — a mean is pulled up by exactly the
    rogue chains being clipped (measured: cap at 3x the geometric mean
    still left the rogues 4x above the clean cluster and diverging).
    The reduction sorts one ``(chains,)`` vector, so under a sharded
    chain batch it is one tiny ``all_gather`` per sampling run.
    """
    finite = jnp.isfinite(log_eps_avg)
    n_finite = jnp.sum(finite.astype(jnp.int32))
    le_sorted = jnp.sort(jnp.where(finite, log_eps_avg, jnp.inf))
    med = le_sorted[jnp.maximum(n_finite - 1, 0) // 2]
    log_clip = jnp.log(jnp.asarray(clip, log_eps_avg.dtype))
    capped = jnp.clip(
        log_eps_avg, med - 2.0 * log_clip, med + log_clip
    )
    return jnp.exp(jnp.where(finite, capped, med))


def _dual_averaging_init(eps0, dtype, nchains=None):
    """Dual-averaging state, PER CHAIN: each chain adapts its own step
    size against its own acceptance statistic (Stan semantics). A single
    pooled step size measurably fails when chains sit in regions of
    different curvature — measured on a 7-param GP posterior: pooled eps
    gave per-chain divergence rates [0.30, 0.33, 0.88, 0.0] with one
    chain at acceptance 0.34 and another pinned at 1.0."""
    eps0 = jnp.asarray(eps0, dtype)
    if nchains is not None and eps0.ndim == 0:
        eps0 = eps0 * jnp.ones((nchains,), dtype)
    shape = eps0.shape
    return {
        "log_eps": jnp.log(eps0),
        "log_eps_avg": jnp.zeros(shape, dtype),
        "h_sum": jnp.zeros(shape, dtype),
        "mu": jnp.log(10.0 * eps0),
        "count": jnp.zeros(shape, dtype),
    }


def _dual_averaging_update(da, accept_mean, target, gamma=0.05, t0=10.0,
                           kappa=0.75):
    count = da["count"] + 1.0
    h_sum = da["h_sum"] + (target - accept_mean)
    log_eps = da["mu"] - (jnp.sqrt(count) / gamma) * h_sum / (count + t0)
    w = count ** (-kappa)
    log_eps_avg = w * log_eps + (1.0 - w) * da["log_eps_avg"]
    return {
        "log_eps": log_eps, "log_eps_avg": log_eps_avg, "h_sum": h_sum,
        "mu": da["mu"], "count": count,
    }


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

def _make_value_and_grad(log_prob_fn):
    vag = jax.value_and_grad(log_prob_fn)

    def value_and_grad(q):
        v, g = vag(q)
        bad = jnp.logical_not(jnp.isfinite(v))
        v = jnp.where(bad, -jnp.inf, v)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return v, g

    return value_and_grad


def _make_transition(value_and_grad, algorithm, num_leapfrog, max_depth):
    if algorithm == "nuts":
        def transition(keys, qs, lps, gs, eps, inv_mass):
            eps = eps * jnp.ones(qs.shape[0], qs.dtype)   # per-chain
            q, lp, g, acc, depth, div = jax.vmap(
                lambda k, q_, lp_, g_, e_: nuts_transition(
                    k, q_, lp_, g_, value_and_grad, e_, inv_mass,
                    max_depth=max_depth,
                )
            )(keys, qs, lps, gs, eps)
            return q, lp, g, acc, {"depth": depth, "diverging": div}
    else:
        def transition(keys, qs, lps, gs, eps, inv_mass):
            eps = eps * jnp.ones(qs.shape[0], qs.dtype)   # per-chain
            q, lp, g, acc = jax.vmap(
                lambda k, q_, lp_, g_, e_: hmc_transition(
                    k, q_, lp_, g_, value_and_grad, e_, inv_mass,
                    num_leapfrog,
                )
            )(keys, qs, lps, gs, eps)
            return q, lp, g, acc, {}
    return transition


@partial(
    jax.jit,
    static_argnames=("log_prob_fn", "algorithm", "num_leapfrog",
                     "max_depth", "target_accept"),
)
def _warmup_chunk(step_keys, carry, in_slow, window_end, log_prob_fn,
                  algorithm, num_leapfrog, max_depth, target_accept):
    """A bounded scan of warmup iterations; adaptation state threads
    through ``carry`` so warmup can be split into arbitrary segments
    (per-step keys come from the caller, so segmentation never changes
    the random stream)."""
    q0, _, _, _, _, _ = carry
    nchains = q0.shape[0]
    value_and_grad = _make_value_and_grad(log_prob_fn)
    transition = _make_transition(
        value_and_grad, algorithm, num_leapfrog, max_depth
    )

    def warm_body(carry, inputs):
        q, lp, g, da, inv_mass, welford = carry
        key, slow, wend = inputs
        keys = jax.random.split(key, nchains)
        eps = jnp.exp(da["log_eps"])
        q, lp, g, acc, _ = transition(keys, q, lp, g, eps, inv_mass)
        # per-chain acceptance -> per-chain step size (elementwise on
        # the sharded chain axis; no collective needed)
        da = _dual_averaging_update(da, acc, target_accept)

        # pooled cross-chain Welford over the slow windows
        dense = isinstance(inv_mass, dict)
        cnt, mean, m2 = welford
        batch_mean = jnp.mean(q, axis=0)
        delta = batch_mean - mean
        cnt_new = cnt + 1.0
        mean_new = mean + delta / cnt_new
        # within-batch spread pooled in as well
        dev = q - batch_mean[None, :]
        if dense:
            m2_new = (
                m2
                + jnp.einsum("ci,cj->ij", dev, dev) / q.shape[0]
                + jnp.outer(delta, batch_mean - mean_new)
            )
        else:
            m2_new = m2 + jnp.mean(dev ** 2, axis=0) + \
                delta * (batch_mean - mean_new)
        welford = jax.tree_util.tree_map(
            lambda new, old: jnp.where(slow, new, old),
            (cnt_new, mean_new, m2_new), (cnt, mean, m2),
        )

        # window end: refresh the mass matrix, restart step-size averaging
        cnt, mean, m2 = welford
        if dense:
            # Stan's shrinkage toward a small identity keeps the window
            # estimate well-conditioned when few draws have accumulated
            w = cnt / (cnt + 5.0)
            sigma = w * (m2 / jnp.maximum(cnt - 1.0, 1.0)) + (
                1e-3 * (1.0 - w) + 1e-5
            ) * jnp.eye(q.shape[1], dtype=q.dtype)
            new_mass = {"sigma": sigma, "chol": jnp.linalg.cholesky(sigma)}
            inv_mass = jax.tree_util.tree_map(
                lambda new, old: jnp.where(wend, new, old),
                new_mass, inv_mass,
            )
        else:
            var = m2 / jnp.maximum(cnt - 1.0, 1.0) + 1e-5
            inv_mass = jnp.where(wend, var, inv_mass)
        da_reset = _dual_averaging_init(
            jnp.exp(da["log_eps"]), q.dtype
        )
        da = jax.tree_util.tree_map(
            lambda r, cur: jnp.where(wend, r, cur), da_reset, da
        )
        welford = jax.tree_util.tree_map(
            lambda w: jnp.where(wend, jnp.zeros_like(w), w), welford
        )
        return (q, lp, g, da, inv_mass, welford), acc

    return jax.lax.scan(
        warm_body, carry, (step_keys, in_slow, window_end)
    )


@partial(
    jax.jit,
    static_argnames=("log_prob_fn", "algorithm",
                     "num_leapfrog", "max_depth"),
)
def _sample_chunk(step_keys, q, lp, g, eps, inv_mass, log_prob_fn,
                  algorithm, num_leapfrog, max_depth):
    """A bounded scan of posterior draws with fixed tuning."""
    nchains = q.shape[0]
    value_and_grad = _make_value_and_grad(log_prob_fn)
    transition = _make_transition(
        value_and_grad, algorithm, num_leapfrog, max_depth
    )

    def sample_body(carry, key):
        q, lp, g = carry
        ks = jax.random.split(key, nchains)
        q, lp, g, acc, extras = transition(ks, q, lp, g, eps, inv_mass)
        out = {"q": q, "logp": lp, "accept": acc}
        out.update(extras)
        return (q, lp, g), out

    return jax.lax.scan(sample_body, (q, lp, g), step_keys)


def _segments(total, size):
    if not total:
        return []
    if size is None or size >= total:
        return [(0, total)]
    out = []
    start = 0
    while start < total:
        out.append((start, min(start + size, total)))
        start += size
    return out


def _sample(key, p0, log_prob_fn, num_warmup, num_samples,
            algorithm="nuts", num_leapfrog=32, max_depth=10,
            target_accept=0.8, segment_size=None, step_size_clip=2.0,
            dense_mass=False):
    """Warmup + sampling driver. ``p0``: (chains, dim).

    With ``segment_size=None`` the whole run is two device programs
    (warmup scan + sampling scan). A finite ``segment_size`` splits both
    into bounded chunks with the adaptation state threaded through the
    host — for runtimes that cap single-program execution time, and for
    periodic checkpointing of long runs (``george_tpu.checkpoint``).
    """
    nchains, dim = p0.shape
    dtype = p0.dtype
    value_and_grad = _make_value_and_grad(log_prob_fn)
    lp0, g0 = jax.vmap(value_and_grad)(p0)

    sched = WarmupSchedule(num_warmup)
    in_slow = jnp.asarray(sched.in_slow)
    window_end = jnp.asarray(sched.window_end)

    if dense_mass:
        # inverse mass = pooled posterior covariance (dim x dim): the
        # right tool for the strongly correlated hyperparameter
        # posteriors GP marginal likelihoods produce, where a diagonal
        # mass leaves the target stiff along the correlated directions
        # and the adapted step size collapses. dim is small (the number
        # of hyperparameters), so all dense-mass ops are negligible next
        # to one likelihood gradient.
        eye = jnp.eye(dim, dtype=dtype)
        mass0 = {"sigma": eye, "chol": eye}
        m2_0 = jnp.zeros((dim, dim), dtype)
    else:
        mass0 = jnp.ones(dim, dtype)
        m2_0 = jnp.zeros(dim, dtype)
    carry = (
        p0, lp0, g0,
        _dual_averaging_init(0.1, dtype, nchains=nchains),
        mass0,
        (
            jnp.zeros((), dtype),        # Welford count
            jnp.zeros(dim, dtype),       # mean
            m2_0,                        # m2 (diag or full)
        ),
    )

    keys = jax.random.split(key, num_warmup + num_samples)
    warm_accs = []
    for (a, b) in _segments(num_warmup, segment_size):
        carry, acc = _warmup_chunk(
            keys[a:b], carry, in_slow[a:b], window_end[a:b],
            log_prob_fn, algorithm, num_leapfrog, max_depth,
            target_accept,
        )
        warm_accs.append(acc)
    q, lp, g, da, inv_mass, _ = carry
    if step_size_clip is not None and nchains > 1:
        eps_final = _robust_final_eps(
            da["log_eps_avg"], float(step_size_clip)
        )
    else:
        eps_final = jnp.exp(da["log_eps_avg"])

    chains = []
    for (a, b) in _segments(num_samples, segment_size):
        (q, lp, g), chunk = _sample_chunk(
            keys[num_warmup + a:num_warmup + b], q, lp, g,
            eps_final, inv_mass,
            log_prob_fn, algorithm, num_leapfrog, max_depth,
        )
        chains.append(chunk)
    chain = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *chains
    )

    stats = {
        "step_size": eps_final,
        "inv_mass": inv_mass,
        "warmup_accept": jnp.concatenate(warm_accs, axis=0)
        if warm_accs else jnp.zeros((0, nchains), dtype),
        "accept": chain["accept"],
        "logp": chain["logp"],
    }
    if "depth" in chain:
        stats["depth"] = chain["depth"]
        stats["diverging"] = chain["diverging"]
    return chain["q"], stats


def sample_nuts(key, log_prob_fn, p0, num_warmup=500, num_samples=500,
                max_depth=10, target_accept=0.8, segment_size=None,
                step_size_clip=2.0, dense_mass=False):
    """NUTS over vmapped chains. ``p0``: ``(chains, dim)``. Returns
    ``(samples (num_samples, chains, dim), stats)``.

    ``step_size_clip`` bounds each chain's post-warmup step size within
    ``[med/clip^2, med*clip]`` around the cross-chain median (``None``
    disables) — see ``_robust_final_eps``. ``dense_mass`` adapts a full (dim, dim)
    inverse-mass matrix from the pooled cross-chain covariance instead
    of a diagonal — use it for the correlated posteriors GP marginal
    likelihoods produce."""
    return _sample(
        key, jnp.asarray(p0), log_prob_fn, int(num_warmup),
        int(num_samples), algorithm="nuts", max_depth=int(max_depth),
        target_accept=float(target_accept),
        segment_size=segment_size, step_size_clip=step_size_clip,
        dense_mass=bool(dense_mass),
    )


def sample_hmc(key, log_prob_fn, p0, num_warmup=500, num_samples=500,
               num_leapfrog=32, target_accept=0.8, segment_size=None,
               step_size_clip=2.0, dense_mass=False):
    """Fixed-length HMC over vmapped chains."""
    return _sample(
        key, jnp.asarray(p0), log_prob_fn, int(num_warmup),
        int(num_samples), algorithm="hmc", num_leapfrog=int(num_leapfrog),
        target_accept=float(target_accept),
        segment_size=segment_size, step_size_clip=step_size_clip,
        dense_mass=bool(dense_mass),
    )


class _GradSampler(object):
    algorithm = None

    def __init__(self, log_prob_fn, num_warmup=500, **options):
        self.log_prob_fn = log_prob_fn
        self.num_warmup = int(num_warmup)
        self.options = options
        self.stats = None

    def run(self, p0, num_samples, seed=0):
        key = jax.random.PRNGKey(seed)
        samples, stats = _sample(
            key, jnp.asarray(np.atleast_2d(p0)), self.log_prob_fn,
            self.num_warmup, int(num_samples),
            algorithm=self.algorithm, **self.options
        )
        self.stats = jax.tree_util.tree_map(np.asarray, stats)
        return np.asarray(samples)


class NUTS(_GradSampler):
    algorithm = "nuts"


class HMC(_GradSampler):
    algorithm = "hmc"
