# -*- coding: utf-8 -*-
"""Multi-output GP with the linear coregionalization (LCM) kernel — the
GPTune fork's flagship addition (reference ``kernels.h:2355-2645``).

Two correlated tasks observe shifted/scaled versions of one latent
function; the LCM kernel transfers strength between them. The task id
rides in the last input coordinate.

Run on CPU: ``python examples/multioutput.py``
"""

import numpy as np

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from george_tpu import GP, kernels
from george_tpu.sampling import minimize


def main():
    rng = np.random.default_rng(7)
    n_per = 40
    xs = np.sort(rng.uniform(0, 10, n_per))
    latent = np.sin(xs)
    y0 = 1.0 * latent + 0.05 * rng.standard_normal(n_per)
    y1 = 0.6 * latent + 0.3 + 0.05 * rng.standard_normal(n_per)

    # inputs: (coordinate, task id)
    x = np.concatenate(
        [
            np.stack([xs, np.zeros(n_per)], axis=1),
            np.stack([xs, np.ones(n_per)], axis=1),
        ]
    )
    y = np.concatenate([y0, y1 - 0.3])   # remove task-1 offset for brevity

    kernel = kernels.LCMKernel(
        logBK=np.log([1.0, 0.6, 0.1, 0.1]),   # B (T x Q) then K (T x Q)
        children=[kernels.ExpSquaredKernel(metric=1.0)],
        T=2, Q=1, ndim=1,
    )
    gp = GP(kernel)
    gp.compute(x, 0.05)
    print("initial log-likelihood: {0:.2f}".format(gp.log_likelihood(y)))
    minimize(gp, y)
    print("fitted  log-likelihood: {0:.2f}".format(gp.log_likelihood(y)))

    # predict task 1 from both tasks' data
    t = np.linspace(0, 10, 100)
    t1 = np.stack([t, np.ones_like(t)], axis=1)
    mu1, var1 = gp.predict(y, t1, return_var=True)
    rmse = np.sqrt(np.mean((mu1 - 0.6 * np.sin(t)) ** 2))
    print("task-1 prediction RMSE vs truth: {0:.4f}".format(rmse))
    assert rmse < 0.15
    # cross-task transfer: task-1 posterior tighter than its noise-only
    # baseline thanks to shared structure
    assert np.median(np.sqrt(var1)) < 0.2


if __name__ == "__main__":
    main()
