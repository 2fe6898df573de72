# -*- coding: utf-8 -*-
"""First-steps example (the reference's ``docs/tutorials/first.rst``
workflow): noisy quasi-periodic data, a composite kernel, likelihood
optimization and posterior prediction.

Run on CPU: ``python examples/first.py``
"""

import numpy as np

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from george_tpu import GP, kernels
from george_tpu.sampling import minimize


def generate_data(n=60, seed=1234):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    yerr = 0.05 + 0.05 * rng.uniform(size=n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    return x, y, yerr


def main():
    x, y, yerr = generate_data()

    kernel = np.var(y) * kernels.ExpSquaredKernel(0.5)
    gp = GP(kernel)
    gp.compute(x, yerr)
    print("Initial log-likelihood: {0:.3f}".format(gp.log_likelihood(y)))

    result = minimize(gp, y)
    print("Optimized parameters:", dict(zip(
        gp.get_parameter_names(), gp.get_parameter_vector()
    )))
    print("Final log-likelihood: {0:.3f}".format(gp.log_likelihood(y)))

    t = np.linspace(0, 10, 500)
    mu, var = gp.predict(y, t, return_var=True)
    rmse = np.sqrt(np.mean((mu - np.sin(t)) ** 2))
    print("Prediction RMSE vs truth: {0:.4f}".format(rmse))
    assert result.success or np.isfinite(result.fun)


if __name__ == "__main__":
    main()
