# -*- coding: utf-8 -*-
"""Hand-written DSL kernels: multi-output LCM and compact-support WendlandC2.

These are the two fork-specific kernels that the reference hand-added to its
generated sources (``kernels.h:2355-2645`` LCM, ``kernels.h:2223-2338``
WendlandC2, parser cases 13/14 in ``parser.h:505-558``).  Here they are
first-class DSL citizens: ``specs/LCM.yml`` and ``specs/WendlandC2.yml``
declare them with ``kind: custom`` pointing at this module, and they compile
to pair functions exactly like the generated kernels.
"""

import numpy as np

import jax.numpy as jnp

from ..modeling import Model, ModelSet
from .base import Kernel, safe_sqrt

__all__ = [
    "LCMKernel", "WendlandC2Kernel",
    "BaseLCMKernel", "BaseWendlandC2Kernel",
]


class _BaseWendlandC2Kernel(Model):
    parameter_names = ("log_rc",)


BaseWendlandC2Kernel = _BaseWendlandC2Kernel


class WendlandC2Kernel(Kernel):
    r"""Wendland C2 compact-support taper applied to a base kernel.

    .. math::

        k(x_i, x_j) = w(r)\,k_\mathrm{base}(x_i, x_j), \qquad
        w(r) = \begin{cases}
            (1 - r/r_c)^4 (4 r/r_c + 1) & r < r_c \\
            0 & r \ge r_c
        \end{cases}

    where :math:`r` is the plain Euclidean distance over **all** input
    dimensions (reference ``kernels.h:2283-2291``). The cutoff radius
    :math:`r_c` is a fitted parameter (in log space) and doubles as the
    sparsity radius for compact-support covariance assembly
    (``get_cutoff``, reference ``kernels.h:2258-2260``).

    :param log_rc: the log of the cutoff radius.
    :param kernel_base: the kernel being tapered.
    """

    kernel_type = 14
    stationary = True
    sparse = True

    def __init__(self, bounds=None, log_rc=0.0, kernel_base=None,
                 ndim=1, axes=None):
        if kernel_base is None:
            raise ValueError("missing required parameter 'kernel_base'")
        self.ndim = ndim
        if axes is None:
            axes = np.arange(ndim, dtype=int)
        self.axes = axes

        kwargs = dict(log_rc=log_rc)
        if bounds is not None:
            kwargs["bounds"] = bounds
        base = _BaseWendlandC2Kernel(**kwargs)
        ModelSet.__init__(self, [(None, base), ("kernel_base", kernel_base)])
        self.dirty = True

    def get_cutoff(self):
        return float(np.exp(self.get_parameter_vector(include_frozen=True)[0]))

    def _compile(self):
        child = self.models["kernel_base"]
        child_fn = child.pair_fn
        nc = child.full_size
        ndim = int(self.ndim)

        def pair(theta, x1, x2):
            rc = jnp.exp(theta[0])
            d = x1[:ndim] - x2[:ndim]
            r = safe_sqrt(jnp.sum(d * d))
            u = r / rc
            uc = jnp.minimum(u, 1.0)
            taper = jnp.where(
                u < 1.0, (1.0 - uc) ** 4 * (4.0 * uc + 1.0), 0.0
            )
            return taper * child_fn(theta[1 : 1 + nc], x1, x2)

        return pair

    def __repr__(self):
        return "WendlandC2Kernel(log_rc={0}, ndim={1}, kernel_base={2})".format(
            self.get_parameter_vector(include_frozen=True)[0],
            self.ndim,
            repr(self.models["kernel_base"]),
        )


class _BaseLCMKernel(Model):
    """Holds the flattened log(B) / log(K) coregionalization parameters."""

    def __init__(self, T, Q, logBK=None):
        self.T = int(T)
        self.Q = int(Q)
        logBK = np.atleast_1d(np.asarray(logBK, dtype=np.float64))
        if len(logBK) != 2 * self.T * self.Q:
            raise ValueError(
                "logBK must have length {0}".format(2 * self.T * self.Q)
            )
        names = [
            "logB_{0}_{1}".format(t, q)
            for t in range(self.T)
            for q in range(self.Q)
        ] + [
            "logK_{0}_{1}".format(t, q)
            for t in range(self.T)
            for q in range(self.Q)
        ]
        self.parameter_names = tuple(names)
        super(_BaseLCMKernel, self).__init__(*logBK)


BaseLCMKernel = _BaseLCMKernel


class LCMKernel(Kernel):
    r"""Multi-output linear coregionalization kernel.

    Inputs carry the task id in their **last** coordinate; the first ``ndim``
    coordinates are the spatial input consumed by the ``Q`` latent child
    kernels (reference ``kernels.h:2412-2474``):

    .. math::

        K\big((x, t_1), (x', t_2)\big) = \sum_{q=1}^{Q}
            \left[ B_{t_1 q} B_{t_2 q} + \delta_{t_1 t_2} K_{t_1 q} \right]
            k_q(x, x')

    with :math:`B` and :math:`K` stored in log space in the flat parameter
    vector ``logBK`` (first ``T*Q`` entries log(B) row-major, then ``T*Q``
    entries log(K); reference ``parser.h:513-520``).

    :param logBK: flat array of length ``T*Q*2``.
    :param children: list of ``Q`` child kernels over the spatial dims.
    :param T: number of tasks.
    :param Q: number of latent processes.
    """

    kernel_type = 13
    stationary = True
    block = None
    metric = None

    def __init__(self, logBK, children, T, Q, ndim=1, axes=None):
        if len(children) != Q:
            raise ValueError("expected {0} child kernels".format(Q))
        self.T = int(T)
        self.Q = int(Q)
        self.children = list(children)
        self.ndim = int(ndim)
        if axes is None:
            axes = np.arange(ndim, dtype=int)
        self.axes = axes

        base = _BaseLCMKernel(T, Q, logBK=logBK)
        ModelSet.__init__(
            self,
            [(None, base)]
            + [
                ("child_{0}".format(i), c)
                for i, c in enumerate(self.children)
            ],
        )
        self.dirty = True

    @property
    def input_ndim(self):
        # Spatial dims plus the trailing task-id column.
        return self.ndim + 1

    @property
    def sort_axes(self):
        """Coordinate axes that carry geometry — the trailing task-id
        column is a label, not a coordinate. Hierarchical solvers must
        order and partition on these axes only, so tasks interleave
        spatially: a task-major ordering makes every coarse off-diagonal
        block a full-domain cross-task kernel matrix (NOT low-rank),
        while spatial ordering keeps block rank bounded by
        ``sum_q rank(B_q) * rank(k_q)`` (measured: rank-16 relative
        error 8e-8 spatial vs 5e-4 task-interleaved on a T=2, Q=2 LCM).
        The reference compresses the same task-modulated covariance with
        ButterflyPACK (``kernels.h:2355-2645``, ``basic.py:80-118``)."""
        return [int(a) for a in np.atleast_1d(self.axes)]

    def _compile(self):
        T, Q = self.T, self.Q
        TQ = T * Q
        ndim = int(self.ndim)
        child_fns = [c.pair_fn for c in self.children]
        child_sizes = [c.full_size for c in self.children]

        def pair(theta, x1, x2):
            B = jnp.exp(theta[:TQ]).reshape(T, Q)
            Kd = jnp.exp(theta[TQ : 2 * TQ]).reshape(T, Q)
            t1 = x1[ndim].astype(jnp.int32)
            t2 = x2[ndim].astype(jnp.int32)
            xs1 = x1[:ndim]
            xs2 = x2[:ndim]
            total = jnp.zeros((), dtype=x1.dtype)
            off = 2 * TQ
            for q in range(Q):
                cval = child_fns[q](
                    theta[off : off + child_sizes[q]], xs1, xs2
                )
                bprod = B[t1, q] * B[t2, q]
                kterm = jnp.where(t1 == t2, Kd[t1, q], 0.0)
                total = total + (bprod + kterm) * cval
                off += child_sizes[q]
            return total

        return pair

    def __repr__(self):
        return (
            "LCMKernel(T={0}, Q={1}, ndim={2}, axes={3}, children={4})".format(
                self.T,
                self.Q,
                self.ndim,
                self.axes,
                [repr(c) for c in self.children],
            )
        )
