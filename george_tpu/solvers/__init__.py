# -*- coding: utf-8 -*-
"""Solvers: exact (dense Cholesky), hierarchical (HODLR-class), sparse
(compact support), and trivial (diagonal).

Protocol (reference ``docs/user/solvers.rst`` and ``basic.py:67-317``):
``compute(x, yerr, nns=None)``, ``apply_inverse(y)``, ``dot_solve(y)``,
``apply_sqrt(r)``, ``apply_forward(y, i)``, ``get_inverse()``,
``log_determinant``, ``computed``.
"""

from .trivial import TrivialSolver  # noqa: F401
from .basic import BasicSolver  # noqa: F401

__all__ = ["TrivialSolver", "BasicSolver"]

try:  # Hierarchical and sparse solvers land incrementally.
    from .hodlr import HODLRSolver  # noqa: F401

    __all__.append("HODLRSolver")
except ImportError:  # pragma: no cover
    pass

try:
    from .sparse import SparseSolver  # noqa: F401

    __all__.append("SparseSolver")
except ImportError:  # pragma: no cover
    pass

try:
    from .hmatrix import HMatrixSolver  # noqa: F401

    __all__.append("HMatrixSolver")
except ImportError:  # pragma: no cover
    pass
