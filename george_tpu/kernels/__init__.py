# -*- coding: utf-8 -*-
"""The kernel zoo: DSL-generated JAX kernels plus composition operators.

All 15 reference kernels (ids 0-14, reference ``kernels.py`` /
``kernels.h``) with ``+`` / ``*`` algebra, three metric types, axis
subspaces, per-axis blocks, compact support, and multi-output LCM.
"""

from .base import (  # noqa: F401
    Kernel,
    Sum,
    Product,
    StationaryKernel,
    NonStationaryKernel,
    safe_sqrt,
)
from .generated import (  # noqa: F401
    LinearKernel,
    RationalQuadraticKernel,
    ExpKernel,
    LocalGaussianKernel,
    EmptyKernel,
    CosineKernel,
    Matern52Kernel,
    ExpSine2Kernel,
    ConstantKernel,
    ExpSquaredKernel,
    Matern32Kernel,
    PolynomialKernel,
    DotProductKernel,
)
from .custom import LCMKernel, WendlandC2Kernel  # noqa: F401

__all__ = [
    "Kernel",
    "Sum",
    "Product",
    "LinearKernel",
    "RationalQuadraticKernel",
    "ExpKernel",
    "LocalGaussianKernel",
    "EmptyKernel",
    "CosineKernel",
    "Matern52Kernel",
    "ExpSine2Kernel",
    "ConstantKernel",
    "ExpSquaredKernel",
    "Matern32Kernel",
    "PolynomialKernel",
    "DotProductKernel",
    "LCMKernel",
    "WendlandC2Kernel",
]
