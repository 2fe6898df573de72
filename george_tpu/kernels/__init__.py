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
from .generated import *  # noqa: F401,F403  (XKernel + BaseXKernel pairs)
from .generated import __all__ as _generated_all
from .custom import (  # noqa: F401
    LCMKernel,
    WendlandC2Kernel,
    BaseLCMKernel,
    BaseWendlandC2Kernel,
)

__all__ = [
    "Kernel",
    "Sum",
    "Product",
    "LCMKernel",
    "WendlandC2Kernel",
    "BaseLCMKernel",
    "BaseWendlandC2Kernel",
] + list(_generated_all)
