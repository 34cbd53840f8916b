"""Native (C++) components with ctypes bindings and numpy fallbacks.

The reference's only first-class native code is SAM2's CUDA connected-
components kernel (SURVEY.md §2.8). enhax rebuilds it as a host-side C++
union-find (native/ccl.cpp) — masks live on the host at post-processing
time — loaded via ctypes (no pybind11 in this image), with a pure-numpy
fallback when the toolchain is unavailable.
"""

from enhax.native.nms import nms
from enhax.native.ccl import (
    connected_components, remove_small_regions, native_available,
)
