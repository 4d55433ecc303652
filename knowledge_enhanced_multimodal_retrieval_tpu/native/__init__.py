"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is Pallas/XLA; these are the *host* hot paths. Each
component builds lazily with ``g++`` on first use and degrades gracefully to
the pure-Python implementation when a toolchain is unavailable.
"""

from .build import load_library, native_available  # noqa: F401
