"""Native C++ host-runtime kernels (sequential hot loops).

Provides ctypes bindings to libscrappie_host.so when it has been built
(python -m scrappie_tpu.native.build); importing any symbol raises
ImportError otherwise, and callers fall back to pure-Python ports.
"""

from __future__ import annotations


def __getattr__(name):
    if name.startswith("_"):
        raise AttributeError(name)
    import importlib

    bindings = importlib.import_module("scrappie_tpu.native.bindings")
    return getattr(bindings, name)
