"""Native (C++) runtime components, loaded via ctypes.

The shared library is compiled on first use with the system toolchain and
cached next to the sources. Everything has a pure-Python fallback so the
framework works without a compiler.
"""
from mile_tpu.native.sink import NativeSampleSink, native_available  # noqa: F401
