"""First-party native (C++) kernels, shipped as source and built on first
use (``segment.felzenszwalb`` shells out to ``make``/``g++``; a bit-parity
numpy fallback covers hosts without a toolchain). This ``__init__`` exists
so setuptools' package discovery includes the directory — without it the
``[tool.setuptools.package-data]`` entry is silently ignored and wheels
ship without the kernel sources.
"""
