"""Native (C++) host-side components, loaded via ctypes when built.

Build with: ``python -m birdsoundclassif_tpu.native.build`` (requires g++).
All consumers fall back to pure-python implementations when the shared
library is absent.
"""
