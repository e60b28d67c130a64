"""First-party native (C++) components.

batch_sampler.cpp — mmap-backed, GIL-free training-batch assembly
(compiled on first use by data/native_loader.py; C ABI via ctypes).
"""
