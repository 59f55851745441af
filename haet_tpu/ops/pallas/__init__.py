from . import slice_kernels  # noqa: F401
