from genomax.kernels import oracle  # noqa: F401
