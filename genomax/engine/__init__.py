from genomax.engine.executor import Engine  # noqa: F401
