from genomax.cli.main import main  # noqa: F401
