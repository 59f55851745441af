from . import config, env  # noqa: F401
