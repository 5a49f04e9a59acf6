from . import windows, stateful  # noqa: F401
