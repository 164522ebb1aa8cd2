from . import stage1, stage2  # noqa: F401
