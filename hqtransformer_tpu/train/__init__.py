from . import scheduler, stage2  # noqa: F401

try:
    from . import stage1  # noqa: F401
except ImportError:  # pragma: no cover
    stage1 = None
