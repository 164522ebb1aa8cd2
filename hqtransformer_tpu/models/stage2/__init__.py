from . import hierarchical, layers, transformer  # noqa: F401

try:  # 3-level model, added after the 2-level spine
    from . import multilevel  # noqa: F401
except ImportError:  # pragma: no cover
    multilevel = None
