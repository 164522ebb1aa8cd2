from . import layers, quantizer, generator  # noqa: F401
