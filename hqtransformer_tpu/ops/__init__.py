from . import quantize, resample, topk_topp  # noqa: F401
