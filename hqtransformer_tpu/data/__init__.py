from . import datasets, tokenizers, transforms  # noqa: F401
