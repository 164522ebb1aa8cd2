from . import fid, inception, prdc  # noqa: F401
