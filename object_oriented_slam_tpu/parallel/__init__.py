from .dist_lm import AXIS, optimize_objects_sharded  # noqa: F401
