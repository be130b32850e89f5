from .lm import LMConfig, ObjectObservations, optimize_objects  # noqa: F401
from .lm_soa import optimize_objects_soa  # noqa: F401
from . import residuals  # noqa: F401
