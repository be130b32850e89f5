from .extractor import ExtractorConfig, extract_local_ellipsoids, make_extractor  # noqa: F401
from .ground_plane import GroundPlaneConfig, estimate_ground_plane, make_plane_estimator  # noqa: F401
