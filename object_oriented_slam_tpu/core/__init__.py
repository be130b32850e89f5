from . import se3, ellipsoid, plane, camera  # noqa: F401
