from . import backproject, cluster, filters, linalg, pca, polygon, voxel  # noqa: F401
