from . import backproject, cluster, pca, voxel  # noqa: F401
