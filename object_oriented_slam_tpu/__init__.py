"""object_oriented_slam_tpu: a TPU-native object-level SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
XunshanMan/Object-oriented-SLAM ("EllipsoidSLAM"): RGB-D object-level SLAM
with ellipsoid (dual quadric) landmarks, symmetry-aided single-frame
estimation, SVD quadric initialization, and a batched LM bundle-adjustment
backend that shards across TPU device meshes.
"""
from . import core  # noqa: F401

__version__ = "0.1.0"
