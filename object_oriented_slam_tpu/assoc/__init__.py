from .association import InstanceCounter, associate_observations  # noqa: F401
