from . import lidar, trajectory, world  # noqa: F401
