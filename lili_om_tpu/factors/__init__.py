from . import lidar, imu, prior  # noqa: F401
