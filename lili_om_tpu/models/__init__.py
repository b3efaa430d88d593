from . import odometry  # noqa: F401
