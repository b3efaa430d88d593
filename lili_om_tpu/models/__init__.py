from . import fusion, odometry, pose_graph, system  # noqa: F401
