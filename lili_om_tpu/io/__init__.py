from . import checkpoint, livox, pcd  # noqa: F401
