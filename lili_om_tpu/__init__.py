"""lili_om_tpu — a TPU-native LiDAR-inertial odometry & mapping engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
KIT-ISAS/lili-om (tightly-coupled keyframe-based LiDAR-inertial SLAM):

* ``utils``    — quaternion/SE(3) math, config, timing.
* ``ops``      — compute kernels: IMU preintegration, feature extraction
                 (Livox eigen-patch + spinning-LiDAR LOAM curvature), kNN map
                 association, voxel downsampling, Schur-complement
                 marginalization, point-to-plane ICP.
* ``factors``  — residuals + tangent-space Jacobians: lidar plane/edge,
                 IMU preintegration, relative-pose, marginal & speed-bias
                 priors.
* ``solver``   — batched Gauss-Newton/LM normal-equation machinery.
* ``models``   — pipeline stages: frontend scan-to-map odometry, backend
                 sliding-window fusion, global pose graph, loop closure, and
                 the full system orchestrator.
* ``parallel`` — device-mesh sharding: distributed residual/Jacobian
                 assembly and Schur reduction over ICI collectives.
* ``sim``      — synthetic worlds and sensor models (the test substrate that
                 replaces the reference's rosbags).
* ``io``       — dataset loading and checkpointing.
"""

__version__ = "0.1.0"

_TOP_LEVEL = {
    "LiliOmSystem": ("lili_om_tpu.models.system", "LiliOmSystem"),
    "PipelineRunner": ("lili_om_tpu.runtime.pipeline", "PipelineRunner"),
    "load_config": ("lili_om_tpu.utils.config", "load_config"),
    "export_run": ("lili_om_tpu.utils.viz", "export_run"),
}


def __getattr__(name):
    """Lazy top-level convenience exports (`from lili_om_tpu import
    LiliOmSystem, load_config`) — lazy so `import lili_om_tpu` stays cheap
    and never triggers JAX backend initialization."""
    try:
        mod, attr = _TOP_LEVEL[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(mod), attr)
