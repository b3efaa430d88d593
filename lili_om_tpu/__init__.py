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
