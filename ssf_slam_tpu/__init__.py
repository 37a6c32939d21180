"""ssf_slam_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of SSF-SLAM.

A semantic scene-flow SLAM framework for dynamic traffic scenes, re-designed
TPU-first: the reference's five-process ROS pipeline (feature extraction ->
odometry -> mapping, fed by a PyTorch scene-flow front-end) becomes a single
pure function ``step(state, scan) -> (state, outputs)`` jitted end-to-end,
scanned over sequences with ``lax.scan`` and vmapped/sharded across sequences
on a TPU mesh.

Subpackages
-----------
- ``ops``       geometry + kernel substrate (SE3, kNN, FPS, grouping, voxel,
                Kabsch, GMM-EM) — replaces PCL / pointnet2-CUDA / Eigen
- ``frontend``  ring binning + curvature + planar feature extraction
                (replaces src/frameFeature.cpp)
- ``odometry``  scan-to-scan point-to-plane Gauss-Newton + flow ego-motion
                (replaces src/lidarOdometry*.cpp + Ceres and the Python
                front-end publishers)
- ``mapping``   keyframe pose-graph back-end with loop closure
                (replaces src/mapOptmization.cpp + GTSAM + PCL ICP)
- ``models``    TFlow scene-flow network + segmentation head in Flax
                (replaces scripts/ActiveSceneFlow TFlowV3_Occlussion.py et al.)
- ``data``      CARLA-style npz sequence IO + synthetic sequence generation
- ``train``     scene-flow training loop (Adam, exp decay, ckpt-on-best)
- ``engine``    the fused SLAM step / sequence runner / TUM output
- ``parallel``  mesh + sharding helpers for multi-chip scale-out
"""

__version__ = "0.1.0"

from ssf_slam_tpu.config import (  # noqa: F401
    LidarConfig,
    OdometryConfig,
    MappingConfig,
    FlowNetConfig,
    PipelineConfig,
    Variant,
)
