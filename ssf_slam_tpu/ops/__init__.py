"""Geometry + kernel substrate: TPU-native replacements for PCL, Eigen,
pyquaternion, sklearn, and the external pointnet2 CUDA op library."""

from ssf_slam_tpu.ops.se3 import (  # noqa: F401
    quat_identity,
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    quat_from_rpy,
    quat_to_rpy,
    so3_exp_quat,
    pose_identity,
    pose_compose,
    pose_inverse,
    pose_apply,
    pose_between,
    pose_from_rt,
)
from ssf_slam_tpu.ops.knn import knn, pairwise_sqdist  # noqa: F401
from ssf_slam_tpu.ops.fps import farthest_point_sample  # noqa: F401
from ssf_slam_tpu.ops.grouping import gather_points, group_points  # noqa: F401
from ssf_slam_tpu.ops.interp import three_nn_interpolate, knn_interpolate  # noqa: F401
from ssf_slam_tpu.ops.voxel import voxel_downsample  # noqa: F401
from ssf_slam_tpu.ops.kabsch import kabsch  # noqa: F401
from ssf_slam_tpu.ops.gmm import gmm_em, gmm_background_mask  # noqa: F401
