from ssf_slam_tpu.odometry.scan2scan import (  # noqa: F401
    fit_ring_diverse_planes,
    scan_to_scan,
    PlaneModel,
)
from ssf_slam_tpu.odometry.egomotion import (  # noqa: F401
    ego_motion_from_flow,
    ego_motion_gt_seg,
    ego_motion_gmm,
)
from ssf_slam_tpu.odometry.flow_refine import refine_flow_pose  # noqa: F401
