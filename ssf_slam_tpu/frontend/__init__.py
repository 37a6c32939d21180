from ssf_slam_tpu.frontend.features import (  # noqa: F401
    extract_plane_features,
    assign_scan_rows,
    FeatureCloud,
)
