from ssf_slam_tpu.models.tflow import TFlow, multi_scale_loss  # noqa: F401
from ssf_slam_tpu.models.segnet import SegNet  # noqa: F401
