from tpu_slam.registration.icp import ICPParams, ICPResult, icp
from tpu_slam.registration.robust import huber_weight, tukey_weight

__all__ = ["ICPParams", "ICPResult", "icp", "huber_weight", "tukey_weight"]
