from pose_refine_tpu.utils.timer import Timer, time_jitted  # noqa: F401
