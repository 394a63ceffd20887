from pose_refine_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_pose_batch,
    refine_poses_sharded,
)
