from pose_refine_tpu.ops.rasterize import (  # noqa: F401
    render,
    rasterize_dense,
    rasterize_scatter,
    max_bbox_extent,
    screen_triangles,
)
from pose_refine_tpu.ops.convert import (  # noqa: F401
    raw_to_depth_u16,
    raw_to_mask_u8,
    raw_to_depth_mask,
)
