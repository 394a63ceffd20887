from pose_refine_tpu.scene.projective import (  # noqa: F401
    SceneProjective,
    SceneProjectiveStack,
)
from pose_refine_tpu.scene.nn import SceneNN, SceneNNStack  # noqa: F401
from pose_refine_tpu.scene.kdtree import KDTree, build_kdtree  # noqa: F401
