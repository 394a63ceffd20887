from pose_refine_tpu.scene.projective import SceneProjective  # noqa: F401
from pose_refine_tpu.scene.nn import SceneNN  # noqa: F401
from pose_refine_tpu.scene.kdtree import KDTree, build_kdtree  # noqa: F401
