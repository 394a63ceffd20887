from pose_refine_tpu.scene.projective import SceneProjective  # noqa: F401
