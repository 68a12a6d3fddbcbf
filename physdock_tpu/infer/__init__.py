from physdock_tpu.infer.pipeline import DockingPipeline  # noqa: F401
