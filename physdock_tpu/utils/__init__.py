from physdock_tpu.utils import geometry, io  # noqa: F401
