from physdock_tpu.model.physdock import PhysDock  # noqa: F401
from physdock_tpu.model.diffusion import (  # noqa: F401
    karras_noise_schedule,
    sample_diffusion,
)
