"""End-to-end guided redocking on the TPU: real demo system, medium model."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.feature_loader import SystemFeaturizer
from physdock_tpu.data.system import generate_system
from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
from physdock_tpu.cli.common import load_params
from physdock_tpu.utils.demo_assets import system_preparation_dir

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

pkl = generate_system(
    f"{system_preparation_dir()}/receptor.pdb",
    f"{system_preparation_dir()}/EJQ.sdf",
    output_dir="/tmp/tpu_e2e/sys",
)
log(f"system: {pkl}")
cfg = PhysDockConfig.named("medium", crop_size=256, atom_crop_size=2048, bf16=True,
                          num_augmentation_sample=2, infer_use_pocket=True)
fz = SystemFeaturizer(cfg.data, seed=0)
params = load_params(None, cfg)
log("params initialized")
pipe = DockingPipeline(cfg, params, fz, SamplerSettings(
    max_samples=10, num_samples_per_round=5, max_rounds=2, steps=40,
    enable_physics_correction=True, num_confs=64, enable_ranking=True))
t0 = time.time()
res = pipe.dock(pkl, "/tmp/tpu_e2e/out")
log(f"dock result: {res}")
log(f"total {time.time()-t0:.1f}s")
print(sorted(os.listdir("/tmp/tpu_e2e/out")))
