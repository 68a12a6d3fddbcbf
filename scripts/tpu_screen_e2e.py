"""Virtual-screening e2e on TPU: 2 SMILES into the 6KZD pocket, medium model."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.feature_loader import SystemFeaturizer
from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
from physdock_tpu.cli.common import load_params
from physdock_tpu.utils.demo_assets import screening_dir

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

DEMO = screening_dir()
cfg = PhysDockConfig.named("medium", crop_size=256, atom_crop_size=2048, bf16=True,
                           num_augmentation_sample=2)
fz = SystemFeaturizer(
    cfg.data,
    msa_features_dir=f"{DEMO}/features/msa_features",
    uniprot_msa_features_dir=f"{DEMO}/features/uniprot_msa_features",
    seed=0,
)
params = load_params(None, cfg)
pipe = DockingPipeline(cfg, params, fz, SamplerSettings(
    max_samples=5, num_samples_per_round=5, max_rounds=1, steps=40,
    enable_physics_correction=True, num_confs=32, enable_ranking=True))
smis = [l.strip() for l in open(f"{DEMO}/demo_db.txt")][:2]
t0 = time.time()
results = pipe.screen(f"{DEMO}/6kzd.pkl.gz", smis, "/tmp/tpu_vs")
for r in results:
    log(str({k: v for k, v in r.items() if k != "rank_order"}))
log(f"total {time.time()-t0:.1f}s")
assert all("error" not in r for r in results), results
