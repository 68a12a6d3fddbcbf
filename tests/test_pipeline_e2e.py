"""End-to-end pipeline test: prepare -> featurize -> dock -> rank -> write.

The CPU analog of the on-chip e2e run (scripts/tpu_redock_e2e.py): toy
model, tiny crops, physics correction on, all outputs written and re-parsed
with our own parsers.
"""

import os

import numpy as np
import pytest

from physdock_tpu.utils.demo_assets import screening_dir, system_preparation_dir

DEMO = system_preparation_dir()
SCREEN_PKL = os.path.join(screening_dir(), "6kzd.pkl.gz")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(f"{DEMO}/EJQ.sdf"), reason="demo assets unavailable"
)
def test_redock_pipeline_end_to_end(tmp_path, toy_config):
    import jax

    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.data.mol import read_sdf
    from physdock_tpu.data.parsers import parse_pdb
    from physdock_tpu.data.system import generate_system
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    pkl = generate_system(
        f"{DEMO}/receptor.pdb", f"{DEMO}/EJQ.sdf", output_dir=str(tmp_path)
    )
    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2
    )
    fz = SystemFeaturizer(cfg.data, seed=0)
    params = load_params(None, cfg)
    pipe = DockingPipeline(
        cfg,
        params,
        fz,
        SamplerSettings(
            max_samples=2,
            num_samples_per_round=2,
            max_rounds=2,
            steps=3,
            enable_physics_correction=True,
            num_confs=4,
            enable_ranking=True,
        ),
    )
    out = str(tmp_path / "out")
    res = pipe.dock(pkl, out)
    assert res["num_poses"] >= 1
    assert res["top5_rmsd"] is not None and all(
        np.isfinite(r) for r in res["top5_rmsd"]
    )
    # outputs parse with our own readers
    chains = parse_pdb(os.path.join(out, "pred_rank0.pdb"))
    assert "A" in chains and len(chains["A"].residues) > 10
    lig = read_sdf(os.path.join(out, "ligand_rank0.sdf"))
    assert lig.num_atoms == 16 and len(lig.bonds) == 17
    assert os.path.exists(os.path.join(out, "top5_rmsd.json"))


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(SCREEN_PKL),
    reason="demo assets unavailable",
)
def test_screening_pipeline_end_to_end(tmp_path, toy_config):
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2
    )
    fz = SystemFeaturizer(cfg.data, seed=0)
    params = load_params(None, cfg)
    pipe = DockingPipeline(
        cfg,
        params,
        fz,
        SamplerSettings(
            max_samples=1,
            num_samples_per_round=1,
            max_rounds=1,
            steps=2,
            enable_physics_correction=False,
            enable_ranking=False,
        ),
    )
    results = pipe.screen(
        SCREEN_PKL,
        ["CCOc1ccccc1"],
        str(tmp_path / "vs"),
    )
    assert len(results) == 1
    assert "error" not in results[0], results[0]
    assert results[0]["num_poses"] == 1


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(SCREEN_PKL),
    reason="demo assets unavailable",
)
def test_screening_batched_multi_ligand(tmp_path):
    """Multi-ligand VS batching: several SMILES docked in one vmapped device
    program (guided), outputs per md5(smi) dir."""
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2
    )
    fz = SystemFeaturizer(cfg.data, seed=0)
    params = load_params(None, cfg)
    pipe = DockingPipeline(
        cfg,
        params,
        fz,
        SamplerSettings(
            max_samples=2,
            num_samples_per_round=2,
            max_rounds=2,
            steps=2,
            enable_physics_correction=True,
            num_confs=4,
            enable_ranking=False,
        ),
    )
    smiles = ["CCOc1ccccc1", "CCNC(=O)c1ccccc1", "CCCCO"]
    results = pipe.screen(
        SCREEN_PKL,
        smiles,
        str(tmp_path / "vs"),
        batch_size=3,
    )
    assert len(results) == 3
    for r in results:
        assert "error" not in r, r
        assert r["num_poses"] == 2
        assert r["vs_batch_size"] >= 1
    # outputs landed in per-md5 dirs
    from physdock_tpu.utils.io import md5_string

    for smi in smiles:
        d = tmp_path / "vs" / md5_string(smi)
        assert (d / "pred_rank0.pdb").exists(), smi
