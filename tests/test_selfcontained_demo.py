"""Self-contained demo: synthesize a complex from nothing and dock it.

Unlike test_pipeline_e2e (which prepares the reference's demo PDB/SDF),
everything here is generated in-repo (data/demo.py): ideal-geometry
two-helix receptor + SMILES-embedded ligand placed in the groove.  Proves
the full prepare -> featurize -> dock -> rank -> write loop needs no
assets outside the repository.
"""

import os

import numpy as np
import pytest


def test_demo_receptor_geometry():
    from physdock_tpu.data.demo import DEMO_SEQUENCE, build_helix, make_demo_receptor

    helix = build_helix(DEMO_SEQUENCE)
    ca = np.array([r["CA"] for r in helix])
    d = np.linalg.norm(ca[1:] - ca[:-1], axis=-1)
    assert np.allclose(d, 3.80, atol=0.05)  # alpha-helical CA-CA
    rise = np.linalg.norm(ca[-1] - ca[0]) / (len(ca) - 1)
    assert 1.4 < rise < 1.7  # ~1.5 A/residue along the axis
    # peptide bond C(i) - N(i+1) continuous
    cn = np.array(
        [np.linalg.norm(helix[i + 1]["N"] - helix[i]["C"])
         for i in range(len(helix) - 1)]
    )
    assert np.allclose(cn, 1.329, atol=0.01)

    pdb_text, groove, rec_xyz = make_demo_receptor()
    from physdock_tpu.data.parsers import parse_pdb

    chains = parse_pdb(pdb_text)
    assert set(chains) == {"A", "B"}
    assert len(chains["A"].residues) == len(DEMO_SEQUENCE)
    assert rec_xyz.shape[1] == 3 and len(rec_xyz) > 4 * len(DEMO_SEQUENCE)


def test_demo_complex_builds_and_featurizes(tmp_path):
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.demo import make_demo_complex
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.utils.io import load_pkl

    pkl = make_demo_complex(str(tmp_path))
    system = load_pkl(pkl)
    assert set(system) == {"A", "B", "1"}
    assert "ligand_meta" in system["1"]
    # clash-free placement
    rec = np.concatenate(
        [np.concatenate(system[c]["all_atom_positions"]) for c in "AB"])
    msk = np.concatenate(
        [np.concatenate(system[c]["all_atom_mask"]) for c in "AB"]).astype(bool)
    lig = system["1"]["all_atom_positions"][0]
    dmin = np.min(np.linalg.norm(lig[:, None] - rec[msk][None], axis=-1))
    assert dmin > 2.5

    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2)
    fz = SystemFeaturizer(cfg.data, seed=0)
    feats, meta = fz.load(pkl)
    assert np.isfinite(feats["ref_pos"]).all()
    assert feats["token_index"].shape[0] == 64


@pytest.mark.slow
def test_selfcontained_redock_end_to_end(tmp_path):
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.demo import make_demo_complex
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.data.mol import read_sdf
    from physdock_tpu.data.parsers import parse_pdb
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    pkl = make_demo_complex(str(tmp_path))
    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2)
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
        np.isfinite(r) for r in res["top5_rmsd"])
    chains = parse_pdb(os.path.join(out, "pred_rank0.pdb"))
    assert "A" in chains and "B" in chains
    lig = read_sdf(os.path.join(out, "ligand_rank0.sdf"))
    assert lig.num_atoms == 11  # paracetamol heavy atoms


@pytest.mark.slow
def test_selfcontained_screening(tmp_path):
    """Virtual screening against the synthetic receptor: SMILES library in,
    per-md5 output dirs out — still zero external assets."""
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.demo import make_demo_complex
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    pkl = make_demo_complex(str(tmp_path))
    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2)
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
        pkl, ["CCOc1ccccc1", "CCCCO"], str(tmp_path / "vs"), batch_size=2)
    assert len(results) == 2
    for r in results:
        assert "error" not in r, r
        assert r["num_poses"] == 1


def test_shared_ccd_code_across_systems_not_poisoned(tmp_path):
    """Two systems whose ligands both use the generic "LIG" CCD code (every
    system.py-built pkl does) must each featurize with their OWN chemistry.
    Regression: the registry cached the first system's ligand_meta and the
    second silently inherited it (wrong atoms or IndexError) — the exact
    workflow of scripts/generalization_gate.py."""
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.demo import make_demo_complex
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.utils.io import load_pkl

    pkl_a = make_demo_complex(str(tmp_path / "a"), name="SYSA",
                              smiles="CC(=O)Oc1ccccc1C(=O)O", seed=0)
    pkl_b = make_demo_complex(str(tmp_path / "b"), name="SYSB",
                              smiles="c1ccc2c(c1)Cc1ccccc1N2", seed=1)
    n_a = len(load_pkl(pkl_a)["1"]["all_atom_positions"][0])
    n_b = len(load_pkl(pkl_b)["1"]["all_atom_positions"][0])
    assert n_a != n_b  # distinct molecules behind the same "LIG" code

    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2)
    fz = SystemFeaturizer(cfg.data, seed=0)
    for pkl, n_lig in ((pkl_a, n_a), (pkl_b, n_b)):
        feats, meta = fz.load(pkl)
        ref_mol = meta.get("ref_mol")
        assert ref_mol is not None and ref_mol.num_atoms == n_lig
        assert np.isfinite(feats["ref_pos"]).all()
