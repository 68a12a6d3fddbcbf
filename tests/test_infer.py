"""Inference-layer tests: ranking, metrics, relaxation, validity checks."""

import numpy as np
import pytest

from physdock_tpu.infer import metrics as M
from physdock_tpu.infer import ranking as R
from physdock_tpu.utils.demo_assets import system_preparation_dir


def _demo_sdf():
    return f"{system_preparation_dir()}/EJQ.sdf"


def test_pairwise_rmsd_and_global_medoid():
    rng = np.random.default_rng(0)
    base = rng.normal(0, 3, (10, 3))
    # 4 poses near base, 1 outlier
    poses = np.stack([base + rng.normal(0, 0.1, base.shape) for _ in range(4)]
                     + [base + 5.0])
    order = R.rank_poses(poses, n_clusters=2)
    assert len(set(order)) == 5
    assert order[0] != 4  # outlier is never the global medoid


def test_rank_poses_single():
    assert R.rank_poses(np.zeros((1, 5, 3))) == [0]


def test_native_rmsd_matches_python():
    from physdock_tpu import native

    poses = np.random.default_rng(1).normal(0, 2, (6, 20, 3)).astype(np.float32)
    r_native = native.pairwise_rmsd(poses)
    r_py = R.pairwise_rmsd_matrix(poses)
    assert np.allclose(r_native, r_py, atol=1e-4)


def test_plddt_and_ptm_metrics():
    rng = np.random.default_rng(2)
    n, bins = 20, 50
    logits = rng.normal(0, 1, (n, bins))
    plddt = M.compute_plddt(logits)
    assert plddt.shape == (n,)
    assert np.all((plddt >= 0) & (plddt <= 100))

    pae_logits = rng.normal(0, 1, (n, n, 64))
    breaks = np.linspace(0, 31.5, 63)
    ptm = M.predicted_tm_score(pae_logits, breaks)
    assert 0 <= ptm <= 1
    asym = np.array([0] * 10 + [1] * 10)
    iptm = M.predicted_tm_score(pae_logits, breaks, asym_id=asym, interface=True)
    assert 0 <= iptm <= 1


def test_clash_detection():
    pos = np.concatenate([np.zeros((50, 3)), np.zeros((50, 3)) + 0.1], axis=0)
    mask = np.ones(100)
    asym = np.array([0] * 50 + [1] * 50)
    poly = np.ones(100)
    assert M.get_has_clash(pos, mask, asym, poly) == 1
    pos2 = np.concatenate([np.zeros((50, 3)), np.zeros((50, 3)) + 50.0], axis=0)
    assert M.get_has_clash(pos2, mask, asym, poly) == 0


def test_check_pose_on_demo_ligand():
    import os

    sdf = _demo_sdf()
    if not os.path.exists(sdf):
        pytest.skip("demo assets unavailable")
    from physdock_tpu.data.mol import read_sdf
    from physdock_tpu.infer.relax import check_pose

    mol = read_sdf(sdf)
    meta = {
        "ref_mol": mol,
        "ligand_atom_idx": np.arange(mol.num_atoms),
        "atom_elements": ["C"] * mol.num_atoms,
    }
    # the crystal pose must pass
    res = check_pose(mol.coords, meta)
    assert res["bond_lengths_ok"] and res["no_internal_clash"]
    # a collapsed pose must fail
    bad = mol.coords * 0.1
    res_bad = check_pose(bad, meta)
    assert not res_bad["pose_valid"]


def test_relax_complex_reduces_ligand_strain():
    import os

    sdf = _demo_sdf()
    if not os.path.exists(sdf):
        pytest.skip("demo assets unavailable")
    from physdock_tpu.data.mol import read_sdf
    from physdock_tpu.infer.relax import relax_complex
    from physdock_tpu.data.embed import ideal_bond_length

    mol = read_sdf(sdf)
    rng = np.random.default_rng(3)
    distorted = mol.coords + rng.normal(0, 0.25, mol.coords.shape).astype(np.float32)
    meta = {
        "ref_mol": mol,
        "ligand_atom_idx": np.arange(mol.num_atoms),
        "atom_names": ["C"] * mol.num_atoms,
    }
    relaxed = relax_complex(distorted, meta, iters=150)

    def strain(x):
        return np.mean(
            [
                abs(
                    np.linalg.norm(x[i] - x[j])
                    - ideal_bond_length(
                        int(mol.atomic_numbers[i]), int(mol.atomic_numbers[j]), o
                    )
                )
                for i, j, o in mol.bonds
            ]
        )

    assert strain(relaxed) < strain(distorted) * 0.6


def test_check_pose_angles_and_ez_stereo():
    """bond_angles_ok flags distorted angles; stereo_ez_ok flags an E/Z
    flip of a directional double bond (PoseBusters checks both)."""
    import numpy as np

    from physdock_tpu.data.smiles import mol_from_smiles
    from physdock_tpu.infer.relax import check_pose

    # trans-2-butene: C/C=C/C
    mol = mol_from_smiles("C/C=C/C")
    meta = {"ref_mol": mol, "ligand_atom_idx": np.arange(mol.num_atoms)}
    res = check_pose(mol.coords, meta)
    assert res["bond_angles_ok"]
    assert res["stereo_ez_ok"]

    # flip to cis by reflecting one terminal methyl across the C=C axis:
    # rotate atom b around the double bond by 180 degrees
    (a, bi, bj, b, is_trans) = mol.stereo_bonds[0]
    assert is_trans
    x = mol.coords.copy()
    axis = x[bj] - x[bi]
    axis = axis / np.linalg.norm(axis)
    v = x[b] - x[bj]
    # Rodrigues 180-degree rotation about the bond axis
    x[b] = x[bj] + 2 * axis * np.dot(axis, v) - v
    res_flip = check_pose(x, meta)
    assert not res_flip["stereo_ez_ok"]

    # squash an angle: move a methyl carbon onto the line of its neighbour
    bad = mol.coords.copy()
    bad[a] = bad[bi] + (bad[bi] - bad[bj])  # collinear -> 180-deg angle
    res_bad = check_pose(bad, meta)
    assert not res_bad["bond_angles_ok"]
