"""PoseBusters-grade decoy suite for check_pose (VERDICT r2 item 6).

Each test perturbs a known-good pose with one specific defect and asserts
the corresponding check fires — and ONLY fires on the decoy, never on the
clean pose.  This pins check_pose's thresholds against PoseBusters
semantics (reference: data/relaxation.py:29-50 shells out to the
PoseBusters package; thresholds documented in infer/relax.py).
"""

import os

import numpy as np
import pytest

from physdock_tpu.data.smiles import mol_from_smiles
from physdock_tpu.infer.relax import check_pose

from physdock_tpu.utils.demo_assets import system_preparation_dir

SDF = f"{system_preparation_dir()}/EJQ.sdf"


def _meta(mol):
    return {"ref_mol": mol, "ligand_atom_idx": np.arange(mol.num_atoms)}


@pytest.fixture(scope="module")
def ejq():
    if not os.path.exists(SDF):
        pytest.skip("demo assets unavailable")
    from physdock_tpu.data.mol import read_sdf

    return read_sdf(SDF)


def test_clean_pose_passes(ejq):
    res = check_pose(ejq.coords, _meta(ejq))
    assert res["bond_lengths_ok"], res
    assert res["no_internal_clash"], res
    assert res["bond_angles_ok"], res
    assert res["aromatic_flatness_ok"], res
    assert res["num_internal_clashes"] == 0
    assert res["num_bond_violations"] == 0


def test_stretched_bond_fires(ejq):
    i, j, _ = ejq.bonds[0]
    x = ejq.coords.copy()
    # pull atom j (and nothing else) 1.5x the bond vector away
    x[j] = x[i] + (x[j] - x[i]) * 1.6
    res = check_pose(x, _meta(ejq))
    assert not res["bond_lengths_ok"]
    assert res["num_bond_violations"] >= 1


def test_buried_internal_clash_fires(ejq):
    # fold a terminal atom onto a graph-distant atom's position
    gd = ejq.shortest_path_matrix()
    iu = np.unravel_index(np.argmax(gd), gd.shape)
    a, b = int(iu[0]), int(iu[1])
    assert gd[a, b] >= 4
    x = ejq.coords.copy()
    x[a] = x[b] + 0.6  # well inside 0.7 x vdW contact (~2.4 A for C-C)
    res = check_pose(x, _meta(ejq))
    assert not res["no_internal_clash"]
    assert res["num_internal_clashes"] >= 1


def test_moderate_overlap_still_fires(ejq):
    """The old 0.35x-contact threshold only caught catastrophic overlaps;
    a 2.0 A C...C contact (well under 0.7 x 3.4 = 2.38 A) must now fail."""
    gd = ejq.shortest_path_matrix()
    iu = np.unravel_index(np.argmax(gd), gd.shape)
    a, b = int(iu[0]), int(iu[1])
    x = ejq.coords.copy()
    d = x[b] - x[a]
    x[a] = x[b] - d / np.linalg.norm(d) * 2.0
    res = check_pose(x, _meta(ejq))
    assert not res["no_internal_clash"]


def test_receptor_buried_clash_fires(ejq):
    n = ejq.num_atoms
    # synthetic receptor: a CA atom placed on top of ligand atom 0
    rec = np.array([ejq.coords[0] + 0.5])
    x = np.concatenate([ejq.coords, rec], axis=0)
    meta = {
        "ref_mol": ejq,
        "ligand_atom_idx": np.arange(n),
        "atom_names": [""] * n + ["CA"],
    }
    res = check_pose(x, meta)
    assert not res["no_receptor_clash"]
    assert res["num_receptor_clashes"] >= 1
    assert not res["volume_overlap_ok"] or res["num_receptor_clashes"] > 0

    # receptor at healthy contact distance (3.6 A) must pass
    direction = np.array([1.0, 0.0, 0.0])
    far = ejq.coords[np.argmax(ejq.coords[:, 0])] + direction * 3.6
    x2 = np.concatenate([ejq.coords, far[None]], axis=0)
    res2 = check_pose(x2, meta)
    assert res2["no_receptor_clash"], res2
    assert res2["near_protein_ok"]


def test_floating_ligand_fires(ejq):
    n = ejq.num_atoms
    rec = ejq.coords.mean(0, keepdims=True) + 50.0
    x = np.concatenate([ejq.coords, rec], axis=0)
    meta = {
        "ref_mol": ejq,
        "ligand_atom_idx": np.arange(n),
        "atom_names": [""] * n + ["CA"],
    }
    res = check_pose(x, meta)
    assert not res["near_protein_ok"]


def test_inverted_chiral_center_fires():
    # L-alanine-like fragment with an explicit chiral centre
    mol = mol_from_smiles("C[C@H](N)C(=O)O")
    centers = mol.chiral_centers()
    if not centers:
        pytest.skip("no chiral centre perceived")
    centre, nbrs = centers[0]
    # the neighbour tuple may include the centre itself (implicit-H
    # convention); the reflection plane must exclude it
    heavy = [a for a in nbrs if a != centre][:3]
    if len(heavy) < 3:
        pytest.skip("centre lacks 3 heavy neighbours")
    x = mol.coords.copy()
    res = check_pose(x, _meta(mol))
    assert res["chirality_ok"]
    # reflect the centre's position through the plane of its 3 heavy
    # neighbours -> inverts the signed volume
    pts = x[heavy]
    n_vec = np.cross(pts[1] - pts[0], pts[2] - pts[0])
    n_vec /= np.linalg.norm(n_vec) + 1e-9
    v = x[centre] - pts.mean(0)
    x[centre] = pts.mean(0) + v - 2 * np.dot(v, n_vec) * n_vec
    res_bad = check_pose(x, _meta(mol))
    assert not res_bad["chirality_ok"]


def test_punched_aromatic_ring_fires(ejq):
    arom = ejq.aromatic_atoms()
    ring = next(
        (r for r in ejq.rings() if len(r) >= 5 and all(arom[a] for a in r)),
        None,
    )
    if ring is None:
        pytest.skip("no aromatic ring in demo ligand")
    x = ejq.coords.copy()
    pts = x[ring]
    n_vec = np.cross(pts[1] - pts[0], pts[2] - pts[0])
    n_vec /= np.linalg.norm(n_vec) + 1e-9
    # push alternating ring atoms out of plane (boat/punch deformation)
    for k, a in enumerate(ring):
        x[a] = x[a] + n_vec * (0.45 if k % 2 == 0 else -0.45)
    res = check_pose(x, _meta(ejq))
    assert not res["aromatic_flatness_ok"]
    assert res["num_aromatic_flatness_violations"] >= 1


def test_counts_accumulate_not_first_hit(ejq):
    """Violation counts must reflect ALL defects, not stop at the first."""
    x = ejq.coords.copy()
    (i0, j0, _), (i1, j1, _) = ejq.bonds[0], ejq.bonds[-1]
    x[j0] = x[i0] + (x[j0] - x[i0]) * 1.6
    x[j1] = x[i1] + (x[j1] - x[i1]) * 1.6
    res = check_pose(x, _meta(ejq))
    assert res["num_bond_violations"] >= 2


def test_restraints_cached_per_molecule(ejq):
    from physdock_tpu.infer.relax import _cached_restraints

    rs1 = _cached_restraints(ejq)
    rs2 = _cached_restraints(ejq)
    assert rs1 is rs2
