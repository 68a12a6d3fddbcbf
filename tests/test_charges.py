"""PEOE ligand charges + typed receptor charges (data/charges.py) and the
electrostatic term in relax_complex (reference analogue: OpenMM amber14
relaxation, PhysDock/data/relaxation.py:243-259)."""

import numpy as np
import pytest

from physdock_tpu.data.charges import (
    gasteiger_charges,
    receptor_partial_charges,
)
from physdock_tpu.data.smiles import mol_from_smiles, parse_smiles


def _q(smi):
    m = parse_smiles(smi)
    return m, gasteiger_charges(m)


def test_total_charge_conserved_neutral():
    for smi in ["CCO", "c1ccccc1", "CC(=O)NC", "CS(=O)(=O)C"]:
        _, q = _q(smi)
        assert abs(q.sum()) < 1e-6, smi


def test_total_charge_conserved_ions():
    m, q = _q("CC(=O)[O-]")
    assert abs(q.sum() + 1.0) < 1e-6
    m, q = _q("C[NH3+]")
    assert abs(q.sum() - 1.0) < 1e-6


def test_ethanol_signs():
    m, q = _q("CCO")
    o = int(np.where(m.atomic_numbers == 8)[0][0])
    assert q[o] < -0.1  # hydroxyl O negative (united-atom: O+H)
    # alpha carbon more positive than the methyl
    c_alpha = [n for n, _, _ in _nbrs(m, o)][0]
    c_methyl = [a for a in range(3) if a not in (o, c_alpha)][0]
    assert q[c_alpha] > q[c_methyl]


def _nbrs(m, a):
    out = []
    for bi, (i, j, o) in enumerate(m.bonds):
        if i == a:
            out.append((j, o, bi))
        elif j == a:
            out.append((i, o, bi))
    return out


def test_carboxylate_oxygens_most_negative_and_equalish():
    m, q = _q("CC(=O)[O-]")
    o_idx = np.where(m.atomic_numbers == 8)[0]
    assert all(q[i] == q.min() or q[i] < -0.3 for i in o_idx)
    # symmetric after charge delocalization? PEOE works on the localized
    # graph, so just require both strongly negative
    assert max(q[i] for i in o_idx) < -0.3


def test_symmetry_equivalent_atoms_equal():
    m, q = _q("CC(C)C")  # isobutane: 3 methyls identical
    methyls = [a for a in range(m.num_atoms) if len(_nbrs(m, a)) == 1]
    assert len(methyls) == 3
    vals = [q[a] for a in methyls]
    assert np.ptp(vals) < 1e-9


def test_carbonyl_polarization():
    m, q = _q("CC(=O)C")  # acetone
    o = int(np.where(m.atomic_numbers == 8)[0][0])
    c_carbonyl = _nbrs(m, o)[0][0]
    assert q[o] < -0.2
    assert q[c_carbonyl] > 0.1


def test_fluorine_most_electronegative():
    m, q = _q("CF")
    f = int(np.where(m.atomic_numbers == 9)[0][0])
    assert q[f] < -0.15
    assert q[1 - f] > 0.0


def test_ammonium_positive_on_nitrogen():
    m, q = _q("C[NH3+]")
    n = int(np.where(m.atomic_numbers == 7)[0][0])
    assert q[n] > 0.3  # united-atom NH3+ carries most of the +1


# ---------------------------------------------------------------- receptor


def test_receptor_residue_monopoles():
    res = ["ASP"] * 4 + ["LYS"] * 3 + ["ALA"] * 3
    names = ["CG", "OD1", "OD2", "CB", "NZ", "CE", "CD", "N", "CA", "O"]
    rid = [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    q = receptor_partial_charges(res, names, rid)
    assert abs(q[:4].sum() + 1.0) < 1e-6  # ASP -1
    assert abs(q[4:7].sum() - 1.0) < 1e-6  # LYS +1
    assert abs(q[7:].sum()) < 1e-6  # ALA 0


def test_receptor_key_atom_signs():
    res = ["ASP", "ASP", "LYS", "SER", "SER", "GLY", "GLY"]
    names = ["OD1", "OD2", "NZ", "OG", "CB", "N", "O"]
    rid = [0, 0, 1, 2, 2, 3, 3]
    q = receptor_partial_charges(res, names, rid)
    assert q[0] < -0.4 and q[1] < -0.4  # carboxylate
    assert q[2] > 0.4  # ammonium
    assert q[3] < 0  # hydroxyl


# ------------------------------------------------------------ integration


def test_relax_electrostatics_pulls_salt_bridge():
    """A ligand carboxylate placed 4.5 A from a LYS NZ moves closer under
    the Coulomb term than without it (same everything else)."""
    from physdock_tpu.infer.relax import relax_complex

    mol = mol_from_smiles("CC(=O)[O-]", seed=0)
    lig = mol.coords.copy()
    o_neg = int(np.argmin(gasteiger_charges(mol)))
    # receptor: a lone LYS NZ 4.5 A away from the anionic O, plus a CA far
    # away to anchor the frame
    nz = lig[o_neg] + np.array([4.5, 0, 0], np.float32)
    ca = lig[o_neg] + np.array([12.0, 0, 0], np.float32)
    x = np.concatenate([np.stack([nz, ca]), lig]).astype(np.float32)
    meta = {
        "ref_mol": mol,
        "ligand_atom_idx": np.arange(2, 2 + mol.num_atoms),
        "atom_names": ["NZ", "CA"] + ["C"] * mol.num_atoms,
        "ccds": ["LYS", "LIG"],
        "chunk_sizes": np.array([2, mol.num_atoms]),
    }
    x_on = relax_complex(x, meta, iters=150, elec_weight=2.0)
    x_off = relax_complex(x, meta, iters=150, elec_weight=0.0)
    d_on = np.linalg.norm(x_on[2 + o_neg] - x_on[0])
    d_off = np.linalg.norm(x_off[2 + o_neg] - x_off[0])
    assert d_on < d_off - 0.05
    assert np.isfinite(x_on).all()


def test_relax_still_finite_without_charge_meta():
    from physdock_tpu.infer.relax import relax_complex

    mol = mol_from_smiles("CCO", seed=1)
    lig = mol.coords.copy()
    rec = lig.mean(0)[None] + np.array([[6.0, 0, 0]], np.float32)
    x = np.concatenate([rec, lig]).astype(np.float32)
    meta = {
        "ref_mol": mol,
        "ligand_atom_idx": np.arange(1, 1 + mol.num_atoms),
        "atom_names": ["CA"] + ["C"] * mol.num_atoms,
    }
    out = relax_complex(x, meta, iters=30)
    assert np.isfinite(out).all()
