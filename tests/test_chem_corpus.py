"""Chem-stack hardening: a corpus of real drug SMILES through the full
RDKit-free pipeline (parse -> embed -> featurize -> conformers -> FF ->
SDF round-trip)."""

import numpy as np
import pytest

from physdock_tpu.data.embed import generate_conformers, ideal_bond_length
from physdock_tpu.data.mol import conformer_features, read_sdf, write_sdf
from physdock_tpu.data.smiles import mol_from_smiles, parse_smiles

DRUGS = {
    "aspirin": "CC(=O)Oc1ccccc1C(=O)O",
    "caffeine": "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "ibuprofen": "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "paracetamol": "CC(=O)Nc1ccc(O)cc1",
    "naproxen": "COc1ccc2cc(ccc2c1)C(C)C(=O)O",
    "warfarin": "CC(=O)CC(c1ccccc1)c1c(O)c2ccccc2oc1=O",
    "metformin": "CN(C)C(=N)NC(=N)N",
    "atenolol": "CC(C)NCC(O)COc1ccc(CC(N)=O)cc1",
    "sulfamethoxazole": "Cc1cc(NS(=O)(=O)c2ccc(N)cc2)no1",
    "ciprofloxacin_core": "OC(=O)c1cn(C2CC2)c2cc(N3CCNCC3)c(F)cc2c1=O",
    "diazepam": "CN1c2ccc(Cl)cc2C(=Nc2ccccc2)CC1=O",
    "fluoxetine": "CNCCC(Oc1ccc(cc1)C(F)(F)F)c1ccccc1",
    "chiral_ala": "C[C@H](N)C(=O)O",
    "charged": "[O-]C(=O)CC[NH3+]",
    "fused_rings": "c1ccc2c(c1)ccc1ccccc12",
    "spiro_like": "C1CCC2(CC1)CCCCC2",
    "thiophene": "c1ccsc1",
    "triple_bond": "CC#CC(=O)O",
}


@pytest.mark.parametrize("name", sorted(DRUGS))
def test_drug_through_chem_stack(name):
    smi = DRUGS[name]
    mol = mol_from_smiles(smi, seed=7)
    assert mol.num_atoms > 3
    assert np.all(np.isfinite(mol.coords))

    # embedded bond lengths near ideal
    for i, j, o in mol.bonds:
        d = np.linalg.norm(mol.coords[i] - mol.coords[j])
        r0 = ideal_bond_length(int(mol.atomic_numbers[i]), int(mol.atomic_numbers[j]), o)
        assert abs(d - r0) < 0.45, (name, i, j, d, r0)

    # no severe internal clashes between non-bonded atoms
    bonded = {(min(i, j), max(i, j)) for i, j, _ in mol.bonds}
    n = mol.num_atoms
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in bonded:
                continue
            assert np.linalg.norm(mol.coords[i] - mol.coords[j]) > 1.0, (name, i, j)

    # featurization contract
    feats = conformer_features(mol)
    assert feats["d_token"].shape == (n, n)
    assert int(feats["token_bonds"].sum()) == 2 * len(mol.bonds)
    assert feats["ref_hybridization"].max() <= 6
    assert feats["ref_implicit_valence"].min() >= 0

    # conformer bank generation + diversity for rotatable molecules
    confs = generate_conformers(mol, num_confs=4, base_coords=mol.coords)
    assert confs.shape == (4, n, 3)
    assert np.all(np.isfinite(confs))

    # SDF round trip preserves topology
    mol2 = read_sdf(write_sdf(mol))
    assert mol2.num_atoms == n
    assert len(mol2.bonds) == len(mol.bonds)


def test_aromatic_perception_on_kekule_sdf():
    """Kekulé-form SDF (alternating single/double ring bonds) must still be
    perceived aromatic."""
    mol = mol_from_smiles("C1=CC=CC=C1", seed=0)  # benzene, Kekulé SMILES
    arom = mol.aromatic_atoms()
    assert arom.sum() == 6
