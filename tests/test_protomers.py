"""Protonation/tautomer handling (data/protomers.py).

The reference delegates ligand sanitization to RDKit's parse-time cleanup
(PhysDock/data/tools/rdkit.py:14-28); protonation/tautomer prep beyond
that is an opt-in extension here.  These tests pin: (a) normalize()
charge-separation parity between the SMILES parser and the geometry
perceiver, (b) the pH-7.4 rules on the classic ionizable groups, (c)
tautomer enumeration/scoring canonical picks.
"""

import numpy as np
import pytest

from physdock_tpu.data import protomers
from physdock_tpu.data.smiles import mol_from_smiles, parse_smiles


def _bond_set(mol):
    return {(min(i, j), max(i, j)): o for i, j, o in mol.bonds}


# ---------------------------------------------------------------- normalize


def test_nitro_hypervalent_spelling_charge_separated():
    # N(=O)=O spelling must normalize to [N+](=O)[O-] like RDKit cleanup
    m = mol_from_smiles("CN(=O)=O", embed=False)
    n_idx = int(np.where(m.atomic_numbers == 7)[0][0])
    o_idx = np.where(m.atomic_numbers == 8)[0]
    assert m.charges[n_idx] == 1
    assert sorted(int(m.charges[i]) for i in o_idx) == [-1, 0]
    orders = sorted(_bond_set(m)[(min(n_idx, i), max(n_idx, i))] for i in o_idx)
    assert orders == [1.0, 2.0]


def test_nitro_spellings_converge():
    # all three spellings → identical canonical graph (charges + orders)
    mols = [
        mol_from_smiles(s, embed=False)
        for s in ("CN(=O)=O", "C[N+](=O)[O-]", "C[N+]([O-])=O")
    ]
    ref = mols[0]
    for m in mols[1:]:
        assert np.array_equal(m.charges, ref.charges)
        assert _bond_set(m) == _bond_set(ref)


def test_azide_charge_separated():
    m = mol_from_smiles("CN=[N]=[N]", embed=False)
    # central N +1, terminal N -1
    ns = np.where(m.atomic_numbers == 7)[0]
    assert sum(int(m.charges[i]) for i in ns) == 0
    assert 1 in [int(m.charges[i]) for i in ns]
    assert -1 in [int(m.charges[i]) for i in ns]


def test_n_oxide_charge_separated():
    # trimethylamine N-oxide written hypervalently
    m = mol_from_smiles("CN(C)(C)=O", embed=False)
    n_idx = int(np.where(m.atomic_numbers == 7)[0][0])
    o_idx = int(np.where(m.atomic_numbers == 8)[0][0])
    assert m.charges[n_idx] == 1 and m.charges[o_idx] == -1
    assert _bond_set(m)[(min(n_idx, o_idx), max(n_idx, o_idx))] == 1.0


def test_normalize_idempotent():
    m = mol_from_smiles("O=[N+]([O-])c1ccccc1", embed=False)
    m2 = protomers.normalize(m)
    assert np.array_equal(m.charges, m2.charges)
    assert _bond_set(m) == _bond_set(m2)


def test_perceiver_and_parser_converge_on_nitro():
    # geometry-perceived nitrobenzene (no charges in input) must land on
    # the same charge-separated graph as the SMILES parse
    from physdock_tpu.data.ccd import molecule_from_positions

    parsed = mol_from_smiles("O=[N+]([O-])c1ccccc1", seed=3)
    perceived = molecule_from_positions(
        parsed.coords, name="nitro", atomic_numbers=parsed.atomic_numbers
    )
    n = int(np.where(parsed.atomic_numbers == 7)[0][0])
    assert perceived.charges[n] == 1
    assert sorted(
        int(perceived.charges[i])
        for i in np.where(parsed.atomic_numbers == 8)[0]
    ) == [-1, 0]


# ---------------------------------------------------- explicit H bookkeeping


def test_bracket_hcount_recorded():
    m = parse_smiles("c1cc[nH]c1")
    n_idx = int(np.where(m.atomic_numbers == 7)[0][0])
    assert m.explicit_h is not None
    assert m.explicit_h[n_idx] == 1
    assert protomers.total_h_counts(m)[n_idx] == 1


def test_ammonium_hcount():
    m = parse_smiles("C[NH3+]")
    n_idx = int(np.where(m.atomic_numbers == 7)[0][0])
    assert protomers.total_h_counts(m)[n_idx] == 3


# ------------------------------------------------------- adjust_protonation


@pytest.mark.parametrize(
    "smi,elem,want",
    [
        ("CC(=O)O", 8, -1),    # acetic acid → carboxylate
        ("CS(=O)(=O)O", 8, -1),  # methanesulfonic acid
        ("CCN", 7, 1),         # ethylamine → ammonium
        ("CC(=N)N", 7, 1),     # acetamidine → amidinium
        ("NC(=N)N", 7, 1),     # guanidine → guanidinium
    ],
)
def test_ph74_charges(smi, elem, want):
    m = protomers.adjust_protonation(parse_smiles(smi), ph=7.4)
    assert want in [int(c) for c, z in zip(m.charges, m.atomic_numbers)
                    if int(z) == elem]


@pytest.mark.parametrize(
    "smi",
    [
        "c1ccncc1",        # pyridine: neutral at 7.4
        "c1cc[nH]c1",      # pyrrole
        "Oc1ccccc1",       # phenol
        "CC(=O)NC",        # N-methylacetamide: amide N stays neutral
        "CS(=O)(=O)NC",    # sulfonamide N stays neutral
        "c1ccc(N)cc1",     # aniline: neutral at 7.4
    ],
)
def test_ph74_neutral_groups(smi):
    m = protomers.adjust_protonation(parse_smiles(smi), ph=7.4)
    assert all(int(c) == 0 for c in m.charges)


def test_tetrazole_deprotonated():
    m = protomers.adjust_protonation(parse_smiles("c1nnn[nH]1"), ph=7.4)
    assert -1 in [int(c) for c in m.charges]


def test_phosphate_double_deprotonation():
    m = protomers.adjust_protonation(parse_smiles("OP(=O)(O)OC"), ph=7.4)
    # pKa1 + pKa2 both below/at 7.4 → 2 anionic oxygens
    assert sum(1 for c in m.charges if int(c) == -1) == 2


def test_low_ph_keeps_acid_protonated():
    m = protomers.adjust_protonation(parse_smiles("CC(=O)O"), ph=2.0)
    assert all(int(c) == 0 for c in m.charges)


# --------------------------------------------------------------- tautomers


def test_keto_enol_enumeration():
    # acetone ↔ propen-2-ol
    m = parse_smiles("CC(=O)C")
    tauts = protomers.enumerate_tautomers(m)
    assert len(tauts) >= 2
    keys = {protomers._state_key(t.bonds, protomers.total_h_counts(t))
            for t in tauts}
    assert len(keys) == len(tauts)  # unique states


def test_canonical_tautomer_prefers_keto():
    enol = parse_smiles("CC(O)=C")  # propen-2-ol
    best = protomers.canonical_tautomer(enol)
    # canonical form is acetone: one C=O double bond, no C=C
    has_co = any(
        o == 2.0
        and {int(best.atomic_numbers[i]), int(best.atomic_numbers[j])} == {6, 8}
        for i, j, o in best.bonds
    )
    assert has_co


def test_canonical_tautomer_prefers_amide():
    imidol = parse_smiles("CC(O)=NC")  # imidic acid form
    best = protomers.canonical_tautomer(imidol)
    has_co = any(
        o == 2.0
        and {int(best.atomic_numbers[i]), int(best.atomic_numbers[j])} == {6, 8}
        for i, j, o in best.bonds
    )
    assert has_co


def test_canonical_tautomer_stable_on_aromatics():
    # aromatic systems untouched: benzene unchanged
    m = parse_smiles("c1ccccc1")
    best = protomers.canonical_tautomer(m)
    assert _bond_set(best) == _bond_set(m)


def test_tautomer_keeps_atom_count_and_h_total():
    m = parse_smiles("CC(=O)CC(=O)C")  # 1,3-diketone: several tautomers
    h0 = int(protomers.total_h_counts(m).sum())
    for t in protomers.enumerate_tautomers(m):
        assert t.num_atoms == m.num_atoms
        assert int(protomers.total_h_counts(t).sum()) == h0


# ------------------------------------------------------------- integration


def test_mol_from_smiles_protonation_flag():
    m = mol_from_smiles("CCN", embed=False, protonate_ph=7.4)
    assert 1 in [int(c) for c in m.charges]
    m0 = mol_from_smiles("CCN", embed=False)
    assert all(int(c) == 0 for c in m0.charges)


def test_embedding_after_protonation():
    # graph transforms precede embedding; conformer must still build
    m = mol_from_smiles("CC(=O)O", protonate_ph=7.4, seed=1)
    assert m.coords is not None and np.isfinite(m.coords).all()
