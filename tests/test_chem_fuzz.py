"""Chem-stack fuzzing: hundreds of SMILES through parse -> perceive ->
embed -> featurize with zero crashes and sane invariants
(aromaticity, charges, macrocycles, stereo).  The known-unsupported list
lives in data/smiles.py's module docstring.
"""

import numpy as np
import pytest

from physdock_tpu.data.mol import conformer_features
from physdock_tpu.data.smiles import mol_from_smiles, parse_smiles

# hand-written real-world molecules (drugs, fragments, edge cases)
REAL = [
    "CC(=O)Oc1ccccc1C(=O)O",                       # aspirin
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",                  # caffeine
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",                  # ibuprofen
    "CC(=O)Nc1ccc(O)cc1",                          # paracetamol
    "COc1ccc2cc(ccc2c1)C(C)C(=O)O",                # naproxen
    "CN1CCC[C@H]1c1cccnc1",                        # nicotine
    "OC(=O)C1CSSCC1",                              # dithiolane acid
    "C1CCCCCCCCCCC1",                              # cyclododecane (macrocycle)
    "C1CCCCCCCCCCCCCCC1",                          # 16-macrocycle
    "O=C1CCCCCCCCCCCCC1",                          # macrolactone-like
    "c1ccc2[nH]ccc2c1",                            # indole
    "c1ccc2ncccc2c1",                              # quinoline
    "c1ccc2c(c1)oc1ccccc12",                       # dibenzofuran
    "c1ccc2c(c1)sc1ccccc12",                       # dibenzothiophene
    "c1cnc2[nH]ccc2c1",                            # azaindole
    "c1cc2ccc3cccc4ccc(c1)c2c34",                  # pyrene
    "C[N+](C)(C)CCO",                              # choline (quaternary N+)
    "[O-]S(=O)(=O)c1ccccc1",                       # sulfonate anion
    "NC(=[NH2+])c1ccccc1",                         # amidinium
    "O=[N+]([O-])c1ccccc1",                        # nitrobenzene
    "F/C=C/F",                                     # E
    "F/C=C\\F",                                    # Z
    "C/C=C/C=C\\C(=O)O",                           # sorbic-like diene
    "CC(C)=CCC/C(C)=C/CO",                         # geraniol
    "C[C@H](N)C(=O)O",                             # L-alanine
    "C[C@@H](N)C(=O)O",                            # D-alanine
    "N[C@@H](Cc1ccccc1)C(=O)O",                    # phenylalanine
    "OC[C@H]1O[C@@H](O)[C@H](O)[C@@H](O)[C@@H]1O", # glucose-like
    "ClC(Cl)(Cl)Cl",                               # carbon tet
    "BrCCBr",                                      # dibromoethane
    "IC#CI",                                       # diiodoacetylene
    "C#N",                                         # HCN heavy atoms
    "CC(C)(C)OC(=O)N1CCC(CC1)N",                   # Boc-piperidine
    "O=C(O)CCCCCCCCC=C",                           # undecylenic acid
    "CCCCCCCCCCCCCCCCCC(=O)O",                     # stearic acid (chain)
    "OCC(O)CO",                                    # glycerol
    "NCCCC[C@H](N)C(=O)O",                         # lysine
    "N[C@@H](CCC(=O)O)C(=O)O",                     # glutamate
    "CSCC[C@H](N)C(=O)O",                          # methionine
    "OP(=O)(O)OCC1OC(C(O)C1O)n1cnc2c(N)ncnc12",    # AMP-like
    "c1ccc(-c2ccccc2)cc1",                         # biphenyl
    "C1=CC2=CC=CC=C2C=C1",                         # naphthalene Kekule
    "O=S(=O)(N)c1ccc(N)cc1",                       # sulfanilamide
    "Cc1onc(c1)-c1ccccc1",                         # isoxazole
    "c1csc(n1)-c1ccccc1",                          # thiazole
    "C1CN2CCN1CC2",                                # DABCO (bridged)
    "C1CC2CCC1CC2",                                # bicyclooctane
    "CC12CCC(CC1)C(C)(C)O2",                       # eucalyptol-like
    "O=C(Nc1ccccc1)c1ccccc1",                      # benzanilide
    "O=C(Oc1ccccc1)c1ccccc1",                      # phenyl benzoate
    "P(c1ccccc1)(c1ccccc1)c1ccccc1",               # triphenylphosphine
    "CC(C)(C)C",                                   # neopentane
    "FC(F)(F)c1ccc(cc1)S(=O)(=O)N",                # CF3 sulfonamide
    "C1(CC1)C1CC1",                                # bicyclopropyl
    "[nH]1cccc1",                                  # pyrrole
    "c1ccoc1",                                     # furan
    "N#Cc1ccccc1C#N",                              # phthalonitrile
    "OB(O)c1ccccc1",                               # boronic acid
]

SCAFFOLDS = [
    "c1ccc({X})cc1",            # benzene
    "c1ccnc({X})c1",            # pyridine
    "c1csc({X})c1",             # thiophene
    "c1cn({X})nc1",             # pyrazole N-sub
    "C1CCN({X})CC1",            # piperidine N-sub
    "C1CCC({X})CC1",            # cyclohexane
    "c1ccc(-c2ccccc2{X})cc1",   # biphenyl ortho-sub
    "O=C(O)C({X})C",            # propanoic acid alpha-sub
    "NC(=O)C{X}",               # acetamide alpha-sub
    "O=S(=O)(N)c1ccc({X})cc1",  # sulfonamide para-sub
]

SUBSTITUENTS = [
    "C", "CC", "CCC", "C(C)C", "C(C)(C)C", "OC", "O", "N", "N(C)C",
    "F", "Cl", "Br", "C#N", "C(=O)O", "C(=O)N", "[N+](C)(C)C",
    "S(=O)(=O)C", "C(F)(F)F", "OCC", "CC=C",
]


def _fuzz_corpus():
    corpus = list(REAL)
    for scaf in SCAFFOLDS:
        for sub in SUBSTITUENTS:
            corpus.append(scaf.replace("{X}", sub))
    return corpus


CORPUS = _fuzz_corpus()


def test_corpus_size():
    assert len(CORPUS) >= 200


@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_fuzz_parse_perceive(idx):
    """Every corpus molecule parses and perceives without crashing, with
    basic graph invariants."""
    smi = CORPUS[idx]
    mol = parse_smiles(smi)
    n = mol.num_atoms
    assert n >= 1
    assert all(0 <= i < n and 0 <= j < n for i, j, _ in mol.bonds)
    arom = mol.aromatic_atoms()
    rings = mol.rings()
    hyb = mol.hybridizations()
    assert len(arom) == n and len(hyb) == n
    # aromatic atoms must be in rings
    ring_atoms = {a for r in rings for a in r}
    for a in range(n):
        if arom[a]:
            assert a in ring_atoms, (smi, a)



# embedding is the expensive stage: fuzz a deterministic sample of 60
@pytest.mark.slow
@pytest.mark.parametrize("idx", range(0, len(CORPUS), max(1, len(CORPUS) // 60)))
def test_fuzz_embed(idx):
    smi = CORPUS[idx]
    mol = mol_from_smiles(smi, seed=11)
    assert np.all(np.isfinite(mol.coords))
    feats = conformer_features(mol)
    assert feats["d_token"].shape == (mol.num_atoms, mol.num_atoms)
    # bonded atoms closer than non-bonded clashes
    for i, j, _ in mol.bonds:
        assert np.linalg.norm(mol.coords[i] - mol.coords[j]) < 2.2, smi


def test_ez_stereo_embedding():
    """E/Z tags produce the correct planar geometry and survive the FF."""
    import jax.numpy as jnp

    from physdock_tpu.model.forcefield import build_ligand_ff, relax_positions

    def d14(smi):
        m = mol_from_smiles(smi, seed=3)
        a, i, j, b, t = m.stereo_bonds[0]
        return m, (a, b), float(np.linalg.norm(m.coords[a] - m.coords[b])), t

    m_t, pair_t, dt, is_t = d14("F/C=C/F")
    m_c, pair_c, dc, is_c = d14("F/C=C\\F")
    assert is_t and not is_c
    assert dt > 3.2 and dc < 3.2  # trans ~3.5 A, cis ~2.7 A

    # rigid 1-4 restraint keeps the isomer through FF relaxation
    ff = build_ligand_ff(
        m_t.atomic_numbers.tolist(),
        [(i, j) for i, j, _ in m_t.bonds],
        m_t.coords,
        rigid_14=[tuple(sorted(pair_t))],
    )
    relaxed = np.asarray(
        relax_positions(jnp.asarray(m_t.coords), ff, iters=20)
    )
    assert np.linalg.norm(relaxed[pair_t[0]] - relaxed[pair_t[1]]) > 3.0
