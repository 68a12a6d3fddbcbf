"""Data-layer tests: chem stack, CCD, featurizer, system prep, MSA machinery."""

import os

import numpy as np
import pytest

from physdock_tpu.config import DataConfig
from physdock_tpu.data.ccd import (
    assemble_ref_feat,
    assemble_rel_tok_feat,
    standard_residue_entry,
)
from physdock_tpu.data.constants import restypes as rc
from physdock_tpu.data.feature_loader import SystemFeaturizer
from physdock_tpu.data.mol import conformer_features, read_sdf, write_sdf
from physdock_tpu.data.schema import validate_batch
from physdock_tpu.data.smiles import mol_from_smiles, parse_smiles
from physdock_tpu.data.system import generate_system

from physdock_tpu.utils.demo_assets import demo_root

DEMO = demo_root()
EJQ = f"{DEMO}/system_preparation/EJQ.sdf"
RECEPTOR = f"{DEMO}/system_preparation/receptor.pdb"
HAVE_DEMO = os.path.exists(EJQ)


def test_residue_tables_consistent():
    for ccd, n in rc.EXPECTED_ATOM_COUNTS.items():
        assert len(rc.AA_ATOMS[ccd]) == n
        names = set(rc.AA_ATOMS[ccd])
        for i, j, _ in rc.AA_BONDS[ccd]:
            assert i in names and j in names


def test_standard_residue_entry_features():
    e = standard_residue_entry("TRP")
    assert assemble_ref_feat(e).shape == (15, 167)
    assert assemble_rel_tok_feat(e).shape == (15, 15, 42)
    assert e["ref_atom_name_chars"][1] == "CA"
    assert e["ref_atom_name_chars"][4] == "CB"


def test_smiles_parser():
    cases = {
        "CCO": (3, 2),
        "c1ccccc1": (6, 6),
        "C[C@H](N)C(=O)O": (6, 5),
        "c1ccc2ccccc2c1": (10, 11),
        "[O-]C(=O)c1ccccc1[NH3+]": (10, 10),
    }
    for smi, (na, nb) in cases.items():
        m = parse_smiles(smi)
        assert (m.num_atoms, len(m.bonds)) == (na, nb), smi


def test_smiles_embedding_reasonable_bonds():
    from physdock_tpu.data.embed import ideal_bond_length

    m = mol_from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")
    assert np.all(np.isfinite(m.coords))
    for i, j, o in m.bonds:
        d = np.linalg.norm(m.coords[i] - m.coords[j])
        r0 = ideal_bond_length(int(m.atomic_numbers[i]), int(m.atomic_numbers[j]), o)
        assert abs(d - r0) < 0.3, (i, j, d, r0)


@pytest.mark.skipif(not HAVE_DEMO, reason="demo assets unavailable")
def test_sdf_roundtrip_and_features():
    mol = read_sdf(EJQ)
    assert mol.num_atoms == 16
    feats = conformer_features(mol)
    assert feats["d_token"].max() <= 30
    assert feats["token_bonds"].sum() == 2 * len(mol.bonds)
    mol2 = read_sdf(write_sdf(mol))
    assert mol2.num_atoms == mol.num_atoms
    assert len(mol2.bonds) == len(mol.bonds)


@pytest.mark.skipif(not HAVE_DEMO, reason="demo assets unavailable")
def test_generate_system_and_featurize(tmp_path):
    pkl = generate_system(RECEPTOR, EJQ, output_dir=str(tmp_path))
    fz = SystemFeaturizer(DataConfig(crop_size=128, atom_crop_size=1024), seed=0)
    feats, meta = fz.load(pkl)
    validate_batch(feats)
    assert feats["s_mask"].shape[0] == 128
    assert int(feats["is_ligand"].sum()) == 16
    assert len(meta["ligand_atom_idx"]) == 16
    # pocket residues found near GT ligand
    assert feats["pocket_res_feat"].sum() > 0
    # ligand tokens carry intra-molecular bonds
    assert feats["token_bonds"].sum() >= 2 * len(meta["ref_mol"].bonds) - 4


@pytest.mark.skipif(not HAVE_DEMO, reason="demo assets unavailable")
def test_screening_featurization_with_cached_msa():
    fz = SystemFeaturizer(
        DataConfig(crop_size=128, atom_crop_size=1024),
        msa_features_dir=f"{DEMO}/screening/features/msa_features",
        uniprot_msa_features_dir=f"{DEMO}/screening/features/uniprot_msa_features",
        seed=0,
    )
    feats, meta = fz.load(
        f"{DEMO}/screening/6kzd.pkl.gz", remove_ligand=True, smi="CCOc1ccccc1"
    )
    validate_batch(feats)
    assert feats["msa_feat"].shape[0] == 128  # real clusters sampled
    assert not fz.missing_msa


def test_msa_merge_two_chains():
    from physdock_tpu.data.msa_pairing import MSA_GAP_IDX, merge_msas

    c1 = {
        "msa": np.array([[1, 2, 3], [4, 5, 6]], np.int8),
        "deletion_matrix": np.zeros((2, 3), np.int8),
    }
    c2 = {
        "msa": np.array([[7, 8], [9, 10]], np.int8),
        "deletion_matrix": np.zeros((2, 2), np.int8),
    }
    msa, dele = merge_msas([c1, c2], [3, 2])
    assert msa.shape[1] == 5
    # first row is the concatenated query
    assert msa[0].tolist() == [1, 2, 3, 7, 8]
    # block-diagonal: chain2's own rows have GAP on chain1's columns
    gap_rows = (msa[:, :3] == MSA_GAP_IDX).all(axis=1)
    assert gap_rows.any()


def test_pdb_writer_roundtrip(tmp_path):
    from physdock_tpu.data.parsers import parse_pdb
    from physdock_tpu.infer.writers import write_pdb

    meta = {
        "ccds": ["ALA", "LIG"],
        "chunk_sizes": np.array([5, 2]),
        "residue_index": np.array([0, 0]),
        "asym_id": np.array([0, 1]),
        "chain_class": ["protein", "ligand"],
        "atom_names": ["N", "CA", "C", "O", "CB", "C0", "O1"],
        "atom_elements": ["N", "C", "C", "O", "C", "C", "O"],
    }
    x = np.arange(21, dtype=np.float32).reshape(7, 3)
    path = str(tmp_path / "out.pdb")
    write_pdb(x, meta, path)
    chains = parse_pdb(path)
    assert set(chains) == {"A", "B"}
    assert chains["A"].residues[0].name == "ALA"
    assert len(chains["A"].residues[0].atoms) == 5


def test_molecule_from_positions_recovers_topology():
    """Geometric CCD reconstruction: exact bond graph, elements mostly right
    (N vs C and halogen identity are geometrically ambiguous)."""
    from physdock_tpu.data.ccd import molecule_from_positions
    from physdock_tpu.data.mol import read_sdf

    mol = read_sdf(f"{DEMO}/system_preparation/EJQ.sdf")
    rec = molecule_from_positions(mol.coords)
    gt_bonds = {tuple(sorted((i, j))) for i, j, _ in mol.bonds}
    rec_bonds = {tuple(sorted((i, j))) for i, j, _ in rec.bonds}
    assert gt_bonds == rec_bonds
    assert (rec.atomic_numbers == mol.atomic_numbers).mean() >= 0.8


def test_reference_demo_pkl_featurizes_without_sdf():
    """The PoseBusters demo pkls load end-to-end with coordinate-based CCD
    reconstruction (no --ligand_sdf / external blob needed)."""
    import os

    import numpy as np

    from physdock_tpu.config import DataConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.data.schema import validate_batch

    pkl = f"{DEMO}/redocking/Posebusters_subset/5SAK_ZRY_A_1.pkl.gz"
    if not os.path.exists(pkl):
        import pytest

        pytest.skip("demo assets unavailable")
    fz = SystemFeaturizer(
        DataConfig(crop_size=64, atom_crop_size=256), seed=0
    )
    feats, meta = fz.load(pkl)
    validate_batch(feats)
    assert meta["ref_mol"] is not None and meta["ref_mol"].num_atoms == 18
    assert np.asarray(feats["is_ligand"]).sum() == 18  # one token per atom
    assert len(meta["ligand_atom_idx"]) == 18
