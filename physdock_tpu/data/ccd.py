"""CCD (chemical component dictionary) metadata.

The reference depends on a prebuilt `params/ccd_id_meta_data.pkl.gz` blob
(absent from its repo — .MISSING_LARGE_BLOBS) holding, per CCD code, the
reference-conformer features consumed by the featurizer
(feature_loader.py:138-176).  Here the metadata is *generated*:

  * standard residues: molecule graphs from data/constants/restypes.py,
    ideal coordinates from the in-house embedder (deterministic, cached);
  * arbitrary ligands: from an SDF Molecule or SMILES;
  * a loader for an external ccd_id_meta_data.pkl.gz when provided (same
    schema), so reference-prepared systems remain usable.

Entry schema (dict per CCD):
  ref_pos [n,3] f32, ref_charge [n], ref_element [n] (atomic_number-1),
  ref_is_aromatic/_degree/_hybridization/_implicit_valence/_chirality [n],
  ref_in_ring_of_3..8 [n], d_token/token_bonds/bond_type/bond_as_double/
  bond_in_ring/bond_is_conjugated/bond_is_aromatic [n,n],
  ref_atom_name_chars [n] str, ref_mol (Molecule | None).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

from physdock_tpu.data.constants import restypes as rc
from physdock_tpu.data.constants.periodic_table import SYMBOL_TO_NUMBER
from physdock_tpu.data.mol import Molecule, conformer_features
from physdock_tpu.utils.io import load_pkl


def residue_molecule(ccd: str) -> Molecule:
    """Build the heavy-atom Molecule of a standard amino acid."""
    names = rc.AA_ATOMS[ccd]
    index = {n: i for i, n in enumerate(names)}
    atomic = [SYMBOL_TO_NUMBER[n[0]] for n in names]
    bonds = [(index[a], index[b], o) for a, b, o in rc.AA_BONDS[ccd]]
    return Molecule(np.array(atomic), np.zeros(len(names), np.int32), bonds, None, ccd)


@functools.lru_cache(maxsize=64)
def standard_residue_entry(ccd: str) -> Dict:
    """CCD entry for a standard residue (ideal geometry embedded once)."""
    from physdock_tpu.data.embed import embed_molecule

    mol = residue_molecule(ccd)
    rng = np.random.default_rng(abs(hash(ccd)) % (2**31))
    mol.coords = embed_molecule(mol, rng, n_starts=3, iters=500)
    feats = conformer_features(mol)
    feats["ref_atom_name_chars"] = list(rc.AA_ATOMS[ccd])
    feats["ref_mol"] = mol
    return feats


def ligand_entry(mol: Molecule, ref_pos: Optional[np.ndarray] = None) -> Dict:
    """CCD entry for a ligand Molecule (coords must exist or be embedded).

    Atom names follow the reference's SMILES path: element symbol + index,
    left-justified to 4 chars (feature_loader.py:322-325)."""
    if ref_pos is None and mol.coords is None:
        from physdock_tpu.data.embed import embed_molecule

        mol.coords = embed_molecule(mol)
    feats = conformer_features(mol, ref_pos)
    from physdock_tpu.data.constants.periodic_table import element_symbol

    feats["ref_atom_name_chars"] = [
        f"{element_symbol(int(z)) + str(i):<4}"
        for i, z in enumerate(mol.atomic_numbers)
    ]
    feats["ref_mol"] = mol
    return feats


class CCDLibrary:
    """Lookup + cache of CCD entries.

    Resolution order: explicit external blob (reference-compatible pkl.gz)
    -> standard residue tables -> registered ligand entries."""

    def __init__(self, external_path: Optional[str] = None):
        self._external: Dict[str, Dict] = {}
        if external_path:
            self._external = load_pkl(external_path)
        self._ligands: Dict[str, Dict] = {}

    def register_ligand(self, ccd: str, entry: Dict) -> None:
        self._ligands[ccd] = entry

    def __contains__(self, ccd: str) -> bool:
        return (
            ccd in self._ligands
            or ccd in self._external
            or (rc.is_standard(ccd) and ccd in rc.AA_ATOMS)
        )

    def __getitem__(self, ccd: str) -> Dict:
        if ccd in self._ligands:
            return self._ligands[ccd]
        if ccd in self._external:
            return self._external[ccd]
        if rc.is_standard(ccd) and ccd in rc.AA_ATOMS:
            return standard_residue_entry(ccd)
        raise KeyError(
            f"CCD {ccd!r} not in library — register the ligand or provide an "
            "external ccd_id_meta_data blob"
        )


def assemble_ref_feat(entry: Dict) -> np.ndarray:
    """167-dim per-atom conditioning feature (feature_loader.py:143-162):
    centred ref_pos(3) + charge(1) + element 1-hot(128) + aromatic(1) +
    degree(9) + hybridization(7) + implicit valence(9) + chirality(3) +
    ring3..8(6)."""
    ref_pos = entry["ref_pos"] - entry["ref_pos"].mean(0, keepdims=True)
    return np.concatenate(
        [
            ref_pos,
            entry["ref_charge"][..., None].astype(np.float32),
            rc.eye_128[entry["ref_element"]],
            entry["ref_is_aromatic"].astype(np.float32)[..., None],
            rc.eye_9[entry["ref_degree"]],
            rc.eye_7[entry["ref_hybridization"]],
            rc.eye_9[entry["ref_implicit_valence"]],
            rc.eye_3[entry["ref_chirality"]],
            entry["ref_in_ring_of_3"].astype(np.float32)[..., None],
            entry["ref_in_ring_of_4"].astype(np.float32)[..., None],
            entry["ref_in_ring_of_5"].astype(np.float32)[..., None],
            entry["ref_in_ring_of_6"].astype(np.float32)[..., None],
            entry["ref_in_ring_of_7"].astype(np.float32)[..., None],
            entry["ref_in_ring_of_8"].astype(np.float32)[..., None],
        ],
        axis=-1,
    ).astype(np.float32)


def assemble_rel_tok_feat(entry: Dict) -> np.ndarray:
    """42-dim intra-conformer pair feature (feature_loader.py:163-171):
    d_token 1-hot(32) + bond type 1-hot(5) + bonded(1) + order-as-double(1) +
    in-ring(1) + conjugated(1) + aromatic(1)."""
    return np.concatenate(
        [
            rc.eye_32[np.minimum(entry["d_token"], 31)],
            rc.eye_5[entry["bond_type"]],
            entry["token_bonds"].astype(np.float32)[..., None],
            entry["bond_as_double"].astype(np.float32)[..., None],
            entry["bond_in_ring"].astype(np.float32)[..., None],
            entry["bond_is_conjugated"].astype(np.float32)[..., None],
            entry["bond_is_aromatic"].astype(np.float32)[..., None],
        ],
        axis=-1,
    ).astype(np.float32)
