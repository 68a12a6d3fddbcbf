"""Chemistry-perception round-trip gate (VERDICT r2 item 2).

Reference-prepped system pkls carry only CCD codes + coordinates for the
ligand; with the reference's ccd_id_meta_data blob unavailable, chemistry
is re-perceived from geometry (data/ccd.py::molecule_from_positions).
This gate quantifies that perception: embed every fuzz-corpus molecule,
re-perceive the graph from the bare coordinates, and compare bond orders
/ aromaticity / carbon chirality.  >=95% of molecules must round-trip
EXACTLY with known elements (the SDF/SMILES case), and element recovery
itself is measured for the worst-case bare-coordinate path.

(Chirality is compared at carbons: charge assignments are not recoverable
from geometry, and charged-N chiral tie-breaks depend on them.)
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from test_chem_fuzz import CORPUS  # noqa: E402

from physdock_tpu.data.ccd import molecule_from_positions  # noqa: E402
from physdock_tpu.data.smiles import mol_from_smiles  # noqa: E402


def _canon_orders(mol):
    return {
        (min(i, j), max(i, j)): (1.5 if mol.aromatic_bond(i, j) else float(o))
        for i, j, o in mol.bonds
    }


def _carbon_tags(mol):
    t = mol.chiral_tags()
    return [
        int(t[a])
        for a in range(mol.num_atoms)
        if int(mol.atomic_numbers[a]) == 6
    ]


@pytest.fixture(scope="module")
def roundtrip_results():
    results = []
    for smi in CORPUS:
        try:
            mt = mol_from_smiles(smi, seed=0)
        except Exception:
            continue
        if mt.coords is None or mt.num_atoms < 2:
            continue
        mp = molecule_from_positions(
            mt.coords, atomic_numbers=mt.atomic_numbers
        )
        ok = (
            _canon_orders(mt) == _canon_orders(mp)
            and _carbon_tags(mt) == _carbon_tags(mp)
        )
        results.append((smi, ok, mt))
    return results


def test_known_element_roundtrip_exact_rate(roundtrip_results):
    n = len(roundtrip_results)
    exact = sum(1 for _, ok, _ in roundtrip_results if ok)
    assert n >= 200
    rate = exact / n
    print(f"\nround-trip exact: {exact}/{n} = {rate:.3f}")
    assert rate >= 0.95, f"perception round-trip below gate: {rate:.3f}"


def test_element_recovery_rate(roundtrip_results):
    """Bare-coordinate path (no elements known): measure per-atom element
    recovery.  Geometric element inference is fundamentally limited
    (aromatic N vs C differ by ~0.05 A), so the gate is a floor that
    guards regressions, not a claim of exactness — exact chemistry should
    always come from --ligand_sdf/--ligand_smi/--ccd_blob."""
    total = correct = 0
    for smi, _, mt in roundtrip_results[:80]:
        mp = molecule_from_positions(mt.coords)
        total += mt.num_atoms
        correct += int(np.sum(mp.atomic_numbers == mt.atomic_numbers))
    rate = correct / max(total, 1)
    print(f"\nelement recovery: {correct}/{total} = {rate:.3f}")
    assert rate >= 0.70, rate


def test_heteroaromatic_geometry_exact():
    """The embedder must produce literature heterocycle geometry (the
    regular-polygon assumption once puckered thiophene 0.14 A out of
    plane): ring planarity < 0.06 A rms and the C-S-C angle near 92 deg."""
    mt = mol_from_smiles("c1csc(C)c1", seed=0)
    ring = mt.rings()[0]
    pts = mt.coords[ring] - mt.coords[ring].mean(0)
    dev = float(np.linalg.svd(pts, compute_uv=False)[-1]) / np.sqrt(len(ring))
    assert dev < 0.06, dev
    s = int(np.nonzero(mt.atomic_numbers == 16)[0][0])
    nb = mt.adjacency[s]
    v1 = mt.coords[nb[0]] - mt.coords[s]
    v2 = mt.coords[nb[1]] - mt.coords[s]
    ang = np.degrees(
        np.arccos(np.dot(v1, v2) / np.linalg.norm(v1) / np.linalg.norm(v2))
    )
    assert 87.0 < ang < 97.0, ang


def test_fused_system_coplanar():
    """Fused aromatics (indole) must embed as one coplanar system, not
    two planar rings book-folded along the fusion bond."""
    mt = mol_from_smiles("c1ccc2[nH]ccc2c1", seed=0)
    atoms = sorted({a for r in mt.rings() for a in r})
    pts = mt.coords[atoms] - mt.coords[atoms].mean(0)
    dev = float(np.linalg.svd(pts, compute_uv=False)[-1]) / np.sqrt(len(atoms))
    assert dev < 0.1, dev
