"""Conformer embedding: molecular graph -> 3D coordinates (RDKit-free).

Replaces RDKit `EmbedMolecule` / `EmbedMultipleConfs` (used by the reference
for SMILES ligands and the physics-guidance conformer bank —
tools/rdkit.py:21, models/model.py:176-196).  Distance-geometry-lite:

  1. derive ideal bond lengths (covalent radii x order factor), 1-3
     distances (law of cosines over hybridization/ring angles), planarity
     restraints for aromatic rings, and soft nonbonded repulsion;
  2. minimize the restraint loss from random starts with Adam (numpy,
     analytic gradients — molecules are tiny, host-side);
  3. conformer banks: resample torsions around rotatable bonds, re-minimize.

Chirality: after embedding, mirror (z -> -z) + re-minimize when a target
tetrahedral sign set is violated.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

from physdock_tpu.data.mol import Molecule

# covalent radii (Angstrom)
_COV_RADII = {
    1: 0.31, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66, 9: 0.57, 14: 1.11, 15: 1.07,
    16: 1.05, 17: 1.02, 35: 1.20, 53: 1.39,
}
_ORDER_FACTOR = {1.0: 1.0, 1.5: 0.93, 2.0: 0.87, 3.0: 0.78}
_VDW = {1: 1.1, 6: 1.7, 7: 1.55, 8: 1.52, 9: 1.47, 15: 1.8, 16: 1.8, 17: 1.75,
        35: 1.85, 53: 1.98}


def ideal_bond_length(z1: int, z2: int, order: float) -> float:
    r = _COV_RADII.get(z1, 1.2) + _COV_RADII.get(z2, 1.2)
    return r * _ORDER_FACTOR.get(order, 1.0)


@dataclasses.dataclass
class RestraintSet:
    pairs: np.ndarray  # [P, 2] int
    targets: np.ndarray  # [P]
    weights: np.ndarray  # [P]
    rep_pairs: np.ndarray  # [R, 2]
    rep_dist: np.ndarray  # [R]
    chiral: List[Tuple[int, Tuple[int, int, int, int], float]]  # (centre, nbrs, sign)
    # (a, centre, b, ideal_angle_rad) triples — populated alongside the 1-3
    # distance restraints; consumed by infer/relax.check_pose's bond-angle
    # criterion (PoseBusters checks angles, not 1-3 distances)
    angles: Optional[List[Tuple[int, int, int, float]]] = None


def build_restraints(mol: Molecule, chiral_signs=None) -> RestraintSet:
    n = mol.num_atoms
    adj = mol.adjacency
    hyb = mol.hybridizations()
    z = mol.atomic_numbers
    ring_sets = [set(r) for r in mol.rings()]

    pairs, targets, weights = [], [], []
    angles: List[Tuple[int, int, int, float]] = []
    seen = set()

    def add(i, j, r0, w):
        key = (min(i, j), max(i, j))
        if key in seen:
            return
        seen.add(key)
        pairs.append(key)
        targets.append(r0)
        weights.append(w)

    bond_len = {}
    for i, j, o in mol.bonds:
        r0 = ideal_bond_length(int(z[i]), int(z[j]), o)
        bond_len[(i, j)] = bond_len[(j, i)] = r0
        add(i, j, r0, 20.0)

    # 1-3 distances by centre-atom angle
    for c in range(n):
        nbrs = adj[c]
        if len(nbrs) < 2:
            continue
        ring_angle = None
        for rs, ring in zip(ring_sets, mol.rings()):
            if c in rs:
                m = len(ring)
                inset = {x for x in nbrs if x in rs}
                if len(inset) >= 2 and m <= 6:
                    ring_angle = math.pi * (m - 2) / m
        base = {1: math.pi, 2: math.radians(120), 3: math.radians(109.47)}.get(
            int(hyb[c]) if hyb[c] in (1, 2, 3) else 3, math.radians(109.47)
        )
        for ii in range(len(nbrs)):
            for jj in range(ii + 1, len(nbrs)):
                a, b = nbrs[ii], nbrs[jj]
                ang = base
                if ring_angle is not None and any(
                    a in rs and b in rs and c in rs for rs in ring_sets
                ):
                    ang = ring_angle
                ra, rb = bond_len[(c, a)], bond_len[(c, b)]
                d13 = math.sqrt(ra**2 + rb**2 - 2 * ra * rb * math.cos(ang))
                add(a, b, d13, 8.0)
                angles.append((a, c, b, ang))

    # planarity of aromatic/small rings: cross-ring distances of the regular
    # polygon with the mean bond length
    for ring in mol.rings():
        m = len(ring)
        if m < 4:
            continue
        arom = mol.aromatic_atoms()
        planar = all(arom[a] for a in ring) or m <= 5
        if not planar:
            continue
        rmean = np.mean(
            [bond_len[(ring[k], ring[(k + 1) % m])] for k in range(m)]
        )
        radius = rmean / (2 * math.sin(math.pi / m))
        for k in range(m):
            for l in range(k + 2, m):
                if (k == 0 and l == m - 1):
                    continue
                sep = min(l - k, m - (l - k))
                chord = 2 * radius * math.sin(math.pi * sep / m)
                add(ring[k], ring[l], chord, 4.0)

    # sp2 substituent planarity via 1-4 over double bonds is approximated by
    # repulsion + angle restraints; skip explicit torsions.

    # E/Z double-bond stereo: pin the specified substituents' 1-4 distance
    # to the planar trans/cis geometry (from SMILES directional tags)
    for a, bi, bj, b, is_trans in getattr(mol, "stereo_bonds", None) or []:
        r_ij = bond_len.get((bi, bj))
        r_ai = bond_len.get((a, bi))
        r_jb = bond_len.get((bj, b))
        if None in (r_ij, r_ai, r_jb):
            continue
        apos = np.array(
            [-0.5 * r_ai, math.sin(2 * math.pi / 3) * r_ai]
        )
        theta = -math.pi / 3 if is_trans else math.pi / 3
        bpos = np.array(
            [r_ij + r_jb * math.cos(theta), r_jb * math.sin(theta)]
        )
        add(a, b, float(np.linalg.norm(apos - bpos)), 10.0)

    restrained = set(seen)
    rep_pairs, rep_dist = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in restrained:
                continue
            rep_pairs.append((i, j))
            rep_dist.append(0.85 * (_VDW.get(int(z[i]), 1.7) + _VDW.get(int(z[j]), 1.7)))

    chiral = []
    if chiral_signs:
        for centre, nbrs, sign in chiral_signs:
            chiral.append((centre, nbrs, sign))

    return RestraintSet(
        pairs=np.array(pairs or [(0, 0)], np.int32),
        targets=np.array(targets or [0.0], np.float32),
        weights=np.array(weights or [0.0], np.float32),
        rep_pairs=np.array(rep_pairs or [(0, 0)], np.int32),
        rep_dist=np.array(rep_dist or [0.0], np.float32),
        chiral=chiral,
        angles=angles,
    )


def _loss_and_grad(x: np.ndarray, rs: RestraintSet):
    """Restraint loss + gradient; x may be [N, 3] or batched [C, N, 3]
    (the conformer bank refines every sample in one vectorized pass)."""
    squeeze = x.ndim == 2
    xb = x[None] if squeeze else x
    g = np.zeros_like(xb)
    i, j = rs.pairs[:, 0], rs.pairs[:, 1]
    dvec = xb[:, i] - xb[:, j]  # [C, P, 3]
    d = np.linalg.norm(dvec, axis=-1) + 1e-9
    diff = d - rs.targets
    loss = np.sum(rs.weights * diff**2, axis=-1)  # [C]
    gpair = (2 * rs.weights * diff / d)[..., None] * dvec
    np.add.at(g, (slice(None), i), gpair)
    np.add.at(g, (slice(None), j), -gpair)

    ri, rj = rs.rep_pairs[:, 0], rs.rep_pairs[:, 1]
    rvec = xb[:, ri] - xb[:, rj]
    rd = np.linalg.norm(rvec, axis=-1) + 1e-9
    viol = np.maximum(rs.rep_dist - rd, 0.0)
    loss = loss + np.sum(2.0 * viol**2, axis=-1)
    grep = (-4.0 * viol / rd)[..., None] * rvec
    np.add.at(g, (slice(None), ri), grep)
    np.add.at(g, (slice(None), rj), -grep)
    if squeeze:
        return float(loss[0]), g[0]
    return loss, g


def _minimize(x: np.ndarray, rs: RestraintSet, iters: int = 300, lr: float = 0.05):
    m = np.zeros_like(x)
    v = np.zeros_like(x)
    b1, b2, eps = 0.9, 0.999, 1e-8
    for t in range(1, iters + 1):
        loss, g = _loss_and_grad(x, rs)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        x = x - lr * mh / (np.sqrt(vh) + eps)
    return x, _loss_and_grad(x, rs)[0]


def _chirality_violations(x: np.ndarray, rs: RestraintSet):
    """Violation count; scalar for [N, 3], [C] array for batched input."""
    squeeze = x.ndim == 2
    xb = x[None] if squeeze else x
    bad = np.zeros(xb.shape[0], np.int32)
    for centre, (a, b, c, d), sign in rs.chiral:
        vol = np.einsum(
            "ci,ci->c",
            np.cross(xb[:, b] - xb[:, a], xb[:, c] - xb[:, a]),
            xb[:, d] - xb[:, a],
        )
        bad += (vol * sign < 0).astype(np.int32)
    if squeeze:
        return int(bad[0])
    return bad


def embed_molecule(
    mol: Molecule,
    rng: Optional[np.random.Generator] = None,
    n_starts: int = 4,
    iters: int = 400,
    chiral_signs=None,
    enforce_chirality: bool = True,
) -> np.ndarray:
    """Embed one conformer. Returns [N, 3] float32 (centred)."""
    rng = rng or np.random.default_rng(0)
    rs = build_restraints(mol, chiral_signs)
    n = mol.num_atoms
    best, best_loss = None, np.inf
    for _ in range(n_starts):
        x0 = rng.normal(0, 1.5 * max(1.0, n ** (1 / 3)), (n, 3))
        x, loss = _minimize(x0, rs, iters)
        if enforce_chirality and rs.chiral and _chirality_violations(x, rs):
            xm = x * np.array([1.0, 1.0, -1.0])
            xm, lm = _minimize(xm, rs, iters // 2)
            if _chirality_violations(xm, rs) < _chirality_violations(x, rs):
                x, loss = xm, lm
        if loss < best_loss:
            best, best_loss = x, loss
    return (best - best.mean(0)).astype(np.float32)


def _component_atoms(mol: Molecule, bond: Tuple[int, int]) -> np.ndarray:
    """Atoms on the j-side after removing bond (i, j)."""
    i, j = bond
    adj = mol.adjacency
    seen = {i, j}
    stack = [j]
    comp = []
    while stack:
        u = stack.pop()
        comp.append(u)
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return np.array(comp, np.int32)


def randomize_torsions(
    mol: Molecule, coords: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Rotate each rotatable bond by a random angle (torsion resampling)."""
    x = coords.copy()
    for i, j in mol.rotatable_bonds():
        comp = _component_atoms(mol, (i, j))
        if len(comp) == 0 or len(comp) >= mol.num_atoms - 1:
            continue
        axis = x[j] - x[i]
        axis = axis / (np.linalg.norm(axis) + 1e-9)
        theta = rng.uniform(0, 2 * np.pi)
        K = np.array(
            [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
        )
        R = np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)
        x[comp] = (x[comp] - x[j]) @ R.T + x[j]
    return x


def generate_conformers(
    mol: Molecule,
    num_confs: int = 128,
    rng: Optional[np.random.Generator] = None,
    refine_iters: int = 120,
    base_coords: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Torsion-sampled conformer bank [C, N, 3] (replacement for
    `EmbedMultipleConfs(numConfs, enforceChirality=True)` —
    models/model.py:176-189).  Conformer 0 is the base embedding."""
    rng = rng or np.random.default_rng(0)
    chiral_signs = _measured_chirality(mol, base_coords)
    rs = build_restraints(mol, chiral_signs)
    if base_coords is None:
        base = embed_molecule(mol, rng, chiral_signs=chiral_signs)
    else:
        base = np.asarray(base_coords, np.float32)
    if num_confs == 1:
        return (base - base.mean(0))[None].astype(np.float32)
    # torsion-resample all conformers, then refine them as ONE batched
    # minimization (the per-conformer python loop dominated VS host time)
    xs = np.stack(
        [randomize_torsions(mol, base, rng) for _ in range(num_confs - 1)]
    )
    xs, _ = _minimize(xs, rs, refine_iters)
    if rs.chiral:
        viol = _chirality_violations(xs, rs)
        bad = viol > 0
        if bad.any():
            xm, _ = _minimize(
                xs[bad] * np.array([1.0, 1.0, -1.0]), rs, refine_iters // 2
            )
            better = _chirality_violations(xm, rs) < viol[bad]
            idx = np.flatnonzero(bad)[better]
            xs[idx] = xm[better]
    out = np.concatenate([(base - base.mean(0))[None], xs - xs.mean(1, keepdims=True)])
    return out.astype(np.float32)


def _measured_chirality(mol: Molecule, coords: Optional[np.ndarray]):
    """Chirality targets measured on given coordinates (or mol.coords)."""
    ref = coords if coords is not None else mol.coords
    if ref is None:
        return []
    out = []
    for centre, nbrs in mol.chiral_centers():
        a, b, c, d = (ref[k] for k in nbrs)
        vol = float(np.dot(np.cross(b - a, c - a), d - a))
        if abs(vol) > 1e-2:
            out.append((centre, nbrs, math.copysign(1.0, vol)))
    return out
