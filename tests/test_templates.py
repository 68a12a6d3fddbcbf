"""Template-hit machinery tests: hhr parsing, mmCIF atoms, featurization."""

import numpy as np

from physdock_tpu.data.msa.templates import (
    parse_hhr,
    parse_mmcif_atoms,
    template_pair_features,
)

HHR = """Query q
No 1
>1abc_A tmpl
Probab=99.0 E-value=1e-30 Aligned_cols=5 Identities=40% Similarity=0.6 Sum_probs=4.5

Q q                1 MKVLA    5 (10)
Q Consensus        1 mkvla    5 (10)
T 1abc_A           2 MK-LA    6 (8)
T Consensus        2 mk-la    6 (8)
"""

CIF = """data_test
loop_
_atom_site.group_PDB
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.label_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
ATOM CA MET A 1 0.0 0.0 0.0
ATOM CB MET A 1 1.0 0.0 0.0
ATOM CA LYS A 2 3.8 0.0 0.0
ATOM CB LYS A 2 4.5 0.5 0.0
ATOM CA GLY A 3 7.6 0.0 0.0
ATOM CA LEU A 4 11.4 0.0 0.0
ATOM CB LEU A 4 12.0 0.6 0.0
ATOM CA ALA A 5 15.2 0.0 0.0
ATOM CB ALA A 5 15.9 0.4 0.0
#
"""


def test_hhr_parse_alignment_indices():
    (hit,) = parse_hhr(HHR)
    assert hit.aligned_cols == 5
    assert hit.indices_query == [0, 1, 2, 3, 4]
    assert hit.indices_hit == [1, 2, -1, 3, 4]


def test_mmcif_and_template_features():
    (hit,) = parse_hhr(HHR)
    chains = parse_mmcif_atoms(CIF)
    feat = template_pair_features(hit, chains["A"], query_length=10)
    assert feat.shape == (10, 10, 40)
    # aligned residues produce a mask block; distogram rows one-hot
    assert feat[..., 39].sum() == 16  # 4 aligned residues with pb atoms
    covered = feat[..., :39][feat[..., 39] > 0]
    sums = covered.sum(-1)
    # off-diagonal covered pairs hit exactly one bin (diagonal d=0 below min)
    assert set(np.unique(sums)).issubset({0.0, 1.0})
