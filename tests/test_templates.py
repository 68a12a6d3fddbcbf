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


def test_parse_hmmsearch_sto_and_featurizer():
    from physdock_tpu.data.msa.templates import (
        TemplateHitFeaturizer,
        parse_hmmsearch_sto,
    )

    query = "MKVLA"
    sto = """# STOCKHOLM 1.0
#=GS 1abc_A DE test hit
1abc_A MK-LA
2def_B MKvVLA
//
"""
    hits = parse_hmmsearch_sto(sto, query)
    assert len(hits) == 2
    h = hits[0]
    assert h.name == "1abc_A"
    assert h.aligned_cols == 4
    assert h.indices_hit[2] == -1  # gap column
    assert h.indices_query == [0, 1, 2, 3, 4]

    # featurizer: mmCIF with CA/CB atoms for the hit chain
    rows = []
    atoms = [("N", 0.0), ("CA", 1.0), ("CB", 2.0)]
    for seq in range(1, 6):
        for nm, off in atoms:
            rows.append(
                f"ATOM {len(rows)+1} C {nm} . MET A 1 {seq} ? "
                f"{seq * 4.0 + off:.2f} 0.00 0.00 1.0 0.0 ? {seq} MET A {nm} 1"
            )
    mmcif = (
        "loop_\n"
        + "\n".join(
            f"_atom_site.{h}"
            for h in [
                "group_PDB", "id", "type_symbol", "label_atom_id",
                "label_alt_id", "label_comp_id", "label_asym_id",
                "label_entity_id", "label_seq_id", "pdbx_PDB_ins_code",
                "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
                "B_iso_or_equiv", "pdbx_formal_charge", "auth_seq_id",
                "auth_comp_id", "auth_asym_id", "auth_atom_id",
                "pdbx_PDB_model_num",
            ]
        )
        + "\n"
        + "\n".join(rows)
        + "\n#\n"
    )
    fz = TemplateHitFeaturizer(
        mmcif_lookup={"1abc": mmcif, "2def": mmcif},
        release_dates={"1abc": "2020-01-01", "2def": "2030-01-01"},
        max_template_date="2021-06-01",
        min_align_ratio=0.5,
    )
    feats = fz.featurize(hits, query)
    # 2def rejected by date; 1abc accepted
    assert len(feats) == 1
    f = feats[0]
    assert f.shape == (5, 5, 40)
    # aligned (non-gap) positions have mask 1; the gap column position 2 not
    assert f[0, 1, 39] == 1.0 and f[2, 2, 39] == 0.0
    # distogram rows sum to <=1 per pair
    assert np.all(f[..., :39].sum(-1) <= 1.0 + 1e-6)


def test_rna_msa_featurization():
    from physdock_tpu.data.msa import parsers
    from physdock_tpu.data.msa.search import rna_msa_key, rna_msa_to_int8
    from physdock_tpu.data.constants.restypes import CCD_TO_ORDER

    msa = parsers.parse_stockholm(
        "# STOCKHOLM 1.0\nq AGCUU\nhit1 AG-UU\n//\n"
    )
    f = rna_msa_to_int8(msa)
    assert f["msa"].shape == (2, 5)
    assert f["msa"][0, 0] == CCD_TO_ORDER["A  "]
    assert f["msa"][0, 3] == CCD_TO_ORDER["U  "]
    assert f["msa"][1, 2] == 31  # gap in the hit row
    assert rna_msa_key("AGCU") != rna_msa_key("AGCA")
