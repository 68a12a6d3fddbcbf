"""Template-hit machinery: hhr parsing, mmCIF atoms, hit featurization.

Functional subset of the reference's AF2-lineage template stack
(data/tools/templates.py:1070-1259 HhsearchHitFeaturizer,
tools/parsers.py:583 hhr parsing, tools/mmcif_parsing.py:196): parse
hhsearch .hhr hits, pull pseudo-beta coordinates from template mmCIFs, and
emit the 40-channel pair template feature the released model consumes
(39-bin distogram + mask, query-indexed).  The released flow uses the GT
receptor distogram instead (feature_loader.get_template_feat); this module
enables true homolog templates for blind settings.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List

import numpy as np

from physdock_tpu.data.constants.restypes import three_to_one


@dataclasses.dataclass
class TemplateHit:
    index: int
    name: str
    aligned_cols: int
    sum_probs: float
    query: str
    hit_sequence: str
    indices_query: List[int]  # query positions (0-based) per aligned column
    indices_hit: List[int]  # hit positions (0-based) per aligned column


def parse_hhr(text: str) -> List[TemplateHit]:
    """Parse hhsearch/hhblits .hhr output into template hits
    (tools/parsers.py:583-713 lineage)."""
    blocks = text.split("\nNo ")[1:]
    hits = []
    for i, block in enumerate(blocks):
        lines = block.splitlines()
        name = lines[1][1:].strip() if len(lines) > 1 else f"hit{i}"
        m = re.search(r"Aligned_cols=(\d+)", block)
        aligned_cols = int(m.group(1)) if m else 0
        m = re.search(r"Sum_probs=([\d.]+)", block)
        sum_probs = float(m.group(1)) if m else 0.0

        q_seq, t_seq = "", ""
        q_start = t_start = None
        for ln in lines:
            qm = re.match(r"Q\s+(?!ss_|Consensus)\S+\s+(\d+)\s+([A-Z\-]+)\s+\d+", ln)
            if qm:
                if q_start is None:
                    q_start = int(qm.group(1)) - 1
                q_seq += qm.group(2)
            tm = re.match(r"T\s+(?!ss_|Consensus)\S+\s+(\d+)\s+([A-Z\-]+)\s+\d+", ln)
            if tm:
                if t_start is None:
                    t_start = int(tm.group(1)) - 1
                t_seq += tm.group(2)
        if not q_seq or len(q_seq) != len(t_seq):
            continue
        iq, it = [], []
        qpos, tpos = q_start, t_start
        for qc, tc in zip(q_seq, t_seq):
            iq.append(qpos if qc != "-" else -1)
            it.append(tpos if tc != "-" else -1)
            if qc != "-":
                qpos += 1
            if tc != "-":
                tpos += 1
        hits.append(
            TemplateHit(i, name, aligned_cols, sum_probs, q_seq, t_seq, iq, it)
        )
    return hits


@dataclasses.dataclass
class MmcifChain:
    chain_id: str
    positions: Dict[int, Dict[str, np.ndarray]]  # seq pos -> atom name -> xyz
    restypes: Dict[int, str]


def parse_mmcif_atoms(text: str) -> Dict[str, MmcifChain]:
    """Minimal mmCIF _atom_site parser (mmcif_parsing.py:196 equivalent):
    per-chain residue atom coordinates keyed by label_seq_id."""
    lines = text.splitlines()
    headers: List[str] = []
    in_loop = False
    chains: Dict[str, MmcifChain] = {}
    for ln in lines:
        if ln.startswith("loop_"):
            in_loop = True
            headers = []
            continue
        if in_loop and ln.startswith("_atom_site."):
            headers.append(ln.strip().split(".")[1])
            continue
        if headers and not ln.startswith(("_", "#", "loop_")) and ln.strip():
            parts = ln.split()
            if len(parts) < len(headers):
                continue
            rec = dict(zip(headers, parts))
            if rec.get("group_PDB") not in ("ATOM", "HETATM"):
                continue
            try:
                seq = int(rec.get("label_seq_id", "."))
            except ValueError:
                continue
            cid = rec.get("auth_asym_id", rec.get("label_asym_id", "A"))
            chain = chains.setdefault(cid, MmcifChain(cid, {}, {}))
            name = rec.get("label_atom_id", "").strip('"')
            xyz = np.array(
                [float(rec["Cartn_x"]), float(rec["Cartn_y"]), float(rec["Cartn_z"])],
                np.float32,
            )
            chain.positions.setdefault(seq, {})[name] = xyz
            chain.restypes[seq] = rec.get("label_comp_id", "UNK")
        elif headers and (ln.startswith("#") or ln.startswith("loop_")):
            headers = []
            in_loop = False
    return chains


def template_pair_features(
    hit: TemplateHit,
    chain: MmcifChain,
    query_length: int,
    min_bin: float = 3.25,
    max_bin: float = 50.75,
    no_bins: int = 39,
) -> np.ndarray:
    """[L, L, 40] pair template feature (39-bin pseudo-beta distogram +
    mask) in query coordinates — the format the released model's
    TemplatePairEmbedder consumes (feature_loader.get_template_feat)."""
    xb = np.zeros((query_length, 3), np.float32)
    mask = np.zeros(query_length, np.float32)
    seqs = sorted(chain.positions)
    for qi, ti in zip(hit.indices_query, hit.indices_hit):
        if qi < 0 or ti < 0 or qi >= query_length or ti >= len(seqs):
            continue
        atoms = chain.positions[seqs[ti]]
        ccd = chain.restypes[seqs[ti]]
        pb_name = "CA" if three_to_one(ccd) == "G" else "CB"
        pos = atoms.get(pb_name, atoms.get("CA"))
        if pos is None:
            continue
        xb[qi] = pos
        mask[qi] = 1.0

    d2 = np.sum((xb[:, None] - xb[None]) ** 2, axis=-1, keepdims=True)
    lower = np.linspace(min_bin, max_bin, no_bins) ** 2
    upper = np.concatenate([lower[1:], [1e16]])
    dgram = ((d2 > lower) & (d2 < upper)).astype(np.float32)
    pair_mask = mask[:, None] * mask[None, :]
    dgram = dgram * pair_mask[..., None]
    return np.concatenate([dgram, pair_mask[..., None]], axis=-1).astype(np.float32)
