"""Round-protocol semantics vs a literal simulation of the reference loop.

The simulation below is a line-by-line numpy transliteration of the
reference's per-system round loop (reference: redocking.py:165-341):
accept/reject bookkeeping, bounded reject deque, adaptive factor,
per-round conformer-bank rebuild (accepted ligand templates + epsilon-top
refill from the original bank), early break, and final reject backfill.
Both sides are driven with identical fake sampler outputs.
"""

from collections import deque

import numpy as np
import pytest

from physdock_tpu.infer.rounds import RoundProtocol, _smooth_epsilon, pairwise


def reference_simulation(
    round_outputs, conf_bank, max_samples, num_samples_per_round, eta_start
):
    """Transliteration of redocking.py:165-341 (torch -> numpy)."""
    accept_samples = []
    reject_samples = deque([], maxlen=max_samples)
    ligand_templates = []
    reference_templates = []
    factor = eta_start
    ref_mol_poses_dist = pairwise(conf_bank)

    banks, factors = [], []
    for recycle_id in range(len(round_outputs)):
        factors.append(factor)
        banks.append(
            None
            if recycle_id == 0
            else np.stack(ligand_templates + reference_templates)
        )
        x_pred, lig_pred, flags = round_outputs[recycle_id]
        for i in range(len(x_pred)):
            if flags[i]:
                ligand_templates.append(lig_pred[i])
                accept_samples.append(x_pred[i])
            else:
                reject_samples.append(x_pred[i])
        if any(flags):
            factor = factor * 1.15
        else:
            factor = max(factor * 0.7, 1)
        if len(accept_samples) >= max_samples:
            break
        lig_d = pairwise(lig_pred)
        delta = np.abs(lig_d[:, None] - ref_mol_poses_dist[None])
        eps = _smooth_epsilon(delta).mean(axis=(0, -1, -2))
        used_inds = np.argsort(eps)[: max_samples - len(ligand_templates)]
        reference_templates = [conf_bank[i] for i in used_inds]

    if len(accept_samples) < num_samples_per_round:
        accept_samples = accept_samples + [_ for _ in reject_samples]
    return banks, factors, np.stack(accept_samples[:max_samples])


def _fake_rounds(rng, n_rounds, S, A, L, flag_plan):
    out = []
    for r in range(n_rounds):
        x = rng.normal(size=(S, A, 3)).astype(np.float32)
        lig = x[:, :L]
        out.append((x, lig, np.asarray(flag_plan[r], bool)))
    return out


CASES = [
    # (flag plan per round, max_samples, num/round, eta)
    ([[False, False], [True, False], [True, True], [False, True]], 4, 2, 6.0),
    ([[False, False], [False, False], [False, False]], 3, 2, 6.0),  # all reject
    ([[True, True, True]], 3, 3, 2.0),  # done in round 0
    ([[False, True], [True, True]], 3, 2, 1.0),
]


@pytest.mark.parametrize("flag_plan,max_samples,nspr,eta", CASES)
def test_protocol_matches_reference_simulation(flag_plan, max_samples, nspr, eta):
    rng = np.random.default_rng(0)
    S, A, L, C = len(flag_plan[0]), 12, 5, 7
    conf_bank = rng.normal(size=(C, L, 3)).astype(np.float32)
    rounds = _fake_rounds(rng, len(flag_plan), S, A, L, flag_plan)

    ref_banks, ref_factors, ref_final = reference_simulation(
        rounds, conf_bank, max_samples, nspr, eta
    )

    proto = RoundProtocol(conf_bank, max_samples, nspr, eta)
    got_banks, got_factors = [], []
    for r, (x, lig, flags) in enumerate(rounds):
        got_factors.append(proto.factor)
        got_banks.append(proto.bank(r))
        proto.update(x, lig, flags)
        if proto.done:
            break

    assert got_factors == pytest.approx(ref_factors)
    assert len(got_banks) == len(ref_banks)
    for got, ref in zip(got_banks, ref_banks):
        if ref is None or len(ref) == 0:
            assert got is None
            continue
        pos, mask = got
        n = int(mask.sum())
        # reference bank contents == unpadded prefix; shape is static
        assert pos.shape == (max_samples, L, 3)
        np.testing.assert_allclose(pos[:n], ref[:max_samples], atol=0)
        assert n == min(len(ref), max_samples)
    np.testing.assert_allclose(proto.final_poses(), ref_final, atol=0)


def test_round0_has_no_bank():
    """(a) no conformer-template guidance at recycle 0 (redocking.py:290)."""
    rng = np.random.default_rng(1)
    proto = RoundProtocol(rng.normal(size=(4, 5, 3)), 3, 2, 6.0)
    assert proto.bank(0) is None


def test_bank_contains_accepted_poses_first():
    """(b) after round k the bank leads with accepted ligand poses
    (redocking.py:294: ligand_templates + reference_templates)."""
    rng = np.random.default_rng(2)
    proto = RoundProtocol(rng.normal(size=(6, 5, 3)), 4, 2, 6.0)
    x = rng.normal(size=(2, 10, 3)).astype(np.float32)
    lig = x[:, :5]
    proto.update(x, lig, np.array([True, False]))
    pos, mask = proto.bank(1)
    assert mask.sum() == 4  # 1 accepted + 3 epsilon-refilled = max_samples
    np.testing.assert_allclose(pos[0], lig[0])  # accepted pose leads
    # remaining entries come from the original conformer bank
    for i in range(1, 4):
        assert any(
            np.allclose(pos[i], c) for c in proto.conf_bank
        )


def test_reject_backfill_accumulates_across_rounds():
    """Rejects are kept in a bounded deque across ALL rounds and backfill
    the final set when too few accepted (redocking.py:166,337-338)."""
    rng = np.random.default_rng(3)
    proto = RoundProtocol(rng.normal(size=(4, 5, 3)), 5, 2, 6.0)
    xs = []
    for r in range(3):
        x = rng.normal(size=(2, 10, 3)).astype(np.float32)
        xs.append(x)
        proto.update(x, x[:, :5], np.array([False, False]))
    final = proto.final_poses()
    # deque maxlen=max_samples=5 keeps the LAST five rejects
    assert final.shape[0] == 5
    np.testing.assert_allclose(final[0], xs[0][1])  # oldest surviving
    np.testing.assert_allclose(final[-1], xs[2][1])


def test_gt_ligand_ablation_bank():
    """--ebable_x_gt_ligand_as_ref_pos: bank is the GT ligand pose
    (redocking.py:293)."""
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(5, 3)).astype(np.float32)
    proto = RoundProtocol(rng.normal(size=(4, 5, 3)), 3, 2, 6.0, gt_ligand=gt)
    pos, mask = proto.bank(1)
    assert mask.sum() == 1
    np.testing.assert_allclose(pos[0], gt)
