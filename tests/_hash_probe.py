"""Temporary probe: detect session-fixture mutation by test_loss_parity."""
import hashlib
import numpy as np

_snap = {}

def test_aaa_snapshot(tiny_batch):
    for k, v in tiny_batch.items():
        _snap[k] = np.asarray(v).copy()

def test_zzz_compare(tiny_batch):
    bad = []
    for k, v in tiny_batch.items():
        if not np.array_equal(np.asarray(v), _snap[k]):
            bad.append(k)
    assert not bad, f"tiny_batch mutated in place: {bad}"
