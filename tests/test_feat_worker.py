"""FeaturizerWorker must reproduce the inline featurizer exactly (same
config, same seed) — it is the same code in a clean subprocess."""

import numpy as np
import pytest

from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.feat_worker import FeaturizerWorker
from physdock_tpu.data.feature_loader import SystemFeaturizer

from physdock_tpu.utils.demo_assets import redocking_features_dir, redocking_systems_dir

PKL = f"{redocking_systems_dir()}/5SAK_ZRY_A_1.pkl.gz"
MSA = redocking_features_dir()


@pytest.fixture(scope="module")
def cfg():
    return PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=512, bf16=False,
        infer_use_pocket=True, infer_use_key_res=True,
    )


def test_worker_matches_inline(cfg):
    import os

    if not os.path.exists(PKL):
        pytest.skip("demo assets unavailable")
    kw = dict(
        msa_features_dir=f"{MSA}/msa_features",
        uniprot_msa_features_dir=f"{MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    inline = SystemFeaturizer(cfg.data, **kw)
    f_in, m_in = inline.load(PKL, num_msa_rounds=2)

    worker = FeaturizerWorker(cfg.data, **kw)
    try:
        f_wk, m_wk, confs = worker.load(PKL, num_msa_rounds=2, num_confs=4)
    finally:
        worker.stop()

    assert set(f_in) == set(f_wk)
    for k in f_in:
        np.testing.assert_array_equal(
            np.asarray(f_in[k]), np.asarray(f_wk[k]), err_msg=k
        )
    assert m_wk["system_id"] == m_in["system_id"]
    np.testing.assert_array_equal(
        np.asarray(m_wk["ligand_atom_idx"]), np.asarray(m_in["ligand_atom_idx"])
    )
    # conformer bank generated worker-side with the same seed as the
    # pipeline's inline path
    from physdock_tpu.data.embed import generate_conformers

    mol = m_in["ref_mol"]
    if mol is not None and confs is not None:
        ref = generate_conformers(
            mol, num_confs=4, base_coords=mol.coords,
            rng=np.random.default_rng(0),
        )
        np.testing.assert_allclose(confs, ref, atol=1e-6)


def test_worker_error_surfaces(cfg):
    worker = FeaturizerWorker(cfg.data, inference_mode=True, seed=0)
    try:
        with pytest.raises(RuntimeError, match="featurizer worker failed"):
            worker.load("/nonexistent/system.pkl.gz")
        # worker survives an error and keeps serving
        import os

        if os.path.exists(PKL):
            f, m, _ = worker.load(PKL, num_msa_rounds=1)
            assert "s_mask" in f
    finally:
        worker.stop()


def test_pipeline_dock_through_worker(cfg):
    """Full dock with the worker featurizer (compact transport): must match
    the inline-featurizer pipeline's results bit-for-bit on CPU."""
    import os

    if not os.path.exists(PKL):
        pytest.skip("demo assets unavailable")
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    kw = dict(
        msa_features_dir=f"{MSA}/msa_features",
        uniprot_msa_features_dir=f"{MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    params = load_params(None, cfg)
    settings = SamplerSettings(
        max_samples=4, num_samples_per_round=2, max_rounds=2, steps=2,
        enable_physics_correction=True, num_confs=4, enable_ranking=True,
        seed=0,
    )

    inline = DockingPipeline(
        cfg, params, SystemFeaturizer(cfg.data, **kw), settings
    )
    r_in = inline.dock(PKL, output_dir="/tmp/wk_in", write_outputs=False)

    worker = FeaturizerWorker(cfg.data, **kw)
    try:
        through = DockingPipeline(cfg, params, worker, settings)
        r_wk = through.dock(PKL, output_dir="/tmp/wk_out", write_outputs=False)
    finally:
        worker.stop()

    assert r_wk["system_id"] == r_in["system_id"]
    assert r_wk["rounds"] == r_in["rounds"]
    assert r_wk["rank_order"] == r_in["rank_order"]
    np.testing.assert_allclose(
        np.asarray(r_wk["top5_rmsd"]), np.asarray(r_in["top5_rmsd"]), atol=1e-4
    )


def test_dock_many_prefetch_matches_sequential(cfg):
    """dock_many (prefetching worker pipeline) == sequential dock()."""
    import os

    if not os.path.exists(PKL):
        pytest.skip("demo assets unavailable")
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    systems = [
        PKL,
        f"{redocking_systems_dir()}/5SD5_HWI_A_1.pkl.gz",
    ]
    kw = dict(
        msa_features_dir=f"{MSA}/msa_features",
        uniprot_msa_features_dir=f"{MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    params = load_params(None, cfg)
    settings = SamplerSettings(
        max_samples=2, num_samples_per_round=2, max_rounds=1, steps=2,
        enable_physics_correction=True, num_confs=4, enable_ranking=True,
        seed=0,
    )

    seq = DockingPipeline(cfg, params, SystemFeaturizer(cfg.data, **kw), settings)
    r_seq = [
        seq.dock(p, output_dir=f"/tmp/dm_seq{i}", write_outputs=False)
        for i, p in enumerate(systems)
    ]

    worker = FeaturizerWorker(cfg.data, **kw)
    try:
        many = DockingPipeline(cfg, params, worker, settings)
        r_many = many.dock_many(systems, "/tmp/dm_many", write_outputs=False)
    finally:
        worker.stop()

    for a, b in zip(r_seq, r_many):
        assert a["system_id"] == b["system_id"]
        assert a["rank_order"] == b["rank_order"]
        np.testing.assert_allclose(
            np.asarray(a["top5_rmsd"]), np.asarray(b["top5_rmsd"]), atol=1e-4
        )


def test_abandoned_request_never_pairs_with_wrong_system(cfg):
    """Regression (ADVICE r2): a queued-but-undrained response must never be
    returned as the result of a LATER request.  load() pins its request id,
    so stale responses are discarded, and respawn() gives a clean slate."""
    import os

    if not os.path.exists(PKL):
        pytest.skip("demo assets unavailable")
    PKL2 = f"{redocking_systems_dir()}/5SD5_HWI_A_1.pkl.gz"
    kw = dict(
        msa_features_dir=f"{MSA}/msa_features",
        uniprot_msa_features_dir=f"{MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    worker = FeaturizerWorker(cfg.data, **kw)
    try:
        # simulate dock_many dying after queueing a load it never drains
        worker.submit(PKL, num_msa_rounds=1)
        # sequential-fallback-style load of a DIFFERENT system
        f, m, _ = worker.load(PKL2, num_msa_rounds=1)
        assert m["system_id"] == "5SD5_HWI_A_1"

        # same scenario through respawn(): clean process, ids reset
        worker.submit(PKL, num_msa_rounds=1)
        worker.respawn()
        f, m, _ = worker.load(PKL2, num_msa_rounds=1)
        assert m["system_id"] == "5SD5_HWI_A_1"
    finally:
        worker.stop()


def test_feat_disk_cache_hit_matches_cold(cfg, tmp_path):
    """With cache_dir set, a repeat load is served from disk and must be
    byte-identical to the cold load (VERDICT r2 item 7: warm load < 0.5 s)."""
    import os

    if not os.path.exists(PKL):
        pytest.skip("demo assets unavailable")
    kw = dict(
        msa_features_dir=f"{MSA}/msa_features",
        uniprot_msa_features_dir=f"{MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    worker = FeaturizerWorker(cfg.data, cache_dir=str(tmp_path), **kw)
    try:
        f_cold, m_cold, c_cold = worker.load(PKL, num_msa_rounds=2, num_confs=4)
        assert m_cold.get("_feat_cache") != "hit"
        f_warm, m_warm, c_warm = worker.load(PKL, num_msa_rounds=2, num_confs=4)
        assert m_warm.get("_feat_cache") == "hit"
        assert m_warm["_worker_time_s"] < 0.5
        for k in f_cold:
            np.testing.assert_array_equal(
                np.asarray(f_cold[k]), np.asarray(f_warm[k]), err_msg=k
            )
        np.testing.assert_allclose(c_cold, c_warm, atol=0)
        # different load kwargs must NOT hit the same entry
        _, m3, _ = worker.load(PKL, num_msa_rounds=1, num_confs=4)
        assert m3.get("_feat_cache") != "hit"
    finally:
        worker.stop()


def test_large_payload_no_pipe_deadlock(cfg):
    """Multiple >1 MB requests queued without draining must not deadlock.

    Regression: submit_post writes ~1 MB of poses; without the writer
    thread the parent blocked on the 64 KB stdin pipe while the worker was
    blocked writing an undrained result (only reproduced at real sizes —
    toy shapes fit inside the pipe buffers)."""
    import signal

    worker = FeaturizerWorker(cfg.data, inference_mode=True, seed=0)

    def on_alarm(*a):
        worker.proc.kill()
        raise TimeoutError("worker pipe deadlock")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(120)
    try:
        n_atoms, n_poses = 30000, 4  # ~1.4 MB per request
        rng = np.random.default_rng(0)
        poses = rng.normal(size=(n_poses, n_atoms, 3)).astype(np.float32)
        args = dict(
            x_gt=rng.normal(size=(n_atoms, 3)).astype(np.float32),
            lig_idx=np.arange(10),
            centre_ids=np.zeros(16, np.int64),
            pocket_res=np.ones(16, np.float32),
            is_protein=np.ones(16, np.float32),
            s_mask=np.ones(16, np.float32),
            a_mask=np.ones(n_atoms, np.float32),
            enable_ranking=False,
            compute_rmsd=True,
        )
        for _ in range(3):
            worker.submit_post(poses.copy(), dict(args))
        for _ in range(3):
            aligned, order, rmsds = worker.result()
            assert aligned.shape == poses.shape
            assert len(rmsds) == n_poses
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        worker.stop()


def test_dock_many_batched(cfg):
    """batch_size>1 stacks same-bucket systems into one vmapped program;
    per-system results must be well-formed and comparable in quality to
    sequential (RNG streams differ by construction)."""
    import os

    if not os.path.exists(PKL):
        pytest.skip("demo assets unavailable")
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    systems = [
        PKL,
        f"{redocking_systems_dir()}/5SD5_HWI_A_1.pkl.gz",
    ]
    kw = dict(
        msa_features_dir=f"{MSA}/msa_features",
        uniprot_msa_features_dir=f"{MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    params = load_params(None, cfg)
    settings = SamplerSettings(
        max_samples=2, num_samples_per_round=2, max_rounds=1, steps=2,
        enable_physics_correction=True, num_confs=4, enable_ranking=True,
        seed=0,
    )
    worker = FeaturizerWorker(cfg.data, **kw)
    try:
        pipe = DockingPipeline(cfg, params, worker, settings)
        res = pipe.dock_many(
            systems, "/tmp/dm_batched", write_outputs=False, batch_size=2
        )
    finally:
        worker.stop()
    assert len(res) == 2
    ids = {r["system_id"] for r in res}
    assert ids == {"5SAK_ZRY_A_1", "5SD5_HWI_A_1"}
    for r in res:
        assert r["vs_batch_size"] == 2
        assert r["num_poses"] == 2
        assert r["top5_rmsd"] is not None
        assert all(np.isfinite(v) for v in r["top5_rmsd"])
