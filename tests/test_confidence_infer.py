"""Confidence head at inference (enable_confidence / confidence_ranking):
per-pose pLDDT/PAE/pTM/ipTM metrics from the trained head, optional
ranking by ranking_confidence (the fused-confidence path; reference ships
release weights without the head, so this is the extension surface)."""

import os

import numpy as np
import pytest

from physdock_tpu.utils.demo_assets import system_preparation_dir

DEMO = system_preparation_dir()


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(f"{DEMO}/EJQ.sdf"), reason="demo assets unavailable"
)
def test_dock_with_confidence_scoring(tmp_path):
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.data.system import generate_system
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    pkl = generate_system(
        f"{DEMO}/receptor.pdb", f"{DEMO}/EJQ.sdf", output_dir=str(tmp_path)
    )
    cfg = PhysDockConfig.named(
        "toy", crop_size=64, atom_crop_size=256, num_augmentation_sample=2
    )
    fz = SystemFeaturizer(cfg.data, seed=0)
    # init_all: includes the head
    params = load_params(None, cfg, with_confidence=True)
    pipe = DockingPipeline(
        cfg,
        params,
        fz,
        SamplerSettings(
            max_samples=3,
            num_samples_per_round=3,
            max_rounds=1,
            steps=2,
            num_confs=4,
            enable_ranking=True,
            enable_confidence=True,
            confidence_ranking=True,
        ),
    )
    out = str(tmp_path / "out")
    res = pipe.dock(pkl, out)

    conf = res["confidence"]
    assert len(conf) == res["num_poses"]
    for m in conf:
        for k in ("mean_plddt", "ptm", "iptm", "ranking_confidence"):
            assert np.isfinite(m[k]), (k, m)
        assert 0.0 <= m["mean_plddt"] <= 100.0
        assert 0.0 <= m["ptm"] <= 1.0

    # confidence[0] belongs to rank 0: scores must be rank-descending
    # modulo the clash penalty tie; check monotone non-increasing
    scores = [m["ranking_confidence"] for m in conf]
    assert all(s1 >= s2 - 1e-6 for s1, s2 in zip(scores, scores[1:]))
    assert os.path.exists(os.path.join(out, "confidence.json"))


def test_enable_confidence_requires_head():
    import jax

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    cfg = PhysDockConfig.named("toy", crop_size=64, atom_crop_size=256)
    pipe = DockingPipeline(
        cfg, {}, SystemFeaturizer(cfg.data, seed=0),
        SamplerSettings(enable_confidence=False),  # model built without head
    )
    with pytest.raises(ValueError, match="with_confidence"):
        pipe._confidence_scores(None, (None,) * 4, np.zeros((1, 4, 3)), {})
