"""Training-harness tests: optimizer schedule, sharded step on the virtual
8-device mesh, checkpoint round-trip, weight-converter mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True, scope="module")
def _clear_xla_caches():
    """The XLA CPU backend segfaults on this module's biggest shard_map
    compile when the in-process compile caches are full (observed at ~99%
    of the one-process suite, round 3+4).  Drop cached executables before
    the module so its compiles start from a clean slate."""
    jax.clear_caches()
    yield


def test_lr_schedule():
    from physdock_tpu.train.optim import stair_exp_warmup_schedule

    sched = stair_exp_warmup_schedule(peak_lr=1.8e-3, warmup_steps=1000)
    assert 0.0 < float(sched(0)) < 1e-5  # first update non-zero
    assert np.isclose(float(sched(499)), 0.9e-3)
    assert np.isclose(float(sched(1000)), 1.8e-3)
    assert np.isclose(float(sched(2000)), 1.8e-3 * 0.998)
    assert np.isclose(float(sched(2999)), 1.8e-3 * 0.998)


def test_per_replica_clip():
    from physdock_tpu.train.optim import clip_by_norm

    tree = {"a": jnp.ones(4) * 10.0}
    clipped = clip_by_norm(tree, 0.1)
    assert np.isclose(float(jnp.linalg.norm(clipped["a"])), 0.1, atol=1e-5)


def test_sharded_train_step_8_devices(toy_config):
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import batch_sharding, make_mesh
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(dp=n)
    model = PhysDock(cfg=toy_config.model)
    optimizer = make_optimizer()

    single = make_synthetic_batch(n_tokens=12, n_atoms=36, n_msa=4, n_ligand_tokens=4)
    batch = {
        k: jnp.asarray(np.stack([np.asarray(v)] * n)) for k, v in single.items()
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    micro = {k: jnp.asarray(v) for k, v in single.items()}
    params = model.init(jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1))
    # state buffers are DONATED by the step: snapshot before stepping
    params0 = jax.tree_util.tree_map(np.asarray, params)
    state = init_train_state(params, optimizer)
    step = make_train_step(model, optimizer, toy_config.loss, mesh)

    state, logs = step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 1
    assert np.isfinite(float(logs["loss"]))
    # params actually moved
    delta = sum(
        float(jnp.sum(jnp.abs(a - jnp.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(params0),
        )
    )
    assert delta > 0
    # EMA lags params
    ema_delta = sum(
        float(jnp.sum(jnp.abs(a - jnp.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(params0),
        )
    )
    assert 0 < ema_delta < delta


def test_dp8_step_equals_dp1_step(toy_config):
    """DP-correctness gate (VERDICT r2 item 5): the 8-device shard_map
    train step must produce the same params/logs as a single-device step
    on the same global batch (per-sample keys fold the GLOBAL index, and
    the fp32 psum-mean is just a reduction order change)."""
    # big-compile segfault mitigation, same as
    # test_mini_rollout_confidence_training below: the XLA CPU backend
    # segfaults on the suite's largest compiles once ~100 tests' worth of
    # executables fill its cache; flush first
    jax.clear_caches()

    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import batch_sharding, make_mesh
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    model = PhysDock(cfg=toy_config.model)
    optimizer = make_optimizer()
    # 8 DIFFERENT systems (same shapes, different seeds)
    singles = [
        make_synthetic_batch(n_tokens=12, n_atoms=36, n_msa=4,
                             n_ligand_tokens=4, seed=s)
        for s in range(8)
    ]
    global_batch = {
        k: np.stack([np.asarray(s[k]) for s in singles]) for k in singles[0]
    }
    micro = {k: jnp.asarray(v) for k, v in singles[0].items()}
    params = model.init(jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1))

    results = {}
    for dp in (8, 1):
        mesh = make_mesh(dp=dp)
        batch = jax.device_put(
            {k: jnp.asarray(v) for k, v in global_batch.items()},
            batch_sharding(mesh),
        )
        state = init_train_state(
            jax.tree_util.tree_map(jnp.copy, params), optimizer
        )
        step = make_train_step(model, optimizer, toy_config.loss, mesh)
        state, logs = step(state, batch, jax.random.PRNGKey(2))
        results[dp] = (
            jax.tree_util.tree_map(np.asarray, state.params),
            {k: float(v) for k, v in logs.items()},
        )

    p8, l8 = results[8]
    p1, l1 = results[1]
    for k in l8:
        np.testing.assert_allclose(l8[k], l1[k], rtol=1e-4, err_msg=k)
    leaves8 = jax.tree_util.tree_leaves_with_path(p8)
    leaves1 = jax.tree_util.tree_leaves(p1)
    for (path, a), b in zip(leaves8, leaves1):
        np.testing.assert_allclose(
            a, b, atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_weight_converter_structure(toy_config, tiny_batch):
    """A synthetic torch-style state dict with the reference naming maps
    onto the flax tree with zero missing/unexpected/mismatched entries."""
    from physdock_tpu.model.import_weights import audit_conversion, convert_state_dict
    from physdock_tpu.model.physdock import PhysDock

    model = PhysDock(cfg=toy_config.model)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    # build the torch-name state dict from the flax tree itself
    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, name))
            else:
                out[name] = np.asarray(v)
        return out

    flat = flatten(params["params"])
    state = {}
    for name, arr in flat.items():
        if ".blocks." in name:
            head, tail = name.split(".blocks.", 1)
            for b in range(arr.shape[0]):
                sub = arr[b]
                state[f"{head}.blocks.{b}.{tail}"] = (
                    sub.T if sub.ndim == 2 else sub
                )
        else:
            state[name] = arr.T if arr.ndim == 2 else arr
    # reference nests the timestep embedder one level deeper
    state = {
        k.replace("time_embedder.linear_", "time_embedder.timestep_embedder.linear_"): v
        for k, v in state.items()
    }

    converted = convert_state_dict(state)
    missing, unexpected, mismatched = audit_conversion(converted, params)
    assert not missing and not unexpected and not mismatched, (
        missing[:3],
        unexpected[:3],
        mismatched[:3],
    )


def test_checkpoint_roundtrip(tmp_path, toy_config):
    from physdock_tpu.train import checkpoint as ck
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state

    params = {"w": jnp.arange(4.0), "b": {"x": jnp.ones(2)}}
    opt = make_optimizer()
    state = init_train_state(params, opt)
    path = ck.save_train_state(str(tmp_path), state)
    restored = ck.restore_train_state(path)
    assert int(restored["step"]) == 0
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(4.0))
    # params-only restore prefers EMA
    p = ck.restore_params(path)
    np.testing.assert_array_equal(p["w"], np.arange(4.0))

    # a crash mid-save leaves an .orbax-checkpoint-tmp dir; auto-resume
    # must skip it (the gate's tpu_retry resume path depends on this)
    import os

    os.makedirs(str(tmp_path / "step_00000099.orbax-checkpoint-tmp"))
    assert ck.latest_checkpoint(str(tmp_path)) == path


def test_params_npz_roundtrip(tmp_path):
    """Flat .npz params artifact (restore-proof committed weights): fp16
    down-cast for float leaves, integers preserved exactly, nested tree
    structure reproduced, and load_params dispatches on the extension."""
    from physdock_tpu.train import checkpoint as ck

    params = {
        "params": {
            "dense": {"kernel": jnp.linspace(-2.0, 2.0, 12).reshape(3, 4),
                      "bias": jnp.zeros(4)},
            "emb": {"table": jnp.arange(6, dtype=jnp.int32).reshape(2, 3)},
        }
    }
    path = str(tmp_path / "p.npz")
    ck.save_params_npz(path, params)
    back = ck.load_params_npz(path)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(
        jax.device_get(params)
    )
    np.testing.assert_allclose(
        back["params"]["dense"]["kernel"],
        np.linspace(-2.0, 2.0, 12).reshape(3, 4),
        atol=1e-3,
    )
    assert back["params"]["emb"]["table"].dtype == np.int32
    np.testing.assert_array_equal(
        back["params"]["emb"]["table"], np.arange(6).reshape(2, 3)
    )

    from physdock_tpu.cli.common import load_params

    via_cli = load_params(path, None)
    np.testing.assert_array_equal(
        via_cli["params"]["dense"]["bias"], np.zeros(4)
    )


def test_mini_rollout_confidence_training(toy_config):
    """Mini-rollout path (loss_module3.py:599-610 + train.sh
    --mini-rollout-steps 12): plddt/pae/pde losses are real (nonzero),
    decrease under training, and infer/metrics ranking-confidence runs on
    the trained head outputs."""
    import dataclasses

    # This is the biggest compile in the suite (trunk + rollout scan +
    # confidence + backward) and runs last; with ~100 tests' worth of
    # executables in the XLA CPU compile cache the backend segfaults inside
    # backend_compile_and_load (reproducible full-suite, passes isolated).
    # Flushing the caches first keeps the compiler healthy.
    jax.clear_caches()

    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.infer.metrics import get_metrics
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import batch_sharding, make_mesh
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    n = 2
    mesh = make_mesh(dp=n, devices=jax.devices()[:n])
    model = PhysDock(cfg=toy_config.model, with_confidence=True)
    optimizer = make_optimizer(peak_lr=1e-3, warmup_steps=1)
    loss_cfg = dataclasses.replace(toy_config.loss, alpha_pae=1.0,
                                   alpha_confidence=1.0)

    single = make_synthetic_batch(n_tokens=12, n_atoms=36, n_msa=4, n_ligand_tokens=4)
    batch = {
        k: jnp.asarray(np.stack([np.asarray(v)] * n)) for k, v in single.items()
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    micro = {k: jnp.asarray(v) for k, v in single.items()}
    params = model.init(
        jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1), method="init_all"
    )
    # numpy snapshot BEFORE the step donates (and deletes) the init buffers
    heads0 = {
        head: jax.tree.map(
            np.asarray, params["params"]["confidence_module"][head]
        )
        for head in ("linear_pae", "linear_pde", "linear_plddt")
    }
    state = init_train_state(params, optimizer)
    step = make_train_step(
        model, optimizer, loss_cfg, mesh,
        use_mini_rollout=True, mini_rollout_steps=2,
    )

    first_logs = None
    for i in range(6):
        state, logs = step(state, batch, jax.random.PRNGKey(2))  # fixed key
        if first_logs is None:
            first_logs = {k: float(v) for k, v in logs.items()}
    last_logs = {k: float(v) for k, v in logs.items()}

    for name in ("plddt_loss", "pae_loss", "pde_loss"):
        assert first_logs[name] > 0, (name, first_logs)
        assert np.isfinite(last_logs[name]), (name, last_logs)
        # same batch + same key: confidence losses must go down
        assert last_logs[name] < first_logs[name], (name, first_logs, last_logs)

    # Every confidence head must actually RECEIVE gradient: with
    # alpha_pae=0 (the release LossConfig default) the PAE head trains to
    # nothing and ipTM/ranking_confidence stays constant at the untrained
    # value — exactly how the r3/r4 confidence gates shipped broken.  A
    # moved kernel AND a moved (zero-init) bias pin grad connectivity
    # through loss -> head -> optimizer masking.
    for head in ("linear_pae", "linear_pde", "linear_plddt"):
        h0 = heads0[head]
        h1 = state.params["params"]["confidence_module"][head]
        assert not np.allclose(
            np.asarray(h0["weight"]), np.asarray(h1["weight"])
        ), f"{head} kernel never trained (zero gradient path)"
        assert float(np.abs(np.asarray(h1["bias"])).max()) > 0, (
            f"{head} bias still exactly zero after training"
        )

    # ranking-confidence consumes the trained head outputs end to end
    # (jitted: eager apply floods the XLA CPU compile cache and has
    # segfaulted the backend when run late in the full suite)
    @jax.jit
    def heads(params, batch, k1, k2):
        out = model.apply(params, batch, k1, return_conditioning=True)
        a, ap, s, z = out["conditioning"]
        x_pred = sample_diffusion(
            model, params, batch, k2,
            num_sample=1, steps=2, conditioning=(a, ap, s, z),
        )
        p_pae, p_pde, p_plddt = model.apply(
            params, batch, s, z, x_pred, method="confidence"
        )
        return x_pred, p_pae, p_pde, p_plddt

    x_pred, p_pae, p_pde, p_plddt = heads(
        state.params, micro, jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    )
    m = get_metrics(
        np.asarray(p_pae), np.asarray(p_plddt), np.asarray(x_pred[0]), single
    )
    for k in ("mean_plddt", "ptm", "iptm", "ranking_confidence"):
        assert np.isfinite(m[k]), m
