"""Training layer tests: trainable-mask semantics (reference pattern strings
against the flax tree), masked optimizer, LoRA transform, EMA, incremental
checkpoints, and a 2-step fit on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from motionrag_tpu.training.checkpoints import restore_into, save_incremental
from motionrag_tpu.training.ema import ema_init, ema_update
from motionrag_tpu.training.lora import init_lora, merge_lora
from motionrag_tpu.training.optim import (
    build_optimizer,
    path_tokens,
    pattern_matches,
    trainable_mask,
)


def fake_params():
    z = lambda *s: jnp.zeros(s)
    return {
        "unet": {"params": {
            "down_blocks_0_attentions_0": {"transformer_blocks_0": {"attn2": {
                "to_q": {"kernel": z(8, 8)},
                "to_q_ip": {"kernel": z(8, 8)},
                "to_k_ip": {"kernel": z(8, 8)},
            }}},
            "conv_in": {"kernel": z(3, 3, 8, 8)},
        }},
        "action_proj_model": {"params": {"proj_in": {"kernel": z(8, 8), "bias": z(8)}}},
        "vae": {"params": {"encoder": {"conv_in": {"kernel": z(3, 3, 3, 8)}}}},
    }


ADAPTER_PATTERN = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.processor"


def test_pattern_matching_adapter_processor():
    params = fake_params()
    mask = trainable_mask(params, [ADAPTER_PATTERN, "action_proj_model"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    selected = {"/".join(path_tokens(p)) for p, m in flat if m}
    assert "action_proj_model/proj_in/kernel" in selected
    assert "action_proj_model/proj_in/bias" in selected
    # processor pattern selects ONLY the adapter branch weights
    assert any("to_q_ip" in s for s in selected)
    assert any("to_k_ip" in s for s in selected)
    assert not any(s.endswith("attn2/to_q/kernel") for s in selected)
    assert not any("conv_in" in s for s in selected)


def test_path_tokens_canonicalization():
    class K:
        def __init__(self, key):
            self.key = key

    toks = path_tokens([K("unet"), K("params"), K("down_blocks_0_attentions_1"), K("to_q_ip"), K("kernel")])
    assert toks == ["unet", "down_blocks", "0", "attentions", "1", "to_q_ip", "kernel"]
    assert pattern_matches(toks, "unet.down_blocks.0")
    assert pattern_matches(toks, "unet.down_blocks.0.attentions.1.processor")
    assert not pattern_matches(toks, "unet.down_blocks.1")


def test_masked_optimizer_freezes_params():
    params = fake_params()
    params = jax.tree.map(lambda x: x + 1.0, params)
    tx, mask = build_optimizer(params, ["action_proj_model"], learning_rate=0.1)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    # frozen unet unchanged; trainable action_proj changed
    np.testing.assert_array_equal(
        np.asarray(new["unet"]["params"]["conv_in"]["kernel"]),
        np.asarray(params["unet"]["params"]["conv_in"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(new["action_proj_model"]["params"]["proj_in"]["kernel"]),
        np.asarray(params["action_proj_model"]["params"]["proj_in"]["kernel"]),
    )


def test_lora_init_and_merge():
    params = fake_params()
    lora = init_lora(jax.random.key(0), params, ["unet.down_blocks.0"], rank=4)
    leaves = [x for x in jax.tree.leaves(lora)]
    assert leaves, "lora tree should have leaves for matched kernels"
    merged = merge_lora(params, lora)
    # B init is zeros -> merge is identity at init
    np.testing.assert_array_equal(
        np.asarray(merged["unet"]["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn2"]["to_q"]["kernel"]),
        np.asarray(params["unet"]["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn2"]["to_q"]["kernel"]),
    )


def test_ema_update_moves_toward_params():
    p0 = {"w": jnp.zeros((3,))}
    ema = ema_init(p0)
    p1 = {"w": jnp.ones((3,))}
    ema = ema_update(ema, p1, jnp.asarray(0))
    # decay at step 0 = min(0.9999, 1/10) = 0.1 -> ema = 0.9 * p1
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.9, rtol=1e-6)


def test_incremental_checkpoint_roundtrip(tmp_path):
    params = jax.tree.map(lambda x: x + 2.0, fake_params())
    mask = trainable_mask(params, ["action_proj_model"])
    save_incremental(tmp_path / "ckpt", params, mask)

    fresh = fake_params()
    merged = restore_into(tmp_path / "ckpt", fresh)
    np.testing.assert_allclose(
        np.asarray(merged["action_proj_model"]["params"]["proj_in"]["kernel"]), 2.0
    )
    np.testing.assert_allclose(np.asarray(merged["unet"]["params"]["conv_in"]["kernel"]), 0.0)


class ToyDataModule:
    """Minimal datamodule protocol used by the Trainer."""

    def __init__(self, b=2, hw=64):
        rng = np.random.default_rng(0)
        self.batch = {
            "video": rng.uniform(-1, 1, (b, 4, 3, hw, hw)).astype(np.float32),
        }

    def prepare_data(self):
        pass

    def setup(self, stage):
        pass

    def train_dataloader(self):
        return [self.batch] * 4

    def val_dataloader(self):
        return [self.batch]

    def test_dataloader(self):
        return [self.batch]


@pytest.mark.slow
def test_trainer_fit_two_steps(tmp_path):
    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer
    from tests.test_svd import tiny_module

    module = tiny_module()
    module.full_trainable_modules = ("unet.conv_out",)
    trainer = Trainer(
        max_steps=2,
        mesh_config=MeshConfig(dp=2, tp=1, sp=1),
        optimizer_config={"learning_rate": 1e-3},
        val_check_interval=0,
        log_every_n_steps=1,
        checkpoint_every_n_steps=0,
        default_root_dir=str(tmp_path),
    )
    state = trainer.fit(module, ToyDataModule())
    assert int(jax.device_get(state.step)) == 2
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.slow
def test_trainer_lora_end_to_end(tmp_path):
    """Reference LoRA semantics (base_module.py:44-66): with
    lora_trainable_modules set, ONLY LoRA leaves update; base params stay
    frozen; the merged weights change; loss is finite; incremental
    checkpoints carry the LoRA tree; eval runs with merged params."""
    import jax.numpy as jnp

    from motionrag_tpu.models.svd.unet import UNetSpatioTemporal
    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer
    from tests.test_svd import tiny_module

    # 2-stage UNet at 32x32: the full train-step jit is minutes of compile
    # on the single host core at the default 4-stage/64x64 size
    module = tiny_module(unet=UNetSpatioTemporal(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=48, num_attention_heads=(1, 2), dtype=jnp.float32,
    ))
    module.full_trainable_modules = ()
    module.lora_trainable_modules = ("unet.*.to_q",)
    module.lora_rank = 4
    trainer = Trainer(
        max_steps=2,
        mesh_config=MeshConfig(dp=2, tp=1, sp=1),
        optimizer_config={"learning_rate": 1e-2},
        val_check_interval=0,
        log_every_n_steps=1,
        checkpoint_every_n_steps=2,
        default_root_dir=str(tmp_path),
    )
    dm = ToyDataModule(hw=32)
    state = trainer.fit(module, dm)
    assert int(jax.device_get(state.step)) == 2
    params = jax.device_get(state.params)
    assert "lora" in params and params["lora"], "LoRA tree missing from state"
    # only lora_b starts at zero; after 2 steps it must have moved
    moved = [
        float(np.abs(np.asarray(v["lora_b"])).max()) for v in params["lora"].values()
    ]
    assert max(moved) > 0, "LoRA B matrices did not update"
    # the optimizer mask marks exactly the LoRA leaves trainable
    n_lora = sum(1 for m in jax.tree.leaves(trainer.mask) if m)
    lora_leaves = sum(len(jax.tree.leaves(v)) for v in params["lora"].values())
    assert n_lora == lora_leaves, "only LoRA leaves should be trainable"
    # incremental checkpoint carries the LoRA tree
    ckpts = sorted((tmp_path / "checkpoints").glob("step_*"))
    assert ckpts
    from motionrag_tpu.training import checkpoints as ckpt_lib

    restored = ckpt_lib.restore_into(ckpts[-1], jax.device_get(state.params))
    assert "lora" in restored
    # eval consumes merged params: after training, W' = W + A@B differs from
    # the frozen base exactly at the LoRA sites (driving the full generation
    # pipeline here would compile the sampler for minutes on the host core —
    # the e2e pipeline itself is covered by test_e2e_cli)
    merged = trainer._merged_params(state.params)
    base = {k: v for k, v in state.params.items() if k != "lora"}
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()), merged, base
    )
    assert max(jax.tree.leaves(diff)) > 0, "merged params identical to base"


@pytest.mark.slow
def test_trainer_fsdp_param_sharding(tmp_path):
    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer
    from tests.test_svd import tiny_module

    module = tiny_module()
    module.full_trainable_modules = ("unet.conv_out",)
    trainer = Trainer(
        max_steps=1,
        mesh_config=MeshConfig(dp=2, fsdp=2, tp=1, sp=1),
        optimizer_config={"learning_rate": 1e-3},
        val_check_interval=0,
        log_every_n_steps=1,
        checkpoint_every_n_steps=0,
        default_root_dir=str(tmp_path),
        param_sharding="fsdp",
    )
    state = trainer.fit(module, ToyDataModule(b=4))
    assert int(jax.device_get(state.step)) == 1
    # at least one large param should actually be sharded over fsdp
    shardings = [
        leaf.sharding for leaf in jax.tree.leaves(state.params)
        if hasattr(leaf, "sharding") and leaf.ndim >= 2
    ]
    assert any("fsdp" in str(s.spec) for s in shardings)

    # full-state resume under fsdp: restored moments re-shard, step carries
    trainer.save_checkpoint(state, 1)
    trainer2 = Trainer(
        max_steps=2,
        mesh_config=MeshConfig(dp=2, fsdp=2, tp=1, sp=1),
        optimizer_config={"learning_rate": 1e-3},
        val_check_interval=0,
        log_every_n_steps=1,
        checkpoint_every_n_steps=0,
        default_root_dir=str(tmp_path / "resume"),
        param_sharding="fsdp",
    )
    module2 = tiny_module()
    module2.full_trainable_modules = ("unet.conv_out",)
    state2 = trainer2.fit(
        module2, ToyDataModule(b=4),
        ckpt_path=str(tmp_path / "checkpoints" / "step_00000001"),
    )
    assert int(jax.device_get(state2.step)) == 2


class _LinearModule:
    """Minimal Trainer-protocol module: loss = <w, g> so grad(w) is the
    batch-constant ``g`` row and optimizer behavior is exactly observable."""

    full_trainable_modules = ("w",)
    trainable_patterns = ("w",)

    def init_params(self, rng, batch):
        return {"w": {"params": {"kernel": jnp.zeros((4,), jnp.float32)}}}

    def loss(self, params, batch, rng):
        w = params["w"]["params"]["kernel"]
        loss = jnp.sum(w * jnp.mean(batch["g"], axis=0))
        return loss, {"main_loss": loss}


class _GradDataModule:
    def __init__(self, n=4, batches=None):
        self.batch = {"g": np.ones((2, 4), np.float32)}
        self.n = n
        self.batches = batches

    def prepare_data(self):
        pass

    def setup(self, stage):
        pass

    def train_dataloader(self):
        if self.batches is not None:
            return list(self.batches)
        return [self.batch] * self.n

    def val_dataloader(self):
        return []

    def test_dataloader(self):
        return []


def _fit_linear(tmp_path, tag, accumulate, max_steps):
    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer

    trainer = Trainer(
        max_steps=max_steps,
        mesh_config=MeshConfig(dp=2, tp=1, sp=1),
        optimizer_config={"learning_rate": 1e-2},
        val_check_interval=0,
        log_every_n_steps=100,
        checkpoint_every_n_steps=0,
        default_root_dir=str(tmp_path / tag),
        accumulate_grad_batches=accumulate,
    )
    state = trainer.fit(_LinearModule(), _GradDataModule())
    return np.asarray(jax.device_get(state.params["w"]["params"]["kernel"]))


def test_accumulate_grad_batches(tmp_path):
    """Lightning ``accumulate_grad_batches`` semantics (reference
    configs/*/MotionRAG_open.yml trainer block): grads are averaged over k
    micro-batches and applied as ONE optimizer update. With identical
    micro-batches, k=2 over 2 steps must equal k=1 over 1 step exactly,
    and a single micro-step under k=2 must leave params untouched."""
    w_deferred = _fit_linear(tmp_path, "deferred", accumulate=2, max_steps=1)
    np.testing.assert_array_equal(w_deferred, 0.0)

    w_acc = _fit_linear(tmp_path, "acc", accumulate=2, max_steps=2)
    w_ref = _fit_linear(tmp_path, "ref", accumulate=1, max_steps=1)
    assert np.abs(w_acc).max() > 0
    np.testing.assert_allclose(w_acc, w_ref, rtol=0, atol=0)


def _mk_trainer(tmp_path, tag, **kw):
    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer

    kw.setdefault("mesh_config", MeshConfig(dp=2, tp=1, sp=1))
    kw.setdefault("optimizer_config", {"learning_rate": 1e-2})
    kw.setdefault("val_check_interval", 0)
    kw.setdefault("log_every_n_steps", 100)
    kw.setdefault("checkpoint_every_n_steps", 0)
    kw.setdefault("default_root_dir", str(tmp_path / tag))
    return Trainer(**kw)


def test_lightning_trainer_block_drop_in(tmp_path):
    """A verbatim reference trainer block (Lightning dump, reference
    configs/dynamicrafter/MotionRAG_open.yml:46-70) must construct: the
    placement/precision keys are resolved by the mesh + dtype policy,
    gradient_clip_val flows into the optimizer chain, and genuinely
    unknown keys still raise (typo safety)."""
    import pytest

    trainer = _mk_trainer(
        tmp_path, "lightning",
        accelerator="auto", strategy="auto", devices=8, num_nodes=1,
        precision="bf16-true", max_epochs=None, max_steps=10000,
        limit_train_batches=None, limit_predict_batches=None,
        overfit_batches=0.0, check_val_every_n_epoch=None,
        min_steps=None, min_epochs=None, max_time=None,
        accumulate_grad_batches=1, gradient_clip_val=0.5,
        gradient_clip_algorithm=None, deterministic=None, benchmark=True,
        inference_mode=True, use_distributed_sampler=True, profiler=None,
        detect_anomaly=False, barebones=False, plugins=None,
        sync_batchnorm=False, reload_dataloaders_every_n_epochs=0,
        enable_checkpointing=None, enable_progress_bar=None,
        enable_model_summary=None, fast_dev_run=None,
    )
    assert trainer.optimizer_config["grad_clip"] == 0.5
    with pytest.raises(TypeError):
        _mk_trainer(tmp_path, "typo", graident_clip_val=0.5)


def test_max_epochs_and_limit_train_batches(tmp_path):
    """Lightning epoch accounting: max_epochs bounds passes over the
    loader; limit_train_batches truncates each pass."""
    trainer = _mk_trainer(tmp_path, "epochs", max_steps=-1, max_epochs=2)
    state = trainer.fit(_LinearModule(), _GradDataModule(n=3))
    assert int(jax.device_get(state.step)) == 6

    trainer = _mk_trainer(
        tmp_path, "limit", max_steps=-1, max_epochs=2, limit_train_batches=2
    )
    state = trainer.fit(_LinearModule(), _GradDataModule(n=4))
    assert int(jax.device_get(state.step)) == 4


def test_fast_dev_run_and_checkpointing_off(tmp_path):
    """fast_dev_run runs exactly one step and writes no checkpoint;
    enable_checkpointing=false suppresses the final save."""
    trainer = _mk_trainer(tmp_path, "fdr", max_steps=100, fast_dev_run=True,
                          checkpoint_every_n_steps=50)
    state = trainer.fit(_LinearModule(), _GradDataModule(n=4))
    assert int(jax.device_get(state.step)) == 1
    assert not (tmp_path / "fdr" / "checkpoints").exists()

    trainer = _mk_trainer(tmp_path, "nockpt", max_steps=2,
                          enable_checkpointing=False)
    trainer.fit(_LinearModule(), _GradDataModule(n=4))
    assert not (tmp_path / "nockpt" / "checkpoints").exists()


def test_full_state_resume_matches_uninterrupted(tmp_path):
    """fit(ckpt_path=...) resumes step count, optimizer moments, and the rng
    stream (Lightning resume semantics): 2 steps + save + resume 2 steps
    must equal one uninterrupted 4-step run bit-for-bit. A varying batch
    sequence makes stale Adam moments observable."""
    batches = [{"g": np.full((2, 4), s, np.float32)} for s in (1.0, -2.0, 3.0, 0.5)]

    def fit(tag, max_steps, ckpt_path=None):
        trainer = _mk_trainer(tmp_path, tag, max_steps=max_steps,
                              checkpoint_every_n_steps=2)
        offset = 0 if ckpt_path is None else 2
        state = trainer.fit(
            _LinearModule(), _GradDataModule(batches=batches[offset:]),
            ckpt_path=ckpt_path,
        )
        return trainer, state

    _, ref_state = fit("straight", max_steps=4)
    trainer_a, state_a = fit("part1", max_steps=2)
    ckpt = tmp_path / "part1" / "checkpoints" / "step_00000002"
    assert ckpt.exists()
    _, state_b = fit("part2", max_steps=4, ckpt_path=str(ckpt))

    assert int(jax.device_get(state_b.step)) == 4
    w_ref = np.asarray(jax.device_get(ref_state.params["w"]["params"]["kernel"]))
    w_res = np.asarray(jax.device_get(state_b.params["w"]["params"]["kernel"]))
    np.testing.assert_array_equal(w_res, w_ref)
    # resumed mid-run differs from a fresh 2-step run on the tail batches
    # (i.e. the optimizer moments actually carried over)
    _, fresh = fit("fresh_tail", max_steps=2)
    w_interrupted = np.asarray(jax.device_get(state_a.params["w"]["params"]["kernel"]))
    assert np.abs(w_res - w_interrupted).max() > 0


def test_params_only_checkpoint_still_loads(tmp_path):
    """Released-artifact path: a bare params tree (no opt_state) restores
    with strict=False merge semantics."""
    from motionrag_tpu.training.checkpoints import restore_into, save_checkpoint

    tree = {"w": {"params": {"kernel": np.full((4,), 7.0, np.float32)}}}
    save_checkpoint(tmp_path / "bare", tree)
    trainer = _mk_trainer(tmp_path, "bare_load", max_steps=1)
    state = trainer.fit(_LinearModule(), _GradDataModule(n=1),
                        ckpt_path=str(tmp_path / "bare"))
    assert int(jax.device_get(state.step)) == 1

    # and the full-state checkpoint works through plain restore_into too
    full_ckpt = tmp_path / "bare_load" / "checkpoints" / "step_00000001"
    merged = restore_into(full_ckpt, {"w": {"params": {"kernel": np.zeros(4, np.float32)}}})
    assert np.abs(merged["w"]["params"]["kernel"]).max() > 0


def test_bf16_true_precision_casts_params_and_moments(tmp_path):
    """Lightning 'bf16-true' semantics (every reference training config,
    e.g. reference configs/cogvideox/action_injection.yml trainer block):
    model WEIGHTS are cast to bf16, so the Adam moments (created in param
    dtype) are bf16 too — halving param+optimizer HBM. '32-true' and
    'bf16-mixed' keep fp32 params."""
    trainer = _mk_trainer(tmp_path, "bf16true", max_steps=2,
                          precision="bf16-true")
    state = trainer.fit(_LinearModule(), _GradDataModule(n=2))
    params = jax.device_get(state.params)
    for leaf in jax.tree.leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16, leaf.dtype
    # optimizer moments follow the param dtype
    moment_dtypes = {
        leaf.dtype for leaf in jax.tree.leaves(jax.device_get(state.opt_state))
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        and getattr(leaf, "ndim", 0) >= 1
    }
    assert moment_dtypes <= {jnp.dtype(jnp.bfloat16)}, moment_dtypes
    # training still moves the weights
    w = np.asarray(params["w"]["params"]["kernel"], np.float32)
    assert np.abs(w).max() > 0

    for prec in ("32-true", "bf16-mixed"):
        tr = _mk_trainer(tmp_path, f"p_{prec}", max_steps=1, precision=prec)
        st = tr.fit(_LinearModule(), _GradDataModule(n=1))
        k = jax.device_get(st.params)["w"]["params"]["kernel"]
        assert k.dtype == jnp.float32

    with pytest.raises(ValueError):
        _mk_trainer(tmp_path, "badprec", precision="fp8-true")


def test_gradient_clip_val_changes_updates(tmp_path):
    """With gradient scales varying across steps, global-norm clipping must
    change the Adam trajectory; an effectively-infinite clip must not."""
    batches = [{"g": np.full((2, 4), s, np.float32)} for s in (1.0, 100.0)]

    def fit(tag, **kw):
        trainer = _mk_trainer(tmp_path, tag, max_steps=2, **kw)
        state = trainer.fit(_LinearModule(), _GradDataModule(batches=batches))
        return np.asarray(jax.device_get(state.params["w"]["params"]["kernel"]))

    w_plain = fit("plain")
    w_clip = fit("clip", gradient_clip_val=0.5)
    w_bigclip = fit("bigclip", gradient_clip_val=1e9)
    np.testing.assert_allclose(w_bigclip, w_plain, rtol=1e-6)
    assert np.abs(w_clip - w_plain).max() > 1e-6
