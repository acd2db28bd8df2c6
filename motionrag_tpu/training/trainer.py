"""JAX trainer loop — the TPU-native replacement for Lightning's Trainer.

fit/test semantics mirror the reference CLI (``main.py {fit,test}``):
  - fit: jitted train step (donated state) over a data-parallel mesh;
    gradient all-reduce is inserted by XLA from the shardings (params
    replicated, batch sharded over dp) — the analogue of DDP/NCCL
    (SURVEY.md §2.9);
  - frozen parameters are stop_gradient'ed inside the loss (XLA DCEs their
    grad computation) and masked out of the optimizer (optim.py);
  - periodic validation runs the module's eval_pipeline and hands generated
    uint8 videos to metric callbacks (reference ``base_module.py:129-183``);
  - checkpoints are incremental (trainable-only) by default.

State lives in a single donated pytree, so steps run at full speed with no
host round-trips except logging every ``log_every_n_steps``.
"""

from __future__ import annotations

import inspect
import json
import time
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from motionrag_tpu.parallel.mesh import MeshConfig, build_mesh
from motionrag_tpu.training import checkpoints as ckpt_lib
from motionrag_tpu.training.ema import ema_init, ema_update
from motionrag_tpu.training.loggers import JSONLLogger, build_logger
from motionrag_tpu.training.optim import build_optimizer
from motionrag_tpu.utils.pipeline import assert_video_output, tensor2vid

__all__ = ["Trainer", "TrainState", "JSONLLogger"]

# Lightning trainer keys that reference configs carry verbatim but that the
# TPU runtime resolves by construction: device placement comes from the
# MeshConfig (devices/num_nodes/accelerator/strategy), and the rest are
# torch/Lightning runtime toggles with no JAX counterpart. Accepted so a
# reference config drops in unchanged (reference configs/*/MotionRAG_open.yml
# trainer block). ``precision`` is honored (see Trainer.__init__).
_LIGHTNING_NOOP_KEYS = frozenset({
    "accelerator", "strategy", "devices", "num_nodes",
    "plugins", "profiler", "sync_batchnorm", "use_distributed_sampler",
    "benchmark", "deterministic", "detect_anomaly", "inference_mode",
    "barebones", "enable_progress_bar", "enable_model_summary",
    "reload_dataloaders_every_n_epochs", "overfit_batches",
    "check_val_every_n_epoch", "min_steps", "min_epochs", "max_time",
    "limit_predict_batches",
})


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    rng: jax.Array


class Trainer:
    def __init__(
        self,
        max_steps: int = 1000,
        mesh_config: MeshConfig | None = None,
        optimizer_config: dict | None = None,
        val_check_interval: int = 2000,
        log_every_n_steps: int = 10,
        checkpoint_every_n_steps: int = 2000,
        default_root_dir: str = "runs/default",
        incremental_checkpoint: bool = True,
        use_ema: bool = False,
        seed: int = 42,
        callbacks: Iterable[Any] = (),
        limit_val_batches: Optional[int] = None,
        limit_test_batches: Optional[int] = None,
        num_sanity_val_steps: int = 0,
        param_sharding: str = "replicated",  # or 'fsdp'
        partition_rules: Optional[list] = None,
        logger: Any = None,
        accumulate_grad_batches: int = 1,
        gradient_clip_val: float | None = None,
        gradient_clip_algorithm: str | None = None,
        max_epochs: int | None = None,
        limit_train_batches: Optional[int] = None,
        fast_dev_run: bool | int | None = None,
        enable_checkpointing: bool | None = None,
        precision: str | int | None = None,
        **lightning_kwargs,
    ):
        # Lightning ``precision`` semantics (every reference config sets
        # 'bf16-true', configs/*/action_injection.yml:8): '*-true' casts the
        # MODEL WEIGHTS — and therefore the optimizer moments, which torch
        # creates in param dtype — to that dtype; '*-mixed' keeps fp32
        # weights with low-precision compute (our modules' dtype field
        # already provides the compute side). bf16-true halves param + Adam
        # HBM: it is what lets the frozen 5.57B CogVideoX DiT train its
        # adapters on a single 16 GB v5e (tools/bench_train.py cog_adapter).
        _prec = str(precision) if precision is not None else None
        if _prec in ("bf16-true", "bf16true"):
            self.param_cast_dtype = jnp.bfloat16
        elif _prec in (None, "32", "32-true", "bf16-mixed", "bf16",
                       "16-mixed", "16-true", "16"):
            # fp16 variants map to fp32 params: JAX-on-TPU has no fp16
            # training story and bf16 compute subsumes it
            self.param_cast_dtype = None
        else:
            raise ValueError(f"unsupported precision {precision!r}")
        unknown = set(lightning_kwargs) - _LIGHTNING_NOOP_KEYS
        if unknown:
            raise TypeError(
                f"Trainer got unexpected keyword arguments: {sorted(unknown)}"
            )
        # Lightning: max_steps=-1/None means "until max_epochs exhausts"
        self.max_steps = float("inf") if max_steps in (None, -1) else max_steps
        self.max_epochs = max_epochs
        if self.max_steps == float("inf") and self.max_epochs is None:
            self.max_epochs = 1000  # Lightning's default when both unbounded
        self.limit_train_batches = (
            int(limit_train_batches)
            if isinstance(limit_train_batches, (int, float))
            and limit_train_batches >= 1 else None
        )
        self.mesh_config = mesh_config or MeshConfig()
        self.optimizer_config = dict(optimizer_config or {})
        if gradient_clip_val is not None:
            # trainer-level Lightning key -> the optimizer chain; an explicit
            # optimizer_config grad_clip wins (it's the more specific knob)
            self.optimizer_config.setdefault("grad_clip", gradient_clip_val)
            if gradient_clip_algorithm is not None:
                self.optimizer_config.setdefault(
                    "grad_clip_algorithm", gradient_clip_algorithm
                )
        self.val_check_interval = val_check_interval
        self.log_every_n_steps = log_every_n_steps
        self.checkpoint_every_n_steps = checkpoint_every_n_steps
        self.root_dir = Path(default_root_dir)
        self.incremental_checkpoint = incremental_checkpoint
        self.use_ema = use_ema
        self.seed = seed
        self.callbacks = list(callbacks)
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        self.num_sanity_val_steps = num_sanity_val_steps
        self.param_sharding = param_sharding
        self.partition_rules = partition_rules
        self.logger = build_logger(logger, self.root_dir)
        self.accumulate_grad_batches = int(accumulate_grad_batches)
        self.checkpointing_enabled = enable_checkpointing is not False
        if not self.checkpointing_enabled:
            self.checkpoint_every_n_steps = 0
        if fast_dev_run:
            # Lightning fast_dev_run: n batches of train (+val), no
            # checkpointing, no sanity run — a smoke pass through the loop
            n = 1 if fast_dev_run is True else int(fast_dev_run)
            self.max_steps = n
            self.val_check_interval = 0
            self.checkpoint_every_n_steps = 0
            self.checkpointing_enabled = False
            self.num_sanity_val_steps = 0
            self.limit_val_batches = n
            self.limit_test_batches = n
        self.mesh = None

    # -- setup -------------------------------------------------------------

    def _shard_batch(self, batch: dict) -> dict:
        """Shard a host batch over the dp(xfsdp) mesh axes.

        Multi-host (jax.process_count() > 1): each process's loader yields
        its LOCAL slice of the global batch (global batch = concatenation
        over processes, the Lightning-DDP contract) and the global array is
        assembled zero-copy via make_array_from_process_local_data."""
        spec = P(("dp", "fsdp"))

        def put(x):
            if not isinstance(x, (np.ndarray, jnp.ndarray)):
                return x
            sharding = NamedSharding(self.mesh, spec)
            if jax.process_count() > 1:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x))
            return jax.device_put(jnp.asarray(x), sharding)

        return {k: put(v) for k, v in batch.items()}

    def _replicate(self, tree):
        sharding = NamedSharding(self.mesh, P())
        if jax.process_count() > 1:
            # every process holds the identical full value (same seed/init)
            def rep(x):
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                    data = jax.make_array_from_process_local_data(
                        sharding, np.asarray(jax.random.key_data(x)))
                    return jax.random.wrap_key_data(
                        data, impl=jax.random.key_impl(x))
                return jax.make_array_from_process_local_data(sharding, np.asarray(x))

            return jax.tree.map(rep, tree)
        return jax.device_put(tree, sharding)

    def _param_shardings(self, params):
        """Sharding tree for parameters: replicated (DDP-equivalent),
        'fsdp' (largest divisible axis sharded over the fsdp mesh axis —
        ZeRO-3-style, XLA inserts the gathers), and/or explicit
        partition_rules (e.g. the CogVideoX DiT TP rules)."""
        if self.partition_rules is not None:
            from motionrag_tpu.parallel.sharding import apply_partition_rules

            return apply_partition_rules(params, self.partition_rules, self.mesh)
        if self.param_sharding == "fsdp":
            n_fsdp = self.mesh.shape["fsdp"]

            def spec_for(leaf):
                if not hasattr(leaf, "shape") or leaf.ndim == 0:
                    return NamedSharding(self.mesh, P())
                # shard the largest axis divisible by the fsdp size
                axes = sorted(range(leaf.ndim), key=lambda a: -leaf.shape[a])
                for a in axes:
                    if leaf.shape[a] % n_fsdp == 0 and leaf.shape[a] >= n_fsdp:
                        spec = [None] * leaf.ndim
                        spec[a] = "fsdp"
                        return NamedSharding(self.mesh, P(*spec))
                return NamedSharding(self.mesh, P())

            return jax.tree.map(spec_for, params)
        return jax.tree.map(lambda _: NamedSharding(self.mesh, P()), params)

    def setup(self, module, batch_template: dict, ckpt_path: str | None = None):
        self.mesh = build_mesh(self.mesh_config)
        rng = jax.random.key(self.seed)
        rng, init_rng = jax.random.split(rng)
        if self.param_cast_dtype is None:
            params = module.init_params(init_rng, batch_template)
        else:
            # bf16-true: jit the init+cast as ONE program so every fp32
            # initializer output is transient (XLA frees each leaf after its
            # cast — peak HBM = the bf16 tree + one fp32 leaf, not the full
            # fp32 tree; the 5.57B CogVideoX DiT in fp32 alone is 22 GB)
            cast = lambda x: (x.astype(self.param_cast_dtype)
                              if jnp.issubdtype(x.dtype, jnp.floating) else x)
            # batches can carry non-array leaves (metadata strings); only
            # array leaves go through the jit boundary, the rest ride the
            # closure untouched
            leaves, treedef = jax.tree_util.tree_flatten(batch_template)
            is_arr = [hasattr(x, "shape") and hasattr(x, "dtype") for x in leaves]
            arrays = [x for x, m in zip(leaves, is_arr) if m]

            def _init_cast(r, arrs):
                it = iter(arrs)
                bt = jax.tree_util.tree_unflatten(
                    treedef, [next(it) if m else x for x, m in zip(leaves, is_arr)]
                )
                return jax.tree.map(cast, module.init_params(r, bt))

            params = jax.jit(_init_cast)(init_rng, arrays)
        # LoRA (reference base_module.py:57-63 / lora_utils.py): low-rank
        # trees for every kernel matching lora_trainable_modules, stored
        # under params['lora'] so the optimizer mask / incremental
        # checkpoints treat them like any other trainable leaves
        lora_patterns = tuple(getattr(module, "lora_trainable_modules", ()) or ())
        if lora_patterns:
            from motionrag_tpu.training.lora import init_lora

            rng, lora_rng = jax.random.split(rng)
            lora_tree = init_lora(
                lora_rng, params, lora_patterns,
                rank=int(getattr(module, "lora_rank", 64)),
            )
            if not lora_tree:
                raise ValueError(
                    f"lora_trainable_modules {lora_patterns} matched no 2D kernels"
                )
            params = dict(params, lora=lora_tree)
        # full-state checkpoints (step/opt_state/rng alongside params) resume
        # training exactly (Lightning resume semantics); params-only
        # checkpoints (incl. released incremental adapter files) merge into
        # the fresh tree with strict=False semantics
        resume_extras = None
        if ckpt_path:
            raw = ckpt_lib.restore_checkpoint(ckpt_path)
            if isinstance(raw, dict) and "opt_state" in raw and "params" in raw:
                resume_extras = raw  # structure recovered via template below
                params = ckpt_lib.merge_into(params, raw["params"])
            else:
                params = ckpt_lib.merge_into(params, raw)
        if self.param_cast_dtype is not None:
            # LoRA trees init fp32 and checkpoint merges restore saved
            # dtypes; one more cast keeps the whole tree at the precision
            # policy (no-op astype for leaves already there)
            params = jax.tree.map(
                lambda x: x.astype(self.param_cast_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        trainable_patterns = list(module.trainable_patterns)
        if lora_patterns:
            trainable_patterns.append("lora")
        self._validate_patterns(module, params)
        self.tx, self.mask = build_optimizer(
            params, trainable_patterns, **self.optimizer_config
        )
        if self.accumulate_grad_batches > 1:
            # Lightning's accumulate_grad_batches: grads are averaged over k
            # micro-batches and applied once (trainer.step still counts
            # micro-steps). optax.MultiSteps keeps the accumulator in
            # opt_state, so it shards/donates with the rest of the state.
            import optax

            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=self.accumulate_grad_batches
            )
        # place params per the sharding policy; optimizer state and EMA
        # inherit the shardings through zeros_like/astype
        shardings = self._param_shardings(params)
        params = jax.tree.map(jax.device_put, params, shardings)
        opt_state = self.tx.init(params)
        step0 = jnp.zeros((), jnp.int32)
        if resume_extras is not None:
            # re-restore with the live opt_state as template so optax's
            # namedtuple/MaskedNode structure comes back intact
            full = ckpt_lib.restore_checkpoint(ckpt_path, {
                "params": jax.device_get(resume_extras["params"]),
                "opt_state": jax.device_get(opt_state),
                "step": np.zeros((), np.int32),
                "rng": np.zeros_like(jax.random.key_data(rng)),
            })
            def _put_like(x, live):
                # restored moments take the live opt_state's mesh shardings
                # (replicated under dp, sharded under fsdp/partition rules);
                # scalar counters carry SingleDeviceSharding — committing to
                # one device would clash with the mesh, so replicate those
                sh = getattr(live, "sharding", None)
                if isinstance(sh, NamedSharding):
                    return jax.device_put(jnp.asarray(x), sh)
                return self._replicate(jnp.asarray(x))

            opt_state = jax.tree.map(_put_like, full["opt_state"], opt_state)
            step0 = jnp.asarray(full["step"], jnp.int32)
            rng = jax.random.wrap_key_data(jnp.asarray(full["rng"]))
            print(f"resumed full train state at step {int(full['step'])}", flush=True)
        ema = ema_init(params) if self.use_ema else None
        state = TrainState(
            step=self._replicate(step0),
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            rng=self._replicate(rng),
        )
        n_train = sum(
            leaf.size for leaf, m in zip(
                jax.tree.leaves(params),
                jax.tree.leaves(self.mask),
            ) if m
        )
        n_total = sum(leaf.size for leaf in jax.tree.leaves(params))
        print(f"params: {n_total / 1e6:.1f}M total, {n_train / 1e6:.1f}M trainable", flush=True)
        return state

    def _validate_patterns(self, module, params):
        """Warn on freeze/full/lora patterns that match nothing — the
        reference silently no-ops these (base_module.py:44-66); surfacing
        typos is strictly safer. freeze_modules itself needs no mask action:
        like the reference, the optimizer only ever receives full+lora
        parameters, so everything else is frozen by construction."""
        from motionrag_tpu.training.optim import path_tokens as _pt
        from motionrag_tpu.training.optim import pattern_matches as _pm

        all_tokens = [
            _pt(path) for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        ]
        for field in ("freeze_modules", "full_trainable_modules", "lora_trainable_modules"):
            for pat in getattr(module, field, ()) or ():
                # raw config entries are module-relative — families prepend
                # their own prefix before masking (e.g. ActionTransformerModule
                # turns 'condition_proj' into 'condition_transformer.condition_proj')
                # — so also try the pattern at any depth before warning
                if not any(_pm(toks, pat) or _pm(toks, "*." + pat)
                           for toks in all_tokens):
                    print(f"WARNING: {field} pattern {pat!r} matches no parameters",
                          flush=True)

    @staticmethod
    def _merged_params(params):
        """Apply LoRA deltas for module consumption (no-op without LoRA)."""
        if not isinstance(params, dict) or "lora" not in params:
            return params
        from motionrag_tpu.training.lora import merge_lora

        base = {k: v for k, v in params.items() if k != "lora"}
        return merge_lora(base, params["lora"])

    def _make_train_step(self, module):
        mask = self.mask
        tx = self.tx
        use_ema = self.use_ema
        merged = self._merged_params

        def train_step(state: TrainState, batch: dict):
            rng, step_rng = jax.random.split(state.rng)

            def loss_fn(params):
                p = jax.tree.map(
                    lambda x, m: x if m else jax.lax.stop_gradient(x), params, mask
                )
                return module.loss(merged(p), batch, step_rng)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            gnorm = jnp.sqrt(
                sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
            )
            metrics = dict(metrics, grad_norm=gnorm)
            ema = state.ema_params
            if use_ema:
                ema = ema_update(ema, params, state.step)
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                ema_params=ema, rng=rng,
            )
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    # -- loops -------------------------------------------------------------

    def fit(self, module, datamodule, ckpt_path: str | None = None):
        datamodule.prepare_data()
        datamodule.setup("fit")
        train_iter = iter(datamodule.train_dataloader())
        first_batch = next(train_iter)
        state = self.setup(module, first_batch, ckpt_path)
        train_step = self._make_train_step(module)

        if self.num_sanity_val_steps:
            self.validate(module, state, datamodule, limit=self.num_sanity_val_steps)

        for cb in self.callbacks:
            if hasattr(cb, "on_fit_start"):
                cb.on_fit_start(self, module)

        batch = first_batch
        epoch = 0
        batch_in_epoch = 1  # first_batch already drawn
        t0 = time.time()
        # the step counter is tracked host-side: a per-step
        # jax.device_get(state.step) would force a host<->device sync every
        # iteration (serializing the async dispatch pipeline and paying a
        # full RPC round-trip per step on remote runtimes); the device only
        # syncs at log/checkpoint/val cadence
        step = int(jax.device_get(state.step))
        while step < self.max_steps:
            for cb in self.callbacks:
                if hasattr(cb, "on_train_batch_start"):
                    cb.on_train_batch_start(self, module, batch)
            sharded = self._shard_batch(batch)
            # only array leaves enter the jitted step (metadata/prompt
            # strings stay host-side, reference collate keeps them too)
            jit_batch = {
                k: v for k, v in sharded.items()
                if isinstance(v, (jnp.ndarray, np.ndarray))
            }
            # mesh context: PartitionSpec-based constraints inside modules
            # (e.g. the DiT's sequence_parallel token sharding) resolve
            # against it; explicit NamedShardings are unaffected
            with self.mesh:
                state, metrics = train_step(state, jit_batch)
            step += 1

            if step % self.log_every_n_steps == 0:
                host_metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                host_metrics["steps_per_sec"] = self.log_every_n_steps / max(
                    time.time() - t0, 1e-9
                )
                t0 = time.time()
                self.logger.log(host_metrics, step)
                for cb in self.callbacks:
                    if hasattr(cb, "on_train_batch_end"):
                        cb.on_train_batch_end(self, module, host_metrics, step)

            if self.checkpoint_every_n_steps and step % self.checkpoint_every_n_steps == 0:
                self.save_checkpoint(state, step)

            if self.val_check_interval and step % self.val_check_interval == 0:
                self.validate(module, state, datamodule, limit=self.limit_val_batches)

            epoch_end = (
                self.limit_train_batches is not None
                and batch_in_epoch >= self.limit_train_batches
            )
            if not epoch_end:
                try:
                    batch = next(train_iter)
                    batch_in_epoch += 1
                except StopIteration:
                    epoch_end = True
            if epoch_end:
                epoch += 1
                if self.max_epochs is not None and epoch >= self.max_epochs:
                    break
                train_iter = iter(datamodule.train_dataloader())
                batch = next(train_iter)
                batch_in_epoch = 1

        final_step = int(jax.device_get(state.step))
        if self.checkpointing_enabled and not (
                self.checkpoint_every_n_steps
                and final_step % self.checkpoint_every_n_steps == 0):
            self.save_checkpoint(state, final_step)  # not already saved above
        self.logger.finish()
        return state

    def validate(self, module, state, datamodule, limit: Optional[int] = None):
        return self._eval_loop(module, state, datamodule, "val", limit)

    def test(self, module, datamodule, ckpt_path: str | None = None):
        datamodule.prepare_data()
        datamodule.setup("test")
        loader = datamodule.test_dataloader()
        first = next(iter(loader))
        state = self.setup(module, first, ckpt_path)
        return self._eval_loop(module, state, datamodule, "test", self.limit_test_batches)

    def _eval_loop(self, module, state, datamodule, stage: str, limit=None):
        self._last_step = int(jax.device_get(state.step))  # for callbacks
        loader = (
            datamodule.val_dataloader() if stage == "val" else datamodule.test_dataloader()
        )
        if not hasattr(module, "eval_pipeline"):
            # loss-based evaluation (e.g. standalone CT training, reference
            # condition/module.py:340-351)
            rng = jax.random.key(self.seed + 1)
            sums: dict[str, float] = {}
            n = 0
            loss_fn = getattr(module, "validation_loss", module.loss)
            eval_params = self._merged_params(state.params)
            for i, batch in enumerate(loader):
                if limit is not None and i >= limit:
                    break
                rng, step_rng = jax.random.split(rng)
                loss, metrics = loss_fn(eval_params, self._shard_batch(batch), step_rng)
                for k, v in {**metrics, f"{stage}/loss": loss}.items():
                    sums[k] = sums.get(k, 0.0) + float(jax.device_get(v))
                n += 1
            results = {k: v / max(n, 1) for k, v in sums.items()}
            if results:
                self.logger.log(results, int(jax.device_get(state.step)))
            return results
        generated, ground_truth, prompts, sample_ids = [], [], [], []
        rng = jax.random.key(self.seed + 1)
        eval_params = self._merged_params(state.params)
        for i, batch in enumerate(loader):
            if limit is not None and i >= limit:
                break
            rng, step_rng = jax.random.split(rng)
            with self.mesh:
                frames = module.eval_pipeline(eval_params, batch, step_rng)
            videos = tensor2vid(frames)  # uint8 [b f c h w] host
            assert_video_output(videos)
            generated.append(videos)
            gt = np.asarray(batch["video"])
            ground_truth.append(((np.clip(gt, -1, 1) + 1) * 127.5).round().astype(np.uint8))
            meta = batch.get("metadata", [{}] * videos.shape[0])
            prompts.extend(m.get("raw_prompt", "") for m in meta)
            # per-sample identity for dedup/ordering (reference wrapper.py
            # keys per-sample scores by video id, not running index)
            base = len(sample_ids)
            sample_ids.extend(m.get("id", base + j) for j, m in enumerate(meta))
        results = {}
        for cb in self.callbacks:
            if hasattr(cb, "on_eval_epoch_end"):
                hook = cb.on_eval_epoch_end
                kwargs = {}
                try:
                    sig = inspect.signature(hook)
                    if "sample_ids" in sig.parameters or any(
                        p.kind is inspect.Parameter.VAR_KEYWORD
                        for p in sig.parameters.values()
                    ):
                        kwargs["sample_ids"] = sample_ids
                except (TypeError, ValueError):
                    pass
                out = hook(self, stage, generated, ground_truth, prompts, **kwargs)
                if out:
                    results.update(out)
        if results:
            self.logger.log(results, int(jax.device_get(state.step)))
        return results

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(self, state: TrainState, step: int):
        """Full-resume checkpoints (Lightning semantics: optimizer state +
        global step ride along, reference ModelCheckpoint). In incremental
        mode the params subtree is trainable-only (reference
        IncrementalCheckpoint, ``training.py:75-97``) — the optimizer state
        is small regardless, since optax only materializes moments for
        trainable leaves."""
        path = self.root_dir / "checkpoints" / f"step_{step:08d}"
        params = jax.device_get(state.params)
        if self.incremental_checkpoint:
            params = ckpt_lib.mask_filter(params, self.mask)
        tree = {
            "params": params,
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(step, np.int32),
            "rng": jax.device_get(jax.random.key_data(state.rng)),
        }
        ckpt_lib.save_checkpoint(path, tree)
        print(f"saved checkpoint: {path}", flush=True)
